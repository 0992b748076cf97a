"""Two-cluster-size scaling protocol (BASELINE.md): run the identical
pipeline on the identical on-disk corpus at N and 4N EXECUTORS, >=3 timed
runs each (fresh subprocess per run), medians reported, efficiency
E = throughput(4N) / (4 x throughput(N)).

An "executor" is a real separate executor JVM with 1 core and a fixed
memory grant (local-cluster[N,1,mem] via SPARK_GRAFT_EXECUTORS) — the
faithful cluster analog: scaling executors scales cores AND memory
together, exactly as adding executors to a cluster does. (A shared
local[N] heap hands the 1-core run 4x the per-core memory a real executor
would get, inflating the N baseline and understating E.)

Level choice is hardware-justified: this sandbox's 32 vCPUs are 16
physical cores + SMT on a shared host. A pure-CPU (register-only) probe —
rerun and embedded in the report — shows the machine itself cannot scale
4x between 8 and 32 threads (no 4x hardware exists there), while 1 -> 4
cores scales ~3.9x. The protocol therefore measures N=1 vs 4N=4 executors
by default and records the machine ceiling alongside, so the efficiency
of the CODE is separated from the ceiling of the HOST.

Usage: python scripts/run_scaling.py [runs] [sf_dir] [N] [4N] [groups]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mem_mb() -> int:
    return int(os.environ.get("SPARK_GRAFT_EXECUTOR_MEM_MB", "4096"))


def _spin(_):
    x = 1.0
    for _ in range(8_000_000):
        x = x * 1.0000001 + 0.5
    return x


def cpu_probe(levels=(1, 2, 4, 8, 16, 32), reps=3) -> dict[int, float]:
    """Register-only spin throughput (tasks/s) per parallelism level —
    the host's compute-scaling ceiling, no memory traffic."""
    import multiprocessing as mp

    spin = _spin
    out = {}
    for n in levels:
        walls = []
        for _ in range(reps):
            t0 = time.time()
            if n == 1:
                spin(0)
            else:
                with mp.Pool(n) as p:
                    p.map(spin, range(n))
            walls.append(time.time() - t0)
        out[n] = round(n / statistics.median(walls), 2)
    return out


def probe4(reps: int = 1) -> float:
    """Quick 4-thread spin probe (tasks/s) — the quiet-host detector."""
    import multiprocessing as mp

    walls = []
    for _ in range(reps):
        t0 = time.time()
        with mp.Pool(4) as p:
            p.map(_spin, range(4))
        walls.append(time.time() - t0)
    return round(4 / statistics.median(walls), 2)


def probe1() -> float:
    """Single-thread spin probe (tasks/s) — sampled across the session so
    the effective-ceiling denominator has the same variance as its
    numerator (a single startup reading swings ~1.5x with co-tenant load)."""
    t0 = time.time()
    _spin(0)
    return round(1 / (time.time() - t0), 2)


def bench_once(cpus: int, sf_dir: str, groups: int | None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_EXECUTORS=str(cpus),  # N one-core/4g executor JVMs
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_PIPELINE_ONLY="1",
    )
    if groups:
        env["BENCH_GROUPS"] = str(groups)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench.py failed (rc={out.returncode}) at {cpus} executors")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    groups = int(sys.argv[5]) if len(sys.argv) > 5 else None
    ratio = n_hi / n_lo

    probe = cpu_probe()
    print(f"cpu probe (tasks/s by threads): {probe}", flush=True)

    # Anchor the quiet band on a SPACED multi-sample median, not the single
    # startup reading: a turbo burst during startup otherwise mis-anchors
    # the whole session (observed in the r4 tmpfs attempt: an 11.40 tasks/s
    # startup burst vs 9.2-10.2 steady state rejected every later probe).
    anchor_samples = [probe[4]]
    for _ in range(4):
        time.sleep(15)
        anchor_samples.append(probe4())
    anchor = statistics.median(anchor_samples)
    print(f"quiet anchor {anchor} from {anchor_samples}", flush=True)

    # Storm-level-anchor detection (r5 incident: a protocol launched inside
    # a STABLE co-tenant storm anchors the quiet band AT storm level, and
    # the gate becomes vacuous — storm runs pass as "gated"). Compare
    # against this boot's own anchor history; a fresh anchor well below the
    # boot's known quiet level marks every result of this session suspect.
    # Advisory, not fatal: the report discloses it, the runs still happen.
    hist_path = os.path.join(REPO, "BENCH", "runs", "anchor_history.jsonl")
    try:
        boot_id = open("/proc/sys/kernel/random/boot_id").read().strip()
    except OSError:
        boot_id = "unknown"
    entries = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            entries = [json.loads(line) for line in f]
    prior = [
        j["anchor"] for j in entries
        if j.get("boot_id") == boot_id and not j.get("suspect")
    ]
    # Bootstrap blind spot (ADVICE r5): the FIRST anchors of a boot have no
    # history to compare against, so a storm-level anchor would silently
    # become the boot's trusted quiet baseline. Trust the median only once
    # >=2 non-suspect priors exist; earlier anchors are marked provisional.
    provisional = len(prior) < 2
    anchor_suspect = (
        not provisional and anchor < 0.85 * statistics.median(prior)
    )
    if anchor_suspect:
        print(
            f"  [WARNING: anchor {anchor} is below 0.85x this boot's known "
            f"quiet level {statistics.median(prior):.2f} — a stable storm "
            "is likely active; results will be flagged suspect]",
            flush=True,
        )
    # Retro-flag the complementary case: a NEW clearly-higher anchor proves
    # earlier same-boot anchors were themselves storm-level — rewrite them
    # as suspect so later medians stop being dragged down by them.
    retro = [
        j for j in entries
        if j.get("boot_id") == boot_id and not j.get("suspect")
        and not anchor_suspect and j["anchor"] < 0.85 * anchor
    ]
    if retro:
        for j in retro:
            j["suspect"] = True
            j["retro_flagged"] = True
        print(
            f"  [retro-flagged {len(retro)} earlier anchor(s) below 0.85x "
            f"the new quiet level {anchor}]", flush=True,
        )
        with open(hist_path, "w") as f:
            for j in entries:
                f.write(json.dumps(j) + "\n")
    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
    with open(hist_path, "a") as f:
        f.write(json.dumps({
            "boot_id": boot_id, "anchor": anchor,
            "suspect": anchor_suspect, "provisional": provisional,
            "ts": round(time.time(), 1),
        }) + "\n")

    results: dict[int, list[dict]] = {n_lo: [], n_hi: []}
    bench_once(n_hi, sf_dir, groups)  # warm-up, discarded; generates corpus

    # Probe-gated acceptance (pre-declared in round-1 NEXT.md): a timed run
    # counts only if a 4-thread spin probe BOTH before and after it shows a
    # quiet host. Co-tenant storms hit the 4N level ~2x harder than the N
    # level (a 1-core job almost always finds a free core; a 4-core job
    # competes), which biases E DOWNWARD — gating conditions measurement on
    # machine availability, never on the measured value. All discards are
    # counted and disclosed in the report.
    # quiet reference = median of recent QUIET readings, floored at 0.8x
    # the startup sample. Only probes that PASSED the gate enter the
    # history: appending rejected busy readings let a sustained co-tenant
    # storm drag the median down to storm level within ~5 probes, after
    # which noisy runs were accepted as "quiet" without the ungated-run
    # sentinel (ADVICE r2) — the 8-attempt sentinel below is now the ONLY
    # way a noisy run enters results. The floor stops the 0.9x acceptance
    # band from ratcheting the reference down gradually; the median (not
    # session max) stops one turbo outlier from ratcheting it up
    # (measured round-2 failure: one 12.15 tasks/s reading vs 9-10 steady).
    probe_hist: list[float] = [anchor]
    probe1_hist: list[float] = [probe[1]]

    def quiet_ref() -> float:
        # clamped to a band around the startup sample: the floor stops a
        # sustained storm from dragging the reference down (ADVICE r2);
        # the CEILING stops a co-tenant lull / turbo burst mid-protocol
        # from ratcheting it up so high that the host's own normal level
        # reads "busy" forever after (observed in the r3 run: a lull
        # pushed the median to 1.23x startup and every later normal probe
        # was rejected until the ungated sentinel fired)
        # ceiling tightened 1.1x -> 1.05x after the r4 1v4 run: a turbo
        # lull pinned the median at the 1.1x ceiling and ~20 min of
        # normal readings were rejected against it (see the archived
        # probe series in BENCH/runs/attempt11_r4_1v4.jsonl)
        recent = statistics.median(probe_hist[-9:])
        return min(max(recent, 0.8 * anchor), 1.05 * anchor)

    discards: dict[int, int] = {n_lo: 0, n_hi: 0}
    # Downward re-anchor path (the quiet_ref band can ratchet UP on a lull
    # but never DOWN, r4 lead): storms read NOISY on the probe — a stable
    # run of rejected readings is not a storm but a genuinely lower host
    # steady state (thermal derating, a reboot losing turbo). Six
    # consecutive spaced rejections within a 5% spread re-anchor the band
    # at their median; the event is archived so the audit sees the
    # reference moved and why. Anything noisy still falls through to the
    # flagged ungated sentinel exactly as before.
    rejected_pre: list[float] = []
    reanchors: list[dict] = []

    progress_path = os.path.join(REPO, "BENCH", "runs", "current_protocol.jsonl")
    os.makedirs(os.path.dirname(progress_path), exist_ok=True)

    def log_probe(kind: str, cpus: int, value: float, accepted: bool) -> None:
        # EVERY probe reading — accepted or rejected — is archived with the
        # reference it was judged against, so a post-hoc audit can verify
        # gate integrity from the jsonl alone (VERDICT r3 item 10)
        with open(progress_path, "a") as f:
            f.write(json.dumps({
                "probe": kind, "execs": cpus, "tasks_per_s": value,
                "quiet_ref": round(quiet_ref(), 2), "accepted": accepted,
                "ts": round(time.time(), 1),
            }) + "\n")

    def maybe_reanchor() -> None:
        nonlocal anchor
        if len(rejected_pre) < 6:
            return
        tail = rejected_pre[-6:]
        med = statistics.median(tail)
        if (max(tail) - min(tail)) / med >= 0.05:
            return  # noisy = storm; leave it to the ungated sentinel
        # Stability alone cannot tell a host derate from a steady co-tenant
        # job (ADVICE this round): discriminate with the 1-thread probe — a
        # frequency/steady-state derate lowers 1-thread and 4-thread
        # throughput PROPORTIONALLY, while a co-tenant compute job hits the
        # 4-thread probe much harder (one thread still finds a free core).
        # Re-anchor only when the single-thread drop corroborates.
        p1_ref = statistics.median(probe1_hist)
        p1_now = probe1()
        ratio4 = med / anchor
        ratio1 = p1_now / p1_ref if p1_ref else ratio4
        if ratio1 > ratio4 * 1.15:
            veto = {"reanchor_veto": True, "probe4_ratio": round(ratio4, 3),
                    "probe1_ratio": round(ratio1, 3), "probe1_now": p1_now,
                    "samples": tail, "ts": round(time.time(), 1)}
            rejected_pre.clear()  # re-accumulate before probing again
            with open(progress_path, "a") as f:
                f.write(json.dumps(veto) + "\n")
            print(f"  [re-anchor vetoed: 1-thread probe at "
                  f"{ratio1:.2f}x of its reference vs 4-thread at "
                  f"{ratio4:.2f}x — steady co-tenant load, not a host "
                  "derate]", flush=True)
            return
        probe1_hist.append(p1_now)
        event = {"reanchor": True, "old_anchor": round(anchor, 2),
                 "new_anchor": round(med, 2), "samples": tail,
                 "probe1_ratio": round(ratio1, 3),
                 "ts": round(time.time(), 1)}
        anchor = med
        probe_hist.clear()
        probe_hist.append(anchor)
        rejected_pre.clear()
        reanchors.append(event)
        with open(progress_path, "a") as f:
            f.write(json.dumps(event) + "\n")
        print(f"  [re-anchored quiet band: {event['old_anchor']} -> "
              f"{event['new_anchor']} (6 stable rejected probes)]",
              flush=True)

    def gated_bench(cpus: int) -> dict:
        for attempt in range(8):
            pre = probe4()
            if pre < 0.9 * quiet_ref():
                log_probe("pre", cpus, pre, False)
                rejected_pre.append(pre)
                maybe_reanchor()
                print(f"  [probe {pre} < 0.9x{quiet_ref():.2f}: host busy, "
                      "wait 60s]", flush=True)
                time.sleep(60)
                continue
            log_probe("pre", cpus, pre, True)
            rejected_pre.clear()
            probe_hist.append(pre)
            try:
                res = bench_once(cpus, sf_dir, groups)
            except RuntimeError as exc:
                # a crashed bench run (e.g. co-tenant memory storm) must not
                # kill the whole protocol; count it as a discard and retry
                discards[cpus] += 1
                print(f"  [bench run failed, retrying: {exc}]", flush=True)
                time.sleep(30)
                continue
            post = probe4()
            accepted = post >= 0.9 * quiet_ref()
            log_probe("post", cpus, post, accepted)
            if accepted:
                probe_hist.append(post)
                probe1_hist.append(probe1())
                return res
            discards[cpus] += 1
            print(f"  [post-probe {post} < 0.9x{quiet_ref():.2f}: storm "
                  f"mid-run, discarding {cpus}-exec run]", flush=True)
        # host never went quiet: take one ungated run, flagged
        discards[cpus] += 1000  # sentinel: report marks level as noisy
        return bench_once(cpus, sf_dir, groups)

    for r in range(runs):
        for cpus in (n_lo, n_hi):  # interleave so load noise hits both
            res = gated_bench(cpus)
            results[cpus].append(res)
            with open(progress_path, "a") as f:
                f.write(json.dumps({"cycle": r + 1, "execs": cpus,
                                    "discards": dict(discards), **res}) + "\n")
            print(
                f"run {r + 1} local[{cpus}]: pipeline "
                f"{res['queries']['pipeline_e2e']}s "
                f"({res['dedup_docs_per_sec']} docs/s)",
                flush=True,
            )
        if results[n_lo] and results[n_hi]:
            # persist a report after every full cycle so a wall-clock cut
            # mid-protocol still leaves a valid (smaller-sample) result
            write_report(results, probe, discards, runs=r + 1,
                         n_lo=n_lo, n_hi=n_hi, ratio=ratio,
                         probe_hist=probe_hist, probe1_hist=probe1_hist,
                         reanchors=reanchors, anchor_suspect=anchor_suspect)

    summary = write_report(results, probe, discards, runs=runs,
                           n_lo=n_lo, n_hi=n_hi, ratio=ratio,
                           probe_hist=probe_hist, probe1_hist=probe1_hist,
                           reanchors=reanchors,
                           anchor_suspect=anchor_suspect)
    print(json.dumps(summary))


def write_report(results, probe, discards, *, runs, n_lo, n_hi, ratio,
                 probe_hist=None, probe1_hist=None, reanchors=None,
                 anchor_suspect=False) -> dict:
    def med(cpus: int, key: str) -> float:
        return statistics.median(r["queries"][key] for r in results[cpus])

    docs = results[n_hi][0]["dedup_docs"]
    thr_lo = statistics.median(r["dedup_docs_per_sec"] for r in results[n_lo])
    thr_hi = statistics.median(r["dedup_docs_per_sec"] for r in results[n_hi])
    eff = thr_hi / (ratio * thr_lo)
    hw_eff = probe[n_hi] / (ratio * probe[n_lo]) if n_lo in probe and n_hi in probe else None

    stages = [k for k in results[n_hi][0]["queries"] if k.startswith("stage_")]
    lines = [
        "# BENCH/BASELINE — two-cluster-size scaling run",
        "",
        f"Input: deterministic synthetic pages corpus, {docs} docs "
        f"(seed 42), generated once on disk and shared by all runs. Fresh "
        f"subprocess (JVM + Python workers) per run; {runs} timed runs per "
        "level, medians; one discarded warm-up run.",
        "",
        "## Host compute ceiling (register-only spin probe, tasks/s)",
        "",
        "| threads | " + " | ".join(str(k) for k in probe) + " |",
        "|---|" + "|".join(["---"] * len(probe)) + "|",
        "| tasks/s | " + " | ".join(str(v) for v in probe.values()) + " |",
        "",
        "The 32 vCPUs are 16 physical cores + SMT on a shared box: the "
        "machine itself delivers no 4x between 8 and 32 threads, so the "
        f"N->4N protocol uses N={n_lo} vs 4N={n_hi} executors (one physical "
        f"core each), where the hardware ceiling is {hw_eff:.2f} "
        "efficiency." if hw_eff else "",
        "",
        f"Executor model: local-cluster[N,1,{_mem_mb()}] — N separate "
        f"executor JVMs, 1 core + {_mem_mb()} MiB each "
        f"({max(1024, _mem_mb() - 512)}m heap), package shipped via "
        "--py-files-style addPyFile; per-executor resources constant "
        "across levels, exactly how adding executors to a real cluster "
        "scales memory with cores (executor memory sized so one cached "
        "corpus partition's columnar build fits the heap).",
        "",
        f"## Pipeline results (N = {n_lo} executors, 4N = {n_hi} executors)",
        "",
        f"| metric | {n_lo} exec (N) | {n_hi} exec (4N) |",
        "|---|---|---|",
        f"| pipeline e2e (s, median) | {med(n_lo, 'pipeline_e2e'):.1f} "
        f"| {med(n_hi, 'pipeline_e2e'):.1f} |",
        f"| docs/sec (median) | {thr_lo:.1f} | {thr_hi:.1f} |",
    ]
    for s in sorted(stages):
        lines.append(
            f"| {s} (s, median) | {med(n_lo, s):.1f} | {med(n_hi, s):.1f} |"
        )
    norm = (eff / hw_eff) if hw_eff else None
    # effective ceiling from WHOLE probe series on BOTH sides of the ratio:
    # the 1-thread denominator is sampled after every accepted run too, so
    # numerator and denominator have comparable variance (a single startup
    # reading swings ~1.5x with co-tenant load — ADVICE r2)
    if probe_hist and len(probe_hist) >= 3 and n_lo == 1 and n_hi == 4:
        eff_4 = statistics.median(probe_hist)
        ones = probe1_hist or [probe[1]]
        eff_1 = statistics.median(ones)
        eff_ceiling = eff_4 / (4 * eff_1)
        lines += [
            "",
            f"Effective host ceiling over the session: median 4-thread probe "
            f"{eff_4:.2f} tasks/s ({len(probe_hist)} quiet readings) / 4 x "
            f"median 1-thread probe {eff_1:.2f} tasks/s ({len(ones)} "
            f"readings) -> ceiling {eff_ceiling:.2f}.",
        ]
    lines += [
        "",
        ("**SUSPECT SESSION: the quiet anchor was sampled below 0.85x of "
         "this boot's known quiet level (stable co-tenant storm at "
         "launch); the probe gate was vacuous and every figure below is "
         "an UNDER-measurement — do not publish as protocol evidence.**"
         if anchor_suspect else ""),
        "",
        f"**Scaling efficiency E = thr(4N) / ({ratio:.0f} x thr(N)) = "
        f"{eff:.3f}** (gate >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})",
        (
            f"**Host-normalized efficiency E / ceiling = {norm:.3f}** — the "
            "fraction of the machine's own measured N->4N scaling the "
            "pipeline achieves (ceiling from the spin probe above)."
            if norm
            else ""
        ),
        "",
        "Per-run raw docs/sec:",
        f"- {n_lo} executor(s): "
        f"{[r['dedup_docs_per_sec'] for r in results[n_lo]]}",
        f"- {n_hi} executor(s): "
        f"{[r['dedup_docs_per_sec'] for r in results[n_hi]]}",
        "",
        "Probe-gated acceptance: each timed run counts only if a 4-thread "
        "spin probe both before and after it reads >= 0.9x the rolling "
        "median of recent QUIET probes (only gate-passing readings enter "
        "the history, floored at 0.8x the startup sample — a sustained "
        "co-tenant storm can never drag the reference down to storm "
        "level); runs bracketing a storm are discarded "
        "and redone (criterion pre-declared in round-1 NEXT.md — gating is "
        "on machine availability, never on the measured value). Discarded "
        f"runs: {discards[n_lo] % 1000} at N, {discards[n_hi] % 1000} at 4N"
        + (" (host never went quiet at some level: >=1 ungated run kept, "
           "flagged)" if max(discards.values()) >= 1000 else "") + " "
        "Every probe reading — accepted or rejected — is archived with the "
        "reference it was judged against in the protocol jsonl under "
        "BENCH/runs/, so gate integrity is auditable post hoc."
        + ((" The quiet band was re-anchored DOWN mid-protocol ("
            + "; ".join(f"{e['old_anchor']} -> {e['new_anchor']} tasks/s"
                        for e in reanchors)
            + ") after 6 consecutive spaced rejections within a 5% spread "
            "AND a corroborating proportional 1-thread-probe drop (a "
            "steady co-tenant job lowers the 4-thread probe without the "
            "1-thread one and is VETOED, not re-anchored); events "
            "archived in the protocol jsonl.")
           if reanchors else ""),
        "",
        "Caveats: shared multi-tenant host — co-tenant load adds 1.5-2x "
        "run-to-run noise (hence medians over interleaved runs); "
        "single-core turbo makes low-executor-count runs artificially "
        "fast, and all executors share one disk (a real 4N cluster also "
        "quadruples scan/shuffle bandwidth), so E here UNDER-states what "
        "the same code does on real hardware. The Python hash kernels are "
        "cache-blocked (functions/minhash.py) specifically so they stay "
        "compute-bound and scale with cores.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {
        "docs": docs,
        f"thr_exec{n_lo}": thr_lo,
        f"thr_exec{n_hi}": thr_hi,
        "efficiency": round(eff, 3),
        "hw_ceiling_efficiency": round(hw_eff, 3) if hw_eff else None,
        "gate_0.8": eff >= 0.8,
        "out": out_path,
    }


if __name__ == "__main__":
    main()
