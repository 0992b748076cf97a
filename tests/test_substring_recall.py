"""Substring-mode candidate recall gate vs a brute-force shared-substring
oracle (SURVEY.md §5; the reference's candidate contract is the
`dist <= max_dist` guarantee over its search backend,
py_image_dedup/persistence/elasticsearchstorebackend.py:209-222 — here the
containment analog: any pair sharing a verbatim block >> substring_len
must surface as a candidate pair).

Winnowing samples windows whose content hash == 0 (mod stride), so a
shared block of B chars carries ~(B - len + 1)/stride expected sampled
keys; at B=400, len=50, stride=25 that is ~14, so the per-pair miss
probability is ~e^-14 — the >=0.99 recall gate mirrors the MinHash LSH
gate (test_minhash.py::test_lsh_recall_vs_bruteforce) for the substring
mode.
"""

from __future__ import annotations

import numpy as np

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.operators.modes import (
    substring_pairs,
    substring_signatures,
)

SUB_LEN = 50
STRIDE = 25
BLOCK = 400  # verbatim block length, >> SUB_LEN

# candidate-recall configuration: verify filters wide open so the gate
# measures the winnowing sampling + bucket join, not the verify threshold
CFG = DedupConfig(
    mode="substring",
    substring_len=SUB_LEN,
    substring_stride=STRIDE,
    max_dist=1.0,
    min_shared_keys=1,
)

_ALPHA = np.array(list("abcdefghijklmnopqrstuvwxyz "))


def _rand_text(rng: np.random.Generator, n: int) -> str:
    return "".join(rng.choice(_ALPHA, size=n))


def _corpus(n_pairs: int = 60, n_single: int = 40, seed: int = 7):
    """Docs where each planted pair shares one verbatim BLOCK-char block at
    independently random offsets (content-defined sampling must survive the
    alignment shift), embedded in otherwise-independent random text."""
    rng = np.random.default_rng(seed)
    rows = []
    for p in range(n_pairs):
        block = _rand_text(rng, BLOCK)
        for side in ("a", "b"):
            n = int(rng.integers(700, 1400))
            base = _rand_text(rng, n)
            off = int(rng.integers(0, n - 10))
            text = base[:off] + block + base[off:]
            rows.append((f"pair{p}{side}", text))
    for s in range(n_single):
        rows.append((f"solo{s}", _rand_text(rng, int(rng.integers(700, 1400)))))
    return rows


def _oracle_pairs(rows, min_shared: int = SUB_LEN):
    """Brute force, no sampling: index EVERY min_shared-char window of
    every doc; a pair is true iff it shares at least one exact window
    (equivalently: longest common substring >= min_shared)."""
    by_window: dict[str, set[str]] = {}
    for url, text in rows:
        for i in range(max(0, len(text) - min_shared + 1)):
            by_window.setdefault(text[i : i + min_shared], set()).add(url)
    truth = set()
    for urls in by_window.values():
        if len(urls) > 1:
            for a in urls:
                for b in urls:
                    if a < b:
                        truth.add((a, b))
    return truth


def test_substring_candidate_recall_vs_bruteforce(spark):
    rows = _corpus()
    truth = _oracle_pairs(rows)
    # every planted pair must be in the oracle truth (sanity of the oracle
    # itself: the block is longer than one window, so it always indexes)
    assert len(truth) >= 60

    df = spark.createDataFrame(rows, "url string, norm_text string")
    sigs = substring_signatures(df, CFG)
    got = {
        (r["url_a"], r["url_b"])
        for r in substring_pairs(sigs, CFG).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.99, (
        f"substring candidate recall {recall}: missing "
        f"{sorted(truth - got)[:5]}"
    )


def test_substring_pairs_survive_offset_shift(spark):
    """A single pair where the shared block sits at offset 0 in one doc and
    deep inside the other — a fixed-stride grid would lose alignment; the
    content-defined sampling must not."""
    rng = np.random.default_rng(11)
    block = _rand_text(rng, BLOCK)
    a = block + _rand_text(rng, 900)
    b = _rand_text(rng, 433) + block + _rand_text(rng, 500)
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("c", _rand_text(rng, 1000))],
        "url string, norm_text string",
    )
    got = {
        (r["url_a"], r["url_b"])
        for r in substring_pairs(substring_signatures(df, CFG), CFG).collect()
    }
    assert ("a", "b") in got
    assert all("c" not in p for p in got)
