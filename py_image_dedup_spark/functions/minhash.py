"""MinHash signatures over character shingles — NumPy-vectorized pandas UDF.

Replaces the reference's delegation to image-match's Goldberg signature
(py_image_dedup/persistence/elasticsearchstorebackend.py:142-145): instead of
a 648-dim int8 image signature we compute a k-permutation MinHash signature
of the document's character-shingle set.

Kernel design (per BASELINE.json input_hint: "no per-row Python"):
 * the whole Arrow batch's shingle hashes are concatenated into ONE uint64
   array with per-doc offsets;
 * each of the ``num_hashes`` permutations is a single vectorized
   multiply-add over that array (multiply-shift universal hashing, mod 2^64
   wraparound — no bigint needed);
 * per-doc minima come from ``np.minimum.reduceat`` over the offsets.
So cost is O(num_hashes × total_chars) of pure NumPy, independent of row
count.

dist = 1 − estimated Jaccard, where the estimate is the fraction of agreeing
signature positions (classic Broder MinHash; the analogue of the reference's
normalized signature distance consumed at deduplicator.py:455-460).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from py_image_dedup_spark.config import DedupConfig

_POLY_B = np.uint64(1099511628211)  # FNV-ish odd multiplier for char rolling hash

# splitmix64 finalizer constants (public domain, Steele et al.)
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_SM_ADD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates low-entropy polynomial hashes."""
    z = h + _SM_ADD
    z = (z ^ (z >> np.uint64(30))) * _SM_C1
    z = (z ^ (z >> np.uint64(27))) * _SM_C2
    return z ^ (z >> np.uint64(31))


def perm_constants(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """Fixed, seeded (a, b) permutation constants; a forced odd."""
    rng = np.random.default_rng(cfg.hash_seed)
    a = rng.integers(0, 2**63, size=cfg.num_hashes, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 2**63, size=cfg.num_hashes, dtype=np.uint64)
    return a, b


def shingle_hashes_u64(
    text: str, k: int, seed: np.uint64 = np.uint64(0)
) -> np.ndarray:
    """SORTED unique uint64 hash per character k-shingle. Texts shorter
    than k hash whole. `seed` folds into the hash pre-mix, so different
    hash_seed configs give independent hash families."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = data.shape[0]
    if n < k or n == 0:
        # degenerate doc: single shingle = whole text (empty -> constant)
        h = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            h = h * _POLY_B + data[j]
        return _mix64(h + seed)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):  # k vectorized passes, O(k*n) total
        np.multiply(h, _POLY_B, out=h)
        np.add(h, data[j : j + m], out=h)
    # dedupe: min over a set == min over the multiset, and boilerplate-heavy
    # docs shrink a lot — one sort here saves every downstream pass
    return np.unique(_mix64(h + seed))


def make_minhash_udf(cfg: DedupConfig) -> Callable:
    """Factory: pandas UDF text -> array<int> MinHash signature.

    Two kernels behind one signature contract (cfg.minhash_kernel):
      "oph"    densified one-permutation hashing (default) — O(shingles)
               per doc: shingle hashes are already sorted+unique, so the
               per-bin minimum is the FIRST element of each top-bits bin,
               found by a 128-entry searchsorted. ~100x fewer FLOPs than
               k-perm; empty bins densified by circular borrow (Shrivastava
               & Li, ICML'14). Requires num_hashes to be a power of two.
      "kperm"  classic Broder k-permutation (cache-blocked multiply-add +
               reduceat) — the verification baseline.
    Both yield positionwise-comparable signatures: est Jaccard = fraction
    of agreeing positions, same banding, same verify expression.
    """
    k = cfg.shingle_k
    num_hashes = cfg.num_hashes
    seed = np.uint64(cfg.hash_seed)
    kernel = cfg.minhash_kernel
    if kernel == "oph" and num_hashes & (num_hashes - 1):
        raise ValueError("minhash_kernel='oph' needs power-of-two num_hashes")
    a, b = perm_constants(cfg)

    @pandas_udf(ArrayType(IntegerType()))
    def minhash_sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            vals = texts.fillna("").to_numpy(dtype=object)
            if len(vals) == 0:
                yield pd.Series([], dtype=object)
                continue
            per_doc = [shingle_hashes_u64(t, k, seed) for t in vals]
            if kernel == "oph":
                sigs_dn = _oph_from_hashes(per_doc, num_hashes)
            else:
                sigs_dn = np.ascontiguousarray(
                    _minhash_from_hashes(per_doc, a, b, num_hashes).T
                )
            # keep only the LOW 32 bits of each minimum: the signature is
            # consumed by equality compares (positionwise agreement, band
            # hashing), where truncation adds a 2^-32 collision bias —
            # negligible — and halves every sig scan/shuffle/write.
            # .view(int32) reinterprets (defined for values >= 2^31).
            out = (
                (sigs_dn & np.uint64(0xFFFFFFFF))
                .astype(np.uint32)
                .view(np.int32)
            )
            yield pd.Series(list(out))

    return minhash_sig


_U64_MAX = np.uint64(np.iinfo(np.uint64).max)


def _oph_from_hashes(per_doc: list[np.ndarray], num_hashes: int) -> np.ndarray:
    """(ndocs, num_hashes) uint64 signatures via one-permutation hashing.

    Bin i of a doc = its hashes whose top log2(num_hashes) bits equal i;
    the bin's minimum is its first element (input arrays are sorted), so a
    searchsorted against the bin edges is the whole kernel. Empty bins
    borrow the value of the nearest occupied bin to the right (circular),
    computed batch-wise — the standard densification that keeps positionwise
    collision probability ≈ Jaccard for small docs too.
    """
    ndocs = len(per_doc)
    bits = int(num_hashes).bit_length() - 1
    shift = np.uint64(64 - bits)
    edges = np.arange(num_hashes, dtype=np.uint64) << shift
    sigs = np.full((ndocs, num_hashes), _U64_MAX, dtype=np.uint64)
    occ = np.zeros((ndocs, num_hashes), dtype=bool)
    for d, h in enumerate(per_doc):
        starts = np.searchsorted(h, edges, side="left")
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = h.shape[0]
        o = ends > starts
        sigs[d, o] = h[starts[o]]
        occ[d] = o
    # Densify only the rows that need it: for each empty bin take the value
    # of the nearest ORIGINALLY-occupied bin to the right (circular), found
    # by a searchsorted against the row's occupied-bin indices. Value-
    # identical to the batch-wide roll formulation this replaces, but
    # O(rows-with-empties x num_hashes) instead of O(max_shift x ndocs x
    # num_hashes): the roll version re-copied the WHOLE batch matrix per
    # shift, so one short doc in a 10k-row batch cost seconds (measured
    # 8.6 s -> 0.3 s per batch; OPTIMIZATION_r06.md).
    for d in np.flatnonzero(~occ.all(axis=1)):
        o = np.flatnonzero(occ[d])
        if o.size == 0:  # unreachable (>=1 hash per doc); keep sentinel row
            continue
        m = np.flatnonzero(~occ[d])
        j = np.searchsorted(o, m)  # first occupied bin right of each miss
        j[j == o.size] = 0  # circular wrap
        sigs[d, m] = sigs[d, o[j]]
    return sigs


# L2-resident chunk: permutations re-read the chunk from cache instead of
# streaming the full shingle array from DRAM 128 times. This box (like most
# oversubscribed multi-tenant hosts) is memory-bandwidth-starved under
# 32-way parallelism; cache blocking keeps the kernel compute-bound so it
# scales with cores (the north_rule N->4N efficiency criterion).
_CHUNK = 1 << 15  # 32k uint64 = 256 KiB


def _minhash_from_hashes(
    per_doc: list[np.ndarray], a: np.ndarray, b: np.ndarray, num_hashes: int
) -> np.ndarray:
    """(num_hashes, ndocs) uint64 signature matrix from per-doc shingle
    hash arrays. Cache-blocked over the concatenated hash stream."""
    ndocs = len(per_doc)
    lens = np.fromiter((x.shape[0] for x in per_doc), dtype=np.int64)
    bounds = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    big = np.concatenate(per_doc)
    n = big.shape[0]
    sigs = np.full((num_hashes, ndocs), np.iinfo(np.uint64).max, dtype=np.uint64)
    v = np.empty(min(_CHUNK, n), dtype=np.uint64)
    lo_doc = 0
    for c0 in range(0, n, _CHUNK):
        c1 = min(c0 + _CHUNK, n)
        chunk = big[c0:c1]
        cv = v[: c1 - c0]
        # docs overlapping [c0, c1)
        while bounds[lo_doc + 1] <= c0:
            lo_doc += 1
        hi_doc = lo_doc
        while hi_doc < ndocs and bounds[hi_doc] < c1:
            hi_doc += 1
        # reduceat boundaries local to the chunk
        starts = np.maximum(bounds[lo_doc:hi_doc] - c0, 0)
        seg = slice(lo_doc, hi_doc)
        for i in range(num_hashes):
            np.multiply(chunk, a[i], out=cv)  # uint64 wrap == mod 2^64
            np.add(cv, b[i], out=cv)
            np.minimum(
                sigs[i, seg], np.minimum.reduceat(cv, starts), out=sigs[i, seg]
            )
        lo_doc = hi_doc - 1
    return sigs


def minhash_udf(cfg: DedupConfig | None = None) -> Callable:
    return make_minhash_udf(cfg or DedupConfig())


def est_jaccard_col(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of agreeing positions — pure built-in, JVM-side."""
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )
    return agree / F.size(sig_a)
