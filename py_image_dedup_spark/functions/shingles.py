"""Shingle / substring expressions — pure built-in column exprs (JVM-side).

These power (a) exact n-gram Jaccard verification (the oracle-checkable twin
of the MinHash estimate) and (b) the substring-containment candidate mode
(SURVEY.md §1.3 "suffix-array substring mode": sampled fixed-width substring
fingerprints; shared key => containment candidate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(col: Column | str, k: int) -> Column:
    """Distinct character k-shingles as array<string>. Built-in only:
    transform over a position sequence + substring + array_distinct.

    Texts shorter than k yield a single whole-text shingle (matches the
    degenerate-doc convention in functions/minhash.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    return F.array_distinct(grams)


def shingle_set_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two shingle-set columns — ratio of two ints in
    double, so bit-identical across engines (DuckDB oracle safe)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def substring_keys(col: Column | str, length: int, stride: int) -> Column:
    """Content-defined substring fingerprints (winnowing-style mod-p
    sampling): hash EVERY `length`-char window, keep windows whose hash
    ≡ 0 (mod `stride`) — expected 1-in-`stride` sampled, and the sampled
    positions are determined by CONTENT, so they survive the position
    shifts that insertions/deletions cause (a fixed-stride grid would lose
    alignment after the first edit). Shared key => containment candidate.

    Docs too short to sample anything fall back to one whole-text key.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(length - 1), F.lit(1))),
        lambda i: F.xxhash64(c.substr(i, F.lit(length))),
    )
    sampled = F.array_distinct(
        F.filter(grams, lambda h: F.pmod(h, F.lit(stride)) == 0)
    )
    return F.when(F.size(sampled) > 0, sampled).otherwise(
        F.array(F.xxhash64(c))
    )


_poly_keys_udfs: dict = {}


def poly_window_keys(col: Column | str, length: int, stride: int) -> Column:
    """Content-defined substring fingerprints with the SAME winnowing
    semantics as substring_keys (hash every `length`-char window, keep
    h ≡ 0 mod `stride`, whole-text-fingerprint fallback) but hashed with
    the ANSI-SQL-expressible polynomial fold

        fp(s) = fold(codepoints(s), (acc, cp) -> (acc*31 + cp) mod p),
        p = FINGERPRINT_MOD

    (the same scheme as functions/textstats.fingerprint_col, which the
    DuckDB ``list_reduce`` twin matches bit-for-bit). This makes the FULL
    substring-containment pair pipeline — winnow keys -> capped/salted
    bucket self-join -> containment verify — hash-checkable against a
    plain SQL oracle; xxhash64 keys (substring_keys) stay the production
    default (JVM-native, better dispersion).

    Arrow-batched NumPy kernel: per doc, one utf-32 decode + one
    sliding-window matmul against a cached 31^k table; exact uint64
    arithmetic (term < 2^51, window sum < 2^57)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from py_image_dedup_spark.config import FINGERPRINT_MOD

    key = (length, stride)
    if key not in _poly_keys_udfs:
        p = np.uint64(FINGERPRINT_MOD)

        def make():
            pow_cache = np.ones(1, dtype=np.uint64)

            def powers(n: int) -> "np.ndarray":
                nonlocal pow_cache
                if len(pow_cache) < n:
                    grown = np.empty(
                        max(n, 2 * len(pow_cache)), dtype=np.uint64
                    )
                    grown[: len(pow_cache)] = pow_cache
                    for k in range(len(pow_cache), len(grown)):
                        grown[k] = grown[k - 1] * np.uint64(31) % p
                    pow_cache = grown
                return pow_cache

            def fp_whole(codes: "np.ndarray") -> int:
                n = len(codes)
                if n == 0:
                    return 0
                pw = powers(n)[:n][::-1]
                return int((codes * pw % p).sum() % p)

            @pandas_udf(ArrayType(LongType()))
            def keys(texts):
                out = []
                for s in texts:
                    if s is None:
                        out.append(None)
                        continue
                    codes = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.uint64)
                    n = len(codes)
                    if n <= length:
                        # single (possibly short) window == the whole text
                        hs = np.array([fp_whole(codes)], dtype=np.uint64)
                    else:
                        pw = powers(length)[:length][::-1]
                        wins = np.lib.stride_tricks.sliding_window_view(
                            codes, length
                        )
                        hs = (wins * pw % p).sum(axis=1) % p
                    samp = np.unique(hs[hs % np.uint64(stride) == 0])
                    if len(samp) == 0:
                        samp = np.array([fp_whole(codes)], dtype=np.uint64)
                    out.append([int(x) for x in samp])
                return pd.Series(out)

            return keys

        _poly_keys_udfs[key] = make()
    c = F.col(col) if isinstance(col, str) else col
    return _poly_keys_udfs[key](c)
