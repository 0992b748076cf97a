"""Text-analysis functions for training-data pipelines.

Built-in column expressions (JVM-side, codegen'd) wherever one exists with
the right complexity; each has an exact ANSI-SQL twin for the DuckDB oracle:

* token_count_col   — whitespace tokenization count
* quality_cols      — length / punctuation / stopword-ratio quality signals
* langid_scores / langid_col — stopword-lexicon language ID heuristic
* fingerprint_col   — polynomial rolling-hash document fingerprint mod p
                      (exact integer arithmetic, reproducible in SQL; an
                      Arrow-batched O(n) kernel — the pure-expression form
                      needs a substr per position, O(n^2) on MB-scale docs)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from py_image_dedup_spark.config import FINGERPRINT_MOD

# Tiny fixed stopword lexicons for the language-ID heuristic. Deterministic,
# public common function words.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "une", "pour"),
    "es": ("el", "la", "los", "que", "es", "en", "por", "una", "con"),
}
LANG_ORDER: tuple[str, ...] = ("en", "de", "fr", "es")

EN_STOPWORDS: tuple[str, ...] = LANG_LEXICONS["en"] + ("a", "for", "on", "as", "are")


def token_count_col(col: Column | str) -> Column:
    """Whitespace token count; empty/blank text counts 0.

    SQL twin: ``CASE WHEN trim(text)='' THEN 0 ELSE
    len(regexp_split_to_array(trim(text), '\\s+')) END``.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


# BPE-ish pre-tokenizer: contraction suffixes, letter runs, digit runs,
# symbol runs (GPT-2-style splitting without lookarounds, so the exact same
# pattern runs under Java regex (Spark) and RE2 (DuckDB); whitespace is
# spelled as an explicit class because \s differs between the two engines).
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\r ']+"


def bpe_token_count_col(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens — the subword-budget estimator a training
    pipeline uses when the real tokenizer is too expensive to run at scan
    time. SQL twin: ``len(regexp_extract_all(text, pattern))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ).cast("long")


def _word_hits(c: Column, words: tuple[str, ...]) -> Column:
    """Count of occurrences of any lexicon word (word-bounded, on lowercase
    text). regexp_extract_all is available in both Spark and DuckDB."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), F.lit(0))).cast("long")


def quality_cols(col: Column | str) -> dict[str, Column]:
    """Quality-scoring signals. All ratios are int/int divisions in double,
    bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("long")
    n_tokens = token_count_col(c)
    n_punct = F.size(
        F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), F.lit(0))
    ).cast("long")
    n_stop = _word_hits(c, EN_STOPWORDS)
    denom_c = F.greatest(n_chars, F.lit(1))
    denom_t = F.greatest(n_tokens, F.lit(1))
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / denom_c,
        "stopword_ratio": n_stop / denom_t,
        "mean_token_len": n_chars / denom_t,
    }


def repetition_cols(col: Column | str, n: int = 5) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 analog for
    this engine): the fraction of word n-grams that are repeats of an
    earlier n-gram in the same document. High values flag boilerplate /
    machine-generated loops that near-dup removal alone misses (the pages
    are distinct documents, just internally repetitive).

    Pure built-in exprs (split + transform + slice + array_distinct):
    whole-stage-codegen'd, and the ratio is int/int in double so the
    DuckDB twin matches bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    size = F.size(toks)
    grams = F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams).cast("long")
    distinct = F.size(F.array_distinct(grams)).cast("long")
    return {
        "n_ngrams": total,
        "dup_ngram_frac": (total - distinct) / F.greatest(total, F.lit(1)),
    }


def langid_scores(col: Column | str) -> dict[str, Column]:
    """Per-lexicon hit counts, one regex scan per language. This is the
    semantic definition (and the shape of the DuckDB oracle twin); the hot
    path is `langid_col`, which fuses all lexicons into a single scan."""
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _word_hits(c, words) for lang, words in LANG_LEXICONS.items()}


# Union of every lexicon word. A `\b(w)\b` match on lowered text is always
# a maximal ASCII word-char run equal to a lexicon word, so extracting the
# runs and filtering by membership in this set finds exactly the same
# matches as the per-lexicon alternation scans — and membership tallying
# then reproduces each per-lexicon count bit-for-bit (shared words like
# 'la' count for both languages).
_ALL_LEXICON_WORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_LEXICONS.values() for w in ws},
           key=lambda w: (-len(w), w))
)


def langid_col(col: Column | str) -> Column:
    """Argmax over lexicon-hit scores, ties broken by LANG_ORDER; all-zero
    scores -> 'und'. SQL twin is the per-lexicon CASE cascade
    (`langid_scores` shape); this implementation is value-identical but
    runs ONE cheap regex pass over the text instead of one alternation scan
    per language: extract maximal word-character runs (`[a-z0-9_]+` on the
    lowered text — exactly the spans a `\\b(word)\\b` alternation could
    match, since Java's \\b is ASCII-\\w-relative), keep only lexicon
    members, then fuse the per-language tally + argmax into one `aggregate`
    finish-lambda. Equivalence to the alternation form: `\\b(w)\\b` matches
    iff a maximal word-char run equals w, so filtering runs by membership
    yields the same multiset of matches. Measured 1.7x faster than the
    combined-alternation scan (alternation retry per boundary position vs
    a single character-class inner loop; see OPTIMIZATION_r06.md)."""
    c = F.col(col) if isinstance(col, str) else col
    # coalesce: NULL text must still classify 'und' (the per-lexicon form's
    # NULL comparisons all fall through to the 'und' default; aggregate over
    # a NULL array would instead return NULL)
    matches = F.filter(
        F.coalesce(
            F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9_]+"), F.lit(0)),
            F.array().cast("array<string>"),
        ),
        lambda x: x.isin(*_ALL_LEXICON_WORDS),
    )
    init = F.struct(*[F.lit(0).cast("long").alias(lang) for lang in LANG_ORDER])

    def merge(acc: Column, x: Column) -> Column:
        return F.struct(*[
            (acc[lang] + F.when(x.isin(*LANG_LEXICONS[lang]), F.lit(1))
             .otherwise(F.lit(0))).alias(lang)
            for lang in LANG_ORDER
        ])

    def finish(acc: Column) -> Column:
        best = F.greatest(*[acc[lang] for lang in LANG_ORDER])
        out = F.lit("und")
        for lang in reversed(LANG_ORDER):
            out = F.when(acc[lang] == best, F.lit(lang)).otherwise(out)
        return F.when(best == 0, F.lit("und")).otherwise(out)

    return F.aggregate(matches, init, merge, finish)


def _fingerprint_kernel_factory():
    """Arrow-batched NumPy kernel for the polynomial fingerprint.

    h = fold(codepoints, h*31 + cp) mod p  ==  sum(cp_i * 31^(n-1-i)) mod p.
    The fold form is sequential; the power-sum form vectorizes: per doc,
    one utf-32 decode + one elementwise multiply against a shared cache of
    31^k mod p. Every term < 2^51 (cp < 2^21, power < 2^30) so a plain
    uint64 sum is exact up to 2^34 chars/doc. The naive built-in expression
    (substr per position) is O(n^2) JVM-side on long docs — this kernel is
    O(n) and C-speed, matching the DuckDB list_reduce twin bit-for-bit.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    p = FINGERPRINT_MOD
    pow_cache = np.ones(1, dtype=np.uint64)  # pow_cache[k] = 31^k mod p

    def powers(n: int) -> "np.ndarray":
        nonlocal pow_cache
        if len(pow_cache) < n:
            grown = np.empty(max(n, 2 * len(pow_cache)), dtype=np.uint64)
            grown[: len(pow_cache)] = pow_cache
            for k in range(len(pow_cache), len(grown)):
                grown[k] = grown[k - 1] * np.uint64(31) % np.uint64(p)
            pow_cache = grown
        return pow_cache

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pyspark's hint-based eval-type inference cannot resolve
    @pandas_udf(LongType())
    def fingerprint(texts):
        out = pd.array([0] * len(texts), dtype="Int64")
        for j, s in enumerate(texts):
            if s is None:
                out[j] = None
            elif s:
                codes = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                n = len(codes)
                pw = powers(n)[:n][::-1]
                out[j] = int((codes * pw % np.uint64(p)).sum() % np.uint64(p))
        return pd.Series(out)

    return fingerprint


_fingerprint_udf = None


def fingerprint_col(col: Column | str) -> Column:
    """Polynomial rolling-hash fingerprint of the text, mod FINGERPRINT_MOD.

    Exact integer arithmetic over Unicode codepoints; the DuckDB
    ``list_reduce`` twin matches bit-for-bit (same fold, same mod).
    """
    global _fingerprint_udf
    if _fingerprint_udf is None:
        _fingerprint_udf = _fingerprint_kernel_factory()
    c = F.col(col) if isinstance(col, str) else col
    return _fingerprint_udf(c)


def quality_filter_cols(
    text_col: Column | str,
    norm_text_col: Column | str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    min_stopword_ratio: float = 0.06,
    max_dup_ngram_frac: float = 0.3,
) -> dict[str, Column]:
    """Gopher-style document quality GATE (Rae et al. 2021, Table A1
    analog) composed from quality_cols + repetition_cols: a boolean
    `quality_pass` plus `fail_reasons` — the failed rule names,
    comma-joined in fixed rule order, '' when the document passes. The
    reasons column is what a curation pipeline logs/aggregates to audit
    WHY mass was dropped, not just how much.

    Raw-text signals (token counts, ratios) evaluate on `text_col`;
    the n-gram repetition signal on `norm_text_col` (whitespace-collapsed)
    exactly like the individual driver oracles. All comparisons are on
    int/int double ratios, bit-identical across engines, so the gate is
    engine-portable (DuckDB twin in the driver contract)."""
    q = quality_cols(text_col)
    r = repetition_cols(norm_text_col)
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    checks = (
        # NULL text first and explicitly: every other condition evaluates
        # to NULL on a NULL document, its `when` never fires, and the doc
        # would sail through the gate with fail_reasons='' (ADVICE r3)
        ("null_text", t.isNull()),
        ("too_few_tokens", q["n_tokens"] < F.lit(min_tokens)),
        ("too_many_tokens", q["n_tokens"] > F.lit(max_tokens)),
        ("short_tokens",
         q["mean_token_len"] < F.lit(float(min_mean_token_len))),
        ("long_tokens",
         q["mean_token_len"] > F.lit(float(max_mean_token_len))),
        ("low_stopword_ratio",
         q["stopword_ratio"] < F.lit(float(min_stopword_ratio))),
        ("repetitive",
         r["dup_ngram_frac"] > F.lit(float(max_dup_ngram_frac))),
    )
    # array_join drops the NULLs of non-firing whens — no filter needed
    reasons = F.array_join(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks]), ","
    )
    return {
        "fail_reasons": reasons,
        "quality_pass": reasons == F.lit(""),
    }
