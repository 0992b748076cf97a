"""Text-analysis functions for training-data pipelines.

All pure built-in column expressions (JVM-side, codegen'd), designed so each
has an exact ANSI-SQL twin for the DuckDB oracle:

* token_count_col   — whitespace tokenization count
* quality_cols      — length / punctuation / stopword-ratio quality signals
* langid_scores / langid_col — stopword-lexicon language ID heuristic
* fingerprint_col   — polynomial rolling-hash document fingerprint mod p
                      (exact integer arithmetic, reproducible in SQL)
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


def langid_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _word_hits(c, words) for lang, words in LANG_LEXICONS.items()}


def langid_col(col: Column | str) -> Column:
    """Argmax over lexicon-hit scores, ties broken by LANG_ORDER; all-zero
    scores -> 'und'. SQL twin is the same CASE cascade."""
    scores = langid_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def fingerprint_col(col: Column | str) -> Column:
    """Polynomial rolling-hash fingerprint of the text, mod FINGERPRINT_MOD.

    h = fold(chars, h*31 + codepoint mod p). Exact int64 arithmetic (values
    stay < 31*p + 1114111 << 2^63), so the DuckDB list_reduce twin matches
    bit-for-bit. O(n) per row via aggregate over a position sequence.
    """
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"),
    )
    folded = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FINGERPRINT_MOD),
    )
    return F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(folded)
