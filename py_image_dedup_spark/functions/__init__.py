"""Column-level functions: normalization, hashing, text analysis.

Everything here is either a pure built-in column expression (JVM-side,
whole-stage-codegen'd) or an Arrow-batched pandas UDF whose kernel is
NumPy-vectorized across the whole batch — never per-row Python.
"""

from py_image_dedup_spark.functions.normalize import extract_text_udf, normalize_text
from py_image_dedup_spark.functions.minhash import minhash_udf, est_jaccard_col
from py_image_dedup_spark.functions.simhash import simhash_udf, hamming_col
from py_image_dedup_spark.functions.shingles import (
    char_shingles,
    poly_window_keys,
    shingle_set_jaccard,
    substring_keys,
)
from py_image_dedup_spark.functions.textstats import (
    fingerprint_col,
    langid_scores,
    langid_col,
    quality_cols,
    repetition_cols,
    token_count_col,
)
from py_image_dedup_spark.functions.urls import canonical_url

__all__ = [
    "extract_text_udf",
    "normalize_text",
    "minhash_udf",
    "est_jaccard_col",
    "simhash_udf",
    "hamming_col",
    "char_shingles",
    "poly_window_keys",
    "shingle_set_jaccard",
    "substring_keys",
    "fingerprint_col",
    "langid_scores",
    "langid_col",
    "quality_cols",
    "repetition_cols",
    "token_count_col",
    "canonical_url",
]
