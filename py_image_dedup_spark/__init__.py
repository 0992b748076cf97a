"""py_image_dedup_spark — PySpark-native near-duplicate detection engine.

A from-scratch reimplementation of the capabilities of
markusressel/py-image-dedup (hash → LSH candidate search → cluster →
keep-best-copy), generalized from perceptual image hashes to web text:

* exact dedup (content hash groupBy)
* MinHash over character shingles + LSH banding (candidate pairs)
* SimHash 64-bit + bit-block banding
* substring-containment fingerprints (suffix-sampling mode)
* distributed connected components (cluster formation)
* deterministic quality-ranked keep-best-copy selection
  (the reference's 17-rule prioritization vocabulary re-expressed as
  window-function sort keys; py_image_dedup/library/deduplicator.py:418-506)

Everything is expressed as PySpark DataFrame operations; the only Python
kernels are Arrow-batched pandas UDFs doing NumPy-vectorized hashing.
"""

from py_image_dedup_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
