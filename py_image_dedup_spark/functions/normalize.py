"""Text extraction + canonical normalization.

The reference computes one canonical signature per file regardless of
orientation variants (elasticsearchstorebackend.py:209-222 searches
``all_orientations=True``). The text analogue is a single canonical
normalization applied before shingling: lowercase + whitespace collapse.

``extract_text_udf`` is the HTML→text step; per BASELINE.json input_hint it
must reproduce the stored ``text`` column byte-identically per url for the
fixture corpus (asserted in tests/test_pages_fixture.py).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType

# The fixture corpus wraps text as:
#   <html><head>...</head><body>{text}</body></html>
# Extraction that reproduces `text` byte-identically: take the body span and
# unescape the three entities the generator escapes. Real-world extraction
# would be a full HTML parser behind the same UDF signature.
_BODY_RE = re.compile(rb"<body>(.*)</body>", re.DOTALL)


def _unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html -> extracted text. Arrow-batched; regex kernel per value.

    (Row-wise regex is unavoidable for parsing; the batch still moves over
    Arrow and the kernel is C-level `re`.)
    """

    def one(b) -> str | None:
        if b is None:
            return None
        m = _BODY_RE.search(bytes(b))
        if not m:
            return ""
        return _unescape(m.group(1).decode("utf-8"))

    return html.map(one)


_META_RE = re.compile(
    rb'<meta\s+(?:name|property)="([^"]+)"\s+content="([^"]*)"', re.IGNORECASE
)
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_CHARSET_RE = re.compile(rb'<meta\s+charset="([^"]+)"', re.IGNORECASE)


@pandas_udf(MapType(StringType(), StringType()))
def extract_meta_udf(html: pd.Series) -> pd.Series:
    """html binary -> map<string,string> of head metadata.

    The EXIF-extraction analog (py_image_dedup/util/image.py:5-26 +
    normalization persistence/__init__.py:83-105): <meta name/property>
    pairs plus title and charset, all values normalized to strings, errors
    -> empty map. Feeds the more-meta / less-meta policy rules.
    """

    def one(b) -> dict | None:
        if b is None:
            return {}
        try:
            raw = bytes(b)
            out: dict[str, str] = {}
            for k, v in _META_RE.findall(raw):
                out[k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
            m = _TITLE_RE.search(raw)
            if m:
                out["title"] = m.group(1).decode("utf-8", "replace")
            m = _CHARSET_RE.search(raw)
            if m:
                out["charset"] = m.group(1).decode("utf-8", "replace")
            return out
        except Exception:  # noqa: BLE001 — parse errors -> {} like the ref
            return {}

    return html.map(one)


def normalize_text(col: Column | str) -> Column:
    """Canonical normalization: lowercase, collapse whitespace runs, trim.

    Pure built-in expression — stays in whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def _strip_punct(col: Column) -> Column:
    """Aggressive variant: drop every char outside [a-z0-9 ] from the
    already-canonical norm_text, then re-collapse the spaces the removal
    leaves behind. Catches near-dups that differ only in punctuation /
    symbol noise (tracker glyphs, smart quotes, list bullets) that the
    canonical form keeps."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, r"[^a-z0-9 ]+", ""), r" +", " "
        )
    )


def _letters_only(col: Column) -> Column:
    """Most aggressive variant: letter runs only, digits dropped too —
    catches near-dups differing in timestamps / view counters embedded in
    the body text."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, r"[^a-z ]+", ""), r" +", " "
        )
    )


# Registry of extra canonical normalizations for cfg.norm_variants — the
# ALL_ORIENTATIONS analog (reference config.py:175-186). Each maps the
# canonical norm_text Column to a more aggressive canonical form; all are
# pure built-in expressions (whole-stage codegen, no Python).
VARIANT_NORMALIZERS: dict = {
    "strip_punct": _strip_punct,
    "letters_only": _letters_only,
}


def variant_normalizer(name: str):
    try:
        return VARIANT_NORMALIZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown norm variant {name!r}; one of "
            f"{sorted(VARIANT_NORMALIZERS)}"
        ) from None
