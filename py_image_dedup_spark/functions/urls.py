"""URL canonicalization — collapse crawl-level url variants before exact
dedup keys them.

Web crawls see the same page under many spellings: scheme/host case,
default ports, fragments, tracking parameters, trailing slashes. The
reference dedups FILES so it never needs this; a web-text corpus does —
canonical_url feeds the S-layer (url as primary key) and the exact-dup
pre-pass the way path normalization feeds `os.walk` in the reference
(py_image_dedup/library/deduplicator.py:249-286 walks already-canonical
filesystem paths).

Pure built-in column expressions (regexp only), whole-stage-codegen'd —
usable inside the pages_meta projection at 100 TB with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_url(col: Column | str) -> Column:
    """Deterministic, idempotent url canonicalization:

      1. strip the fragment (`#...`)
      2. lowercase the scheme and host:port ONLY — userinfo credentials
         (`user:pass@`) are case-significant and pass through untouched
      3. drop default ports (`:80` for http, `:443` for https)
      4. drop `utm_*` tracking query parameters (and a dangling `?`/`&`)
      5. collapse duplicate slashes in the PATH segment only (query
         values like `?q=a//b` or `?next=//b.com/x` keep their bytes —
         they distinguish genuinely different pages)
      6. strip a single trailing slash from a non-root path (again path
         only; a `/` at the end of a query value is preserved)
    """
    c = F.col(col) if isinstance(col, str) else col
    # 1. fragment
    u = F.regexp_replace(c, r"#.*$", "")
    # 2. lowercase scheme + host:port; userinfo (up to the LAST '@' in the
    #    authority — RFC 3986 allows ':'/'%' inside userinfo) is preserved
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?]+)://", 1))
    authority = F.regexp_extract(u, r"^[^:/?]+://([^/?]*)", 1)
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)  # greedy → last @
    hostport = F.regexp_replace(authority, r"^.*@", "")
    tail = F.regexp_replace(u, r"^[^:/?]+://[^/?]*", "")
    u = F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), userinfo, F.lower(hostport), tail)
    )
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/?]*?):80(?=[/?]|$)", "$1")
    u = F.regexp_replace(u, r"^(https://[^/?]*?):443(?=[/?]|$)", "$1")
    # 4. utm_* params, in three passes so runs of them fall together
    #    (Java replaceAll resumes AFTER a replacement, so one combined
    #    pattern would skip every second utm param in a run):
    #    non-first params, then a first-with-successor, then an only-utm
    u = F.regexp_replace(u, r"&utm_[^&#]*", "")
    u = F.regexp_replace(u, r"\?utm_[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?utm_[^&#]*$", "")
    # 5+6 apply to the path segment only — split at the first '?'
    path = F.regexp_extract(u, r"^[^?]*", 0)
    query = F.regexp_replace(u, r"^[^?]*", "")
    # 5. duplicate slashes in the path ('://' kept by the lookbehind)
    path = F.regexp_replace(path, r"(?<!:)//+", "/")
    # 6. trailing slash on a non-root path
    path = F.regexp_replace(path, r"^(.*://[^/?]*/.*[^/])/$", "$1")
    return F.concat(path, query)
