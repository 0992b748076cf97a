"""Selection-policy tests ported 1:1 from the reference
(tests/test_select_images_to_delete.py), re-expressed against the
window-function implementation in operators/select.py.

Reference candidates are dicts keyed by MetadataKey
(test_select_images_to_delete.py:150-166); here they are rows of the
`candidates` schema (FIXTURES.md §2). Each case asserts keep/dont_keep
membership on the original input order, the reversed order, and shuffled
orders (the reference's order-invariance property, :124-142).

Rule order mirrors the reference test config
(tests/py_image_dedup.yaml:17-33) mapped to the text-domain vocabulary;
max mod-time delta 0:01:40 = 100 s (yaml:16).
"""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from py_image_dedup_spark.config import DedupConfig
from py_image_dedup_spark.operators.select import select_keepers

# tests/py_image_dedup.yaml prioritization_rules, remapped (longer-path /
# shorter-path are no-ops in the reference, deduplicator.py:461-462)
YAML_RULES = (
    "more-meta",
    "less-meta",
    "bigger-size",
    "smaller-size",
    "newer-timestamp",
    "older-timestamp",
    "smaller-distance",
    "bigger-distance",
    "contains-copy-in-url",
    "longer-url-name",
    "shorter-url-name",
    "longer-url-path",
    "shorter-url-path",
    "higher-score",
    "lower-score",
)

CFG = DedupConfig(prioritization_rules=YAML_RULES, max_ts_delta_s=100.0)

_EPOCH = datetime.datetime(1970, 1, 1)


def candidate(
    url: str = "C:/test",
    dist: float = 0.05,
    n_bytes: int = 100,
    ts: int = 1,
    n_chars: int = 10000,
    meta: dict | None = None,
    score: float = 64.0,
) -> dict:
    """Mirror of _create_default_candidate (reference :150-166)."""
    return {
        "url": url,
        "dist": float(dist),
        "n_bytes": n_bytes,
        "warc_ts": _EPOCH + datetime.timedelta(seconds=ts),
        "n_chars": n_chars,
        "meta": meta or {},
        "score": float(score),
        "cluster_id": "g1",
    }


SCHEMA = (
    "url string, dist double, n_bytes long, warc_ts timestamp, "
    "n_chars long, meta map<string,string>, score double, cluster_id string"
)


def run_case(spark, keep, dont_keep, cfg=CFG, shuffles=3):
    """Reference _run_test (:124-142): original + reversed + shuffled."""
    rows = keep + dont_keep
    orders = [rows, rows[::-1]]
    rng = random.Random(7)
    for _ in range(shuffles):
        shuffled = rows[:]
        rng.shuffle(shuffled)
        orders.append(shuffled)
    keep_urls = {c["url"] for c in keep}
    dont_urls = {c["url"] for c in dont_keep}
    for order in orders:
        df = spark.createDataFrame(order, SCHEMA)
        out = select_keepers(df, cfg)
        got = {
            r["url"]: r["action"] for r in out.select("url", "action").collect()
        }
        got_keep = {u for u, a in got.items() if a == "keep"}
        got_del = {u for u, a in got.items() if a == "delete"}
        assert keep_urls <= got_keep, f"missing keeps: {keep_urls - got_keep}"
        assert dont_urls <= got_del, f"missing deletes: {dont_urls - got_del}"


def test_filter_max_mod_time_diff(spark):
    """reference :12-28 — non-keepers beyond the delta are kept anyway."""
    keep = [candidate(url="C:/a.jpg", ts=1500), candidate(url="C:/b.jpg", ts=1001)]
    rng = random.Random(3)
    for i in range(20):
        keep.append(candidate(url=f"C:/r{i}.jpg", ts=rng.randrange(0, 1400)))
    dont_keep = [candidate(url="C:/close.jpg", ts=1450)]
    run_case(spark, keep, dont_keep)


def test_contains_copy(spark):
    """reference :30-38"""
    keep = [candidate(url="C:/1.jpg")]
    dont_keep = [candidate(url=f"C:/1{i}-Copy.jpg") for i in range(20)]
    run_case(spark, keep, dont_keep)


def test_newer_and_bigger(spark):
    """reference :40-48"""
    keep = [candidate(url="C:/best.jpg", n_bytes=100, ts=100)]
    dont_keep = [
        candidate(url=f"C:/x{i}.jpg", n_bytes=i, ts=i) for i in range(20)
    ]
    run_case(spark, keep, dont_keep)


def test_newer(spark):
    """reference :50-58"""
    keep = [candidate(url="C:/best.jpg", ts=100)]
    dont_keep = [candidate(url=f"C:/x{i}.jpg", ts=i) for i in range(20)]
    run_case(spark, keep, dont_keep)


def test_bigger(spark):
    """reference :60-68"""
    keep = [candidate(url="C:/best.jpg", n_bytes=100)]
    dont_keep = [candidate(url=f"C:/x{i}.jpg", n_bytes=i) for i in range(20)]
    run_case(spark, keep, dont_keep)


def test_all_the_same(spark):
    """reference :70-78 — longest file name, then url asc."""
    keep = [candidate(url="C:/00000.jpg")]
    dont_keep = [candidate(url=f"C:/1{i}.jpg") for i in range(20)]
    run_case(spark, keep, dont_keep)


def test_all_the_same_2(spark):
    """reference :80-88"""
    keep = [candidate(url="C:/50-edited.jpg")]
    dont_keep = [candidate(url=f"C:/{i}.jpg") for i in range(20)]
    run_case(spark, keep, dont_keep)


def test_higher_score(spark):
    """reference :90-98"""
    keep = [candidate(score=100)]
    dont_keep = [candidate(url=f"C:/x{i}.jpg") for i in range(20)]
    # identical names would tie; reference keeps default path "C:/test" for
    # the high-score row and distinct paths for the rest, same here — but
    # name-length rules fire before score, so give all equal-length names.
    keep = [candidate(url="C:/x99.jpg", score=100)]
    run_case(spark, keep, dont_keep)


def test_lower_dist(spark):
    """reference :100-108"""
    rng = random.Random(11)
    keep = [candidate(url="C:/best.jpg", dist=0.0)]
    dont_keep = [
        candidate(url=f"C:/x{i}.jpg", dist=rng.uniform(0.1, 1.0))
        for i in range(20)
    ]
    run_case(spark, keep, dont_keep)


def test_real_example(spark):
    """reference :110-122 — Google-Photos original vs Telegram copies."""
    keep = [
        candidate(
            url=r"M:\Fotos\M\Google Photos Archiv\Takeout\Google Photos\2017-06-17\20170617_153437.jpg",
            n_bytes=10_000_000,
            ts=1,
        )
    ]
    dont_keep = [
        candidate(
            url=r"M:\Fotos\I\Syncthing\Telegram Empfangen\223023133_644761%d.jpg" % i,
            n_bytes=270_000,
            ts=2,
        )
        for i in range(20)
    ]
    run_case(spark, keep, dont_keep)


def test_north_star_policy(spark):
    """North-star default: longest clean text, earliest warc_ts, url asc."""
    cfg = DedupConfig()  # DEFAULT_RULES
    keep = [candidate(url="C:/long-early.html", n_chars=5000, ts=10)]
    dont_keep = [
        candidate(url="C:/long-late.html", n_chars=5000, ts=20),
        candidate(url="C:/short-early.html", n_chars=100, ts=1),
    ]
    run_case(spark, keep, dont_keep, cfg=cfg)


def test_keep_url_and_rank(spark):
    df = spark.createDataFrame(
        [candidate(url="C:/a", n_chars=10), candidate(url="C:/b", n_chars=20)],
        SCHEMA,
    )
    out = select_keepers(df, DedupConfig()).collect()
    by_url = {r["url"]: r for r in out}
    assert by_url["C:/b"]["rank"] == 1
    assert all(r["keep_url"] == "C:/b" for r in out)


def test_rule_names_in_sync_with_rule_columns(spark):
    # RULE_NAMES is the session-free vocabulary the config validator uses;
    # it must exactly match the Column-building registry
    from py_image_dedup_spark.operators.select import RULE_NAMES, _rule_columns

    assert RULE_NAMES == frozenset(_rule_columns())


def test_unknown_rule_fails_at_config_time():
    import pytest

    from py_image_dedup_spark.config import DedupConfig

    with pytest.raises(ValueError, match="unknown prioritization rules"):
        DedupConfig(prioritization_rules=("more-content", "no-such-rule"))
