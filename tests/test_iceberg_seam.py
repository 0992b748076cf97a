"""Iceberg DDL/MERGE seam: SQL builders are pure functions (no cluster
needed); the executor path is exercised only for its honest fallback."""

from __future__ import annotations

from py_image_dedup_spark.sources.iceberg import (
    create_signatures_ddl,
    delete_by_urls_sql,
    merge_signatures_sql,
)


def test_create_ddl_buckets_by_url():
    ddl = create_signatures_ddl("cat.db.signatures", bucket_count=128)
    assert "CREATE TABLE IF NOT EXISTS cat.db.signatures" in ddl
    assert "USING iceberg" in ddl
    assert "bucket(128, url)" in ddl
    assert "sig ARRAY<INT>" in ddl


def test_merge_sql_upserts_on_url():
    sql = merge_signatures_sql("cat.db.signatures", "updates")
    assert "MERGE INTO cat.db.signatures t USING updates u" in sql
    assert "ON t.url = u.url" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_delete_sql_by_key():
    sql = delete_by_urls_sql("cat.db.signatures", "orphans")
    assert sql.startswith("DELETE FROM cat.db.signatures")
    assert "url IN (SELECT url FROM orphans)" in sql
