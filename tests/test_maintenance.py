"""Compaction + partition expiry (SURVEY §4 rotation analog)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.maintenance import compact_parquet, expire_partitions

from .conftest import SF_SMOKE


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(40).write.parquet(path)  # simulate a small-file mess
    before = docs.count()

    stats = compact_parquet(spark, path, target_file_bytes=16 * 1024 * 1024)
    assert stats.files_before == 40
    assert stats.files_after < 40
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    # content identical, not just counts
    assert (
        after_df.agg(F.sum(F.crc32(F.col("text")))).collect()[0][0]
        == docs.agg(F.sum(F.crc32(F.col("text")))).collect()[0][0]
    )


def test_compact_failure_leaves_table_intact(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    load_table(spark, SF_SMOKE, "region").write.parquet(path)
    n = spark.read.parquet(path).count()

    import rclabsapi_spark.maintenance as m

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(m.os, "rename", boom)
    try:
        compact_parquet(spark, path)
    except OSError:
        pass
    assert spark.read.parquet(path).count() == n
    assert not [d for d in os.listdir(tmp_path) if ".compact-" in d]


def test_expire_partitions(spark, tmp_path):
    path = str(tmp_path / "ev")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "index_date", F.date_format("ts", "yyyy.MM.dd")
    )
    ev.write.partitionBy("index_date").parquet(path)
    all_parts = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("index_date=")
    )
    assert len(all_parts) > 3
    cutoff = all_parts[2]

    dropped = expire_partitions(path, keep_from=cutoff)
    assert dropped == all_parts[:2]
    remaining = spark.read.parquet(path)
    assert remaining.select(F.min("index_date")).collect()[0][0] == cutoff


def test_compaction_with_zorder_reclusters(spark, tmp_path):
    """Compaction with zorder_cols rewrites the same rows laid out along
    the curve: row count conserved, fewer files, and a predicate on the
    second z-dimension prunes files it couldn't before."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.maintenance import compact_parquet
    from tests.test_layout import _files_overlapping

    path = str(tmp_path / "grid")
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    # messy initial state: many files, x-striped (y unprunable)
    grid.repartitionByRange(64, "x").write.mode("overwrite").parquet(path)
    y_hit0, total0 = _files_overlapping(path, "y", 0, 15)
    assert y_hit0 == total0

    stats = compact_parquet(
        spark, path, target_file_bytes=1 << 15, zorder_cols=["x", "y"]
    )
    assert stats.files_after < stats.files_before
    assert spark.read.parquet(path).count() == 256 * 256
    y_hit1, total1 = _files_overlapping(path, "y", 0, 15)
    assert y_hit1 <= total1 // 2
