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


def test_merge_upsert_touches_only_affected_partitions(spark, tmp_path):
    """MERGE semantics (update + insert + tombstone delete) with the
    100 TB property: untouched partitions' files stay byte-identical on
    disk."""
    import os

    from rclabsapi_spark.maintenance import merge_upsert

    target = str(tmp_path / "tbl")
    rows = [(k, f"d{k % 3}", float(k)) for k in range(30)]
    spark.createDataFrame(rows, "id long, day string, v double").write.partitionBy(
        "day"
    ).parquet(target)

    def files_in(day):
        d = os.path.join(target, f"day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    untouched_before = files_in("d2")

    updates = spark.createDataFrame(
        [
            (0, "d0", 100.0, False),   # update existing
            (999, "d0", 999.0, False), # insert new
            (3, "d0", 0.0, True),      # tombstone delete
            (1, "d1", 111.0, False),   # update in second partition
        ],
        "id long, day string, v double, deleted boolean",
    )
    stats = merge_upsert(
        spark,
        target,
        updates,
        key_cols=["id"],
        partition_col="day",
        delete_col="deleted",
    )
    assert stats["partitions"] == ["d0", "d1"]
    assert stats["upserted"] == 3 and stats["deleted"] == 1

    got = {
        r["id"]: (r["day"], r["v"])
        for r in spark.read.parquet(target).collect()
    }
    assert got[0] == ("d0", 100.0)
    assert got[999] == ("d0", 999.0)
    assert 3 not in got
    assert got[1] == ("d1", 111.0)
    assert got[2] == ("d2", 2.0)  # untouched row intact
    assert len(got) == 30  # 30 - 1 deleted + 1 inserted

    # the d2 partition was never rewritten
    assert files_in("d2") == untouched_before


def test_merge_change_feed_captures_pre_and_post_images(spark, tmp_path):
    """The change feed written before the overwrite carries correct
    op/pre/post rows for exactly the touched keys."""
    from rclabsapi_spark.maintenance import merge_upsert

    target = str(tmp_path / "tbl_cdf")
    changes = str(tmp_path / "cdf_out")
    rows = [(k, f"d{k % 2}", float(k)) for k in range(10)]
    spark.createDataFrame(rows, "id long, day string, v double").write.partitionBy(
        "day"
    ).parquet(target)

    updates = spark.createDataFrame(
        [
            (0, "d0", 50.0, False),
            (77, "d1", 77.0, False),
            (2, "d0", 0.0, True),
        ],
        "id long, day string, v double, deleted boolean",
    )
    merge_upsert(
        spark,
        target,
        updates,
        key_cols=["id"],
        partition_col="day",
        delete_col="deleted",
        changes_dir=changes,
    )
    feed = {
        r["id"]: (r["op"], r["pre"], r["post"])
        for r in spark.read.parquet(changes).collect()
    }
    assert set(feed) == {0, 77, 2}
    op, pre, post = feed[0]
    assert op == "update" and pre["v"] == 0.0 and post["v"] == 50.0
    op, pre, post = feed[77]
    assert op == "insert" and pre is None and post["v"] == 77.0
    op, pre, post = feed[2]
    assert op == "delete" and pre["v"] == 2.0 and post is None


def test_dataset_manifest_order_insensitive_and_change_sensitive(spark):
    """The content digest is identical under any partitioning/ordering of
    the same rows and changes on any single-row edit, insert, or drop."""
    from rclabsapi_spark.maintenance import dataset_manifest

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    m1 = dataset_manifest(df)
    m2 = dataset_manifest(df.repartition(17).orderBy(F.rand(42)))
    assert m1 == m2
    assert m1["n_rows"] == df.count()

    edited = df.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    )
    assert dataset_manifest(edited)["content_digest"] != m1["content_digest"]
    dropped = df.filter(F.col("o_orderkey") != 1)
    assert dataset_manifest(dropped)["content_digest"] != m1["content_digest"]
    doubled = df.unionAll(df.limit(1))
    assert dataset_manifest(doubled)["content_digest"] != m1["content_digest"]


def test_missing_partitions_backfill_plan(spark, tmp_path):
    from rclabsapi_spark.maintenance import missing_partitions

    target = str(tmp_path / "backfill_tbl")
    rows = [(k, d) for k in range(10) for d in ("d1", "d2", "d4")]
    spark.createDataFrame(rows, "id long, day string").write.partitionBy(
        "day"
    ).parquet(target)
    plan = missing_partitions(
        spark, target, partition_col="day",
        expected=["d1", "d2", "d3", "d4", "d5"],
    )
    assert plan["missing"] == ["d3", "d5"]
    assert plan["present"] == ["d1", "d2", "d4"]
    assert plan["unexpected"] == []


def test_schema_evolution_merge_read(spark, tmp_path):
    """Readers tolerate appended columns: v2 files add a column, a
    mergeSchema read unifies with NULLs for v1 rows — the schema-drift
    path a long-lived table hits."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, x string"
    ).write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, x string, score double"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "x", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5
