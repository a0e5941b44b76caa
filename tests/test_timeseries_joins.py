"""Semantics of the time-series joins (operators/joins.py): as-of
backward join (tie at equal timestamps, no-match rows, group isolation)
and bucketed point-in-interval range join (boundary inclusivity, bucket
blocking yields exactly the inequality-join answer)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rclabsapi_spark.operators.joins import (
    asof_join,
    range_join_points_to_intervals,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_match_ties_and_groups(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # exact-tie with right
            (2, 10, _ts("2024-01-01T11:00:00")),  # later → latest right
            (3, 10, _ts("2024-01-01T09:00:00")),  # before any right → null
            (4, 20, _ts("2024-01-01T12:00:00")),  # other group, no right
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 100.0),
            (10, _ts("2024-01-01T10:30:00"), 200.0),
        ],
        "user_id long, ts timestamp, val double",
    )
    out = {
        r["event_id"]: r["val"]
        for r in asof_join(
            left, right, on="ts", by="user_id", right_cols=["val"]
        ).collect()
    }
    assert out[1] == 100.0  # right at the same instant matches (<=)
    assert out[2] == 200.0  # latest right before the left row
    assert out[3] is None  # nothing at or before
    assert out[4] is None  # isolation: other group's rights invisible
    assert len(out) == 4  # every left row survives exactly once


def test_range_join_boundaries_and_overlaps(spark):
    # interval [10:00, 11:00): start inclusive, end exclusive
    iv = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00")),
            # overlapping interval covering both points below
            (2, _ts("2024-01-01T09:30:00"), _ts("2024-01-01T12:00:00")),
        ],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),  # == start → in
            (2, _ts("2024-01-01T11:00:00")),  # == end → out of iv 1
        ],
        "pid long, ts timestamp",
    )
    got = {
        (r["pid"], r["window_id"])
        for r in range_join_points_to_intervals(
            pts,
            iv,
            point_col="ts",
            start_col="w_start",
            end_col="w_end",
            bucket_seconds=600,
        ).collect()
    }
    assert got == {(1, 1), (1, 2), (2, 2)}


def test_range_join_bucket_width_does_not_change_answer(spark):
    """Blocking is physical only: any bucket width must produce exactly
    the inequality-join answer."""
    from rclabsapi_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts"
    )
    iv = spark.createDataFrame(
        [
            (1, _ts("2024-01-03T00:00:00"), _ts("2024-01-05T12:00:00")),
            (2, _ts("2024-01-04T06:00:00"), _ts("2024-01-04T18:00:00")),
        ],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    expected = {
        (r["event_id"], r["window_id"])
        for r in events.join(
            iv,
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        ).collect()
    }
    assert expected  # fixture actually has events in these windows
    for width in (3600, 86_400, 7 * 86_400):
        got = {
            (r["event_id"], r["window_id"])
            for r in range_join_points_to_intervals(
                events,
                iv,
                point_col="ts",
                start_col="w_start",
                end_col="w_end",
                bucket_seconds=width,
            ).collect()
        }
        assert got == expected, width


def test_asof_forward_match_ties_and_groups(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:30:00")),  # exact-tie with right
            (2, 10, _ts("2024-01-01T09:00:00")),  # earlier → earliest right
            (3, 10, _ts("2024-01-01T11:00:00")),  # after all rights → null
            (4, 20, _ts("2024-01-01T09:00:00")),  # other group, no right
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 100.0),
            (10, _ts("2024-01-01T10:30:00"), 200.0),
        ],
        "user_id long, ts timestamp, val double",
    )
    out = {
        r["event_id"]: r["val"]
        for r in asof_join(
            left, right, on="ts", by="user_id", right_cols=["val"],
            direction="forward",
        ).collect()
    }
    assert out[1] == 200.0  # right at the same instant matches (>=)
    assert out[2] == 100.0  # earliest right at-or-after the left row
    assert out[3] is None  # nothing at or after
    assert out[4] is None  # isolation: other group's rights invisible
    assert len(out) == 4


def test_asof_tolerance_boundary(spark):
    """Tolerance is inclusive: a match exactly at the tolerance stays; a
    second beyond it nulls out (left row itself survives)."""
    from rclabsapi_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1000), (1, 5000)], "user_id long, t long"
    ).withColumn("ts", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, 0, 7.0)], "user_id long, t long, quote double"
    ).withColumn("ts", F.col("t").cast("timestamp")).drop("t")
    out = {
        r["t"]: r["quote"]
        for r in asof_join(
            left.drop("t").withColumn("t", F.col("ts").cast("long")),
            right,
            on="ts",
            by="user_id",
            right_cols=["quote"],
            tolerance_seconds=1000.0,
        ).collect()
    }
    assert out == {1000: 7.0, 5000: None}


def test_cogrouped_asof_matches_window_asof(spark):
    """The cogroup/merge_asof escape hatch and the union-window asof_join
    must produce identical matches on the fixture click→purchase join."""
    from rclabsapi_spark.operators.joins import asof_join, asof_join_cogrouped

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    kw = dict(on="ts", by="user_id", right_cols=["pv"])
    a = {
        (r["event_id"], r["pv"])
        for r in asof_join(clicks, purchases, **kw).collect()
    }
    b = {
        (r["event_id"], r["pv"])
        for r in asof_join_cogrouped(clicks, purchases, **kw).collect()
    }
    assert a == b
    assert a  # non-trivial
