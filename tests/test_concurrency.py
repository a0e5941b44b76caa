"""Sweep-line concurrency (operators/timeseries.py::concurrency_peaks):
half-open interval semantics, brute-force parity, partitioning
invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators.timeseries import concurrency_peaks

SF_DIR = "/root/testdata/sf0.001"


def _peaks(spark, rows):
    df = spark.createDataFrame(rows, "g string, s long, e long")
    return {
        r["g"]: (r["peak"], r["peak_at_s"])
        for r in concurrency_peaks(
            df, group_col="g", start_col="s", end_col="e"
        ).collect()
    }


def test_touching_intervals_do_not_overlap(spark):
    # [1,3) and [3,5) never coexist: peak 1, first reached at t=1
    assert _peaks(spark, [("a", 1, 3), ("a", 3, 5)]) == {"a": (1, 1)}


def test_nested_and_staggered(spark):
    rows = [("a", 0, 10), ("a", 2, 4), ("a", 3, 6), ("a", 8, 9)]
    # t=3..4 has {0-10, 2-4, 3-6} → peak 3 at t=3
    assert _peaks(spark, rows) == {"a": (3, 3)}


def test_zero_length_interval_is_invisible(spark):
    assert _peaks(spark, [("a", 5, 5), ("a", 1, 2)]) == {"a": (1, 1)}


def test_groups_independent(spark):
    rows = [("a", 0, 5), ("a", 1, 2), ("b", 0, 1)]
    assert _peaks(spark, rows) == {"a": (2, 1), "b": (1, 0)}


def test_fixture_bruteforce_parity_and_partition_invariance(spark):
    events = load_table(spark, SF_DIR, "events")
    s = F.col("ts").cast("timestamp").cast("long")
    iv = events.select(
        "event_type",
        s.alias("s"),
        (s + F.floor(F.col("value")).cast("long") * 60).alias("e"),
    )
    expected = {}
    for g, rows in (
        (r["event_type"], None) for r in iv.select("event_type").distinct().collect()
    ):
        pts = sorted(
            [
                (r["s"], 1)
                for r in iv.filter(F.col("event_type") == g).collect()
            ]
            + [
                (r["e"], -1)
                for r in iv.filter(F.col("event_type") == g).collect()
            ]
        )
        # net deltas per instant, then prefix-scan
        from collections import defaultdict

        net = defaultdict(int)
        for t, d in pts:
            net[t] += d
        conc, peak, peak_at = 0, -1, None
        for t in sorted(net):
            conc += net[t]
            if conc > peak:
                peak, peak_at = conc, t
        expected[g] = (peak, peak_at)

    for shape in (iv, iv.repartition(64)):
        got = {
            r["event_type"]: (r["peak"], r["peak_at_s"])
            for r in concurrency_peaks(
                shape, group_col="event_type", start_col="s", end_col="e"
            ).collect()
        }
        assert got == expected
