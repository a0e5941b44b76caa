"""SCD2 interval-building semantics (operators/timeseries.py):
simultaneous-change tie-break, no-op compression, null-safe change
detection (→NULL kept, NULL→NULL dropped, first-row NULL kept), and
interval chaining (valid_to = next valid_from, exactly one current row).
"""

from __future__ import annotations

import datetime as dt

from rclabsapi_spark.operators.timeseries import scd2_intervals


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, attr string, seq long"
    )
    out = scd2_intervals(
        df, key_col="key", ts_col="ts", attr_col="attr", tiebreak_col="seq"
    )
    return sorted(
        ((r["key"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
         for r in out.collect()),
    )


def test_tiebreak_noop_and_chaining(spark):
    rows = [
        # t0: two simultaneous changes — seq=2 ("A") must win
        (1, _ts("2024-01-01T00:00:00"), "Z", 1),
        (1, _ts("2024-01-01T00:00:00"), "A", 2),
        # t1: no-op repeat of "A" → dropped
        (1, _ts("2024-01-01T01:00:00"), "A", 3),
        # t2: real change
        (1, _ts("2024-01-01T02:00:00"), "B", 4),
        # key isolation: key 2's history independent
        (2, _ts("2024-01-01T00:30:00"), "A", 5),
    ]
    got = _run(spark, rows)
    assert got == [
        (1, _ts("2024-01-01T00:00:00"), "A", _ts("2024-01-01T02:00:00"), 0),
        (1, _ts("2024-01-01T02:00:00"), "B", None, 1),
        (2, _ts("2024-01-01T00:30:00"), "A", None, 1),
    ]
    # chaining invariant: valid_to == next valid_from, one current per key
    k1 = [r for r in got if r[0] == 1]
    assert k1[0][3] == k1[1][1]
    assert sum(r[4] for r in got) == 2  # one current row per key


def test_null_transitions(spark):
    rows = [
        # first row is NULL attr — must be kept (row_number marker, not
        # prev_attr IS NULL, which can't tell first-row from NULL-prev)
        (1, _ts("2024-01-01T00:00:00"), None, 1),
        # NULL → A: change
        (1, _ts("2024-01-01T01:00:00"), "A", 2),
        # A → NULL: change (attr != prev is NULL-valued — eqNullSafe keeps it)
        (1, _ts("2024-01-01T02:00:00"), None, 3),
        # NULL → NULL: no-op — dropped
        (1, _ts("2024-01-01T03:00:00"), None, 4),
        # NULL → B: change
        (1, _ts("2024-01-01T04:00:00"), "B", 5),
    ]
    got = _run(spark, rows)
    assert got == [
        (1, _ts("2024-01-01T00:00:00"), None, _ts("2024-01-01T01:00:00"), 0),
        (1, _ts("2024-01-01T01:00:00"), "A", _ts("2024-01-01T02:00:00"), 0),
        (1, _ts("2024-01-01T02:00:00"), None, _ts("2024-01-01T04:00:00"), 0),
        (1, _ts("2024-01-01T04:00:00"), "B", None, 1),
    ]
