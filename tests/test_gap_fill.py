"""gap_fill NULL semantics: the fixture's events.value has zero NULLs, so
oracle parity alone can't exercise the IGNORE-NULLS paths. This builds a
tiny series containing every NULL edge case — an all-NULL mid bucket,
leading/trailing NULL buckets, an all-NULL key, a mixed NULL/non-NULL
bucket — and checks Spark gap_fill against the SAME DuckDB oracle SQL the
driver runs, pointed at the synthetic data."""

from __future__ import annotations

import datetime as dt

import duckdb

from rclabsapi_spark.operators.timeseries import gap_fill
from rclabsapi_spark.suites.timeseries import _GAP_FILL_ORACLE

from .conftest import df_to_multiset


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


ROWS = [
    # key 1: observed 00h, all-NULL 01h bucket, observed 04h → ffill
    # skips past 01h, interpolation spans it and the 02/03h gaps.
    (1, _t(0, 10), 10.0),
    (1, _t(0, 40), None),  # mixed bucket: AVG ignores the NULL
    (1, _t(1, 5), None),
    (1, _t(1, 30), None),  # all-NULL bucket
    (1, _t(4, 0), 40.0),
    # key 2: LEADING all-NULL bucket before the first observation.
    (2, _t(0, 0), None),
    (2, _t(2, 0), 5.0),
    # key 3: TRAILING all-NULL bucket after the last observation.
    (3, _t(0, 0), 7.0),
    (3, _t(2, 30), None),
    # key 4: every bucket NULL.
    (4, _t(0, 0), None),
    (4, _t(1, 0), None),
]


def test_gap_fill_ignore_nulls_matches_oracle(spark, tmp_path):
    df = spark.createDataFrame(
        ROWS, "user_id int, ts timestamp, value double"
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)

    out = gap_fill(
        spark.read.parquet(path),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        grain="hour",
    )
    srows = out.collect()
    scols = out.columns

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    rel = con.sql(_GAP_FILL_ORACLE)
    dcols = rel.columns
    drows = rel.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    sset = df_to_multiset(scols, [tuple(r[c] for c in scols) for r in srows])
    dset = df_to_multiset(dcols, drows)
    assert sset == dset, [
        (a, b) for a, b in zip(sset, dset) if a != b
    ][:5]


def test_gap_fill_null_edge_values(spark):
    df = spark.createDataFrame(
        ROWS, "user_id int, ts timestamp, value double"
    )
    out = gap_fill(
        df, key_col="user_id", ts_col="ts", value_col="value", grain="hour"
    ).collect()
    by = {(r.user_id, r.bucket.hour): r for r in out}

    # key 1: 5 buckets 00-04; the all-NULL 01h bucket is filled PAST
    # (ffill 10.0) and interpolated ACROSS (10 + 30*h/4).
    assert {h for (k, h) in by if k == 1} == {0, 1, 2, 3, 4}
    assert by[(1, 0)].v == 10.0 and by[(1, 0)].v_interp == 10.0
    r11 = by[(1, 1)]
    assert r11.v is None and r11.v_ffill == 10.0 and r11.v_interp == 17.5
    assert by[(1, 2)].v_interp == 25.0 and by[(1, 3)].v_interp == 32.5
    assert by[(1, 4)].v == 40.0

    # key 2: leading NULL bucket and the gap after it have no fill source.
    for h in (0, 1):
        r = by[(2, h)]
        assert r.v is None and r.v_ffill is None and r.v_interp is None
    assert by[(2, 2)].v == 5.0

    # key 3: trailing NULL bucket forward-fills but cannot interpolate.
    for h in (1, 2):
        r = by[(3, h)]
        assert r.v is None and r.v_ffill == 7.0 and r.v_interp is None

    # key 4: all-NULL key still emits its full span, everything NULL.
    for h in (0, 1):
        r = by[(4, h)]
        assert r.v is None and r.v_ffill is None and r.v_interp is None
