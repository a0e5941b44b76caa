"""Time-series join suite: as-of join and point-in-interval range join —
the two join shapes Spark's equi-join can't express directly, each
implemented as a scale-safe composition (union-window / bucket-blocking)
and verified against DuckDB's native ASOF JOIN / inequality join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators.joins import (
    asof_join,
    range_join_points_to_intervals,
)
from rclabsapi_spark.functions.scalars import (
    grid_sum,
    sql_grid_sum,
    sql_round_half_up,
)
from rclabsapi_spark.operators.timeseries import (
    concurrency_peaks,
    gap_fill,
    scd2_intervals,
)
from rclabsapi_spark.registry import query

_ASOF_ORACLE = """
WITH p AS (
    SELECT user_id, ts, MAX(value) AS last_purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts, c.value, p.last_purchase_value
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND p.ts <= c.ts
"""


@query("j_asof_clicks_purchases", _ASOF_ORACLE)
def q_asof(spark, sf_dir):
    """As-of join: each click gets the user's latest purchase value at or
    before the click. Union-window implementation (one shuffle on
    user_id) vs DuckDB's native ASOF JOIN as the oracle. Right side
    pre-aggregated per (user, ts) so the equal-timestamp tie-break is
    engine-independent."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_cols=["last_purchase_value"],
    )


_RANGE_ORACLE = f"""
WITH iv AS (
    SELECT w AS window_id,
           TIMESTAMP '2024-01-01 00:00:00' + w * 2 * INTERVAL 1 DAY
               AS w_start,
           TIMESTAMP '2024-01-01 00:00:00'
               + (w * 2 + 1 + w % 3) * INTERVAL 1 DAY AS w_end
    FROM range(10) AS t(w)
)
SELECT iv.window_id,
       COUNT(e.event_id)::BIGINT AS n_events,
       {sql_grid_sum('e.value', 6)} AS sum_value
FROM events e JOIN iv
  ON e.ts >= iv.w_start AND e.ts < iv.w_end
GROUP BY iv.window_id
"""


@query("j_range_promo_windows", _RANGE_ORACLE)
def q_range(spark, sf_dir):
    """Range join: events against 10 overlapping promo windows (1-3 days,
    2-day stride) via day-bucket blocking + exact residual — an
    inequality join that stays a hash join. The oracle runs the plain
    inequality join (fine at fixture scale; the point of the bucketed
    plan is that Spark would otherwise pick broadcast-nested-loop)."""
    iv = spark.range(10).select(
        F.col("id").alias("window_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0, 0, 0, cast(id * 2 as int))"
        ).alias("w_start"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0, 0, 0, cast(id * 2 + 1 + id % 3 as int))"
        ).alias("w_end"),
    )
    events = load_table(spark, sf_dir, "events")
    joined = range_join_points_to_intervals(
        events,
        iv,
        point_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=86_400,
    )
    return joined.groupBy("window_id").agg(
        F.count("event_id").alias("n_events"),
        grid_sum(F.col("value"), 6).alias("sum_value"),
    )


# Rounding goes through sql_round_half_up (not ROUND): Spark's F.round and
# DuckDB's ROUND disagree at representable half-ties (r4: 1 row of 105,171,
# 65.404688 vs 65.404687); floor(x*1e6+0.5)/1e6 is pure IEEE arithmetic and
# bit-identical across engines given the same input double.
_GAP_FILL_ORACLE = f"""
WITH obs AS (
    SELECT user_id, date_trunc('hour', ts) AS bucket,
           {sql_round_half_up(
               'SUM(CAST(FLOOR(value * 1000000000.0 + 0.5) AS HUGEINT))::DOUBLE'
               ' / (COUNT(value) * 1000000000.0)', 6)} AS v
    FROM events GROUP BY 1, 2
),
b AS (
    SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
    FROM obs GROUP BY 1
),
spine AS (
    SELECT user_id,
           UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
    FROM b
),
j AS (
    SELECT s.user_id, s.bucket, o.v
    FROM spine s LEFT JOIN obs o USING (user_id, bucket)
),
w AS (
    SELECT user_id, bucket, v,
           epoch(bucket)::BIGINT AS t,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) AS v_ffill,
           LAST_VALUE(CASE WHEN v IS NOT NULL
                           THEN epoch(bucket)::BIGINT END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS prev_t,
           FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
           FIRST_VALUE(CASE WHEN v IS NOT NULL
                            THEN epoch(bucket)::BIGINT END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_t
    FROM j
)
SELECT user_id, bucket, v, v_ffill,
       CASE WHEN v IS NOT NULL THEN v
            WHEN v_ffill IS NOT NULL AND next_v IS NOT NULL
            THEN {sql_round_half_up(
                'v_ffill + (next_v - v_ffill) * (t - prev_t)'
                ' / (next_t - prev_t)', 6)}
            ELSE NULL END AS v_interp
FROM w
"""


_SCD2_ORACLE = """
WITH per_instant AS (
    SELECT user_id AS key, ts, MAX_BY(event_type, event_id) AS attr
    FROM events GROUP BY 1, 2
),
marked AS (
    SELECT key, ts, attr,
           LAG(attr) OVER w AS prev_attr,
           ROW_NUMBER() OVER w AS rn
    FROM per_instant
    WINDOW w AS (PARTITION BY key ORDER BY ts)
),
changed AS (
    SELECT key, ts, attr FROM marked
    WHERE rn = 1 OR attr IS DISTINCT FROM prev_attr
)
SELECT key AS user_id,
       attr AS event_type,
       ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       (CASE WHEN LEAD(ts) OVER w2 IS NULL THEN 1 ELSE 0 END)::INT
           AS is_current
FROM changed
WINDOW w2 AS (PARTITION BY key ORDER BY ts)
"""


@query("ts_scd2_intervals", _SCD2_ORACLE, bench=True)
def q_scd2(spark, sf_dir):
    """SCD2 validity intervals over the per-user event_type change stream
    (reference: ST11 job status transitions, etl_job_manager.cpp:671-699
    — here applied to the events fixture, the same shape at volume).
    One shuffle on user_id: the per-instant dedup, change-compression
    lag, and validity lead all reuse that partitioning; the history
    rebuild is idempotent (no previous-snapshot join). Null-safe change
    detection via IS DISTINCT FROM / eqNullSafe on both engines."""
    events = load_table(spark, sf_dir, "events")
    return scd2_intervals(
        events,
        key_col="user_id",
        ts_col="ts",
        attr_col="event_type",
        tiebreak_col="event_id",
    )


@query("ts_gap_fill_interpolate", _GAP_FILL_ORACLE, bench=True)
def q_gap_fill(spark, sf_dir):
    """Gap-fill the per-user event-value series to hourly grain via run
    emission: each observed hourly bucket emits itself plus its gap run
    (sequence/explode up to the next observed bucket — output is keys ×
    span/grain, independent of input rows), with ignore-nulls fill
    sources computed as O(n) running window frames over the same single
    user_id partitioning; both fills are then per-row arithmetic on the
    emitted rows — no spine relation, no spine⋈obs join."""
    events = load_table(spark, sf_dir, "events")
    return gap_fill(
        events, key_col="user_id", ts_col="ts", value_col="value", grain="hour"
    )


_ASOF_FWD_ORACLE = """
WITH p AS (
    SELECT user_id, ts, MAX(value) AS next_purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts, c.value, p.next_purchase_value
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND p.ts >= c.ts
"""


@query("j_asof_forward", _ASOF_FWD_ORACLE, bench=True)
def q_asof_forward(spark, sf_dir):
    """Forward as-of join: each click gets the user's NEXT purchase value
    at or after the click (the time-to-next-event primitive). Same
    union-window implementation as the backward join with the window
    ordered descending — one shuffle on user_id; DuckDB's native
    ASOF >= is the oracle."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("next_purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_cols=["next_purchase_value"],
        direction="forward",
    )


# ---------------------------------------------------------------------------
# Interval-overlap concurrency (sweep line)
# ---------------------------------------------------------------------------

_EPOCH_S = "date_diff('second', TIMESTAMP '1970-01-01', ts)::BIGINT"

_CONCURRENCY_ORACLE = f"""
WITH iv AS (
    SELECT event_type,
           {_EPOCH_S} AS s,
           {_EPOCH_S} + FLOOR(value)::BIGINT * 60 AS e
    FROM events
),
pts AS (
    SELECT event_type, s AS t, 1 AS delta FROM iv
    UNION ALL
    SELECT event_type, e AS t, -1 AS delta FROM iv
),
net AS (
    SELECT event_type, t, SUM(delta) AS net FROM pts GROUP BY 1, 2
),
run AS (
    SELECT event_type, t,
           SUM(net) OVER (PARTITION BY event_type ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS conc
    FROM net
),
peaks AS (SELECT event_type, MAX(conc) AS peak FROM run GROUP BY 1)
SELECT r.event_type, p.peak::BIGINT AS peak, MIN(r.t)::BIGINT AS peak_at_s
FROM run r
JOIN peaks p ON r.event_type = p.event_type AND r.conc = p.peak
GROUP BY 1, 2
"""


@query("ts_concurrency_peak", _CONCURRENCY_ORACLE, bench=True)
def q_concurrency_peak(spark, sf_dir):
    """Peak concurrent activity per event type: each event opens a
    half-open activity interval [ts, ts + floor(value) minutes) — the
    job-duration shape of the reference's active-jobs gauge
    (job_monitor_service.cpp:477-530) — and the sweep-line operator nets
    +1/−1 deltas per instant before one per-type prefix sum. Epoch
    seconds via the truncating cast on both engines (long cast truncates;
    date_diff counts whole-second boundaries). operators/timeseries.py::
    concurrency_peaks."""
    events = load_table(spark, sf_dir, "events")
    # defensive NTZ guard as in w_sessionization (metrics_ext.py:711)
    s = F.col("ts").cast("timestamp").cast("long")
    iv = events.select(
        "event_type",
        s.alias("start_s"),
        (s + F.floor(F.col("value")).cast("long") * 60).alias("end_s"),
    )
    return concurrency_peaks(
        iv, group_col="event_type", start_col="start_s", end_col="end_s"
    )


# ---------------------------------------------------------------------------
# As-of join with tolerance (stale matches nulled)
# ---------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
WITH p AS (
    SELECT user_id, ts, MAX(value) AS last_purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       CASE WHEN abs(epoch(c.ts) - epoch(p.ts)) <= 3600.0
            THEN p.last_purchase_value END AS last_purchase_value
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND p.ts <= c.ts
"""


@query("j_asof_tolerance", _ASOF_TOL_ORACLE)
def q_asof_tolerance(spark, sf_dir):
    """As-of join with a 1-hour tolerance (pandas merge_asof's
    ``tolerance``; same staleness contract as the reference's session
    expiry checks, auth/session validation in request_handler.cpp):
    a purchase older than an hour is stale context and
    must NOT attach to the click — matched payloads beyond the tolerance
    null out. Same one-shuffle union-window plan as j_asof_clicks_
    purchases; the tolerance is a per-row predicate on the carried match
    timestamp (epoch-seconds arithmetic identical on both engines)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_cols=["last_purchase_value"],
        direction="backward",
        tolerance_seconds=3600.0,
    )


# ---------------------------------------------------------------------------
# Rolling correlation between two aligned daily series
# ---------------------------------------------------------------------------

_ROLLING_CORR_ORACLE = f"""
WITH daily AS (
    SELECT event_type, date_trunc('day', ts)::DATE AS day,
           SUM(value) AS x, COUNT(*)::DOUBLE AS y
    FROM events GROUP BY 1, 2
),
rolled AS (
    SELECT event_type, day,
           COUNT(*) OVER w::DOUBLE AS n,
           SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
           SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
           SUM(x * y) OVER w AS sxy
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       CASE WHEN n >= 7 AND (sxx - sx * sx / n) > 0
                 AND (syy - sy * sy / n) > 0
            THEN {sql_round_half_up(
                "(sxy - sx * sy / n)"
                " / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))", 6)}
       END AS rolling_corr
FROM rolled
"""


@query("ts_rolling_corr", _ROLLING_CORR_ORACLE)
def q_rolling_corr(spark, sf_dir):
    """Rolling 7-day Pearson correlation per event type between the
    daily value-sum and the daily event count — "are volume and
    intensity still moving together". Five co-moment rolling sums share
    ONE ordered window per type (no self-join, no per-offset recompute);
    NULL until the frame fills or where either variance is zero.
    operators/timeseries.py::rolling_correlation."""
    from rclabsapi_spark.operators.timeseries import rolling_correlation

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum("value").alias("x"),
            F.count(F.lit(1)).cast("double").alias("y"),
        )
    )
    return rolling_correlation(
        daily,
        group_cols=("event_type",),
        order_col="day",
        x_col="x",
        y_col="y",
        window_rows=7,
    )
