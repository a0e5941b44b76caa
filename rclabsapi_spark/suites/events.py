"""Streaming-semantics suite, batch-replayed over the ``events`` fixture
(SURVEY §2.9). The live Structured Streaming versions of these operators
live in ``rclabsapi_spark.streaming``; these queries verify the *window /
predicate semantics* against DuckDB on the same data, per SURVEY §5's
batch-replay strategy.

Domain mapping (FIXTURES.md §8): client_id→user_id, endpoint→event_type,
log level→value band (value<50 INFO, <150 WARN, else ERROR), jobId→user_id.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rclabsapi_spark.layout import spread_by

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import sql_grid_sum
from rclabsapi_spark.registry import query
from rclabsapi_spark.streaming.rate_limiter import RATE_RULES, rate_limit_check
from rclabsapi_spark.streaming.routing import route_events, subscriptions_df

_LEVEL_SQL = "CASE WHEN value < 50 THEN 'INFO' WHEN value < 150 THEN 'WARN' ELSE 'ERROR' END"


def _with_level(ev):
    return ev.withColumn(
        "level",
        F.when(F.col("value") < 50, "INFO")
        .when(F.col("value") < 150, "WARN")
        .otherwise("ERROR"),
    )


# ---------------------------------------------------------------------------
# ST5 — tumbling-window rate limiting with longest-prefix rule match
# (rate_limiter.cpp:10-33, 48-90, 206-214)
# ---------------------------------------------------------------------------

_RULES_SQL = """
    SELECT * FROM (VALUES
        ('purch', 2),
        ('p', 3),
        ('error', 1),
        ('', 5)
    ) AS rules(prefix, per_minute_limit)
"""

_ST5_ORACLE = f"""
WITH counts AS (
    SELECT user_id, event_type, date_trunc('minute', ts) AS window_start,
           COUNT(*)::BIGINT AS request_count
    FROM events
    GROUP BY user_id, event_type, date_trunc('minute', ts)
),
rules AS ({_RULES_SQL}),
matched AS (
    SELECT c.*, r.prefix, r.per_minute_limit
    FROM counts c JOIN rules r
      ON c.event_type LIKE r.prefix || '%'
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type, window_start
        ORDER BY length(r.prefix) DESC) = 1
)
SELECT user_id, event_type, window_start, request_count,
       prefix AS matched_prefix, per_minute_limit,
       request_count <= per_minute_limit AS allowed,
       GREATEST(per_minute_limit - request_count, 0)::BIGINT AS remaining
FROM matched
"""


@query("st5_rate_limit_windows", _ST5_ORACLE, bench=True)
def q_st5(spark, sf_dir):
    """ST5 — per-(client, endpoint) tumbling-minute counts vs per-rule
    limits with longest-prefix rule match (rate_limiter.cpp:25-29, 48-90)."""
    ev = load_table(spark, sf_dir, "events")
    return rate_limit_check(ev, RATE_RULES)


# ---------------------------------------------------------------------------
# P9/ST1 — per-subscriber predicate routing
# (job_monitoring_models.cpp:817-859; message_broadcaster.cpp:154-233)
# ---------------------------------------------------------------------------

_SUBS_SQL = """
    SELECT * FROM (VALUES
        ('conn_all',    []::BIGINT[],    []::VARCHAR[],          []::VARCHAR[]),
        ('conn_errors', []::BIGINT[],    ['ERROR']::VARCHAR[],   ['error']::VARCHAR[]),
        ('conn_user7',  [7]::BIGINT[],   []::VARCHAR[],          []::VARCHAR[]),
        ('conn_mixed',  [1, 2, 3]::BIGINT[], ['WARN','ERROR']::VARCHAR[],
            ['purchase','view']::VARCHAR[])
    ) AS subs(connection_id, job_ids, levels, types)
"""

_P9_ORACLE = f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, {_LEVEL_SQL} AS level FROM events
),
subs AS ({_SUBS_SQL})
SELECT s.connection_id, e.event_id, e.user_id, e.event_type, e.level
FROM ev e CROSS JOIN subs s
WHERE (len(s.types) = 0 OR list_contains(s.types, e.event_type))
  AND (len(s.job_ids) = 0 OR list_contains(s.job_ids, e.user_id))
  AND (len(s.levels) = 0 OR list_contains(s.levels, e.level))
"""


@query("p9_subscription_routing", _P9_ORACLE, bench=True)
def q_p9(spark, sf_dir):
    """P9/ST1 — ConnectionFilters.shouldReceiveMessage: empty set = match
    all; else membership, conjunctive across dimensions
    (job_monitoring_models.cpp:817-859)."""
    ev = _with_level(load_table(spark, sf_dir, "events"))
    return route_events(ev, subscriptions_df(ev.sparkSession))


# ---------------------------------------------------------------------------
# ST6 — threshold alerting (system_metrics.hpp:43-54, config.json:108-117)
# ---------------------------------------------------------------------------


@query(
    "st6_threshold_alerts",
    """
    SELECT event_id, user_id, ts, value,
           'RESOURCE_ALERT' AS alert_type,
           CASE WHEN value > 195 THEN 'critical' ELSE 'warning' END AS severity
    FROM events WHERE value > 180
    """,
)
def q_st6(spark, sf_dir):
    """ST6 — metric > threshold → alert rows with severity tiers (the
    streaming.alerts operator; batch and stream share the code path)."""
    from rclabsapi_spark.streaming.alerts import threshold_alerts

    ev = load_table(spark, sf_dir, "events")
    return threshold_alerts(ev, warn_at=180.0, critical_at=195.0).select(
        "event_id", "user_id", "ts", "value", "alert_type", "severity"
    )


# ---------------------------------------------------------------------------
# ST9 — streaming log handler filter (log_handler.hpp:236-300)
# ---------------------------------------------------------------------------


@query(
    "st9_stream_filter",
    f"""
    WITH ev AS (
        SELECT *, {_LEVEL_SQL} AS level FROM events
    )
    SELECT event_id, user_id, event_type, level, ts FROM ev
    WHERE (CASE level WHEN 'INFO' THEN 1 WHEN 'WARN' THEN 2 ELSE 3 END) >= 2
      AND user_id IN (1, 3, 5, 7, 9)
    """,
)
def q_st9(spark, sf_dir):
    """ST9 — minLevel gate + job-id set filter (empty = all)."""
    ev = _with_level(load_table(spark, sf_dir, "events"))
    ordinal = (
        F.when(F.col("level") == "INFO", 1)
        .when(F.col("level") == "WARN", 2)
        .otherwise(3)
    )
    return ev.filter(
        (ordinal >= 2) & F.col("user_id").isin(1, 3, 5, 7, 9)
    ).select("event_id", "user_id", "event_type", "level", "ts")


# ---------------------------------------------------------------------------
# ST3 — priority ordering within a batch (message_broadcaster.hpp:52-60)
# ---------------------------------------------------------------------------


@query(
    "st3_priority_batches",
    """
    SELECT event_id, user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                              ORDER BY value DESC, event_id) AS drain_order
    FROM events
    """,
)
def q_st3(spark, sf_dir):
    """ST3 — higher-priority-first drain order per micro-batch (hour =
    batch analog, value = priority)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(F.date_trunc("hour", F.col("ts"))).orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.row_number().over(w).alias("drain_order"),
    )


_ST5_DUAL_ORACLE = f"""
WITH minute0 AS (
    SELECT user_id, event_type, date_trunc('minute', ts) AS minute_start,
           COUNT(*)::BIGINT AS minute_count
    FROM events GROUP BY 1, 2, 3
),
minute AS (
    SELECT minute0.*,
           CASE WHEN event_type LIKE 'purch%' THEN 'purch'
                WHEN event_type LIKE 'error%' THEN 'error'
                WHEN event_type LIKE 'p%' THEN 'p'
                ELSE '' END AS matched_prefix,
           CASE WHEN event_type LIKE 'purch%' THEN 2
                WHEN event_type LIKE 'error%' THEN 1
                WHEN event_type LIKE 'p%' THEN 3
                ELSE 5 END AS per_minute_limit,
           CASE WHEN event_type LIKE 'purch%' THEN 40
                WHEN event_type LIKE 'error%' THEN 20
                WHEN event_type LIKE 'p%' THEN 60
                ELSE 100 END AS per_hour_limit
    FROM minute0
),
hour AS (
    -- minutes contribute at most per_minute_limit: minute-denied requests
    -- never consume hour budget (reference increments on allow only)
    SELECT user_id, event_type, date_trunc('hour', minute_start) AS hour_start,
           SUM(LEAST(minute_count, per_minute_limit))::BIGINT AS hour_count
    FROM minute GROUP BY 1, 2, 3
)
SELECT m.user_id, m.event_type, m.minute_start, m.minute_count, h.hour_count,
       m.matched_prefix, m.per_minute_limit, m.per_hour_limit,
       (m.minute_count <= m.per_minute_limit
        AND h.hour_count <= m.per_hour_limit) AS allowed
FROM minute m
JOIN hour h ON h.user_id = m.user_id AND h.event_type = m.event_type
           AND h.hour_start = date_trunc('hour', m.minute_start)
"""


@query("st5_rate_limit_dual_windows", _ST5_DUAL_ORACLE, bench=True)
def q_st5_dual(spark, sf_dir):
    """ST5 full isAllowed — BOTH epoch-minute and epoch-hour limits
    (rate_limiter.cpp:48-90, 206-214). Hour counts re-aggregate the
    minute counts (multi-grain rollup), no second event scan."""
    from rclabsapi_spark.streaming.rate_limiter import rate_limit_check_dual

    ev = load_table(spark, sf_dir, "events")
    return rate_limit_check_dual(ev)


# ---------------------------------------------------------------------------
# Cohort retention (extension: the canonical event-log OLAP rollup —
# weekly signup cohorts × activity-week offsets)
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH firsts AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT f.cohort_week::TIMESTAMP AS cohort_week,
       (datediff('day', f.cohort_week, a.week) / 7)::BIGINT AS week_offset,
       COUNT(DISTINCT a.user_id)::BIGINT AS n_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY 1, 2
"""


@query("w_cohort_retention", _COHORT_ORACLE, bench=True)
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by the week of their first
    event, counted distinct per (cohort, weeks-since) — the engagement
    rollup every event dashboard draws. SINGLE fact scan, single fact
    shuffle: distinct (user, week) pairs under a user_id repartition
    (hashpartitioning(user_id) satisfies the (user_id, week) clustering),
    cohort week as min(week) over the same partitioning — date_trunc is
    monotone, so min(trunc(ts)) == trunc(min(ts)) and no separate firsts
    relation or join is needed. The rows reaching the final (cohort,
    offset) aggregate are already one-per-(user, week), so the distinct
    count degenerates to a plain count of the pre-shrunk relation. Week
    offsets are exact (week-starts differ by multiples of 7 days in both
    engines, Monday-anchored date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    weeks = (
        ev.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("week")
        )
        .transform(lambda d: spread_by(d, "user_id"))
        .distinct()
    )
    w_u = Window.partitionBy("user_id")
    cohorted = weeks.select(
        "user_id", "week", F.min("week").over(w_u).alias("cohort_week")
    )
    return cohorted.groupBy(
        "cohort_week",
        F.floor(
            F.datediff(F.col("week"), F.col("cohort_week")) / 7
        ).cast("long").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Funnel analysis (extension: ordered view → click → purchase per user)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts >= v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM events e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
    GROUP BY e.user_id
)
SELECT 'view' AS stage, (SELECT COUNT(*) FROM v)::BIGINT AS n_users
UNION ALL SELECT 'click', (SELECT COUNT(*) FROM c)::BIGINT
UNION ALL SELECT 'purchase', (SELECT COUNT(*) FROM p)::BIGINT
"""


@query("w_funnel_stages", _FUNNEL_ORACLE, bench=True)
def q_funnel(spark, sf_dir):
    """Ordered funnel: view → click-after-view → purchase-after-click,
    counting users surviving each stage (order matters: a click BEFORE
    the first view doesn't advance the funnel — the windowed-sequence
    semantics a naive per-type count gets wrong). SINGLE fact scan,
    single fact shuffle: two stacked running-min window passes over one
    user_id partitioning (RANGE frames on epoch seconds, so same-instant
    events qualify, matching the oracle's >=) mark each row with the
    earliest view / earliest qualifying click seen so far — a stage-k
    event qualifies iff a stage-(k-1) marker exists at-or-before it,
    which is exactly ts >= min(qualifying prev stage). Per-user flags
    then collapse in the same partitioning and one singleton aggregate
    unpivots to the 3 stage rows. (The join-chain formulation scanned
    the fact 5× with 9 exchanges; this is 1 scan, 1 fact exchange.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    # NTZ-safe epoch ordering (vanilla sessions read parquet ts as
    # TIMESTAMP_NTZ, which cannot cast straight to long).
    ts_s = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_s)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    is_click = F.col("event_type") == "click"
    is_purchase = F.col("event_type") == "purchase"

    s1 = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(is_view, F.col("ts"))).over(w).alias("t_view_le"),
    )
    qual_click = F.when(
        is_click & F.col("t_view_le").isNotNull(), F.col("ts")
    )
    s2 = s1.select(
        "user_id",
        "event_type",
        "t_view_le",
        qual_click.alias("t_qual_click"),
        F.min(qual_click).over(w).alias("t_click_le"),
    )
    flags = s2.groupBy("user_id").agg(
        F.max(is_view.cast("int")).alias("v"),
        F.max(F.col("t_qual_click").isNotNull().cast("int")).alias("c"),
        F.max(
            (is_purchase & F.col("t_click_le").isNotNull()).cast("int")
        ).alias("p"),
    )
    totals = flags.agg(
        F.sum("v").alias("view"),
        F.sum("c").alias("click"),
        F.sum("p").alias("purchase"),
    )
    return totals.select(
        F.expr(
            "stack(3, 'view', view, 'click', click,"
            " 'purchase', purchase) AS (stage, n_users)"
        )
    )


# ---------------------------------------------------------------------------
# Last-touch conversion attribution
# ---------------------------------------------------------------------------

_ATTR_ORACLE = f"""
WITH touched AS (
    SELECT event_type, value,
           LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
    FROM events
),
counts AS (
    SELECT channel, COUNT(*)::BIGINT AS n_conversions,
           {sql_grid_sum('value', 6)} AS attributed_value
    FROM touched WHERE event_type = 'purchase' GROUP BY 1
)
SELECT channel, n_conversions, attributed_value,
       n_conversions::DOUBLE / (SUM(n_conversions) OVER ())::DOUBLE AS share
FROM counts
"""


@query("attr_last_touch", _ATTR_ORACLE, bench=True)
def q_attr_last_touch(spark, sf_dir):
    """Last-touch attribution: every purchase is credited to the most
    recent preceding non-purchase event type in the user's timeline
    (NULL channel = first-session purchases, reported rather than
    dropped). One fact shuffle — the per-user ordered window — then a
    |types|-sized rollup; share divides exact integer counts.
    operators/analytics.py::last_touch_attribution."""
    from rclabsapi_spark.operators.analytics import last_touch_attribution

    ev = load_table(spark, sf_dir, "events")
    return last_touch_attribution(ev, conversion_type="purchase")


# ---------------------------------------------------------------------------
# Native session windows (batch) vs gaps-and-islands semantics
# ---------------------------------------------------------------------------

_SESSION_NATIVE_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTES
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTES AS session_end,
       COUNT(*)::BIGINT AS n_events
FROM sessions GROUP BY user_id, sid
"""


@query("w_session_native", _SESSION_NATIVE_ORACLE, bench=True)
def q_session_native(spark, sf_dir):
    """Spark's NATIVE session_window operator hash-checked against the
    gaps-and-islands SQL formulation — the cross-check that the
    streaming-capable sessionizer (streaming/sessions.py, merge-on-
    overlap state) and the batch window SQL agree event-for-event.
    Boundary pinned: native splits at gap ≥ timeout, so the oracle uses
    >= (not >); session_end is last event + gap by definition."""
    from rclabsapi_spark.streaming.sessions import session_agg

    ev = load_table(spark, sf_dir, "events")
    return session_agg(ev, gap="30 minutes")
