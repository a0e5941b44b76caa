"""Extended coverage suite — the SURVEY §2 rows not in the core suite:

- P5 type filter, P11 full LogQueryParams pipeline
- A4/A6 filtered rollups, A8 error-rate mean, A10 resource utilization,
  A12 batch accounting, A13 composite efficiency score, A14 baseline
  comparison
- W4 retention caps
- F20 roles array round-trip
- ST11 job state machine transitions (batch replay)
- embedding-cosine near-dup (fifth dedup tier)

Fixture mapping follows FIXTURES.md §9 (etl_jobs→orders/lineitem metric
map, logs→events with derived level, users→customer).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import (
    grid_mean,
    round_half_up,
    sql_grid_mean,
    sql_round_half_up,
)
from rclabsapi_spark.llm.similarity import embedding_near_dup_pairs
from rclabsapi_spark.operators.aggregates import efficiency_score, metric_rollup
from rclabsapi_spark.plans.log_query import LogQueryParams, search_logs
from rclabsapi_spark.registry import query
from rclabsapi_spark.suites.core import _METRIC_MAP_SQL, _metric_mapped

# ---------------------------------------------------------------------------
# P5 — equality filter by type (etl_job_repository.cpp:296-311)
# ---------------------------------------------------------------------------


@query(
    "p5_filter_type",
    "SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'",
)
def q_p5(spark, sf_dir):
    """P5 — WHERE job_type = … (pushed to the parquet scan)."""
    return load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )


# ---------------------------------------------------------------------------
# P11 — full LogQueryParams pipeline (log_file_manager.hpp:45-61, declared
# semantics; the reference .cpp only implements the substring scan)
# ---------------------------------------------------------------------------

_LEVEL_SQL = "CASE WHEN value < 50 THEN 'INFO' WHEN value < 150 THEN 'WARN' ELSE 'ERROR' END"

_P11_ORACLE = f"""
WITH logs AS (
    SELECT event_id, ts, user_id, event_type, value, props,
           {_LEVEL_SQL} AS level
    FROM events
)
SELECT event_id, ts, user_id, event_type, level, props
FROM logs
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <= TIMESTAMP '2024-01-25 00:00:00'
  AND (CASE level WHEN 'DEBUG' THEN 0 WHEN 'INFO' THEN 1 WHEN 'WARN' THEN 2
       WHEN 'ERROR' THEN 3 WHEN 'FATAL' THEN 4 ELSE -1 END) >= 2
  AND (CASE level WHEN 'DEBUG' THEN 0 WHEN 'INFO' THEN 1 WHEN 'WARN' THEN 2
       WHEN 'ERROR' THEN 3 WHEN 'FATAL' THEN 4 ELSE -1 END) <= 3
  AND event_type = 'click'
  AND props LIKE '%9%'
ORDER BY ts DESC, event_id
LIMIT 200 OFFSET 10
"""


@query("p11_log_query_pipeline", _P11_ORACLE, bench=True)
def q_p11(spark, sf_dir):
    """P11+P12+O3+O4 composed — time range, level ordinal range, component
    equality, substring search, sort desc, offset+limit."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.expr(_LEVEL_SQL).alias("level"),
        "props",
    )
    params = LogQueryParams(
        start_time="2024-01-05 00:00:00",
        end_time="2024-01-25 00:00:00",
        min_level="WARN",
        max_level="ERROR",
        component="click",
        search_text="9",
        max_results=200,
        offset=10,
        sort_by="timestamp",
        ascending=False,
    )
    return search_logs(
        ev,
        params,
        ts_col="ts",
        component_col="event_type",
        job_col="__absent__",
        thread_col="__absent__",
        message_col="props",
        key_col="event_id",
    )


# ---------------------------------------------------------------------------
# A4 / A6 — rollups filtered by id-list / time range
# (job_monitor_service.cpp:477-489, 514-538)
# ---------------------------------------------------------------------------

_ROLLUP_SELECT_SQL = f"""
    SELECT CAST(SUM(records_processed) AS BIGINT) AS sum_records_processed,
           CAST(SUM(records_failed) AS BIGINT) AS sum_records_failed,
           CAST(SUM(batches) AS BIGINT) AS sum_batches,
           MAX(peak_memory) AS max_peak_memory,
           {sql_grid_mean("CASE WHEN rate > 0 THEN rate END")}
               AS avg_rate_positive
"""


@query(
    "a4_rollup_idlist",
    f"""
    WITH m AS ({_METRIC_MAP_SQL.replace("FROM lineitem", ", l_suppkey FROM lineitem")})
    {_ROLLUP_SELECT_SQL}
    FROM m
    WHERE l_suppkey IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
      AND records_processed > 0
    """,
)
def q_a4(spark, sf_dir):
    """A4 — rollup over an explicit id list, excluding records_processed=0
    rows (job_monitor_service.cpp:477-489)."""
    m = _metric_mapped_with_supp(spark, sf_dir)
    filtered = m.filter(
        F.col("l_suppkey").isin(list(range(1, 11)))
        & (F.col("records_processed") > 0)
    )
    return _rollup_select(filtered)


def _metric_mapped_with_supp(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    failed = F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)
    return li.select(
        "l_suppkey",
        "l_shipdate",
        F.col("l_quantity").alias("records_processed"),
        failed.alias("records_failed"),
        (F.col("l_discount") * 100.0).alias("rate"),
        F.col("l_linenumber").alias("batches"),
        F.col("l_extendedprice").alias("peak_memory"),
        (F.col("l_tax") * 100.0).alias("peak_cpu"),
    )


def _rollup_select(df):
    return df.agg(
        F.sum("records_processed").cast("long").alias("sum_records_processed"),
        F.sum("records_failed").cast("long").alias("sum_records_failed"),
        F.sum("batches").cast("long").alias("sum_batches"),
        F.max("peak_memory").alias("max_peak_memory"),
        # 9dp-grid mean: per-row rates are bit-identical doubles across
        # engines, the aggregate's fold order is not (grid_mean note)
        grid_mean(F.when(F.col("rate") > 0, F.col("rate"))).alias(
            "avg_rate_positive"
        ),
    )


@query(
    "a6_rollup_time_range",
    f"""
    WITH m AS ({_METRIC_MAP_SQL.replace("FROM lineitem", ", l_shipdate FROM lineitem")})
    {_ROLLUP_SELECT_SQL}
    FROM m
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate <= TIMESTAMP '1996-12-31'
    """,
)
def q_a6(spark, sf_dir):
    """A6 — rollup over a start-time range (job_monitor_service.cpp:514-538)."""
    m = _metric_mapped_with_supp(spark, sf_dir)
    return _rollup_select(
        m.filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
    )


# ---------------------------------------------------------------------------
# A8 — mean error rate where records_processed > 0
# (job_monitor_service.cpp:574-606)
# ---------------------------------------------------------------------------


@query(
    "a8_avg_error_rate",
    f"""
    WITH m AS ({_METRIC_MAP_SQL.replace("FROM lineitem", ", l_linestatus FROM lineitem")})
    SELECT l_linestatus,
           {sql_grid_mean(
               "CASE WHEN records_processed > 0 "
               "THEN 100.0 * records_failed / records_processed END"
           )} AS avg_error_rate
    FROM m GROUP BY l_linestatus
    """,
)
def q_a8(spark, sf_dir):
    """A8 — AVG error rate over rows with records_processed > 0, grouped
    by type."""
    li = load_table(spark, sf_dir, "lineitem")
    failed = F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)
    m = li.select(
        "l_linestatus",
        F.col("l_quantity").alias("records_processed"),
        failed.alias("records_failed"),
    )
    er = F.when(
        F.col("records_processed") > 0,
        100.0 * F.col("records_failed") / F.col("records_processed"),
    )
    return m.groupBy("l_linestatus").agg(
        grid_mean(er).alias("avg_error_rate")
    )


# ---------------------------------------------------------------------------
# A10 — resource utilization over active jobs (job_monitor_service.cpp:688-727)
# ---------------------------------------------------------------------------


@query(
    "a10_resource_utilization",
    f"""
    WITH m AS ({_METRIC_MAP_SQL})
    SELECT {sql_grid_mean("peak_memory / 1048576.0")} AS avg_memory_mb,
           {sql_grid_mean("peak_cpu")} AS avg_cpu,
           MAX(peak_memory) AS max_peak_memory,
           MAX(peak_cpu) AS max_peak_cpu,
           COUNT(*)::BIGINT AS n_jobs
    FROM m
    WHERE peak_memory > 0 OR peak_cpu > 0
    """,
)
def q_a10(spark, sf_dir):
    """A10 — AVG/MAX memory+cpu over rows with any resource signal."""
    m = _metric_mapped(spark, sf_dir)
    return m.filter((F.col("peak_memory") > 0) | (F.col("peak_cpu") > 0)).agg(
        grid_mean(F.col("peak_memory") / 1048576.0).alias("avg_memory_mb"),
        grid_mean(F.col("peak_cpu")).alias("avg_cpu"),
        F.max("peak_memory").alias("max_peak_memory"),
        F.max("peak_cpu").alias("max_peak_cpu"),
        F.count(F.lit(1)).alias("n_jobs"),
    )


# ---------------------------------------------------------------------------
# A12 — incremental batch accounting (job_monitoring_models.cpp:222-252)
# ---------------------------------------------------------------------------


@query(
    "a12_batch_accounting",
    """
    WITH b AS (
        SELECT l_orderkey,
               COUNT(*)::BIGINT AS total_batches,
               SUM(l_quantity) AS records_processed,
               CAST(SUM(FLOOR(l_extendedprice)) AS BIGINT) AS total_bytes,
               CAST(SUM(l_suppkey * 100) AS BIGINT) AS execution_time_ms
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey, total_batches, records_processed, total_bytes,
           ROUND(CASE WHEN total_batches > 0
                 THEN records_processed / total_batches ELSE 0.0 END, 6)
               AS avg_batch_size,
           ROUND(CASE WHEN execution_time_ms / 1000.0 > 0
                 THEN records_processed / (execution_time_ms / 1000.0)
                 ELSE 0.0 END, 6) AS avg_rate
    FROM b
    """,
)
def q_a12(spark, sf_dir):
    """A12 — per-job batch counters + calculateAverages: lineitem rows are
    the batch events, one groupBy replaces the reference's mutexed
    increments."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("total_batches"),
        F.sum("l_quantity").alias("records_processed"),
        F.sum(F.floor("l_extendedprice")).cast("long").alias("total_bytes"),
        F.sum(F.col("l_suppkey") * 100).cast("long").alias("execution_time_ms"),
    )
    sec = F.col("execution_time_ms") / 1000.0
    return b.select(
        "l_orderkey",
        "total_batches",
        "records_processed",
        "total_bytes",
        F.round(
            F.when(
                F.col("total_batches") > 0,
                F.col("records_processed") / F.col("total_batches"),
            ).otherwise(0.0),
            6,
        ).alias("avg_batch_size"),
        F.round(
            F.when(sec > 0, F.col("records_processed") / sec).otherwise(0.0), 6
        ).alias("avg_rate"),
    )


# ---------------------------------------------------------------------------
# A13 — composite efficiency score (job_monitoring_models.cpp:285-319)
# ---------------------------------------------------------------------------

_A13_TERMS_SQL = """
    SELECT l_returnflag, records_processed,
           CASE WHEN rate > 0
                THEN LEAST(1.0, rate / 1000.0) END AS t_rate,
           CASE WHEN records_processed > 0
                THEN (100.0 - error_rate) / 100.0 END AS t_err,
           CASE WHEN mem_eff > 0
                THEN LEAST(1.0, mem_eff / 1000.0) END AS t_mem,
           CASE WHEN cpu_eff > 0
                THEN LEAST(1.0, cpu_eff / 100.0) END AS t_cpu
    FROM ind
"""


@query(
    "a13_efficiency_score",
    f"""
    WITH m AS ({_METRIC_MAP_SQL}),
    ind AS (
        SELECT l_returnflag, records_processed,
               rate,
               CASE WHEN records_processed > 0
                    THEN 100.0 * records_failed / records_processed
                    ELSE 0.0 END AS error_rate,
               CASE WHEN peak_memory > 0
                    THEN records_processed / (peak_memory / 1048576.0)
                    ELSE 0.0 END AS mem_eff,
               CASE WHEN peak_cpu > 0
                    THEN records_processed / peak_cpu
                    ELSE 0.0 END AS cpu_eff
        FROM m
    ),
    terms AS ({_A13_TERMS_SQL})
    SELECT l_returnflag,
           {sql_grid_mean(
               '''CASE WHEN COALESCE(t_rate, t_err, t_mem, t_cpu) IS NOT NULL
                    THEN (COALESCE(t_rate, 0) + COALESCE(t_err, 0)
                          + COALESCE(t_mem, 0) + COALESCE(t_cpu, 0))
                         / ((CASE WHEN t_rate IS NULL THEN 0 ELSE 1 END)
                            + (CASE WHEN t_err IS NULL THEN 0 ELSE 1 END)
                            + (CASE WHEN t_mem IS NULL THEN 0 ELSE 1 END)
                            + (CASE WHEN t_cpu IS NULL THEN 0 ELSE 1 END))
                    ELSE 0.0 END'''
           )} AS avg_efficiency_score
    FROM terms GROUP BY l_returnflag
    """,
)
def q_a13(spark, sf_dir):
    """A13 — per-row composite score (mean of up-to-4 clamped terms, each
    included only when its input > 0), averaged per group."""
    m = _metric_mapped(spark, sf_dir)
    ind = m.select(
        "l_returnflag",
        "records_processed",
        F.col("rate"),
        F.when(
            F.col("records_processed") > 0,
            100.0 * F.col("records_failed") / F.col("records_processed"),
        )
        .otherwise(0.0)
        .alias("error_rate"),
        F.when(
            F.col("peak_memory") > 0,
            F.col("records_processed") / (F.col("peak_memory") / 1048576.0),
        )
        .otherwise(0.0)
        .alias("mem_eff"),
        F.when(
            F.col("peak_cpu") > 0, F.col("records_processed") / F.col("peak_cpu")
        )
        .otherwise(0.0)
        .alias("cpu_eff"),
    )
    score = efficiency_score(
        F.col("rate"),
        F.col("error_rate"),
        F.col("mem_eff"),
        F.col("cpu_eff"),
        F.col("records_processed"),
    )
    return ind.select("l_returnflag", score.alias("score")).groupBy(
        "l_returnflag"
    ).agg(grid_mean(F.col("score")).alias("avg_efficiency_score"))


# ---------------------------------------------------------------------------
# A14 — baseline comparison predicate (job_monitoring_models.cpp:321-352)
# ---------------------------------------------------------------------------


@query(
    "a14_baseline_comparison",
    f"""
    WITH m AS ({_METRIC_MAP_SQL}),
    per_group AS (
        SELECT l_returnflag,
               {sql_grid_mean("rate")} AS rate,
               {sql_grid_mean(
                   "CASE WHEN records_processed > 0 "
                   "THEN 100.0 * records_failed / records_processed "
                   "ELSE 0.0 END"
               )} AS error_rate,
               {sql_grid_mean("peak_cpu")} AS cpu
        FROM m GROUP BY l_returnflag
    ),
    -- per_group means are 6dp-rounded, so micro-int sums over the
    -- tiny group relation keep the baseline order-independent too
    baseline AS (
        -- COUNT(col), not COUNT(*): the Spark side divides by the
        -- window's non-null count, and both must count the same rows
        SELECT SUM(CAST(FLOOR(rate * 1000000.0 + 0.5) AS HUGEINT))::DOUBLE
                   / (COUNT(rate) * 1000000.0) AS b_rate,
               SUM(CAST(FLOOR(error_rate * 1000000.0 + 0.5) AS HUGEINT))::DOUBLE
                   / (COUNT(error_rate) * 1000000.0) AS b_err,
               SUM(CAST(FLOOR(cpu * 1000000.0 + 0.5) AS HUGEINT))::DOUBLE
                   / (COUNT(cpu) * 1000000.0) AS b_cpu
        FROM per_group
    )
    SELECT l_returnflag,
           rate, error_rate,
           ((CASE WHEN b_rate > 0 THEN rate >= 0.8 * b_rate ELSE TRUE END)
            AND (CASE WHEN b_err > 0 THEN error_rate <= 1.2 * b_err ELSE TRUE END)
            AND (CASE WHEN b_cpu > 0 THEN cpu >= 0.8 * b_cpu ELSE TRUE END))
               AS is_performing_well
    FROM per_group, baseline
    """,
)
def q_a14(spark, sf_dir):
    """A14 — isPerformingWell vs a 1-row baseline (each bound applies only
    when its baseline > 0); baseline side is a broadcast cross join."""
    m = _metric_mapped(spark, sf_dir)
    er = F.when(
        F.col("records_processed") > 0,
        100.0 * F.col("records_failed") / F.col("records_processed"),
    ).otherwise(0.0)
    per_group = m.groupBy("l_returnflag").agg(
        grid_mean(F.col("rate")).alias("rate"),
        grid_mean(er).alias("error_rate"),
        grid_mean(F.col("peak_cpu")).alias("cpu"),
    )
    # baseline = global mean of the per-group rows. A second .agg() on
    # per_group re-computes the whole subtree (two fact scans — caught by
    # the plan audit); an unpartitioned window over the tiny grouped
    # relation reads it once. Per-group means are 6dp-rounded, so
    # micro-int window sums keep the baseline order-independent too.
    w_all = Window.partitionBy()

    def _micro_mean(col: str):
        g = F.floor(F.col(col) * 1000000.0 + F.lit(0.5)).cast(
            "decimal(38,0)"
        )
        return F.sum(g).over(w_all).cast("double") / (
            F.count(F.col(col)).over(w_all) * 1000000.0
        )

    with_base = per_group.select(
        "*",
        _micro_mean("rate").alias("b_rate"),
        _micro_mean("error_rate").alias("b_err"),
        _micro_mean("cpu").alias("b_cpu"),
    )
    ok = (
        F.when(F.col("b_rate") > 0, F.col("rate") >= 0.8 * F.col("b_rate")).otherwise(
            F.lit(True)
        )
        & F.when(
            F.col("b_err") > 0, F.col("error_rate") <= 1.2 * F.col("b_err")
        ).otherwise(F.lit(True))
        & F.when(F.col("b_cpu") > 0, F.col("cpu") >= 0.8 * F.col("b_cpu")).otherwise(
            F.lit(True)
        )
    )
    return with_base.select(
        "l_returnflag",
        "rate",
        "error_rate",
        ok.alias("is_performing_well"),
    )


# ---------------------------------------------------------------------------
# W4 — history retention caps (job_monitor_service.hpp:156-159)
# ---------------------------------------------------------------------------


@query(
    "w4_retention_caps",
    """
    WITH capped AS (
        SELECT event_id, user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id) AS rn,
               MAX(ts) OVER () AS max_ts
        FROM events
    )
    SELECT event_id, user_id, ts, value
    FROM capped
    WHERE rn <= 50 AND ts >= max_ts - INTERVAL 24 HOURS
    """,
)
def q_w4(spark, sf_dir):
    """W4 — keep ≤N rows per key AND within the retention window (≤1000
    snapshots/job, 24h retention)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id"))
    w_all = Window.partitionBy()
    capped = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("rn"),
        F.max("ts").over(w_all).alias("max_ts"),
    )
    return capped.filter(
        (F.col("rn") <= 50)
        & (F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
    ).select("event_id", "user_id", "ts", "value")


# ---------------------------------------------------------------------------
# F20 — TEXT[] roles parse/serialize (user_repository.cpp:32-33)
# ---------------------------------------------------------------------------


@query(
    "f20_roles_roundtrip",
    """
    WITH r AS (
        SELECT c_custkey,
               string_split(c_mktsegment || ','
                   || CASE WHEN c_acctbal >= 0 THEN 'active' ELSE 'debtor' END,
                   ',') AS roles
        FROM customer
    )
    SELECT c_custkey,
           array_to_string(roles, ',') AS roles_str,
           len(roles)::BIGINT AS n_roles,
           roles[1] AS first_role
    FROM r
    """,
)
def q_f20(spark, sf_dir):
    """F20 — rolesToString/stringToRoles round-trip (user_repository.cpp:32-33)
    as native ArrayType: split ↔ array_join are exact inverses for comma-free
    role names. The array itself stays internal — driver output columns are
    scalars (the driver's canonicalizer sorts pandas columns, and list cells
    are unsortable/unhashable there); ``roles_str``/``n_roles``/``first_role``
    pin the roundtrip, cardinality, and element order of the array."""
    c = load_table(spark, sf_dir, "customer")
    roles_str = F.concat_ws(
        ",",
        F.col("c_mktsegment"),
        F.when(F.col("c_acctbal") >= 0, "active").otherwise("debtor"),
    )
    roles = F.split(roles_str, ",")
    return c.select(
        "c_custkey",
        F.array_join(roles, ",").alias("roles_str"),
        F.size(roles).cast("long").alias("n_roles"),
        roles.getItem(0).alias("first_role"),
    )


# ---------------------------------------------------------------------------
# P17 — users-by-role array-membership filter (user_repository.cpp:242:
# WHERE '<role>' = ANY(roles) ORDER BY created_at DESC)
# ---------------------------------------------------------------------------


@query(
    "p_users_by_role",
    """
    WITH u AS (
        SELECT c_custkey,
               c_name,
               string_split(c_mktsegment || ','
                   || CASE WHEN c_acctbal >= 0 THEN 'active' ELSE 'debtor' END,
                   ',') AS roles,
               DATE '1995-01-01' + INTERVAL ((c_custkey * 37) % 2557) DAY
                   AS created_at,
               c_acctbal >= 0 AS is_active
        FROM customer
    )
    SELECT c_custkey, c_name,
           array_to_string(roles, ',') AS roles_str,
           CAST(created_at AS DATE) AS created_at,
           is_active
    FROM u
    WHERE list_contains(roles, 'BUILDING')
    ORDER BY created_at DESC, c_custkey
    """,
)
def q_users_by_role(spark, sf_dir):
    """P17 — getUsersByRole (user_repository.cpp:230-242): the reference's
    only array-predicate query shape, ``'<role>' = ANY(roles) ORDER BY
    created_at DESC``. Users map per FIXTURES.md §9 (users→customer) with
    the F20 roles model (mktsegment + active/debtor); ``created_at`` is a
    deterministic per-user date proxy (the fixture has no signup column).
    ``F.array_contains`` ≙ DuckDB ``list_contains`` — an O(|roles|) scan
    predicate evaluated inside whole-stage codegen, pushed nowhere (array
    membership can't reach the parquet scan on either engine) but applied
    pre-shuffle so only matching users reach the global sort. At 100 TB
    the sort is a TakeOrdered only when the caller adds a limit; unbounded
    role listings are range-partitioned by Spark's sort exchange."""
    c = load_table(spark, sf_dir, "customer")
    roles = F.split(
        F.concat_ws(
            ",",
            F.col("c_mktsegment"),
            F.when(F.col("c_acctbal") >= 0, "active").otherwise("debtor"),
        ),
        ",",
    )
    created = F.date_add(
        F.lit("1995-01-01").cast("date"),
        ((F.col("c_custkey") * 37) % 2557).cast("int"),
    )
    return (
        c.select(
            "c_custkey",
            "c_name",
            F.array_join(roles, ",").alias("roles_str"),
            created.alias("created_at"),
            (F.col("c_acctbal") >= 0).alias("is_active"),
            roles.alias("_roles"),
        )
        .filter(F.array_contains(F.col("_roles"), F.lit("BUILDING")))
        .drop("_roles")
        .orderBy(F.col("created_at").desc(), "c_custkey")
    )


# ---------------------------------------------------------------------------
# ST11 — job state machine transitions (etl_job_manager.cpp:671-699),
# batch replay: consecutive event types per user = status transitions
# ---------------------------------------------------------------------------


@query(
    "st11_state_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*)::BIGINT AS transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def q_st11(spark, sf_dir):
    """ST11 — transition matrix of the per-key event sequence (the
    PENDING→RUNNING→… state machine replayed from the event log)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("transitions"))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (fifth dedup tier)
# ---------------------------------------------------------------------------

_DOT_SQL = (
    "list_reduce(list_transform(range(1, len({a}) + 1),"
    " i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"
)
_COS_SQL = (
    f"{_DOT_SQL.format(a='a.v', b='b.v')} / "
    f"(sqrt({_DOT_SQL.format(a='a.v', b='a.v')})"
    f" * sqrt({_DOT_SQL.format(a='b.v', b='b.v')}))"
)
_EMB_BUCKET_SQL = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(8)
) + ")"


@query(
    "dedup_embedding_cosine",
    f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, {_EMB_BUCKET_SQL} AS bucket
        FROM embeddings
    )
    SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COS_SQL}, 6) AS cosine_sim
    FROM b a JOIN b b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND({_COS_SQL}, 6) >= 0.5
    """,
    bench=True,
)
def q_emb_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: sign-LSH buckets, exact cosine
    within buckets only (llm.similarity.embedding_near_dup_pairs)."""
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), num_bits=8, threshold=0.5
    )


# ---------------------------------------------------------------------------
# Cosine near-dup threshold sweep (dedup threshold-selection curve)
# ---------------------------------------------------------------------------

# Coarser 4-bit buckets than the near-dup query: the sweep's job is the
# curve BELOW the production threshold, so it needs the recall of bigger
# buckets; the bucket-size cap keeps the in-bucket pair count linear.
_SWEEP_THRESHOLDS = (0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5)
_SWEEP_MAX_BUCKET = 512

_EMB_BUCKET4_SQL = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(4)
) + ")"

_SWEEP_VALUES_SQL = ", ".join(f"({t}::DOUBLE)" for t in _SWEEP_THRESHOLDS)


@query(
    "dedup_cosine_threshold_sweep",
    f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, {_EMB_BUCKET4_SQL} AS bucket
        FROM embeddings
    ),
    bc AS (SELECT bucket, COUNT(*)::BIGINT AS c FROM b GROUP BY 1),
    pr AS (
        SELECT a.vec_id AS id_a, bb.vec_id AS id_b,
               ROUND({_COS_SQL.replace('b.v', 'bb.v')}, 6) AS cosine_sim
        FROM b a
        JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
        JOIN bc ON bc.bucket = a.bucket
        WHERE bc.c <= {_SWEEP_MAX_BUCKET}
          AND ROUND({_COS_SQL.replace('b.v', 'bb.v')}, 6)
              >= {_SWEEP_THRESHOLDS[0]}
    ),
    th AS (SELECT * FROM (VALUES {_SWEEP_VALUES_SQL}) t(threshold)),
    sw AS (
        SELECT th.threshold, pr.id_a, pr.id_b, pr.cosine_sim
        FROM th JOIN pr ON pr.cosine_sim >= th.threshold
    ),
    pa AS (
        SELECT threshold, COUNT(*)::BIGINT AS n_pairs,
               SUM(CAST(ROUND(cosine_sim * 1000000.0, 0) AS BIGINT)) AS micro
        FROM sw GROUP BY 1
    ),
    ids AS (
        SELECT threshold, COUNT(DISTINCT vid)::BIGINT AS n_vecs
        FROM (SELECT threshold, id_a AS vid FROM sw
              UNION ALL SELECT threshold, id_b FROM sw) u
        GROUP BY 1
    )
    SELECT th.threshold,
           COALESCE(pa.n_pairs, 0)::BIGINT AS n_pairs,
           COALESCE(ids.n_vecs, 0)::BIGINT AS n_vecs,
           CASE WHEN pa.n_pairs > 0
                THEN {sql_round_half_up(
                    "pa.micro::DOUBLE / (pa.n_pairs * 1000000.0)", 6)}
                ELSE 0.0 END AS mean_cosine
    FROM th LEFT JOIN pa USING (threshold) LEFT JOIN ids USING (threshold)
    """,
    bench=True,
)
def q_cosine_threshold_sweep(spark, sf_dir):
    """Near-dup threshold-selection curve: pair counts, affected-vector
    counts, and mean cosine at each candidate dedup threshold, from ONE
    pass over the sign-LSH candidate pairs — the sweep a curation team
    runs before fixing the semantic-dedup cutoff (too low merges topics,
    too high leaves dups in). The capped 4-bit-bucket pair relation is
    built once and cached; each threshold row is a filter over it (an
    explode of the 7-literal threshold array — no join, no re-scoring),
    so at 100 TB the sweep costs one candidate generation regardless of
    how many thresholds are probed. Zero-count thresholds survive via
    the 7-row spine left-join. llm/similarity.py::embedding_near_dup_pairs."""
    pairs = (
        embedding_near_dup_pairs(
            load_table(spark, sf_dir, "embeddings"),
            num_bits=4,
            threshold=_SWEEP_THRESHOLDS[0],
            max_bucket_size=_SWEEP_MAX_BUCKET,
        )
        .select("id_a", "id_b", "cosine_sim")
        .cache()
    )
    th_arr = F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])
    sw = pairs.select(
        "id_a", "id_b", "cosine_sim", F.explode(th_arr).alias("threshold")
    ).filter(F.col("cosine_sim") >= F.col("threshold"))
    pa = sw.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.round(F.col("cosine_sim") * 1000000.0, 0).cast("long")
        ).alias("micro"),
    )
    ids = (
        sw.select(
            "threshold", F.explode(F.array("id_a", "id_b")).alias("vid")
        )
        .groupBy("threshold")
        .agg(F.countDistinct("vid").alias("n_vecs"))
    )
    spine = spark.range(1).select(F.explode(th_arr).alias("threshold"))
    return (
        spine.join(pa, "threshold", "left")
        .join(ids, "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias(
                "n_pairs"
            ),
            F.coalesce(F.col("n_vecs"), F.lit(0).cast("long")).alias(
                "n_vecs"
            ),
            F.when(
                F.col("n_pairs") > 0,
                round_half_up(
                    F.col("micro").cast("double")
                    / (F.col("n_pairs") * 1000000.0),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Data-quality: CHECK-constraint audit (§1.2 — init.sql enum CHECKs)
# ---------------------------------------------------------------------------


@query(
    "dq_constraint_violations",
    """
    WITH agg AS (
        SELECT
            CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS status_enum,
            CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_nonneg,
            CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_notnull,
            CAST(SUM(CASE WHEN o_orderpriority NOT LIKE '%-%' THEN 1 ELSE 0 END) AS BIGINT) AS priority_format
        FROM orders
    )
    SELECT 'status_enum' AS constraint_name, status_enum AS violations FROM agg
    UNION ALL SELECT 'totalprice_nonneg', totalprice_nonneg FROM agg
    UNION ALL SELECT 'orderdate_notnull', orderdate_notnull FROM agg
    UNION ALL SELECT 'priority_format', priority_format FROM agg
    """,
)
def q_dq(spark, sf_dir):
    """CHECK-constraint audit: all constraints counted in ONE scan + one
    stack unpivot (vs a scan per constraint)."""
    from rclabsapi_spark.functions.validation import check_constraints

    o = load_table(spark, sf_dir, "orders")
    return check_constraints(
        o,
        {
            "status_enum": F.col("o_orderstatus").isin("O", "F", "P"),
            "totalprice_nonneg": F.col("o_totalprice") >= 0,
            "orderdate_notnull": F.col("o_orderdate").isNotNull(),
            "priority_format": F.col("o_orderpriority").like("%-%"),
        },
    )


# ---------------------------------------------------------------------------
# Data-quality: corpus snapshot diff (row-level ingest/versioning audit)
# ---------------------------------------------------------------------------

# Deterministic pseudo-snapshots derived from the one documents fixture
# on BOTH engines (the PII-tail precedent — the operator under test is
# the DIFF, not the synthesis): yesterday lacked the doc_id%17==0 docs
# (today's "added"), today dropped the %19==0 docs ("removed"), and the
# %13==0 docs carried an older revision yesterday ("changed").


@query(
    "dq_snapshot_diff",
    """
    WITH old_snap AS (
        SELECT doc_id, source,
               md5(CASE WHEN doc_id % 13 = 0 THEN text || ' rev0'
                        ELSE text END) AS fp
        FROM documents WHERE doc_id % 17 <> 0
    ),
    new_snap AS (
        SELECT doc_id, source, md5(text) AS fp
        FROM documents WHERE doc_id % 19 <> 0
    ),
    j AS (
        SELECT COALESCE(n.source, o.source) AS source,
               CASE WHEN o.fp IS NULL THEN 'added'
                    WHEN n.fp IS NULL THEN 'removed'
                    WHEN o.fp <> n.fp THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN o.fp IS NOT NULL THEN 1 ELSE 0 END AS in_old,
               CASE WHEN n.fp IS NOT NULL THEN 1 ELSE 0 END AS in_new
        FROM old_snap o FULL OUTER JOIN new_snap n USING (doc_id)
    ),
    agg AS (
        SELECT source,
               SUM(in_old)::BIGINT AS n_old,
               SUM(in_new)::BIGINT AS n_new,
               SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT
                   AS n_added,
               SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT
                   AS n_removed,
               SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT
                   AS n_changed,
               SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT
                   AS n_unchanged
        FROM j GROUP BY source
    )
    SELECT source, n_old, n_new, n_added, n_removed, n_changed,
           n_unchanged,
           FLOOR(((n_added + n_removed + n_changed)::DOUBLE
                  / (n_old + n_added)::DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 AS churn_rate
    FROM agg
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Corpus snapshot diff: per-source added/removed/changed/unchanged
    breakdown between two snapshot fingerprint relations — the
    row-level ingest/versioning audit run before promoting a corpus
    snapshot (did today's crawl really only touch what the pipeline
    claims?). Fingerprints are md5 projections computed at each scan,
    so the FULL OUTER join on doc_id shuffles 32-B digests, never
    document bodies; counts partial-combine. A FULL OUTER join cannot
    broadcast, so this is a designed fact-to-fact shuffle join on the
    key — the honest shape at 100 TB (both sides reduce to key+fp+group
    first). maintenance.py::snapshot_diff."""
    from rclabsapi_spark.maintenance import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        "source",
        F.md5(
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.col("text"), F.lit(" rev0")),
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    new = docs.filter(F.col("doc_id") % 19 != 0).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    return snapshot_diff(old, new)


# ---------------------------------------------------------------------------
# Sessionization (extension: the canonical large-scale event-log op)
# ---------------------------------------------------------------------------


@query(
    "w_sessionization",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*)::BIGINT AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30-min inactivity gap): lag flag →
    running sum = session id → per-session aggregates. Two window passes
    over the same (user, ts) partitioning → one shuffle reused."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Defensive no-op under the pinned session config (session.py sets
    # inferTimestampNTZ.enabled=false, so ts already reads as LTZ); kept
    # because NTZ — which the default inference would yield — cannot cast
    # straight to long, and the guard is free.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(w_run).alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col("ts").cast("timestamp").cast("long"))
            - F.min(F.col("ts").cast("timestamp").cast("long"))
        )
        .cast("long")
        .alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# Corpus n-gram vocabulary (extension: training-data frequency analysis)
# ---------------------------------------------------------------------------


@query(
    "text_ngram_vocab",
    """
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok, COUNT(*)::BIGINT AS freq
    FROM toks
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 100
    """,
)
def q_vocab(spark, sf_dir):
    """Corpus token vocabulary top-100 — explode → count → distributed
    top-k (TakeOrdered; partial aggregation bounds the shuffle to the
    distinct-token dictionary, not the token stream)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Data-quality: referential-integrity audit (§1.2 — init.sql FK REFERENCES)
# ---------------------------------------------------------------------------


@query(
    "dq_fk_orphans",
    """
    SELECT 'lineitem_orders' AS relationship,
           (SELECT COUNT(*) FROM lineitem l
            LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL)::BIGINT AS orphans
    UNION ALL
    SELECT 'orders_customer',
           (SELECT COUNT(*) FROM orders o
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'customer_nation',
           (SELECT COUNT(*) FROM customer c
            LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
              ON c.c_nationkey = n.n_nationkey
            WHERE n.n_nationkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'supplier_nation',
           (SELECT COUNT(*) FROM supplier s
            LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
              ON s.s_nationkey = n.n_nationkey
            WHERE n.n_nationkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'nation_region',
           (SELECT COUNT(*) FROM nation na
            LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r
              ON na.n_regionkey = r.r_regionkey
            WHERE r.r_regionkey IS NULL)::BIGINT
    """,
    bench=True,
)
def q_dq_fk(spark, sf_dir):
    """Referential-integrity audit over the star schema's FK spine
    (reference: NOT NULL REFERENCES columns, init.sql:17,60,72 —
    postgres enforces these; a parquet lake must audit them). Each
    relationship is one anti-join reduced to a count: dims broadcast,
    lineitem→orders shuffles on the order key."""
    from rclabsapi_spark.functions.validation import fk_orphan_counts

    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "supplier", "nation", "region")}
    return fk_orphan_counts([
        ("lineitem_orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey"),
        ("orders_customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey"),
        ("customer_nation", t["customer"], "c_nationkey",
         t["nation"], "n_nationkey"),
        ("supplier_nation", t["supplier"], "s_nationkey",
         t["nation"], "n_nationkey"),
        ("nation_region", t["nation"], "n_regionkey",
         t["region"], "r_regionkey"),
    ])


# ---------------------------------------------------------------------------
# A16 extension — exact percentiles PER GROUP (the per-job-type latency
# distribution the scalar A16 summarizes globally)
# ---------------------------------------------------------------------------


@query(
    "a16_percentiles_by_group",
    f"""
    SELECT o_orderpriority,
           {sql_round_half_up('quantile_cont(o_totalprice, 0.5)', 6)} AS p50,
           {sql_round_half_up('quantile_cont(o_totalprice, 0.9)', 6)} AS p90,
           {sql_round_half_up('quantile_cont(o_totalprice, 0.99)', 6)} AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_a16_by_group(spark, sf_dir):
    """Exact interpolated percentiles per group
    (performance_monitor.hpp:239-255 applied per job type). Both engines
    use the same (n-1)·p linear interpolation, so values are
    bit-identical before the final rounding — which therefore goes
    through round_half_up, not F.round/ROUND (the representable-half-tie
    divergence class). One shuffle on the group key; at scale, swap in
    the GK sketch (approx_quantile_bound) when per-group sorts
    dominate."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            round_half_up(
                F.expr("percentile(o_totalprice, 0.5)"), 6
            ).alias("p50"),
            round_half_up(
                F.expr("percentile(o_totalprice, 0.9)"), 6
            ).alias("p90"),
            round_half_up(
                F.expr("percentile(o_totalprice, 0.99)"), 6
            ).alias("p99"),
        )
    )


# ---------------------------------------------------------------------------
# Heartbeat-gap audit (job timeout monitoring: the reference flags jobs
# whose progress stalls — job_monitor_service timeout sweep; ST6-adjacent)
# ---------------------------------------------------------------------------


@query(
    "dq_heartbeat_gaps",
    """
    WITH g AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    gaps AS (
        SELECT user_id,
               (FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts)))::BIGINT AS gap_s
        FROM g WHERE prev_ts IS NOT NULL
    ),
    tail AS (
        SELECT user_id,
               (FLOOR(epoch(TIMESTAMP '2024-02-01 00:00:00'))
                - FLOOR(epoch(MAX(ts))))::BIGINT AS silence_s
        FROM events GROUP BY user_id
    )
    SELECT t.user_id,
           COALESCE(x.n_gaps, 0)::BIGINT AS n_gaps,
           COALESCE(x.max_gap_s, 0)::BIGINT AS max_gap_s,
           t.silence_s,
           (CASE WHEN t.silence_s > 86400 THEN 1 ELSE 0 END)::INT
               AS is_silent
    FROM tail t
    LEFT JOIN (
        SELECT user_id,
               COUNT(CASE WHEN gap_s > 21600 THEN 1 END)::BIGINT AS n_gaps,
               MAX(gap_s)::BIGINT AS max_gap_s
        FROM gaps GROUP BY user_id
    ) x USING (user_id)
    """,
)
def q_heartbeat_gaps(spark, sf_dir):
    """Heartbeat-gap audit per key: count intra-stream gaps > 6h, the
    max gap, and trailing silence vs frozen 'now' (2024-02-01) with a
    >24h dead-man flag — the batch form of the reference's job-timeout
    sweep (stalled-progress detection). One shuffle on user_id: the lag
    window, the gap aggregate, and the tail aggregate all cluster on
    the key."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    now = F.lit("2024-02-01 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Under a vanilla session the parquet ts reads as TIMESTAMP_NTZ,
    # which cannot cast straight to long in Spark 4 — route via
    # timestamp first (no-op under the engine's pinned session config).
    ts_s = F.col("ts").cast("timestamp").cast("long")
    g = ev.select(
        "user_id",
        "ts",
        (ts_s - F.lag(ts_s).over(w)).alias("gap_s"),
    )
    per_key = g.groupBy("user_id").agg(
        F.count(F.when(F.col("gap_s") > 21600, 1)).alias("n_gaps"),
        F.coalesce(F.max("gap_s"), F.lit(0)).cast("long").alias("max_gap_s"),
        (now.cast("long") - F.max(ts_s)).cast("long").alias("silence_s"),
    )
    return per_key.select(
        "user_id",
        "n_gaps",
        "max_gap_s",
        "silence_s",
        (F.col("silence_s") > 86400).cast("int").alias("is_silent"),
    )


# ---------------------------------------------------------------------------
# Column-level table profile (pre-load data audit)
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       COUNT(*)::BIGINT AS n_rows,
       COUNT(*) FILTER (WHERE {c} IS NULL)::BIGINT AS n_null,
       COUNT(DISTINCT {c})::BIGINT AS n_distinct,
       {f"MIN({c})::DOUBLE" if num else "NULL::DOUBLE"} AS min_num,
       {f"MAX({c})::DOUBLE" if num else "NULL::DOUBLE"} AS max_num
FROM orders"""
    for c, num in _PROFILE_COLS
)


@query("dq_profile_orders", _PROFILE_ORACLE)
def q_dq_profile(spark, sf_dir):
    """Column-level profile of the orders feed — row/null/distinct
    counts per column, min/max for numerics — the audit run before
    trusting a new extract (engine-side analog of schema.sql's CHECK
    constraints, which validate rows but never summarize). ONE scan,
    one global aggregate, driver-trivial unpivot.
    operators/aggregates.py::table_profile."""
    from rclabsapi_spark.operators.aggregates import table_profile

    orders = load_table(spark, sf_dir, "orders")
    return table_profile(orders, [c for c, _ in _PROFILE_COLS])


# ---------------------------------------------------------------------------
# Exponentially-weighted variance: the adaptive alert band
# ---------------------------------------------------------------------------

_EW_VARIANCE_ORACLE = f"""
WITH folded AS (
    SELECT user_id,
           -- field order matters: DuckDB 1.0 evaluates struct_pack
           -- lambda fields sequentially IN PLACE, so a later field sees
           -- earlier fields already updated. var (which reads the OLD
           -- mu) must therefore come first.
           list_reduce(
               list_transform(
                   list(value ORDER BY ts, event_id),
                   v -> struct_pack(var := 0.0::DOUBLE, mu := v)),
               (acc, x) -> struct_pack(
                   var := (1.0::DOUBLE - 0.1::DOUBLE) * (acc.var
                          + 0.1::DOUBLE * (x.mu - acc.mu) * (x.mu - acc.mu)),
                   mu := acc.mu + 0.1::DOUBLE * (x.mu - acc.mu))
           ) AS st
    FROM events GROUP BY user_id
)
SELECT user_id,
       {sql_round_half_up("st.mu", 6)} AS ewma,
       {sql_round_half_up("st.var", 6)} AS ewvar,
       {sql_round_half_up("sqrt(st.var)", 6)} AS ewstd
FROM folded
"""


@query("w_ew_variance", _EW_VARIANCE_ORACLE, bench=True)
def q_ew_variance(spark, sf_dir):
    """EWMA + exponentially-weighted variance per user (West 1979
    update, α=0.1) — the reference's smoothed mean
    (performance_monitor.hpp:378-392) upgraded to an adaptive alert
    band (|x − ewma| > k·ewstd). One ordered struct-state fold per key,
    distributed across keys; the oracle folds the identical recurrence
    with list_reduce, so the doubles are bit-identical
    (deterministic-fold rule, registry.py). The streaming twin
    (streaming/stateful.py) holds batch==stream parity in
    tests/test_streaming.py. operators/windows.py::ew_stats_per_key."""
    from rclabsapi_spark.operators.windows import ew_stats_per_key

    ev = load_table(spark, sf_dir, "events")
    return ew_stats_per_key(
        ev, "user_id", "ts", "event_id", "value", alpha=0.1
    )
