"""Core relational suite — scans, filters, sorts, joins, aggregations,
windows, set ops (SURVEY §2.1-§2.7) expressed over the driver's star
schema per FIXTURES.md §9 (etl_jobs→orders, users→customer, logs→events).

Each query uses the engine's operator layer and carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators import joins as J
from rclabsapi_spark.operators import relational as R
from rclabsapi_spark.operators.aggregates import (
    avg_positive,
    count_by,
    metric_rollup,
)
from rclabsapi_spark.operators.windows import (
    delta_vs_previous,
    ewma_per_key,
    keep_last_n,
    running_peak,
)
from rclabsapi_spark.functions.scalars import (
    grid_mean,
    grid_sum,
    round_half_up,
    sql_grid_mean,
    sql_grid_sum,
)
from rclabsapi_spark.plans.metrics import derived_indicators
from rclabsapi_spark.plans.monitor_jobs import monitor_jobs
from rclabsapi_spark.registry import query

# Frozen "now" for the orders domain (F17's RUNNING branch needs a
# deterministic clock; the fixture data tops out at 2001-08-01).
ORDERS_NOW = "2002-01-01 00:00:00"

# ---------------------------------------------------------------------------
# Flagship: the /api/monitor/jobs pipeline (SURVEY §3.1, §7.1)
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
WITH filtered AS (
    SELECT * FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <= TIMESTAMP '1998-12-31'
    ORDER BY o_orderdate DESC, o_orderkey
    LIMIT 100
), computed AS (
    SELECT *,
        epoch_ms(TIMESTAMP '{ORDERS_NOW}') - epoch_ms(o_orderdate)
            AS execution_time_ms
    FROM filtered
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority, execution_time_ms,
       CASE WHEN execution_time_ms / 1000.0 > 0
            THEN o_totalprice / (execution_time_ms / 1000.0)
            ELSE 0.0 END AS processing_rate
FROM computed
"""


@query("monitor_jobs_pipeline", _FLAGSHIP_ORACLE, bench=True)
def q_monitor_jobs(spark, sf_dir):
    """§3.1 composed pipeline: P4 status + P7 range + O1/O2 newest-N +
    F17/F19 computed columns (request_handler.cpp:1197-1317)."""
    orders = load_table(spark, sf_dir, "orders")
    return monitor_jobs(
        orders,
        status="F",
        from_ts="1996-01-01 00:00:00",
        to_ts="1998-12-31 00:00:00",
        limit=100,
        status_col="o_orderstatus",
        type_col="o_orderpriority",
        created_col="o_orderdate",
        key_col="o_orderkey",
        records_col="o_totalprice",
        completed_col="__absent__",
        now=ORDERS_NOW,
    )


# ---------------------------------------------------------------------------
# §2.1/§2.6 scans + sorts + pagination
# ---------------------------------------------------------------------------


@query(
    "s2_scan_ordered",
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,"
    " o_orderpriority FROM orders ORDER BY o_orderdate DESC",
)
def q_s2(spark, sf_dir):
    """S2/O1 — full scan ordered newest-first (etl_job_repository.cpp:136-158)."""
    return R.order_limit(
        load_table(spark, sf_dir, "orders"), [F.col("o_orderdate").desc()]
    )


@query(
    "o2_topn",
    "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders"
    " ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
)
def q_o2(spark, sf_dir):
    """O1+O2 — top-N with deterministic tiebreak; Spark plans this as a
    distributed TakeOrderedAndProject, not a global sort."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return R.order_limit(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey")], limit=25
    )


@query(
    "o3_pagination",
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
    " ORDER BY o_orderkey LIMIT 100 OFFSET 200",
)
def q_o3(spark, sf_dir):
    """O3 — offset+limit pagination (log_file_manager.hpp:55-56)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return R.order_limit(orders, ["o_orderkey"], limit=100, offset=200)


# ---------------------------------------------------------------------------
# §2.2 filters
# ---------------------------------------------------------------------------


@query("p3_key_lookup", "SELECT * FROM lineitem WHERE l_orderkey = 42")
def q_p3(spark, sf_dir):
    """P3 — equality filter by key (etl_job_repository.cpp:112); pushed to
    the parquet scan (row-group min/max pruning)."""
    return R.filter_eq(load_table(spark, sf_dir, "lineitem"), "l_orderkey", 42)


@query("p4_filter_status", "SELECT * FROM orders WHERE o_orderstatus = 'P'")
def q_p4(spark, sf_dir):
    """P4 — status equality (etl_job_repository.cpp:177-190)."""
    return R.filter_eq(load_table(spark, sf_dir, "orders"), "o_orderstatus", "P")


@query(
    "p6_filter_inlist",
    "SELECT * FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
)
def q_p6(spark, sf_dir):
    """P6 — IN-list (active jobs shape, etl_job_repository.cpp:337-351)."""
    return R.filter_in(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", ["1-URGENT", "2-HIGH"]
    )


@query(
    "p7_range_filter",
    "SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'"
    " AND ts <= TIMESTAMP '2024-01-20 00:00:00'",
)
def q_p7(spark, sf_dir):
    """P7 — inclusive timestamp range (request_handler.cpp:1226-1249)."""
    return R.filter_range(
        load_table(spark, sf_dir, "events"),
        "ts",
        "2024-01-10 00:00:00",
        "2024-01-20 00:00:00",
    )


@query(
    "p8_valid_sessions",
    "SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'"
    " AND event_type <> 'error'",
)
def q_p8(spark, sf_dir):
    """P8 — expiry + validity filter (session_repository.cpp:189):
    expires_at≥now AND is_valid, mapped onto (ts, event_type≠error)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-15 00:00:00"))
        & (F.col("event_type") != "error")
    )


@query(
    "p12_substring_search",
    "SELECT doc_id, lang, source, n_chars FROM documents"
    " WHERE contains(text, 'merge join')",
)
def q_p12(spark, sf_dir):
    """P12 — substring search (log_file_manager.cpp:699-713)."""
    docs = load_table(spark, sf_dir, "documents")
    return R.search_substring(docs, "text", "merge join").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "p13_regex_search",
    "SELECT doc_id, lang, n_chars FROM documents"
    " WHERE regexp_matches(text, 'scan\\s+(merge|sort)')",
)
def q_p13(spark, sf_dir):
    """P13 — regex search (log_file_manager.hpp:54)."""
    docs = load_table(spark, sf_dir, "documents")
    return R.search_regex(docs, "text", r"scan\s+(merge|sort)").select(
        "doc_id", "lang", "n_chars"
    )


# ---------------------------------------------------------------------------
# §2.3 joins (J1-J5 shapes on the star schema)
# ---------------------------------------------------------------------------


@query(
    "j1_events_users",
    "SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment"
    " FROM events e JOIN customer c ON e.user_id = c.c_custkey",
)
def q_j1(spark, sf_dir):
    """J1 — sessions⋈users (init.sql:17) as events⋈customer; the user dim
    broadcasts (no shuffle of the fact side)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return J.join_broadcast_dim(
        ev, cust, on=ev.user_id == cust.c_custkey
    ).select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")


@query(
    "j2_fact_dim_broadcast",
    "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, p.p_brand, p.p_type"
    " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey",
)
def q_j2(spark, sf_dir):
    """J2 — job_logs⋈etl_jobs with small dim broadcast (init.sql:70-78)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return J.join_broadcast_dim(
        li, part, on=li.l_partkey == part.p_partkey
    ).select("l_orderkey", "l_linenumber", "l_quantity", "p_brand", "p_type")


@query(
    "j3_left_join_rollup",
    """
    SELECT o.o_orderkey, o.o_orderstatus,
           COALESCE(l.li_count, 0)::BIGINT AS li_count,
           COALESCE(l.sum_qty, 0.0) AS sum_qty
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, COUNT(*)::BIGINT AS li_count,
               SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
)
def q_j3(spark, sf_dir):
    """J3 — left join monitoring→jobs (job_monitor_service.cpp:226-263):
    pre-aggregate the fact side before joining (shuffle carries one row per
    key, not raw lineitems)."""
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("li_count"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )
    return (
        J.join_fact_fact(
            orders, li, on=orders.o_orderkey == li.l_orderkey, how="left"
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce(F.col("li_count"), F.lit(0)).cast("long").alias("li_count"),
            F.coalesce(F.col("sum_qty"), F.lit(0.0)).alias("sum_qty"),
        )
    )


@query(
    "j4_anti_join",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS"
    " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q_j4(spark, sf_dir):
    """J4 — NOT-EXISTS gate (user_repository.cpp:214) as left-anti."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return J.anti_join(cust, orders, on=cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "c_name"
    )


@query(
    "j5_semi_join",
    "SELECT c_custkey, c_name FROM customer c WHERE EXISTS"
    " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q_j5(spark, sf_dir):
    """J1 probe shape — semi join (session_repository.cpp:104)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return J.semi_join(cust, orders, on=cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "c_name"
    )


@query(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           -- prices are 2dp (disc_price 4dp) per row, so cent/0.1-mille
           -- integer sums are exact and accumulation-order-independent;
           -- a raw SUM(double) lands within ulps of a representable
           -- grid boundary and its ROUND is then fold-order-dependent
           SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS HUGEINT))::DOUBLE
               / 100.0 AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                    AS HUGEINT))::DOUBLE / 10000.0 AS sum_disc_price,
           {sql_grid_mean("l_quantity")} AS avg_qty,
           {sql_grid_mean("l_extendedprice")} AS avg_price,
           {sql_grid_mean("l_discount")} AS avg_disc,
           COUNT(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q_tpch_q1(spark, sf_dir):
    """ΔJ/A — TPC-H Q1 shape: the canonical wide-agg scan. Map-side partial
    aggregation → 6-group shuffle. Money sums ride exact integer cent
    grids and the means are 9dp-grid sums (see the oracle note) so every
    double in the output is fold-order-independent."""
    li = load_table(spark, sf_dir, "lineitem")

    def cents_sum(c, scale):
        g = F.floor(c * scale + F.lit(0.5)).cast("decimal(38,0)")
        return F.sum(g).cast("double") / scale

    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            cents_sum(F.col("l_extendedprice"), 100.0).alias(
                "sum_base_price"
            ),
            cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000.0
            ).alias("sum_disc_price"),
            grid_mean(F.col("l_quantity")).alias("avg_qty"),
            grid_mean(F.col("l_extendedprice")).alias("avg_price"),
            grid_mean(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    f"""
    SELECT o.o_orderkey,
           {sql_grid_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    bench=True,
)
def q_tpch_q3(spark, sf_dir):
    """ΔJ — TPC-H Q3 shape: dim-filtered fact-fact join + group. customer
    broadcasts; orders⋈lineitem sort-merges with AQE."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00")
    )
    joined = J.join_fact_fact(
        J.join_broadcast_dim(orders, cust, on=orders.o_custkey == cust.c_custkey),
        li,
        on=orders.o_orderkey == li.l_orderkey,
    )
    return joined.groupBy("o_orderkey", "o_orderdate").agg(
        grid_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("revenue")
    ).select("o_orderkey", "revenue", "o_orderdate")


@query(
    "tpch_q5_region_revenue",
    f"""
    SELECT n.n_name,
           {sql_grid_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    bench=True,
)
def q_tpch_q5(spark, sf_dir):
    """ΔJ — TPC-H Q5 shape: dim-chain (region→nation→customer broadcast)
    into the fact-fact join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
    )
    joined = (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return joined.groupBy("n_name").agg(
        grid_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_count_by_status",
    "SELECT o_orderstatus, COUNT(*)::BIGINT AS cnt FROM orders GROUP BY o_orderstatus",
)
def q_a1(spark, sf_dir):
    """A1 — one-pass status counts (request_handler.cpp:1526-1548 does 4
    scans; one groupBy replaces them)."""
    return count_by(load_table(spark, sf_dir, "orders"), "o_orderstatus")


@query(
    "a2_type_hour_counts",
    "SELECT event_type, date_trunc('hour', ts) AS hour_start,"
    " COUNT(*)::BIGINT AS cnt FROM events GROUP BY event_type, date_trunc('hour', ts)",
)
def q_a2(spark, sf_dir):
    """A2 — component×level counts over time (log_file_manager.cpp:1547-1586)
    mapped to event_type×hour."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hour_start", F.date_trunc("hour", F.col("ts"))
    )
    return count_by(ev, "event_type", "hour_start")


_METRIC_MAP_SQL = """
    SELECT l_returnflag,
           l_quantity                                   AS records_processed,
           CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END
                                                        AS records_failed,
           l_quantity - CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END
                                                        AS records_successful,
           FLOOR(l_extendedprice)                       AS bytes_processed,
           l_suppkey * 100                              AS execution_time_ms,
           l_linenumber                                 AS batches,
           l_discount * 100.0                           AS rate,
           l_extendedprice                              AS peak_memory,
           l_tax * 100.0                                AS peak_cpu
    FROM lineitem
"""


def _metric_mapped(spark, sf_dir):
    """Map lineitem onto the JobMetrics column set (FIXTURES.md §1) so the
    A3 rollup formulas run on driver data. rate has genuine zeros
    (l_discount=0 rows) to exercise the >0 exclusion."""
    li = load_table(spark, sf_dir, "lineitem")
    failed = F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)
    return li.select(
        "l_returnflag",
        F.col("l_quantity").alias("records_processed"),
        failed.alias("records_failed"),
        (F.col("l_quantity") - failed).alias("records_successful"),
        F.floor(F.col("l_extendedprice")).alias("bytes_processed"),
        (F.col("l_suppkey") * 100).alias("execution_time_ms"),
        F.col("l_linenumber").alias("batches"),
        (F.col("l_discount") * 100.0).alias("rate"),
        F.col("l_extendedprice").alias("peak_memory"),
        (F.col("l_tax") * 100.0).alias("peak_cpu"),
    )


@query(
    "a3_metric_rollup_by_group",
    f"""
    WITH m AS ({_METRIC_MAP_SQL}),
    agg AS (
        SELECT l_returnflag,
               CAST(SUM(records_processed) AS BIGINT) AS sum_records_processed,
               CAST(SUM(records_successful) AS BIGINT) AS sum_records_successful,
               CAST(SUM(records_failed) AS BIGINT) AS sum_records_failed,
               CAST(SUM(bytes_processed) AS BIGINT) AS sum_bytes_processed,
               CAST(SUM(execution_time_ms) AS BIGINT) AS sum_execution_time_ms,
               CAST(SUM(batches) AS BIGINT) AS sum_batches,
               MAX(peak_memory) AS max_peak_memory,
               MAX(peak_cpu) AS max_peak_cpu,
               {sql_grid_mean("CASE WHEN rate > 0 THEN rate END")}
                   AS avg_rate_positive
        FROM m GROUP BY l_returnflag
    )
    SELECT l_returnflag, sum_records_processed, sum_records_successful,
           sum_records_failed, sum_bytes_processed, sum_execution_time_ms,
           sum_batches, max_peak_memory, max_peak_cpu,
           avg_rate_positive,
           ROUND(CASE WHEN sum_batches > 0
                 THEN sum_records_processed / sum_batches ELSE 0.0 END, 6)
               AS avg_batch_size,
           ROUND(CASE WHEN sum_execution_time_ms / 1000.0 > 0
                 THEN sum_records_processed / (sum_execution_time_ms / 1000.0)
                 ELSE 0.0 END, 6) AS processing_rate,
           ROUND(CASE WHEN sum_records_processed > 0
                 THEN 100.0 * sum_records_failed / sum_records_processed
                 ELSE 0.0 END, 6) AS error_rate,
           ROUND(CASE WHEN sum_execution_time_ms / 1000.0 > 0
                 THEN (sum_bytes_processed / 1048576.0)
                      / (sum_execution_time_ms / 1000.0)
                 ELSE 0.0 END, 6) AS throughput_mbps
    FROM agg
    """,
    bench=True,
)
def q_a3(spark, sf_dir):
    """A3/A5 — aggregateMetrics rollup grouped by type
    (job_monitor_service.cpp:1292-1385, 491-512): SUM counters, MAX peaks,
    AVG(rate>0), derived guarded ratios."""
    rolled = metric_rollup(_metric_mapped(spark, sf_dir), group_cols=("l_returnflag",))
    return rolled.select(
        "l_returnflag",
        "sum_records_processed",
        "sum_records_successful",
        "sum_records_failed",
        "sum_bytes_processed",
        "sum_execution_time_ms",
        "sum_batches",
        "max_peak_memory",
        "max_peak_cpu",
        "avg_rate_positive",
        F.round("avg_batch_size", 6).alias("avg_batch_size"),
        F.round("processing_rate", 6).alias("processing_rate"),
        F.round("error_rate", 6).alias("error_rate"),
        F.round("throughput_mbps", 6).alias("throughput_mbps"),
    )


@query(
    "a7_avg_positive",
    f"SELECT event_type, "
    f"{sql_grid_mean('CASE WHEN value > 0 THEN value END')}"
    f" AS avg_value_positive FROM events GROUP BY event_type",
)
def q_a7(spark, sf_dir):
    """A7/A8 — AVG with >0 exclusion (job_monitor_service.cpp:540-606);
    grid mean, see operators.aggregates.avg_positive."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        avg_positive(F.col("value")).alias("avg_value_positive")
    )


@query(
    "a9_benchmarks_minmax",
    """
    SELECT event_type,
           MIN(CASE WHEN value > 0 THEN value END) AS worst_value,
           MAX(CASE WHEN value > 0 THEN value END) AS best_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q_a9(spark, sf_dir):
    """A9 — min/max benchmark scan with >0 gating
    (job_monitor_service.cpp:608-665)."""
    ev = load_table(spark, sf_dir, "events")
    pos = F.when(F.col("value") > 0, F.col("value"))
    return ev.groupBy("event_type").agg(
        F.min(pos).alias("worst_value"),
        F.max(pos).alias("best_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "a11_derived_indicators",
    f"""
    WITH m AS ({_METRIC_MAP_SQL}),
    keyed AS (
        SELECT m.*,
               execution_time_ms / 1000.0 AS sec,
               peak_memory AS memory_usage, peak_cpu AS cpu_usage
        FROM m
    ),
    ind AS (
        SELECT records_processed, records_failed,
            CASE WHEN sec > 0 THEN records_processed / sec ELSE 0.0 END
                AS processing_rate,
            CASE WHEN records_processed > 0
                 THEN 100.0 * records_failed / records_processed
                 ELSE 0.0 END AS error_rate,
            CASE WHEN sec > 0 THEN (bytes_processed / 1048576.0) / sec
                 ELSE 0.0 END AS throughput_mbps,
            CASE WHEN memory_usage > 0
                 THEN records_processed / (memory_usage / 1048576.0)
                 ELSE 0.0 END AS memory_efficiency,
            CASE WHEN cpu_usage > 0 THEN records_processed / cpu_usage
                 ELSE 0.0 END AS cpu_efficiency
        FROM keyed
    )
    SELECT records_processed, records_failed,
           FLOOR(processing_rate * 1000000.0 + 0.5) / 1000000.0 AS processing_rate,
           FLOOR(error_rate * 1000000.0 + 0.5) / 1000000.0 AS error_rate,
           FLOOR(throughput_mbps * 1000000.0 + 0.5) / 1000000.0 AS throughput_mbps,
           FLOOR(memory_efficiency * 1000000.0 + 0.5) / 1000000.0 AS memory_efficiency,
           FLOOR(cpu_efficiency * 1000000.0 + 0.5) / 1000000.0 AS cpu_efficiency,
           COALESCE(FLOOR((
               CASE WHEN processing_rate > 0
                    THEN LEAST(1.0, processing_rate / 1000.0) ELSE 0.0 END
             + CASE WHEN records_processed > 0 THEN (100.0 - error_rate) / 100.0
                    ELSE 0.0 END
             + CASE WHEN memory_efficiency > 0
                    THEN LEAST(1.0, memory_efficiency / 1000.0) ELSE 0.0 END
             + CASE WHEN cpu_efficiency > 0
                    THEN LEAST(1.0, cpu_efficiency / 100.0) ELSE 0.0 END
           ) / NULLIF(
               (processing_rate > 0)::INT + (records_processed > 0)::INT
             + (memory_efficiency > 0)::INT + (cpu_efficiency > 0)::INT, 0)
           * 1000000.0 + 0.5) / 1000000.0, 0.0) AS efficiency_score
    FROM ind
    """,
)
def q_a11(spark, sf_dir):
    """A11+A13 — per-row derived indicators with divide-by-zero guards and
    the clamped composite score (job_monitoring_models.cpp:160-209,
    285-319)."""
    m = _metric_mapped(spark, sf_dir).withColumn(
        "memory_usage", F.col("peak_memory")
    ).withColumn("cpu_usage", F.col("peak_cpu"))
    ind = derived_indicators(
        m,
        records_col="records_processed",
        failed_col="records_failed",
        ms_col="execution_time_ms",
        bytes_col="bytes_processed",
        mem_col="memory_usage",
        cpu_col="cpu_usage",
    )
    return ind.select(
        "records_processed",
        "records_failed",
        round_half_up(F.col("processing_rate")).alias("processing_rate"),
        round_half_up(F.col("error_rate")).alias("error_rate"),
        round_half_up(F.col("throughput_mbps")).alias("throughput_mbps"),
        round_half_up(F.col("memory_efficiency")).alias("memory_efficiency"),
        round_half_up(F.col("cpu_efficiency")).alias("cpu_efficiency"),
        round_half_up(F.col("efficiency_score")).alias("efficiency_score"),
    )


@query(
    "a16_percentiles",
    "SELECT ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,"
    " ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95 FROM orders",
)
def q_a16(spark, sf_dir):
    """A16 — exact interpolated percentile (performance_monitor.hpp:239-255)."""
    return load_table(spark, sf_dir, "orders").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
    )


@query(
    "a17_count_scalar",
    "SELECT COUNT(*)::BIGINT AS cnt FROM orders WHERE o_totalprice > 100000",
)
def q_a17(spark, sf_dir):
    """A17 — filtered COUNT(*) (user_repository.cpp:214)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_totalprice") > 100000).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "agg_rollup_hierarchy",
    "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,"
    " COUNT(*)::BIGINT AS cnt FROM lineitem"
    " GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def q_rollup(spark, sf_dir):
    """Extension (SURVEY §2.4 note) — ROLLUP grouping sets for the fixture
    hierarchy shapes."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------


@query(
    "w1_running_peak",
    """
    SELECT event_id, user_id, ts, value,
           MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS peak_value
    FROM events
    """,
)
def q_w1(spark, sf_dir):
    """W1 — running peak per entity (job_monitoring_models.cpp:202-208)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("peak_value", F.max("value").over(w))


@query(
    "w2_first_error_time",
    "SELECT user_id, MIN(CASE WHEN event_type = 'error' THEN ts END)"
    " AS first_error_ts FROM events GROUP BY user_id",
)
def q_w2(spark, sf_dir):
    """W2 — time-to-first-error, set once per entity
    (job_monitoring_models.cpp:211-220)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias(
            "first_error_ts"
        )
    )


@query(
    "w3_recent_ring_buffer",
    """
    SELECT event_id, user_id, ts, event_type FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) <= 5
    """,
)
def q_w3(spark, sf_dir):
    """W3/W4 — keep-last-N ring buffer (job_monitor_service.hpp:166,
    recent_logs TEXT[] init.sql:64)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    return keep_last_n(ev, "user_id", "ts", 5, "event_id")


@query(
    "w5_ewma",
    """
    SELECT user_id,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.1 * x + 0.9 * acc), 6) AS ewma
    FROM events GROUP BY user_id
    """,
)
def q_w5(spark, sf_dir):
    """W5/A15 — EWMA α=0.1 (performance_monitor.hpp:378-392); sequential
    fold per key, distributed across keys."""
    ev = load_table(spark, sf_dir, "events")
    out = ewma_per_key(ev, "user_id", "ts", "event_id", "value", alpha=0.1)
    return out.select("user_id", F.round("ewma", 6).alias("ewma"))


@query(
    "st7_progress_throttle",
    """
    SELECT event_id, user_id, ts, value FROM (
        SELECT event_id, user_id, ts, value,
               LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_value
        FROM events
    ) WHERE prev_value IS NULL OR ABS(value - prev_value) >= 50
    """,
)
def q_st7(spark, sf_dir):
    """ST7 — progress-update throttling: emit only on change ≥ threshold
    (job_monitor_service.hpp:167-168), batch-replayed via lag."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    d = delta_vs_previous(ev, "user_id", "ts", "event_id", "value", out="delta")
    return d.filter(F.col("delta").isNull() | (F.abs(F.col("delta")) >= 50)).drop(
        "delta"
    )


@query(
    "w_moving_avg",
    """
    SELECT event_id, user_id, ts,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
               AS moving_avg
    FROM events
    """,
)
def q_moving_avg(spark, sf_dir):
    """Extension — bounded sliding mean (the metrics-history window shape,
    job_monitor_service.hpp:150-158). Raw-AVG exemption (b): the 4-row
    frame is pinned by ORDER BY (ts, event_id) — both engines accumulate
    the same few doubles in the same order, so no integer grid is
    needed."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts", F.round(F.avg("value").over(w), 6).alias("moving_avg")
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@query(
    "setop_union_distinct",
    """
    SELECT event_id, user_id, event_type FROM events WHERE value > 150
    UNION
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'error'
    """,
)
def q_union(spark, sf_dir):
    """§2.7 — union of entity sets with dedup
    (job_monitor_service.cpp:495-509)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 150).select("event_id", "user_id", "event_type")
    b = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "event_type"
    )
    return a.union(b).distinct()


@query(
    "setop_intersect",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def q_intersect(spark, sf_dir):
    """§2.7 extension — INTERSECT."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query(
    "setop_except",
    """
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def q_except(spark, sf_dir):
    """§2.7 extension — EXCEPT."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)


@query(
    "agg_cube_status_priority",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*)::BIGINT AS cnt,"
    f" {sql_grid_sum('o_totalprice', 6)} AS sum_price,"
    " GROUPING(o_orderstatus)::INT AS g_status,"
    " GROUPING(o_orderpriority)::INT AS g_priority"
    " FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",
)
def q_cube(spark, sf_dir):
    """Extension (SURVEY §2.4 note) — CUBE grouping sets: every margin of
    the status × priority cross-tab in one pass (the ROLLUP sibling,
    agg_rollup_hierarchy, covers the hierarchy shape). GROUPING flags
    disambiguate NULL-as-total from NULL-as-value."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        grid_sum(F.col("o_totalprice"), 6).alias("sum_price"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


# ---------------------------------------------------------------------------
# S8 — cache warm-up key selection (the reference's last named SELECT)
# ---------------------------------------------------------------------------

_CACHE_WARMUP_ORACLE = """
WITH acc AS (
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS key_name,
           MAX(event_type) AS data_type,
           COUNT(*)::BIGINT AS access_count
    FROM events GROUP BY user_id
)
SELECT key_name, data_type, access_count
FROM acc
ORDER BY access_count DESC, key_name
LIMIT 20
"""


@query("s8_cache_warmup_keys", _CACHE_WARMUP_ORACLE)
def q_cache_warmup_keys(spark, sf_dir):
    """S8 cache warm-up: the most-accessed cache keys with their type,
    for preloading on startup — the reference's cache_manager.cpp:456-457
    ``SELECT DISTINCT key_name, data_type FROM cache_access_log ORDER BY
    access_count DESC LIMIT n``, modeled over the events fixture (key =
    the user the entry caches, access count = the key's event volume,
    data_type = a deterministic representative event type). One
    partial-combined aggregate to the |keys| relation, then a top-k
    TakeOrdered (no global sort); the key tie-break pins the selected
    set under equal counts."""
    ev = load_table(spark, sf_dir, "events")
    acc = ev.groupBy("user_id").agg(
        F.max("event_type").alias("data_type"),
        F.count(F.lit(1)).alias("access_count"),
    )
    return (
        acc.select(
            F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias(
                "key_name"
            ),
            "data_type",
            "access_count",
        )
        .orderBy(F.col("access_count").desc(), "key_name")
        .limit(20)
    )
