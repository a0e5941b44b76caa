"""Extended TPC-H-shape bench queries (ΔJ, SURVEY §2.3) — the join/agg
shapes a 100 TB deployment of the engine would run constantly:

- q6  — pure scan-aggregate with tight pushed predicates (the "is the
        scan path fast" benchmark)
- q10 — wide 4-table join + top-k by aggregate
- q14 — fact⋈dim ratio aggregate (conditional sum / sum)
- q18 — having-filtered self-aggregate then fact join (group → semi shape)

All follow the engine's join strategy: dims broadcast, fact-fact
sort-merge under AQE, aggregates single-pass with partial combine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import (
    grid_ratio,
    grid_sum,
    sql_grid_ratio,
    sql_grid_sum,
)
from rclabsapi_spark.registry import query


@query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {sql_grid_sum("l_extendedprice * l_discount", 4)} AS revenue,
           COUNT(*)::BIGINT AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
)
def q_tpch_q6(spark, sf_dir):
    """Q6 shape: every predicate pushes to the parquet scan; the agg is a
    single partial-combined scalar — no shuffle of row data at all."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            grid_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_grid_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    bench=True,
)
def q_tpch_q10(spark, sf_dir):
    """Q10 shape: fact-fact join under broadcast dims, then top-k by the
    aggregate (TakeOrdered after the group shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            grid_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    f"""
    SELECT {sql_grid_ratio(
               "CASE WHEN p.p_type = 'PROMO'"
               " THEN l.l_extendedprice * (1 - l.l_discount)"
               " ELSE 0.0 END",
               "l.l_extendedprice * (1 - l.l_discount)",
               6, mult=100.0)} AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-02-01'
    """,
    bench=True,
)
def q_tpch_q14(spark, sf_dir):
    """Q14 shape: fact⋈broadcast-dim, conditional-ratio scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return joined.agg(
        grid_ratio(promo, rev, 6, mult=100.0).alias("promo_revenue_pct")
    )


@query(
    "tpch_q18_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    bench=True,
)
def q_tpch_q18(spark, sf_dir):
    """Q18 shape: aggregate-then-join. The HAVING pre-aggregate shrinks the
    fact side before the join (the order matters at scale: aggregate
    first, join the survivors)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    joined = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        joined.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
