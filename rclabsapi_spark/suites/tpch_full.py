"""Remaining TPC-H query shapes (ΔJ, SURVEY §2.3) — completes the
join/subquery surface beyond tpch_ext (q1/q3/q5/q6/q10/q14/q18 live there).

The driver testdata is a TPC-H *subset* (no partsupp, no l_commitdate /
l_receiptdate / l_shipmode / c_phone), so each query is adapted to the
available columns while preserving the structural shape that matters at
100 TB — the correlated scalar subquery (q2/q15/q17), EXISTS / NOT EXISTS
semi+anti pipeline (q4/q21/q22), multi-dim snowflake joins (q7/q8/q9),
aggregate-vs-global-threshold (q11), left-join histogram (q13),
count-distinct group (q16), and disjunctive pushdown (q19).

Scale notes common to all: dims (region/nation/part/supplier/customer at
TPC-H ratios) broadcast; fact-fact joins shuffle on the join key once and
reuse that partitioning for the following group-by where keys align;
aggregate-then-join ordering shrinks the shuffled side before the join
(q11/q15/q17/q20 pre-aggregate lineitem before touching dims).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import (
    grid_ratio,
    grid_sum,
    round_half_up,
    sql_grid_ratio,
    sql_grid_sum,
)
from rclabsapi_spark.registry import query

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q2_min_bal_supplier",
    """
    WITH supply AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name,
               MIN(e.s_acctbal) OVER (PARTITION BY p.p_partkey) AS min_bal
        FROM part p
        JOIN supply sp ON sp.l_partkey = p.p_partkey
        JOIN eu e ON e.s_suppkey = sp.l_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand WHERE s_acctbal = min_bal
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)
def q_tpch_q2(spark, sf_dir):
    """Q2 shape (adapted: supply relation = DISTINCT lineitem pairs standing
    in for partsupp; min s_acctbal standing in for min ps_supplycost): the
    correlated MIN subquery becomes a window-min over the part partition —
    one shuffle on p_partkey instead of a re-scan per part. Equality is on
    a *raw* column value (s_acctbal), so cross-engine double comparison is
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    supply = li.select("l_partkey", "l_suppkey").distinct()
    eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        part.join(supply, part.p_partkey == supply.l_partkey)
        .join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
        .withColumn(
            "min_bal", F.min("s_acctbal").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        cand.filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """Q4 shape (adapted: EXISTS predicate is l_returnflag='R' — the
    commit/receipt-date columns don't exist in the fixture): EXISTS compiles
    to a left-semi join; the quarter filter pushes to the orders scan so
    only ~1/26 of orders reach the semi probe."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_volume_shipping",
    f"""
    WITH v AS (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate)::BIGINT AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT supp_nation, cust_nation, l_year,
           {sql_grid_sum("volume", 4)} AS revenue
    FROM v GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    bench=True,
)
def q_tpch_q7(spark, sf_dir):
    """Q7 shape: two-nation trade volume. The only fact-fact join is
    lineitem⋈orders on orderkey; supplier/customer/nation all broadcast.
    The nation-pair disjunction can't prune either nation join alone, but
    each side IS prunable to the 2-nation set — done explicitly so the
    broadcast builds are 2 rows, not 25."""
    pair = ("NATION_1", "NATION_2")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(grid_sum(_rev(), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    f"""
    WITH v AS (
        SELECT EXTRACT(year FROM o.o_orderdate)::BIGINT AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           {sql_grid_ratio(
               "CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END",
               "volume", 6)} AS mkt_share
    FROM v GROUP BY o_year ORDER BY o_year
    """,
    bench=True,
)
def q_tpch_q8(spark, sf_dir):
    """Q8 shape: national market share inside a region. Part filter prunes
    the fact early (broadcast the filtered part dim into the lineitem scan
    stage); customer-side region restriction is a broadcast chain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    vol = _rev()
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(grid_ratio(target, vol, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate)::BIGINT AS o_year,
           {sql_grid_sum(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - 0.5 * p.p_retailprice * l.l_quantity", 4)} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    bench=True,
)
def q_tpch_q9(spark, sf_dir):
    """Q9 shape (adapted: cost term = 0.5·p_retailprice·l_quantity — there
    is no ps_supplycost without partsupp): profit by supplier nation and
    year over a name-substring part slice. The contains() filter can't use
    parquet stats, but it runs on the 2k-row broadcast dim, not the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(grid_sum(F.col("profit"), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_parts",
    """
    WITH val AS (
        -- per-part revenue on the 9dp integer grid (HUGEINT): the global
        -- 0.1% threshold gates row MEMBERSHIP, so the comparison must be
        -- exact integer arithmetic, not an accumulation-ordered double
        SELECT l.l_partkey,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                              * 1000000000.0 + 0.5) AS HUGEINT)) AS value_g
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_5', 'NATION_6')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey,
           FLOOR((value_g::DOUBLE / 1000000000.0) * 10000.0 + 0.5)
               / 10000.0 AS value
    FROM val
    WHERE value_g * 1000 > (SELECT SUM(value_g) FROM val)
    ORDER BY value DESC, l_partkey
    """,
)
def q_tpch_q11(spark, sf_dir):
    """Q11 shape (adapted: part value = revenue shipped by the nation
    group's suppliers, standing in for ps_supplycost·ps_availqty): per-key
    aggregate filtered against a global-aggregate threshold. The global sum
    re-aggregates the *already-reduced* per-part relation (cheap), then
    broadcasts one row — the fact is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(_rev() * 1000000000.0 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            ).alias("value_g")
        )
    )
    total = val.agg(F.sum("value_g").alias("total_g"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_g") * 1000 > F.col("total_g"))
        .select(
            "l_partkey",
            round_half_up(
                F.col("value_g").cast("double") / 1000000000.0, 4
            ).alias("value"),
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "tpch_q12_priority_lines",
    """
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus ORDER BY l.l_linestatus
    """,
)
def q_tpch_q12(spark, sf_dir):
    """Q12 shape (adapted: grouped by l_linestatus — no l_shipmode column):
    conditional counts over a fact-fact join; the year filter pushes to the
    lineitem scan, shrinking the shuffled side ~7×."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q13_customer_distribution",
    """
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey)::BIGINT AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    bench=True,
)
def q_tpch_q13(spark, sf_dir):
    """Q13 shape (adapted: the excluded-comment predicate becomes an
    order-priority exclusion *inside the join condition* — left-join rows
    that miss it still count the customer with c_count=0): order-count
    histogram. Two reductions; the second groups an already customer-sized
    relation. At 100 TB the first agg is the cost — count per custkey
    partial-combines map-side, so the shuffle carries (custkey, count)
    pairs, not order rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {sql_grid_sum("l_extendedprice * (1 - l_discount)", 4)}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark, sf_dir):
    """Q15 shape: top supplier by quarterly revenue — aggregate, take the
    scalar max of the aggregate, keep ties. Revenue is rounded *before* the
    max/equality so the cross-engine comparison is on identical values
    (accumulation-order ulps are squashed by the round). The max re-reads
    the supplier-sized aggregate, not the fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        grid_sum(_rev(), 4).alias("total_revenue")
    )
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_part_supplier_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < -900.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """Q16 shape (adapted: the supplier relation is DISTINCT suppliers per
    part from lineitem; the complaints exclusion is an acctbal predicate):
    count-distinct suppliers per part attribute triple, with a NOT-IN
    anti-join. The anti side is tiny (filtered suppliers) → broadcast
    anti-join, no extra shuffle; count_distinct shuffles (brand,type,size,
    suppkey) pairs after map-side dedup."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 14)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < -900.0
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_qty_revenue",
    f"""
    WITH pa AS (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_grid_sum("l.l_extendedprice", 4, denom=7.0)} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#2'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_threshold
    """,
)
def q_tpch_q17(spark, sf_dir):
    """Q17 shape: small-quantity order revenue — the classic correlated
    scalar AVG subquery, decorrelated into aggregate-then-join. The per-part
    threshold relation is part-sized (small) → broadcast back onto the fact,
    so the fact is scanned twice but shuffled zero times for the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    thresholds = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    pa = thresholds.withColumnRenamed("l_partkey", "pa_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(pa), li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(grid_sum(F.col("l_extendedprice"), 4, denom=7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q19_disjunctive",
    f"""
    SELECT {sql_grid_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    bench=True,
)
def q_tpch_q19(spark, sf_dir):
    """Q19 shape (adapted: container/shipmode terms dropped with the
    columns): disjunctive mixed-side predicate. The per-side implications
    are applied manually — part pruned to the 3-brand disjunction (builds a
    small broadcast), lineitem pre-filtered to quantity ∈ [1,30] (pushes to
    the scan) — then the full OR evaluates post-join. Catalyst keeps the
    residual OR; the manual pre-filters are what make the broadcast small
    at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    part = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 15))
    )
    qty = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#2")
         & F.col("p_size").between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#13")
           & F.col("p_size").between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#25")
           & F.col("p_size").between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(grid_sum(_rev(), 4).alias("revenue"))
    )


@query(
    "tpch_q20_excess_shipments",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
    WHERE s.s_suppkey IN (
        SELECT sh.l_suppkey FROM shipped sh
        JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE 'small%'
        WHERE sh.qty > 50.0
    )
    ORDER BY s_name
    """,
    bench=True,
)
def q_tpch_q20(spark, sf_dir):
    """Q20 shape (adapted: 'has excess availqty' becomes 'shipped > 50
    units of a small* part in 1997'): nested IN-subquery chain compiled as
    aggregate → broadcast-dim filter → semi-join into the supplier dim.
    The fact reduces to (partkey, suppkey) groups before any join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    shipped = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
    )
    qualifying = shipped.join(
        F.broadcast(part), shipped.l_partkey == part.p_partkey
    ).select("l_suppkey")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        WHERE l.l_returnflag = 'R'
    )
    SELECT s.s_name, COUNT(*)::BIGINT AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_9'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    bench=True,
)
def q_tpch_q21(spark, sf_dir):
    """Q21 shape (adapted: 'late' = l_returnflag='R' on a finished order —
    no receipt/commit dates): the EXISTS + NOT EXISTS pair over the same
    fact, i.e. a semi-join then an anti-join, both keyed on l_orderkey with
    a suppkey-inequality residual. All three lineitem branches shuffle on
    orderkey — AQE coalesces them into one exchange reuse; supplier/nation
    broadcast at the end onto the already-reduced row set."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.l2_orderkey)
            & (l1.l_suppkey != l2.l2_suppkey),
            "left_semi",
        ).join(
            l3,
            (l1.l_orderkey == F.col("l3_orderkey"))
            & (l1.l_suppkey != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_dormant_customers",
    """
    WITH pos AS (
        -- nano-grid mean/sum: balances are NOT a fixed-dp grid in the
        -- fixture, and raw SUM/AVG of doubles is accumulation-ordered;
        -- HUGEINT accumulator (≙ decimal(38,0)) — a BIGINT sum of 1e13
        -- per-row nanos wraps around ~1e6 rows, under the design scale
        SELECT SUM(CAST(FLOOR(c_acctbal * 1000000000.0 + 0.5) AS HUGEINT))::DOUBLE
                   / (COUNT(*) * 1000000000.0) AS avg_bal
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    )
    SELECT c.c_nationkey,
           COUNT(*)::BIGINT AS numcust,
           FLOOR((SUM(CAST(FLOOR(c.c_acctbal * 1000000000.0 + 0.5) AS HUGEINT))::DOUBLE
                  / 1000000000.0) * 10000.0 + 0.5) / 10000.0 AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      AND c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """,
)
def q_tpch_q22(spark, sf_dir):
    """Q22 shape (adapted: country-code prefix → nation-key set — there is
    no c_phone): above-average-balance customers with no orders at all.
    Scalar AVG broadcasts as a 1-row relation; the NOT EXISTS is an
    anti-join against the orders key projection (orderkey column pruned to
    o_custkey at the scan). The threshold mean and the per-nation balance
    sum go through 9dp-integer-grid sums (order-independent — a raw
    double AVG/SUM is accumulation-ordered, and the mean also gates a
    strict > filter, so one ulp could flip row membership)."""
    from rclabsapi_spark.functions.scalars import round_half_up

    nations = [1, 2, 3, 4, 5, 6, 7]
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(nations)
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    bal_nano = F.floor(
        F.col("c_acctbal") * 1000000000.0 + F.lit(0.5)
    ).cast("decimal(38,0)")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(bal_nano).cast("double")
            / (F.count(F.lit(1)) * 1000000000.0)
        ).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_half_up(
                F.sum(bal_nano).cast("double") / 1000000000.0, 4
            ).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
