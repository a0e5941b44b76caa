"""Graph-kernel queries over relation-derived edge lists: triangle
census of the part co-order graph and PageRank over the event-type
transition graph. Implementations in operators/graph.py.

Oracle notes: the triangle oracle mirrors the degree orientation
exactly (same (degree, id) rank, same wedge order), so intermediate
relations match row-for-row, not just the final count. The PageRank
oracle unrolls the same three synchronous iterations as CTEs; per-node
in-sums are ≤|types| terms and the final ranks round at 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import sql_round_half_up
from rclabsapi_spark.operators.graph import pagerank, triangle_count
from rclabsapi_spark.registry import query

# ---------------------------------------------------------------------------
# Triangle count over the co-order part graph (support ≥ 2)
# ---------------------------------------------------------------------------

_EDGES_SQL = """
    SELECT item_a AS u, item_b AS v FROM (
        SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n
        FROM (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
              FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
              FROM lineitem) b
          ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2
    ) WHERE n >= 2
"""

_TRIANGLE_ORACLE = f"""
WITH e AS ({_EDGES_SQL}),
deg AS (
    SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
    ) GROUP BY 1
),
o AS (
    SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
                THEN u ELSE v END AS src,
           CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
                THEN v ELSE u END AS dst,
           CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
                THEN dv.deg ELSE du.deg END AS dst_deg
    FROM e
    JOIN deg du ON du.node = e.u
    JOIN deg dv ON dv.node = e.v
),
wedges AS (
    SELECT a.dst AS src, b.dst AS dst
    FROM o a JOIN o b ON a.src = b.src
    WHERE (a.dst_deg < b.dst_deg)
       OR (a.dst_deg = b.dst_deg AND a.dst < b.dst)
),
tri AS (
    SELECT COUNT(*)::BIGINT AS n_triangles
    FROM wedges w JOIN o ON w.src = o.src AND w.dst = o.dst
)
SELECT (SELECT COUNT(*) FROM deg)::BIGINT AS n_vertices,
       (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
       n_triangles
FROM tri
"""


@query("graph_triangles_coorder", _TRIANGLE_ORACLE, bench=True)
def q_triangles(spark, sf_dir, *, materialize=True):
    """Triangle census of the part co-order graph (parts linked when
    co-ordered in ≥2 baskets) — the clustering-structure audit for a
    co-occurrence graph. Degree-oriented wedge generation keeps
    per-vertex fan-out O(√m); two equi-joins, no cartesian anything.

    Edge derivation (r16): ONE collect_set per basket + in-bucket array
    pair-gen (the basket_pair_support shape) — the fact's dedup, and
    the pair generation, ride a single exchange on the basket id; the
    previous distinct + basket-keyed self-join spent three exchanges on
    the same 1.2M pairs. Baskets are ≤ tens of items (the co-order
    relation), so the per-row array is bounded; the pair aggregate then
    shuffles on (src, dst) as before. The edge set is byte-identical
    (sorted distinct items, i < j pairs, count ≥ 2), and it arrives
    already canonical — src < dst, distinct — so triangle_count skips
    its normalization dedup (``edges_canonical``).
    ``materialize=False`` exposes the pre-checkpoint plan for pins and
    the plan audit. operators/graph.py::triangle_count."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(
            F.col("l_orderkey").alias("basket"),
            F.col("l_partkey").alias("item"),
        )
        .groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("its"))
    )
    it = F.col("its")
    pair_structs = F.flatten(
        F.transform(
            it,
            lambda x, i: F.transform(
                F.slice(it, i + F.lit(2), F.size(it) - i - F.lit(1)),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    edges = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    return triangle_count(
        edges, materialize=materialize, edges_canonical=True
    )


# ---------------------------------------------------------------------------
# PageRank over the event-type transition graph
# ---------------------------------------------------------------------------

_SEQ_WINDOW = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"

_PAGERANK_ORACLE = f"""
WITH seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) {_SEQ_WINDOW} AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, COUNT(*)::BIGINT AS n
    FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
p AS (
    SELECT from_type, to_type,
           n::DOUBLE / (SUM(n) OVER (PARTITION BY from_type))::DOUBLE AS w
    FROM counts
),
nodes AS (
    SELECT from_type AS node FROM p
    UNION SELECT to_type AS node FROM p
),
nn AS (SELECT COUNT(*)::DOUBLE AS nn FROM nodes),
r0 AS (SELECT node, 1.0 / nn AS r FROM nodes CROSS JOIN nn),
c1 AS (SELECT to_type AS node, SUM(r * w) AS s
       FROM p JOIN r0 ON p.from_type = r0.node GROUP BY 1),
r1 AS (SELECT nodes.node, 0.15 / nn + 0.85 * COALESCE(s, 0.0) AS r
       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.node = nodes.node),
c2 AS (SELECT to_type AS node, SUM(r * w) AS s
       FROM p JOIN r1 ON p.from_type = r1.node GROUP BY 1),
r2 AS (SELECT nodes.node, 0.15 / nn + 0.85 * COALESCE(s, 0.0) AS r
       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.node = nodes.node),
c3 AS (SELECT to_type AS node, SUM(r * w) AS s
       FROM p JOIN r2 ON p.from_type = r2.node GROUP BY 1),
r3 AS (SELECT nodes.node, 0.15 / nn + 0.85 * COALESCE(s, 0.0) AS r
       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.node = nodes.node)
SELECT node, {sql_round_half_up("r", 6)} AS pagerank FROM r3
"""


@query("graph_pagerank_transitions", _PAGERANK_ORACLE)
def q_pagerank(spark, sf_dir, *, materialize=True):
    """PageRank over the first-order event-transition graph (weights =
    row-normalized transition probabilities from path_transitions):
    which state attracts the flow. Three synchronous power iterations
    as a driver loop of broadcast join + per-destination aggregate over
    the |types|² relation. operators/graph.py::pagerank."""
    from rclabsapi_spark.operators.analytics import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    edges = transition_matrix(ev).select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        F.col("p").alias("w"),
    )
    return pagerank(edges, iters=3, damping=0.85, materialize=materialize)
