"""Record-linkage and co-occurrence queries: blocked fuzzy name
matching over customers, and market-basket part pairs over lineitem.

Reference parity: the reference joins entities on exact keys only
(database_manager.cpp upserts; user/session lookups) — fuzzy linkage
and co-occurrence are the analytics a warehouse grows once entity
names/attributes arrive dirty from several sources. Implementations in
operators/linkage.py; oracles mirror the same blocking keys and caps so
the candidate sets match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators.linkage import (
    basket_pair_support,
    blocked_fuzzy_pairs,
)
from rclabsapi_spark.registry import query

# ---------------------------------------------------------------------------
# Blocked fuzzy matching: customer names within a digit-prefix block
# ---------------------------------------------------------------------------

# Customer names are 'Customer#' + 9 digits; blocking on all but the last
# two digits means candidates differ only in the final two characters —
# the classic sorted-neighborhood recall tradeoff, mirrored in the oracle.

_FUZZY_ORACLE = """
WITH base AS (
    SELECT c_custkey AS key, c_name AS name,
           substring(c_name, 1, length(c_name) - 2) AS block
    FROM customer
),
sized AS (
    SELECT *, COUNT(*) OVER (PARTITION BY block) AS block_n FROM base
),
subbed AS (
    -- blocks within the cap keep sub0 = 0 / sub1 = NULL (exact recall,
    -- rescue join drops on the null key); oversized blocks salt into
    -- ceil(size/cap) md5 sub-blocks INDEPENDENTLY under two salts —
    -- recall 1-(1-1/n_sub)^2 for 2x the capped work; each pair is
    -- emitted under its FIRST matching salt, so the two branches are
    -- disjoint and the union needs no DISTINCT (blocked_fuzzy_pairs)
    SELECT key, name, block,
           CASE WHEN block_n <= 1000 THEN CAST(0 AS BIGINT)
                ELSE CAST(concat('0x', substring(
                         md5('sub' || CAST(key AS VARCHAR)), 1, 8))
                     AS BIGINT)
                     % CAST(ceil(block_n / 1000.0) AS BIGINT)
           END AS sub0,
           CASE WHEN block_n <= 1000 THEN NULL
                ELSE CAST(concat('0x', substring(
                         md5('sub2' || CAST(key AS VARCHAR)), 1, 8))
                     AS BIGINT)
                     % CAST(ceil(block_n / 1000.0) AS BIGINT)
           END AS sub1
    FROM sized
)
SELECT a.key AS key_a, b.key AS key_b,
       levenshtein(a.name, b.name)::BIGINT AS lev_dist,
       FLOOR((1.0 - levenshtein(a.name, b.name)::DOUBLE /
              GREATEST(length(a.name), length(b.name))::DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS name_sim
FROM subbed a JOIN subbed b
  ON a.block = b.block AND a.sub0 = b.sub0 AND a.key < b.key
WHERE levenshtein(a.name, b.name) <= 1
UNION ALL
SELECT a.key AS key_a, b.key AS key_b,
       levenshtein(a.name, b.name)::BIGINT AS lev_dist,
       FLOOR((1.0 - levenshtein(a.name, b.name)::DOUBLE /
              GREATEST(length(a.name), length(b.name))::DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS name_sim
FROM subbed a JOIN subbed b
  ON a.block = b.block AND a.sub1 = b.sub1 AND a.sub0 <> b.sub0
 AND a.key < b.key
WHERE levenshtein(a.name, b.name) <= 1
"""


@query("link_fuzzy_names", _FUZZY_ORACLE, bench=True)
def q_fuzzy_names(spark, sf_dir):
    """Near-duplicate customer names by edit distance ≤ 1 inside
    drop-last-two-digits blocks. No all-pairs join: candidates come from
    (block, salt, sub-block) equality (one shuffle on the key),
    oversized blocks salt into ⌈size/cap⌉ md5 sub-blocks independently
    under TWO salts with the pairs unioned distinct — recall
    1−(1−1/n_sub)² for 2·size·cap bounded work instead of the pre-r13
    all-or-nothing drop — and levenshtein runs JVM-side on candidates
    only. operators/linkage.py::blocked_fuzzy_pairs."""
    cust = load_table(spark, sf_dir, "customer")
    block = F.expr("substring(c_name, 1, length(c_name) - 2)")
    return blocked_fuzzy_pairs(
        cust,
        key_col="c_custkey",
        name_col="c_name",
        block_col=block,
        max_dist=1,
        max_block=1000,
    )


# ---------------------------------------------------------------------------
# Market-basket mining: co-ordered part pairs
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH distinct_items AS (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
capped AS (
    SELECT basket, item FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY basket) AS basket_n
        FROM distinct_items
    ) WHERE basket_n <= 50
),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS support_ab
    FROM capped a JOIN capped b
      ON a.basket = b.basket AND a.item < b.item
    GROUP BY 1, 2
),
supports AS (
    SELECT item, COUNT(*)::BIGINT AS support FROM capped GROUP BY 1
),
nb AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM capped)
SELECT item_a, item_b, support_ab,
       sa.support AS support_a, sb.support AS support_b,
       FLOOR((support_ab::DOUBLE * n_baskets::DOUBLE)
             / (sa.support::DOUBLE * sb.support::DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS lift
FROM pairs
JOIN supports sa ON pairs.item_a = sa.item
JOIN supports sb ON pairs.item_b = sb.item
CROSS JOIN nb
ORDER BY support_ab DESC, item_a, item_b
LIMIT 20
"""


@query("mba_pair_lift", _BASKET_ORACLE, bench=True)
def q_basket_pairs(spark, sf_dir):
    """Top-20 co-ordered part pairs with support and lift (frequent
    2-itemsets). Baskets dedupe to distinct (order, part), the size cap
    guards the Σ basket² pair-gen, the pair self-join shuffles once on
    the order key, and supports/N broadcast back for per-row lift.
    operators/linkage.py::basket_pair_support."""
    li = load_table(spark, sf_dir, "lineitem")
    return basket_pair_support(
        li,
        basket_col="l_orderkey",
        item_col="l_partkey",
        k=20,
        max_basket=50,
    )
