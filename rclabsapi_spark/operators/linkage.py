"""Record linkage and co-occurrence mining: blocked fuzzy matching
(edit-distance pairs within blocking keys) and market-basket pair
support/lift.

Reference parity: the reference deduplicates and cross-references
entities with exact keys only (user/session lookups,
database_manager.cpp's unique-constraint upserts); fuzzy linkage is the
standard extension once entity names arrive from multiple systems with
typos. Basket mining extends the A-series rollups
(job_monitoring_models.cpp) from "how often does X occur" to "what
co-occurs with X".

Scale posture:

- Fuzzy matching NEVER does the all-pairs cross join. Candidates come
  from equality on a blocking key (shuffle on the key), oversized blocks
  are dropped against a ``max_block`` cap (the same default-on guard as
  LSH's ``max_bucket_size``), and the quadratic pair-gen is Σ block²
  by construction. Edit distance runs JVM-side (``levenshtein``) on
  candidates only.
- Basket pair-gen is the same shape: self-join within basket id, basket
  size capped, support counts partial-aggregate before the pair shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rclabsapi_spark.functions.scalars import round_half_up


def blocked_fuzzy_pairs(
    df: DataFrame,
    *,
    key_col: str,
    name_col: str,
    block_col,
    max_dist: int = 1,
    max_block: int = 1000,
) -> DataFrame:
    """Candidate duplicate pairs by edit distance within blocking keys:
    all (a, b) with ``a.key < b.key``, equal block, block size ≤
    ``max_block``, and ``levenshtein(a.name, b.name) ≤ max_dist``.

    Classic blocked record linkage (sorted-neighborhood family): recall
    is bounded by the blocking key — a pair whose names differ outside
    the blocked positions is not generated, which is the documented
    tradeoff that makes the operator linear-ish instead of n². Pair work
    is Σ block² with oversized blocks dropped (cap mirrored in the
    oracle), so one hot key cannot go quadratic."""
    w_b = Window.partitionBy("block")
    base = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(name_col).alias("name"),
            block_col.alias("block"),
        )
        .withColumn("block_n", F.count(F.lit(1)).over(w_b))
        .filter(F.col("block_n") <= max_block)
        .drop("block_n")
    )
    a, b = base.alias("a"), base.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    name_len = F.greatest(F.length("a.name"), F.length("b.name"))
    return (
        a.join(b, "block")
        .filter(F.col("a.key") < F.col("b.key"))
        .filter(dist <= max_dist)
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            dist.cast("long").alias("lev_dist"),
            round_half_up(
                1.0 - dist.cast("double") / name_len.cast("double")
            ).alias("name_sim"),
        )
    )


def basket_pair_support(
    items: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    k: int = 20,
    max_basket: int = 50,
) -> DataFrame:
    """Top-k co-occurring item pairs across baskets with support and
    lift: support_ab = #baskets containing both, lift = support_ab·N /
    (support_a·support_b).

    The Apriori-style first step (frequent 2-itemsets), kept linear:
    baskets are deduped to distinct (basket, item), oversized baskets
    dropped against ``max_basket`` (pair work is Σ basket² — the cap is
    the quadratic guard), and the pair self-join shuffles once on the
    basket id. Item supports and N are broadcast-sized aggregates; lift
    is per-row arithmetic on exact counts. Deterministic top-k:
    support desc, then item pair lexicographic."""
    distinct = items.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    w_basket = Window.partitionBy("basket")
    # cached: four consumers (both pair-join sides, item supports, N) —
    # without it each re-runs the fact dedup
    capped = (
        distinct.withColumn("basket_n", F.count(F.lit(1)).over(w_basket))
        .filter(F.col("basket_n") <= max_basket)
        .drop("basket_n")
        .cache()
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, "basket")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("support_ab"))
    )
    supports = capped.groupBy(F.col("item").alias("item")).agg(
        F.count(F.lit(1)).alias("support")
    )
    n_baskets = capped.agg(
        F.countDistinct("basket").alias("n_baskets")
    )
    sa = supports.select(
        F.col("item").alias("item_a"), F.col("support").alias("support_a")
    )
    sb = supports.select(
        F.col("item").alias("item_b"), F.col("support").alias("support_b")
    )
    lift = (
        F.col("support_ab").cast("double") * F.col("n_baskets").cast("double")
    ) / (F.col("support_a").cast("double") * F.col("support_b").cast("double"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "support_ab",
            "support_a",
            "support_b",
            round_half_up(lift).alias("lift"),
        )
        .orderBy(F.col("support_ab").desc(), "item_a", "item_b")
        .limit(k)
    )
