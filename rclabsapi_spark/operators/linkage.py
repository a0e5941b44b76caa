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
  from equality on a blocking key (shuffle on the key); blocks over the
  ``max_block`` cap are salted into ⌈size/max_block⌉ md5 sub-blocks —
  independently per salt, pairs unioned disjointly across exactly TWO
  salts (r14; the pair arity is part of the contract, checked at
  entry) — so pair work inside an oversized block is ~2·size·max_block
  instead of size² and recall degrades gracefully to
  1−(1−1/n_sub)² (a pair is found iff both rows share a
  sub-block under at least one salt) rather than collapsing to zero
  when a head block ("J. Smith") crosses the cap. Edit distance runs
  JVM-side (``levenshtein``) on candidates only.
- Basket pair-gen is the same shape: self-join within basket id, basket
  size capped, support counts partial-aggregate before the pair shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    salts: tuple[str, str] = ("sub", "sub2"),
) -> DataFrame:
    """Candidate duplicate pairs by edit distance within blocking keys:
    all (a, b) with ``a.key < b.key``, equal block, equal sub-block
    under at least one salt, and ``levenshtein(a.name, b.name) ≤
    max_dist``.

    Classic blocked record linkage (sorted-neighborhood family): recall
    is bounded by the blocking key — a pair whose names differ outside
    the blocked positions is not generated, which is the documented
    tradeoff that makes the operator linear-ish instead of n².

    Cap semantics (r13, second-salt union r14): a block within
    ``max_block`` keeps a single sub-block 0, so its recall is exact. A
    block of size B > ``max_block`` is salted into n_sub =
    ⌈B/max_block⌉ md5 sub-blocks INDEPENDENTLY under two salts (pure
    functions of the key, mirrored in the oracle), and a pair is
    emitted iff both rows share a sub-block under AT LEAST ONE salt —
    within-block recall 1−(1−1/n_sub)² (~75% at n_sub=2, ~44% at
    n_sub=4, vs 1/n_sub single-salt) for 2·B·max_block pair work
    instead of B² — the head-block regime ("J. Smith") where dup mass
    concentrates degrades gracefully, never to zero, and the second
    salt doubles the (already linear) capped work, never the quadratic
    term.

    Exactly-once per pair WITHOUT an output-side exchange: each pair is
    emitted under its FIRST matching salt — the salt-0 join on
    (block, sub0), then a salt-1 rescue join on (block, sub1) filtered
    to ``a.sub0 != b.sub0`` — two disjoint branches unioned, so no
    distinct/dropDuplicates shuffle on the (potentially tens of
    millions of rows) pair relation. ``sub1`` is NULL for blocks
    within the cap, so the rescue join's input is EMPTY in the common
    no-oversized-block case and the second salt costs nothing there
    (equi-join null keys drop).

    Block sizes come from a partial-combining aggregate joined back
    (NOT a count-over-block window): a window would funnel the whole
    hot block through one task, and window skew is exactly what AQE
    cannot split — the size join and both pair joins stay
    AQE-skew-splittable, and every post-sub join group is ~max_block
    by construction.

    Cache lifetime (ADVICE r13): the subbed relation is cached so both
    pair-join sides reuse one materialization (the basket_pair_support
    multi-consumer pattern) instead of re-scanning the fact twice. The
    cache is owned by the RETURNED PLAN — it cannot be unpersisted
    here because nothing has run yet. Callers that invoke this
    repeatedly with different inputs in one long-lived session should
    unpersist between invocations (``spark.catalog.clearCache()`` or
    hold/unpersist their own cached input); otherwise superseded
    entries linger until LRU eviction — storage pressure only, never
    correctness.

    The union construction is a fixed PAIR of salts (ADVICE r14): the
    emission branches below hardcode a first-salt join plus one rescue
    join, so a 1-tuple would IndexError mid-plan and extra salts would
    be silently ignored while the docstring's recall formula implied
    otherwise — rejected loudly at entry instead."""
    if len(salts) != 2:
        raise ValueError(
            "blocked_fuzzy_pairs unions exactly two salted sub-blockings"
            f" (recall 1-(1-1/n_sub)^2); got {len(salts)} salts"
        )
    named = df.select(
        F.col(key_col).alias("key"),
        F.col(name_col).alias("name"),
        block_col.alias("block"),
    )
    sizes = named.groupBy("block").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    n_sub = F.ceil(F.col("block_n") / F.lit(float(max_block))).cast("long")

    def sub_for(salt: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(salt), F.col("key").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_sub
        )

    oversized = F.col("block_n") > max_block
    base = (
        named.join(sizes, "block")
        .select(
            "key",
            "name",
            "block",
            F.when(~oversized, F.lit(0).cast("long"))
            .otherwise(sub_for(salts[0]))
            .alias("sub0"),
            # NULL for in-cap blocks: the rescue join's equi-key drops
            # them, so the second salt is free in the common case
            F.when(oversized, sub_for(salts[1])).alias("sub1"),
        )
        .cache()
    )

    def emit(joined):
        dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
        name_len = F.greatest(F.length("a.name"), F.length("b.name"))
        return (
            joined.filter(F.col("a.key") < F.col("b.key"))
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

    a, b = base.alias("a"), base.alias("b")
    first = emit(a.join(b, ["block", "sub0"]))
    # rescue: pairs the first salt separated — disjoint from `first`
    # by the sub0 inequality, so the union is exactly-once per pair
    second = emit(
        a.join(b, ["block", "sub1"]).filter(
            F.col("a.sub0") != F.col("b.sub0")
        )
    )
    return first.unionByName(second)


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
    the quadratic guard; unlike fuzzy-name head blocks, an oversized
    basket is corrupt data, not concentrated signal, so all-or-nothing
    is the right contract here), and the pair self-join shuffles once
    on the basket id. Basket sizes come from a partial-combining
    aggregate semi-joined back, NOT a count-over-basket window — a
    window would funnel an adversarial mega-basket through one
    unsplittable task (the blocked_fuzzy_pairs r13 lesson); the size
    join is AQE-skew-splittable. Item supports and N are
    broadcast-sized aggregates; lift is per-row arithmetic on exact
    counts. Deterministic top-k: support desc, then item pair
    lexicographic."""
    distinct = items.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    small = (
        distinct.groupBy("basket")
        .agg(F.count(F.lit(1)).alias("basket_n"))
        .filter(F.col("basket_n") <= max_basket)
        .select("basket")
    )
    # cached: four consumers (both pair-join sides, item supports, N) —
    # without it each re-runs the fact dedup
    capped = distinct.join(small, "basket").cache()
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
