"""Approximate (sketch-backed) aggregates — the mergeable one-pass
summaries a 100 TB pipeline substitutes for exact DISTINCT / percentile
when the exact form stops fitting in memory.

Why these are first-class at scale: exact COUNT(DISTINCT x) shuffles every
distinct value; exact ``percentile`` buffers the whole column per group.
The sketch forms (HyperLogLog++ for cardinality, the Greenwald–Khanna
summary behind ``percentile_approx``) are fixed-size, partial-aggregate
map-side, and merge associatively — the shuffle carries kilobyte sketches
instead of the data. Both are Spark built-ins running inside whole-stage
codegen; this module just gives them the engine's operator surface.

Correctness contract: sketch outputs are estimator-specific, so no DuckDB
hash oracle exists (the registered queries take the rows-only check by
design). The real guarantees are pinned in tests/test_approx.py: relative
error vs the exact answer at the declared rsd/accuracy, and
partitioning-invariance of the HLL estimate (merge correctness).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    *,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group HyperLogLog++ cardinality estimate (relative standard
    deviation ``rsd``). One exchange carrying fixed-size HLL registers;
    the exact-DISTINCT plan this replaces shuffles every distinct value."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    probs: Sequence[float] = (0.5, 0.95, 0.99),
    *,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles via ``percentile_approx``
    (Greenwald–Khanna summaries, rank error ≤ 1/accuracy). Emits one
    ``p<NN>`` column per requested probability."""
    prob_arr = "array(" + ", ".join(repr(p) for p in probs) + ")"
    q = F.expr(f"percentile_approx({col}, {prob_arr}, {accuracy})")
    return df.groupBy(*group_cols).agg(
        *[
            q.getItem(i).alias(f"p{int(round(p * 100)):02d}")
            for i, p in enumerate(probs)
        ]
    )


def mg_topk(
    df: DataFrame,
    col: str,
    *,
    summary_size: int = 64,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k frequent items via merged per-partition
    Misra–Gries summaries — the scale path for exact heavy hitters
    (operators/analytics.py::heavy_hitters) when the item domain is too
    large to aggregate exactly (URLs, n-grams, user agents at 100 TB).

    Each partition maintains ONE Misra–Gries summary of ``summary_size``
    counters across its Arrow batches (``mapInPandas`` receives the
    batch iterator per partition, so the summary persists across
    batches); the per-partition summaries — ≤ summary_size rows each —
    are then merged by summing per-item lower bounds. Mergeable-summary
    guarantee (Agarwal et al., PODS'12, public literature): writing n
    for the total row count,

      estimate ≤ true_count ≤ estimate + n/(summary_size+1)

    and every item with true_count > n/(summary_size+1) survives into
    the merged candidate set. The shuffle carries partitions×summary_size
    tiny rows instead of the item domain; tests/test_approx.py pins the
    error bound and its partitioning-invariance.

    Output: (item, est, n_total) — top-k candidates by estimated lower
    bound, ties broken on the item for determinism. Exactly ONE data
    scan: each partition's row count rides along as a null-item sentinel
    row in its summary, so n (needed for the error bound) needs no
    second pass."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                n_part += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < summary_size:
                    counters[v] = 1
                else:
                    # decrement-all: drop zeros (the MG step)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {
                "item": list(counters) + [None],
                "cnt": list(counters.values()) + [n_part],
            }
        )

    src = df.select(F.col(col).cast("string").alias(col))
    summaries = src.mapInPandas(
        summarize, schema="item string, cnt long"
    ).cache()  # ≤ partitions×(summary_size+1) rows; 2 consumers
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est"))
    )
    total = summaries.filter(F.col("item").isNull()).agg(
        F.sum("cnt").alias("n_total")
    )
    return (
        merged.join(F.broadcast(total))
        .orderBy(F.col("est").desc(), "item")
        .limit(k)
    )


def cms_buckets(item: Column, *, depth: int = 4, hex_digits: int = 2) -> list[Column]:
    """Per-seed Count-Min bucket of an item: the first ``hex_digits`` of
    ``md5('cms{j}:' || item)`` — a 16^hex_digits-way uniform hash that
    both engines compute identically (fixed-width lowercase hex)."""
    return [
        F.substring(
            F.md5(F.concat(F.lit(f"cms{j}:"), item.cast("string"))),
            1,
            hex_digits,
        )
        for j in range(depth)
    ]


def cms_estimate(
    df: DataFrame,
    items: DataFrame,
    *,
    item_col: str,
    depth: int = 4,
    hex_digits: int = 2,
) -> DataFrame:
    """Count-Min sketch estimates for the rows of ``items`` (a relation
    with an ``item_col`` column): build the depth × 16^hex_digits
    counter table in one pass over ``df``, then estimate each queried
    item as min_j counter[j][bucket_j(item)].

    The CMS guarantee: exact ≤ est ≤ exact + εN (ε ≈ e/width) — the
    one-sided overestimate makes it the right sketch for "never
    undercount" alerting, complementing Misra–Gries' undercount
    (operators/approx.py::mg_topk). The sketch relation is
    depth·width rows regardless of input size (that's the point: at
    100 TB the counters still fit in L2), built by one partial-combined
    groupBy over (seed, bucket); estimates broadcast-join the queried
    items against it. Merge = adding counter tables — the groupBy IS the
    merge, so any partitioning yields the identical sketch
    (tests/test_approx.py pins this under adversarial repartitions)."""
    item = F.col(item_col)
    buckets = cms_buckets(item, depth=depth, hex_digits=hex_digits)
    pts = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("seed"), b.alias("bucket")
                    )
                    for j, b in enumerate(buckets)
                ]
            )
        ).alias("sb")
    ).select("sb.seed", "sb.bucket")
    sketch = pts.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("c"))
    q = items.select(
        item.alias("__item"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("seed"), b.alias("bucket"))
                    for j, b in enumerate(
                        cms_buckets(item, depth=depth, hex_digits=hex_digits)
                    )
                ]
            )
        ).alias("sb"),
    ).select("__item", "sb.seed", "sb.bucket")
    # ONE broadcast join against the fixed-size sketch, then min over
    # seeds — not a join per seed (which would recompute the sketch
    # branch depth times)
    return (
        q.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("__item")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("__est"))
        .select(
            F.col("__item").alias(item_col),
            F.col("__est").cast("long").alias("cms_est"),
        )
    )
