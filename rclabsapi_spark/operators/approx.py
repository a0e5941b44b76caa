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
