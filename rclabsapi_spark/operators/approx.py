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
