"""Live distribution-drift monitoring: per-event-time-window equal-width
histogram counts, folded into a PSI score against a frozen reference
distribution.

The streaming upgrade of the batch PSI audit (operators/analytics.py::
psi_drift): instead of comparing two halves of a static table, every
tumbling window's value histogram scores against a reference histogram
captured from a known-good period — the distributional version of the
reference's threshold alerts (ST6, system_metrics.hpp:43-54), which
only watch point values.

Scale/streaming shape: the binning is a per-row codegen expression with
FROZEN bounds (no global min/max pass — a stream cannot see its future;
bounds come from the reference period), so the windowed count is an
ordinary watermarked groupBy — bounded state, one row per (window, bin).
The PSI fold runs over the n_bins rows per window, engine-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equal_width_bin(
    value, *, lo: float, hi: float, n_bins: int = 10
):
    """Clamped equal-width bin id over frozen [lo, hi] bounds — identical
    to the batch PSI binning, but with constants instead of a global
    aggregate (streams can't min/max their future)."""
    width = (hi - lo) / float(n_bins)
    return F.least(
        F.greatest(
            F.floor((value.cast("double") - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )


def binned_window_counts(
    events: DataFrame,
    *,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float,
    hi: float,
    n_bins: int = 10,
    window: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(event-time window, bin) value counts. Identical semantics on
    batch and streaming input; streaming adds the watermark so window
    state finalizes and expires."""
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.select(
            F.window(F.col(ts_col), window).alias("w"),
            equal_width_bin(
                F.col(value_col), lo=lo, hi=hi, n_bins=n_bins
            ).alias("bin"),
        )
        .groupBy("w", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "bin",
            "n",
        )
    )


def psi_vs_reference(
    counts: DataFrame,
    ref_shares: dict[int, float],
    *,
    eps: float = 1e-6,
) -> DataFrame:
    """Fold per-window bin counts into a PSI score against a frozen
    reference share table: PSI_w = Σ_bins (q−p)·ln(q/p) with ε floors.
    ``ref_shares`` maps bin id → reference share (from the known-good
    period); missing bins floor to ε on either side. Output: one row per
    window (window_start, n_rows, psi)."""
    ref_col = F.create_map(
        *[x for b, s in sorted(ref_shares.items()) for x in (F.lit(b), F.lit(s))]
    )
    w_tot = F.sum("n").over(Window.partitionBy("window_start"))
    shares = counts.select(
        "window_start",
        "bin",
        "n",
        (F.col("n").cast("double") / w_tot).alias("q"),
        F.coalesce(ref_col[F.col("bin")], F.lit(0.0)).alias("p"),
    )
    q = F.greatest(F.col("q"), F.lit(eps))
    p = F.greatest(F.col("p"), F.lit(eps))
    # same 9dp-grid sum as the batch operator (operators/analytics.py::
    # psi_drift), so the replay-parity twin stays bit-identical
    from rclabsapi_spark.functions.scalars import grid_sum

    return (
        shares.groupBy("window_start")
        .agg(
            F.sum("n").alias("n_rows"),
            grid_sum((q - p) * F.log(q / p), 6).alias("psi"),
        )
    )
