"""Time-series regularization operators: gap-fill (spine + forward-fill +
linear interpolation) and SCD2 interval building (change-data-capture →
type-2 validity ranges).

Reference parity: the reference's hypertable-style rollups expose
fixed-grain series with missing buckets (job_monitor_service.cpp:477-727
returns time-bucketed metrics; the dashboard fills gaps client-side).
Here gap-filling is an engine operator: the spine is generated
distributively (``sequence`` + ``explode`` per key — no driver loop), and
both fills are window functions over one per-key partitioning.

Scale notes (100 TB):

- The spine is built from the per-key [min, max] bucket bounds, so its
  size is #keys × span/grain — independent of input row count. All three
  steps (observed-bucket aggregate, bounds, fill windows) shuffle on the
  same key, and AQE reuses/coalesces those exchanges.
- ``scd2_intervals`` is one shuffle on the entity key; the dedup, the
  change-compression lag, and the validity lead all run over that single
  partitioning. No join against the previous snapshot is needed — the
  full history rebuild IS the merge (idempotent, re-runnable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GRAIN_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain: str = "hour",
) -> DataFrame:
    """Regularize a per-key series to a fixed grain.

    Returns one row per (key, bucket) for every bucket in the key's
    observed [min, max] range with:

    - ``v``        — ROUND(AVG(value), 6) of the bucket's observations,
      NULL for gap buckets;
    - ``v_ffill``  — last observed ``v`` at or before the bucket;
    - ``v_interp`` — linear interpolation between the surrounding
      observed buckets (NULL before the first / after the last
      observation).

    The interpolation arithmetic runs on the *rounded* bucket averages
    with integer epoch-second distances, so it is bit-identical across
    engines evaluating the same expression tree.
    """
    if grain not in _GRAIN_SECONDS:
        raise ValueError(f"grain must be one of {sorted(_GRAIN_SECONDS)}")

    bucket = F.date_trunc(grain, F.col(ts_col))
    obs = (
        df.select(
            F.col(key_col).alias("key"), bucket.alias("bucket"), F.col(value_col)
        )
        .groupBy("key", "bucket")
        .agg(F.round(F.avg(value_col), 6).alias("v"))
    )

    bounds = obs.groupBy("key").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        "key",
        F.explode(
            F.expr(f"sequence(lo, hi, interval 1 {grain})")
        ).alias("bucket"),
    )

    filled = spine.join(obs, ["key", "bucket"], "left")

    t = F.col("bucket").cast("timestamp").cast("long")
    back = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("v").isNotNull(), t)

    prev_v = F.last("v", ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.first("v", ignorenulls=True).over(fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(fwd)

    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            F.round(
                prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t), 6
            ),
        )
        .otherwise(F.lit(None).cast("double"))
    )

    return filled.select(
        F.col("key").alias(key_col),
        "bucket",
        "v",
        prev_v.alias("v_ffill"),
        interp.alias("v_interp"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build type-2 validity intervals from a change stream.

    Per key: dedupe simultaneous changes (highest ``tiebreak_col`` wins),
    drop no-op changes (same attribute value as the previous change), then
    ``valid_from = ts`` / ``valid_to = next change's ts`` (NULL ⇒ current).
    ``is_current`` is an INT flag (0/1) for cross-engine hash stability.
    """
    per_instant = (
        df.groupBy(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"))
        .agg(F.max_by(attr_col, tiebreak_col).alias("attr"))
    )

    w = Window.partitionBy("key").orderBy("ts")
    changed = per_instant.withColumn("prev_attr", F.lag("attr").over(w)).filter(
        F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr"))
    )

    return changed.select(
        F.col("key").alias(key_col),
        F.col("attr").alias(attr_col),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
    )
