"""Time-series regularization operators: gap-fill (fixed-grain spine +
forward-fill + linear interpolation) and SCD2 interval building
(change-data-capture → type-2 validity ranges).

Reference parity: the reference's hypertable-style rollups expose
fixed-grain series with missing buckets (job_monitor_service.cpp:477-727
returns time-bucketed metrics; the dashboard fills gaps client-side).
Here gap-filling is an engine operator: each observed bucket emits its
gap run distributively (one ``lead`` window + ``sequence``/``explode``
per key — no driver loop, no spine join), and both fills are per-row
arithmetic on the emitted rows.

Scale notes (100 TB):

- Output size is #keys × span/grain — independent of input row count.
  The whole operator is ONE shuffle on the key (pre-partitioned so the
  bucket aggregate and the lead window share the exchange), one sort,
  one explode; per-key cost is O(observed + emitted), with no
  quadratic window frame anywhere (pinned by a bench budget — the
  spine-join formulation's unbounded-following lookup was O(rows²)
  per key).
- ``scd2_intervals`` is one shuffle on the entity key; the dedup, the
  change-compression lag, and the validity lead all run over that single
  partitioning. No join against the previous snapshot is needed — the
  full history rebuild IS the merge (idempotent, re-runnable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rclabsapi_spark.functions.scalars import round_half_up

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

    - ``v``        — AVG(value) of the bucket's observations rounded
      half-up to 6 decimals (``round_half_up`` — the engine-portable
      floor(x·1e6+0.5)/1e6 form; plain ``F.round`` vs DuckDB ``ROUND``
      diverge at representable half-ties), NULL for gap buckets;
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
    # ONE shuffle total: hashpartitioning(key) satisfies the clustering
    # requirement of both the (key, bucket) aggregate and the lead()
    # window, so neither inserts its own exchange.
    obs = (
        df.select(
            F.col(key_col).alias("key"), bucket.alias("bucket"), F.col(value_col)
        )
        .repartition(F.col("key"))
        .groupBy("key", "bucket")
        .agg(round_half_up(F.avg(value_col), 6).alias("v"))
    )

    # Each observed bucket emits itself plus the gap buckets up to (not
    # including) the NEXT observed bucket, so every emitted row already
    # carries its surrounding observations: v is the forward-fill source
    # and one lead() pair supplies the interpolation target. The fills
    # are then pure per-row arithmetic after one explode — no spine
    # relation, no spine⋈obs join, no window pass over the exploded
    # rows (the join formulation re-scanned and re-shuffled the input
    # for the bounds branch, and its next-observation lookup — first()
    # over (currentRow, unboundedFollowing) — is evaluated by Spark by
    # recomputing the aggregate per row, O(rows²) per key: 43 s vs
    # 1.7 s at sf0.1).
    w = Window.partitionBy("key").orderBy("bucket")
    nxt = obs.select(
        "key",
        "bucket",
        "v",
        F.lead("bucket").over(w).alias("next_bucket"),
        F.lead("v").over(w).alias("next_v"),
    )
    run = F.when(
        F.col("next_bucket").isNull(), F.array(F.col("bucket"))
    ).otherwise(
        F.expr(
            f"sequence(bucket, next_bucket - interval 1 {grain},"
            f" interval 1 {grain})"
        )
    )
    emitted = nxt.select(
        "key", "bucket", "v", "next_bucket", "next_v",
        F.explode(run).alias("out_bucket"),
    )

    t_out = F.col("out_bucket").cast("timestamp").cast("long")
    t_prev = F.col("bucket").cast("timestamp").cast("long")
    t_next = F.col("next_bucket").cast("timestamp").cast("long")
    is_observed = F.col("out_bucket") == F.col("bucket")

    interp = F.when(is_observed, F.col("v")).otherwise(
        # every gap row sits strictly between two observations, so the
        # oracle's prev/next-not-null guard is satisfied by construction
        round_half_up(
            F.col("v")
            + (F.col("next_v") - F.col("v"))
            * (t_out - t_prev)
            / (t_next - t_prev),
            6,
        )
    )

    return emitted.select(
        F.col("key").alias(key_col),
        F.col("out_bucket").alias("bucket"),
        F.when(is_observed, F.col("v")).alias("v"),
        F.col("v").alias("v_ffill"),
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

    Change detection is null-safe: a transition to/from a NULL attribute
    is a change (``eqNullSafe``, SQL ``IS DISTINCT FROM``), and the first
    row per key is kept via an explicit ``row_number`` marker — using
    ``prev_attr IS NULL`` for that would both drop →NULL transitions
    (``attr != NULL`` is NULL) and keep NULL→NULL no-ops.

    Reference parity: the job state-machine history
    (etl_job_manager.cpp:671-699 — status transitions recorded with
    timestamps); this is the SCD2 view of that change stream.
    """
    # ONE shuffle total: repartition on the entity key up front —
    # hashpartitioning(key) satisfies the clustered-distribution
    # requirement of the (key, ts) dedup aggregate AND of both windows,
    # so neither inserts its own exchange. (Without this Spark shuffles
    # twice: once on (key, ts) for the aggregate, again on key for the
    # windows. Simultaneous-change duplicates are rare, so the skipped
    # map-side combine costs nothing.)
    per_instant = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(attr_col).alias("attr0"),
            F.col(tiebreak_col).alias("tb"),
        )
        .repartition(F.col("key"))
        .groupBy("key", "ts")
        .agg(F.max_by("attr0", "tb").alias("attr"))
    )

    w = Window.partitionBy("key").orderBy("ts")
    changed = per_instant.select(
        "key",
        "ts",
        "attr",
        F.lag("attr").over(w).alias("prev_attr"),
        F.row_number().over(w).alias("rn"),
    ).filter(
        (F.col("rn") == 1) | ~F.col("attr").eqNullSafe(F.col("prev_attr"))
    )

    return changed.select(
        F.col("key").alias(key_col),
        F.col("attr").alias(attr_col),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
    )
