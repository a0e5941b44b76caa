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

from rclabsapi_spark.layout import spread_by

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

    - ``v``        — the bucket's mean observation via 9dp-integer-grid
      sums (per-row values are bit-identical across engines, raw AVG
      accumulation order is not), rounded half-up to 6 decimals
      (``round_half_up`` — the engine-portable floor(x·1e6+0.5)/1e6
      form; plain ``F.round`` vs DuckDB ``ROUND`` diverge at
      representable half-ties), NULL for gap buckets;
    - ``v_ffill``  — last NON-NULL ``v`` at or before the bucket
      (IGNORE-NULLS semantics: a bucket whose observations are all
      NULL is filled past, not from);
    - ``v_interp`` — linear interpolation between the surrounding
      non-NULL observed buckets (NULL before the first / after the
      last non-NULL observation; all-NULL buckets are spanned).

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
        .transform(lambda d: spread_by(d, "key"))
        .groupBy("key", "bucket")
        .agg(
            round_half_up(
                F.sum(
                    F.floor(
                        F.col(value_col) * 1000000000.0 + F.lit(0.5)
                    ).cast("decimal(38,0)")
                ).cast("double")
                / (F.count(value_col) * 1000000000.0),
                6,
            ).alias("v")
        )
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
    # Fill sources honour IGNORE-NULLS semantics: a bucket whose AVG is
    # NULL (every observation NULL) still bounds the spine and emits its
    # run, but forward-fill skips past it and interpolation spans it —
    # matching the oracle's LAST_VALUE/FIRST_VALUE ... IGNORE NULLS.
    # Both ignore-nulls lookups are O(n) RUNNING frames: ascending
    # last() for the fill-from side, and a descending twin — where
    # "preceding" rows are LATER buckets, so last() over
    # (unboundedPreceding, -1) is the first non-NULL observation
    # strictly AFTER the current bucket — for the fill-to side. The
    # quadratic unbounded-FOLLOWING first() never appears. Same key
    # partitioning for all three windows → still the single exchange;
    # the descending pair costs one extra in-partition sort.
    w = Window.partitionBy("key").orderBy("bucket")
    w_ff = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_nn = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t_b = F.col("bucket").cast("timestamp").cast("long")
    v_nn = F.when(F.col("v").isNotNull(), t_b)
    nxt = obs.select(
        "key",
        "bucket",
        "v",
        F.lead("bucket").over(w).alias("next_bucket"),
        F.last("v", ignorenulls=True).over(w_ff).alias("ff_v"),
        F.last(v_nn, ignorenulls=True).over(w_ff).alias("ff_t"),
        F.last("v", ignorenulls=True).over(w_nn).alias("nn_v"),
        F.last(v_nn, ignorenulls=True).over(w_nn).alias("nn_t"),
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
        "key", "bucket", "v", "ff_v", "ff_t", "nn_v", "nn_t",
        F.explode(run).alias("out_bucket"),
    )

    t_out = F.col("out_bucket").cast("timestamp").cast("long")
    is_observed = F.col("out_bucket") == F.col("bucket")
    v_out = F.when(is_observed, F.col("v"))

    # A gap row inherits its generating bucket's lookups unchanged: no
    # observation sits between them, so "last non-NULL ≤ out_bucket" ==
    # ff at the generator and "first non-NULL > out_bucket" == nn at
    # the generator. NULL ff_v or nn_v (before first / after last
    # non-NULL observation, or an all-NULL key) propagates through the
    # arithmetic to a NULL v_interp, matching the oracle's guard.
    interp = F.coalesce(
        v_out,
        round_half_up(
            F.col("ff_v")
            + (F.col("nn_v") - F.col("ff_v"))
            * (t_out - F.col("ff_t"))
            / (F.col("nn_t") - F.col("ff_t")),
            6,
        ),
    )

    return emitted.select(
        F.col("key").alias(key_col),
        F.col("out_bucket").alias("bucket"),
        v_out.alias("v"),
        F.col("ff_v").alias("v_ffill"),
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
        .transform(lambda d: spread_by(d, "key"))
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


def concurrency_peaks(
    intervals: DataFrame,
    *,
    group_col: str = "event_type",
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """Interval-overlap sweep line: peak concurrency per group over
    half-open integer intervals ``[start, end)``, plus the first instant
    the peak is reached.

    The classic "how many jobs ran at once" question the reference's job
    monitor answers driver-side by scanning active jobs
    (job_monitor_service.cpp:477-530); here it is a distributed sweep:
    each interval emits (+1 at start, -1 at end), deltas are NETTED per
    (group, instant) *before* the running sum, so tie instants are
    unambiguous in both engines (a start and an end at the same t cancel
    — correct for half-open intervals), and the prefix sum over instants
    is the concurrency on [t, next_t).

    Scale: ONE exchange — the input is pre-partitioned on the group key,
    the (group, t) netting aggregate reuses that clustering (hash(group)
    satisfies the coarser (group, t) distribution), and the prefix-sum
    window sorts within the same partitions. The netted relation is
    |distinct instants|-sized, far below 2·n at any realistic grain.
    Peak extraction is a per-group max + min-t filter on that relation.
    """
    pts = intervals.select(
        F.col(group_col).alias("g"),
        F.col(start_col).alias("t"),
        F.lit(1).alias("delta"),
    ).unionAll(
        intervals.select(
            F.col(group_col).alias("g"),
            F.col(end_col).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    net = (
        spread_by(pts, "g")
        .groupBy("g", "t")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.partitionBy("g").orderBy("t")
    run = net.select(
        "g", "t", F.sum("net").over(w).alias("conc")
    )
    # peak via a second window over the SAME g-clustering — no join, no
    # recompute of the sweep branch
    w_g = Window.partitionBy("g")
    return (
        run.withColumn("peak", F.max("conc").over(w_g))
        .filter(F.col("conc") == F.col("peak"))
        .groupBy(F.col("g"), F.col("peak"))
        .agg(F.min("t").alias("peak_at_s"))
        .select(
            F.col("g").alias(group_col),
            F.col("peak").cast("long").alias("peak"),
            F.col("peak_at_s").cast("long").alias("peak_at_s"),
        )
    )


def rolling_correlation(
    series: DataFrame,
    *,
    group_cols: tuple[str, ...],
    order_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 7,
) -> DataFrame:
    """Rolling Pearson correlation between two aligned series per group
    over a trailing ``window_rows`` frame — "are these two metrics still
    moving together", the windowed version of the one-pass correlation
    matrix (suites/analytics.py::stat_corr_lineitem).

    Decomposed into the five co-moment rolling sums (Σx, Σy, Σx², Σy²,
    Σxy) over ONE ordered window per group — five frames share the same
    sort, no self-join, no recompute per offset. Emits NULL until the
    frame is full and where either variance is zero (constant series
    have no defined correlation)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    corr = F.when(
        (n >= float(window_rows)) & (vx > 0) & (vy > 0),
        cov / F.sqrt(vx * vy),
    )
    return series.select(
        *group_cols,
        F.col(order_col),
        round_half_up(corr, 6).alias("rolling_corr"),
    )
