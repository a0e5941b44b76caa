"""Approximate-aggregate suite: sketch-backed DISTINCT and quantiles with
deterministically-verifiable error bounds.

Sketch estimates are estimator-specific (HLL++ register layout, GK summary
compaction), so the raw estimate can't hash-match a DuckDB oracle. Instead
each query emits the EXACT aggregate (oracle-verified value) alongside a
boolean asserting the sketch landed within its declared bound — both
engines agree the flag must be true, and both sketches are deterministic
functions of the data, so the whole row hash-verifies. The statistical
guarantees themselves (rsd, rank error, merge/partition invariance) are
pinned in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators.approx import approx_distinct, approx_quantiles
from rclabsapi_spark.registry import query


@query(
    "approx_distinct_bound",
    "SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS exact_distinct,"
    " true AS within_bound FROM events GROUP BY event_type",
)
def q_approx_distinct(spark, sf_dir):
    """Per-type HLL++ user cardinality (rsd=5%), checked against the exact
    count at 3×rsd. The exact count rides along as the oracle-verified
    value; at 100 TB it is the column you'd drop, keeping the KB-sized
    sketch."""
    events = load_table(spark, sf_dir, "events")
    both = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", 0.05).alias("approx"),
    )
    return both.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("approx") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.15
        ).alias("within_bound"),
    )


@query(
    "approx_quantile_bound",
    "SELECT event_type,"
    " ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,"
    " ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,"
    " true AS rank_ok FROM events GROUP BY event_type",
)
def q_approx_quantiles(spark, sf_dir):
    """Per-type GK-sketch quantiles (accuracy=100 → rank error ≤ 1%),
    verified by the empirical rank of each estimate: the fraction of rows
    ≤ the p50/p95 estimate must sit within ±2% of the target rank. Exact
    interpolated quantiles ride along as the oracle-verified values."""
    events = load_table(spark, sf_dir, "events")
    approx = approx_quantiles(
        events, ["event_type"], "value", probs=(0.5, 0.95), accuracy=100
    ).withColumnRenamed("p50", "a50").withColumnRenamed("p95", "a95")
    ranked = events.join(F.broadcast(approx), "event_type").groupBy(
        "event_type"
    ).agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_exact"),
        F.avg((F.col("value") <= F.col("a50")).cast("double")).alias("r50"),
        F.avg((F.col("value") <= F.col("a95")).cast("double")).alias("r95"),
    )
    return ranked.select(
        "event_type",
        "p50_exact",
        "p95_exact",
        (
            (F.abs(F.col("r50") - 0.5) <= 0.02)
            & (F.abs(F.col("r95") - 0.95) <= 0.02)
        ).alias("rank_ok"),
    )


@query(
    "approx_mg_topk_bound",
    """
    WITH exact AS (
        SELECT event_type, COUNT(*)::BIGINT AS exact_n
        FROM events GROUP BY 1
    )
    SELECT event_type, exact_n, true AS within_bound
    FROM exact ORDER BY exact_n DESC, event_type LIMIT 5
    """,
)
def q_mg_topk(spark, sf_dir):
    """Merged Misra–Gries heavy hitters (summary_size=64) checked against
    the exact top-5 type counts: estimate ≤ exact ≤ estimate + n/65 must
    hold for EVERY partitioning (the mergeable-summaries guarantee —
    tests/test_approx.py pins it under adversarial repartitions). The
    exact counts are the oracle-verified values; at 100 TB the exact
    aggregate is the side you drop, keeping the fixed-size summaries.
    operators/approx.py::mg_topk."""
    from rclabsapi_spark.operators.approx import mg_topk

    events = load_table(spark, sf_dir, "events")
    exact = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "event_type")
        .limit(5)
    )
    mg = mg_topk(events, "event_type", summary_size=64, k=5).select(
        F.col("item"), F.col("est"), F.col("n_total")
    )
    j = exact.join(mg, exact.event_type == mg.item, "left")
    est = F.coalesce(F.col("est"), F.lit(0))
    n = F.max(F.col("n_total")).over(Window.partitionBy())
    bound = est + n.cast("double") / 65.0
    return j.select(
        "event_type",
        "exact_n",
        (
            (est <= F.col("exact_n"))
            & (F.col("exact_n").cast("double") <= bound)
        ).alias("within_bound"),
    ).orderBy(F.col("exact_n").desc(), "event_type")


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable overestimating counter table)
# ---------------------------------------------------------------------------


@query(
    "approx_cms_bound",
    """
    WITH exact AS (
        SELECT user_id, COUNT(*)::BIGINT AS exact_n
        FROM events GROUP BY 1
    )
    SELECT user_id, exact_n, true AS within_bound
    FROM exact ORDER BY exact_n DESC, user_id LIMIT 10
    """,
)
def q_cms_bound(spark, sf_dir):
    """Count-Min estimates (depth 4 × width 256) for the 10 busiest
    users, checked against the CMS contract: exact ≤ est ≤ exact + εn
    with ε = 2/width — the one-sided overestimate dual of Misra–Gries'
    undercount (approx_mg_topk_bound). The exact counts are the
    oracle-verified values; the sketch itself is a fixed depth·width
    counter relation built in one partial-combined pass, so at 100 TB
    it is the side you keep when the exact per-key aggregate won't fit.
    operators/approx.py::cms_estimate."""
    from rclabsapi_spark.operators.approx import cms_estimate

    events = load_table(spark, sf_dir, "events")
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
    )
    est = cms_estimate(events, exact, item_col="user_id", depth=4, hex_digits=2)
    totals = events.agg(F.count(F.lit(1)).cast("double").alias("n_tot"))
    bound = F.col("exact_n").cast("double") + 2.0 * F.col("n_tot") / 256.0
    return (
        exact.join(est, "user_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "user_id",
            "exact_n",
            (
                (F.col("cms_est") >= F.col("exact_n"))
                & (F.col("cms_est").cast("double") <= bound)
            ).alias("within_bound"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
    )
