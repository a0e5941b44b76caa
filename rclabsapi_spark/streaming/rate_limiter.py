"""ST5 — tumbling-window rate limiting (rate_limiter.cpp:10-214).

The reference counts requests per (clientId, endpoint) in the current
epoch-minute/hour against per-rule limits, matching rules by longest URL
prefix (rate_limiter.cpp:25-29) and keeping only current+previous window
state (cleanup, rate_limiter.cpp:132-187).

Engine design: the *semantics* are a windowed count joined to a broadcast
rules table — identical code paths in batch (replay/audit) and streaming:

- batch: ``rate_limit_check`` groups on ``date_trunc('minute')``;
- streaming: ``rate_limit_stream`` uses ``window(ts, '1 minute')`` with a
  1-minute watermark — Spark's state store drops closed windows, which is
  exactly the reference's keep-2-windows cleanup.

The rules table is tiny → broadcast; the count shuffles on (client,
endpoint, window), which is also the state-store key. No skew expected
(clients are many); a hot client is handled by AQE skew split in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Default rule set — prefix → per-minute limit. Mirrors the shape of the
# reference's defaults (rate_limiter.cpp:12-22: login 5/min, logs 60/min …)
# with prefixes that overlap so longest-prefix matching is exercised.
RATE_RULES: list[tuple[str, int]] = [
    ("purch", 2),
    ("p", 3),
    ("error", 1),
    ("", 5),  # catch-all
]


def rules_df(spark, rules: list[tuple[str, int]]) -> DataFrame:
    return spark.createDataFrame(rules, "prefix string, per_minute_limit int")


def rate_limit_check(
    events: DataFrame,
    rules: list[tuple[str, int]] | None = None,
    *,
    ts_col: str = "ts",
    client_col: str = "user_id",
    endpoint_col: str = "event_type",
) -> DataFrame:
    """Batch replay: per-(client, endpoint, minute) counts vs the
    longest-prefix rule (isAllowed semantics, rate_limiter.cpp:48-90)."""
    spark = events.sparkSession
    counts = (
        events.groupBy(
            F.col(client_col).alias("user_id"),
            F.col(endpoint_col).alias("event_type"),
            F.date_trunc("minute", F.col(ts_col)).alias("window_start"),
        ).agg(F.count(F.lit(1)).alias("request_count"))
    )
    rules_ = F.broadcast(rules_df(spark, rules or RATE_RULES))
    matched = counts.join(
        rules_, F.col("event_type").startswith(F.col("prefix")), "inner"
    )
    # longest-prefix wins (rate_limiter.cpp:25-29)
    w = Window.partitionBy("user_id", "event_type", "window_start").orderBy(
        F.length("prefix").desc()
    )
    best = matched.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") == 1
    )
    return best.select(
        "user_id",
        "event_type",
        "window_start",
        "request_count",
        F.col("prefix").alias("matched_prefix"),
        "per_minute_limit",
        (F.col("request_count") <= F.col("per_minute_limit")).alias("allowed"),
        F.greatest(
            F.col("per_minute_limit") - F.col("request_count"), F.lit(0)
        ).cast("long").alias("remaining"),
    )


def rate_limit_stream(
    events: DataFrame,
    rules: list[tuple[str, int]] | None = None,
    *,
    ts_col: str = "ts",
    client_col: str = "user_id",
    endpoint_col: str = "event_type",
) -> DataFrame:
    """Streaming variant: tumbling window + watermark. The 1-minute
    watermark reproduces the reference's current+previous window retention
    (rate_limiter.cpp:132-187) — older state is dropped by the store."""
    spark = events.sparkSession
    counts = (
        events.withWatermark(ts_col, "1 minute")
        .groupBy(
            F.window(F.col(ts_col), "1 minute").alias("win"),
            F.col(client_col).alias("user_id"),
            F.col(endpoint_col).alias("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("request_count"))
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            "event_type",
            "request_count",
        )
    )
    rules_ = F.broadcast(rules_df(spark, rules or RATE_RULES))
    matched = counts.join(
        rules_, F.col("event_type").startswith(F.col("prefix")), "inner"
    )
    # Streaming can't use a rank window; dedup to the longest prefix via
    # max_by on prefix length per key inside each micro-batch.
    return (
        matched.groupBy("user_id", "event_type", "window_start", "request_count")
        .agg(
            F.expr("max_by(prefix, length(prefix))").alias("matched_prefix"),
            F.expr("max_by(per_minute_limit, length(prefix))").alias(
                "per_minute_limit"
            ),
        )
        .withColumn(
            "allowed", F.col("request_count") <= F.col("per_minute_limit")
        )
    )
