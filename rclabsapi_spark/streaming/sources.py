"""Streaming sources/sinks (SURVEY §2.1 S3-S7, §2.9 ST4/ST8/ST10).

The reference tails log directories, buffers writes with rotation, and
ships batches to external destinations with retries. Spark-first:

- S4 tail        → ``readStream`` file source (parquet/json/text)
- S5 rotation    → partitioned streaming parquet sink (date partitions ≙
                   rotated files; lifecycle = partition expiry)
- S6/ST4 ship    → ``foreachBatch`` with bounded retry
- S7 index name  → ``date_format(ts, 'yyyy.MM.dd')`` partition column
- ST8 sampling   → rate source at a fixed rows/sec
- ST10 buffering → micro-batch trigger (processingTime)
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_dir(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """S4 — micro-batch tail of a growing directory
    (log_file_manager.cpp:649-670)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def rate_source(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """ST8 — fixed-interval sampling loop (system_metrics.hpp:62)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def with_index_partition(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """S7 — `logs-%Y.%m.%d` index pattern (log_aggregator.hpp:45) as a
    partition column; downstream writers partition by it so time-range
    queries prune."""
    return df.withColumn("index_date", F.date_format(F.col(ts_col), "yyyy.MM.dd"))


def write_partitioned_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    partition_col: str = "index_date",
    trigger_seconds: int | None = None,
    available_now: bool = False,
):
    """S5/ST10 — buffered, partitioned parquet sink; rotation ≙ date
    partitions (log_file_manager.cpp:180-214)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(partition_col)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def ship_foreach_batch(
    df: DataFrame,
    checkpoint: str,
    ship: Callable[[DataFrame, int], None],
    *,
    max_retries: int = 3,
    retry_delay_s: float = 0.1,
    allowed_levels: list[str] | None = None,
    level_col: str = "level",
):
    """S6/ST4 — batched shipping with per-destination level filter and
    bounded retry (log_aggregator.hpp:54-57, 230-256)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        if allowed_levels:
            batch = batch.filter(F.col(level_col).isin(allowed_levels))
        attempt = 0
        while True:
            try:
                ship(batch, batch_id)
                return
            except Exception:
                attempt += 1
                if attempt > max_retries:
                    raise
                time.sleep(retry_delay_s * attempt)

    return (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
