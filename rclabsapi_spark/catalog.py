"""Catalog over the driver's parquet fixture tables.

The reference persists six PostgreSQL tables (SURVEY §1.1); the driver's
correctness fixtures are a TPC-H-ish star schema plus ``events`` (stream
analog), ``documents`` and ``embeddings`` (training-data-pipeline tables).
FIXTURES.md §9 maps reference entities onto these:

- ``etl_jobs``   → ``orders``   (status/type/created_at/metric columns)
- ``job_logs``   → ``events``   (level/component/message/ts)
- ``users``      → ``customer``
- ``sessions``   → ``orders``→``customer`` FK shape
- stream input   → ``events``

At 100 TB these would be partitioned tables (date-partitioned facts,
broadcast-sized dims); here they are single parquet files per SF dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # outright. Read nanos as long (legacy conf) and truncate to a
        # microsecond timestamp — the same ns→µs truncation DuckDB applies,
        # so oracle comparisons see identical values.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_catalog(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
