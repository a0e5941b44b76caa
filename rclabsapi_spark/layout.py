"""Physical table layout for scale: bucketing and sorted writes.

The reference relies on PostgreSQL B-tree indexes (scripts/init.sql:89-98)
for its hot predicates. A Spark-native engine gets the same effect from
table LAYOUT at rest:

- **Bucketing** (`write_bucketed`): pre-shuffle a table into N buckets by
  its join/group key at write time. Every later join or aggregation on
  that key skips its exchange — the 100 TB fact⋈fact join becomes a
  zipper over co-located buckets. This is the "pay the shuffle once"
  contract AQE can't give you at runtime.
- **Sorted-within-partition writes** (`write_sorted`): parquet row-group
  min/max stats become range indexes; a predicate on the sort column
  skips whole row groups (the B-tree-index analog for scans).

Both are write-time decisions, exactly like the reference's CREATE INDEX
statements — schema-design artifacts, not per-query code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations between tables bucketed the same way on the same
    key run exchange-free (verified by tests/test_layout.py asserting the
    join plan has no Exchange)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_sorted(
    df: DataFrame,
    path: str,
    *,
    sort_cols: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Sort-within-partitions then write: row-group min/max stats on
    ``sort_cols`` let predicate scans skip row groups."""
    out = df.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
