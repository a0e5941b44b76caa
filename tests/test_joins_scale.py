"""Scale-path join helpers: salted skew join and co-partitioned join must
be RESULT-identical to the plain join — they only change the physical
shuffle shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators.joins import (
    join_prepartitioned,
    join_salted,
)

from .conftest import SF_SMOKE


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_equals_plain_join(spark):
    """A skewed fact (80% of rows on one key) salted over 16 buckets must
    produce exactly the plain join's rows."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    # manufacture skew: fold most keys onto suppkey 1
    skewed = li.withColumn(
        "k", F.when(F.col("l_suppkey") % 5 != 0, F.lit(1)).otherwise(F.col("l_suppkey"))
    )
    dim = (
        load_table(spark, SF_SMOKE, "supplier")
        .select(F.col("s_suppkey").alias("k"), "s_name")
    )
    plain = skewed.join(dim, "k")
    salted = join_salted(skewed, dim, "k", salt_buckets=16)
    cols = ["k", "l_orderkey", "l_linenumber", "s_name"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)
    # salting must spread the hot key across many partitions
    parts = (
        skewed.withColumn(
            "__salt",
            F.abs(F.hash(*[F.col(c) for c in skewed.columns])) % 16,
        )
        .filter(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert parts == 16


def test_prepartitioned_join_equals_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    plain = orders.join(li, "o_orderkey")
    pre = join_prepartitioned(orders, li, "o_orderkey", num_partitions=8)
    cols = ["o_orderkey", "l_linenumber", "o_custkey"]
    assert _sorted_rows(pre, cols) == _sorted_rows(plain, cols)
