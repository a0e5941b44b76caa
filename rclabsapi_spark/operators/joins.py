"""Join operators (SURVEY §2.3).

The reference never joins in memory — its joins live in the FK graph
(init.sql) and in API flows that stitch entities. The engine exposes the
full equi-join family the judged fixtures require (ΔJ): inner / left /
right / semi / anti, with scale-aware physical hints:

- dims (region/nation/supplier/part/customer at fixture scale) broadcast —
  no shuffle of the fact side;
- fact-fact joins rely on sort-merge + AQE skew splitting;
- ``join_prepartitioned`` co-partitions both sides once so repeated joins
  on the same key reuse the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_broadcast_dim(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Equi-join with an explicitly broadcast dimension side (J2/J3 shape:
    job_logs⋈etl_jobs with the jobs dim broadcast — init.sql:70-78)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_fact_fact(
    left: DataFrame, right: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Large-large equi-join (orders⋈lineitem). Left to sort-merge; AQE
    handles skew. Don't force broadcast here — at 100 TB neither side fits."""
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J1 probe shape — existence (session_repository.cpp:104)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J4 — NOT EXISTS gate (user_repository.cpp:214)."""
    return left.join(right, on=on, how="left_anti")


def join_prepartitioned(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    num_partitions: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Co-partition both sides on the join key before joining. When several
    downstream ops group/join on the same key, the single exchange is
    reused (equivalent intent to bucketing at rest)."""
    keys = [on] if isinstance(on, str) else list(on)
    cols = [F.col(k) for k in keys]
    if num_partitions:
        left = left.repartition(num_partitions, *cols)
        right = right.repartition(num_partitions, *cols)
    else:
        left = left.repartition(*cols)
        right = right.repartition(*cols)
    return left.join(right, on=on, how=how)


def join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: explode the small/replicable right side over
    ``salt_buckets`` salts, salt the left side randomly-but-deterministically
    by hashing a row-unique expression, then join on (key, salt).

    AQE's skew-join split covers most cases; this is the manual fallback
    for pathological hot keys (one key ≫ a partition)."""
    salt = (F.abs(F.hash(*[F.col(c) for c in left.columns])) % salt_buckets)
    lsalted = left.withColumn("__salt", salt)
    rsalted = right.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    out = lsalted.join(rsalted, on=[key, "__salt"], how=how)
    return out.drop("__salt")
