"""Keyed upsert (MERGE) into a parquet table — the reference's
``UPDATE etl_jobs SET … WHERE job_id = $1`` (etl_job_repository.cpp) as a
table operation.

Plain parquet has no row-level update; the engine's MERGE is
read → anti-join out the updated keys → union the new versions → staged
commit (atomic rename, same rollback contract as the ETL load). At scale
this is the classic copy-on-write table format move (what Delta/Iceberg
do per-file); partition the table and pass one partition's path to bound
the rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
) -> None:
    """MERGE ``updates`` into the table at ``path`` by key: matching keys
    are replaced, new keys appended. Staged-commit write: a failure
    before the swap leaves the table untouched; a failure between the two
    swap renames restores the old dir before re-raising. The swap is not
    concurrent-reader safe — a reader racing the renames can briefly see
    a missing table."""
    if os.path.exists(path):
        current = spark.read.parquet(path)
        keep = current.join(
            updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
        )
        merged = keep.unionByName(updates)
    else:
        merged = updates
    staging = f"{path}.merge-{uuid.uuid4().hex[:8]}"
    try:
        merged.write.mode("overwrite").parquet(staging)
        old = None
        if os.path.exists(path):
            old = f"{path}.old-{uuid.uuid4().hex[:8]}"
            os.rename(path, old)
        try:
            os.rename(staging, path)
        except Exception:
            if old is not None:
                os.rename(old, path)
            raise
        if old is not None:
            shutil.rmtree(old)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
