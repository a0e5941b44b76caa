"""ETL job model — the reference's job-run data model re-typed for Spark.

Mirrors (structurally, not literally):
- ETLJobConfig / ETLJob structs: etl_job_models.hpp:9-41
- persisted etl_jobs schema: scripts/init.sql:23-56 (FIXTURES.md §1)
- the status state machine: etl_job_manager.cpp:671-699 with transitions
  PENDING→RUNNING→{COMPLETED,FAILED,CANCELLED} and timestamps set on
  transition (ST11).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Mapping, Sequence

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class JobType(str, Enum):
    EXTRACT = "EXTRACT"
    TRANSFORM = "TRANSFORM"
    LOAD = "LOAD"
    FULL_ETL = "FULL_ETL"


class JobStatus(str, Enum):
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    COMPLETED = "COMPLETED"
    FAILED = "FAILED"
    CANCELLED = "CANCELLED"


# etl_job_manager.cpp:671-699 — the legal transition edges. Terminal
# states have no outgoing edges.
VALID_TRANSITIONS: dict[JobStatus, frozenset[JobStatus]] = {
    JobStatus.PENDING: frozenset({JobStatus.RUNNING, JobStatus.CANCELLED}),
    JobStatus.RUNNING: frozenset(
        {JobStatus.COMPLETED, JobStatus.FAILED, JobStatus.CANCELLED}
    ),
    JobStatus.COMPLETED: frozenset(),
    JobStatus.FAILED: frozenset(),
    JobStatus.CANCELLED: frozenset(),
}


class InvalidTransition(ValueError):
    """Raised on an illegal status edge (the reference logs and refuses)."""


@dataclass(frozen=True)
class ETLJobConfig:
    """Mirror of ETLJobConfig (etl_job_models.hpp:9-18).

    source_config / target_config are Spark reader/writer descriptors:
    ``{"format": "parquet", "path": ..., "options": {...}}``; the target
    adds ``{"mode": "overwrite", "partition_by": [...]}``.
    """

    job_id: str
    job_type: JobType
    source_config: Mapping[str, Any]
    target_config: Mapping[str, Any] = field(default_factory=dict)
    transformation_rules: Sequence[Mapping[str, Any]] = ()


@dataclass
class ETLJob:
    """One row of the etl_jobs fact table (init.sql:23-56, FIXTURES.md §1)."""

    job_id: str
    job_type: str
    status: str
    source_config: str = ""
    target_config: str = ""
    created_at: dt.datetime | None = None
    started_at: dt.datetime | None = None
    completed_at: dt.datetime | None = None
    error_message: str | None = None
    records_processed: int = 0
    records_successful: int = 0
    records_failed: int = 0
    processing_rate: float = 0.0
    execution_time_ms: int = 0
    total_bytes_written: int = 0
    total_batches: int = 0
    progress_percent: int = 0


ETL_JOBS_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("job_type", StringType(), False),
        StructField("status", StringType(), False),
        StructField("source_config", StringType()),
        StructField("target_config", StringType()),
        StructField("created_at", TimestampType()),
        StructField("started_at", TimestampType()),
        StructField("completed_at", TimestampType()),
        StructField("error_message", StringType()),
        StructField("records_processed", IntegerType()),
        StructField("records_successful", IntegerType()),
        StructField("records_failed", IntegerType()),
        StructField("processing_rate", DoubleType()),
        StructField("execution_time_ms", LongType()),
        StructField("total_bytes_written", LongType()),
        StructField("total_batches", IntegerType()),
        StructField("progress_percent", IntegerType()),
    ]
)
