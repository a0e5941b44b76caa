"""ETL job runner tests (SURVEY §3.2): schedule → run → state machine →
metrics → staged-commit load, over the sf0.001 fixtures."""

from __future__ import annotations

import datetime as dt
import itertools
import json

import pytest

from rclabsapi_spark.etl import (
    ETLJobConfig,
    ETLJobManager,
    JobStatus,
    JobType,
)
from rclabsapi_spark.etl.models import InvalidTransition
from rclabsapi_spark.plans.monitor_jobs import monitor_jobs

from .conftest import SF_SMOKE

DOCS = f"{SF_SMOKE}/documents.parquet"


def ticking_clock(start="2024-06-01 00:00:00", step_s=1):
    """Deterministic clock: +step_s per call."""
    t0 = dt.datetime.fromisoformat(start)
    counter = itertools.count()
    return lambda: t0 + dt.timedelta(seconds=step_s * next(counter))


def full_etl_config(tmp_path, job_id="job_1_1234") -> ETLJobConfig:
    return ETLJobConfig(
        job_id=job_id,
        job_type=JobType.FULL_ETL,
        source_config={"format": "parquet", "path": DOCS},
        target_config={"format": "parquet", "path": str(tmp_path / "out")},
        transformation_rules=[
            {
                "sourceField": "lang",
                "targetField": "lang_u",
                "transformationType": "uppercase",
            },
            {
                "sourceField": "n_chars",
                "targetField": "n_chars_x2",
                "transformationType": "multiply",
                "parameters": {"factor": "2"},
            },
            {
                "sourceField": "text",
                "targetField": "text",
                "transformationType": "identity",
                "parameters": {"required": "true"},
            },
        ],
    )


def test_full_etl_end_to_end(spark, tmp_path):
    mgr = ETLJobManager(spark, clock=ticking_clock())
    events = []
    mgr.add_progress_listener(lambda jid, pct: events.append(pct))

    cfg = full_etl_config(tmp_path)
    assert mgr.schedule_job(cfg) == cfg.job_id
    job = mgr.get_job(cfg.job_id)
    assert job.status == JobStatus.PENDING.value

    assert mgr.run_next() == cfg.job_id
    assert job.status == JobStatus.COMPLETED.value
    assert job.started_at is not None and job.completed_at >= job.started_at
    assert job.execution_time_ms > 0
    assert job.processing_rate > 0
    assert job.total_bytes_written > 0
    assert job.total_batches >= 1
    assert events == [10, 50, 80, 100]  # milestones, throttled (ST7)

    n_in = spark.read.parquet(DOCS).count()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert job.records_processed == n_in
    assert out.count() == n_in  # fixture has no empty text rows
    row = out.limit(1).collect()[0]
    assert row["lang_u"] == row["lang"].upper()
    assert float(row["n_chars_x2"]) == 2.0 * row["n_chars"]


def test_failed_job_records_error_and_cleans_staging(spark, tmp_path):
    mgr = ETLJobManager(spark, clock=ticking_clock())
    cfg = ETLJobConfig(
        job_id="job_2_1234",
        job_type=JobType.FULL_ETL,
        source_config={"format": "parquet", "path": "/nonexistent.parquet"},
        target_config={"path": str(tmp_path / "out")},
    )
    mgr.schedule_job(cfg)
    with pytest.raises(Exception):
        mgr.run_job(cfg.job_id)
    job = mgr.get_job(cfg.job_id)
    assert job.status == JobStatus.FAILED.value
    assert "PATH_NOT_FOUND" in job.error_message or "Path" in job.error_message
    assert not (tmp_path / "out").exists()
    assert not list(tmp_path.glob("*.staging-*"))


def test_state_machine_rejects_illegal_edges(spark, tmp_path):
    mgr = ETLJobManager(spark, clock=ticking_clock())
    cfg = full_etl_config(tmp_path, job_id="job_3_1234")
    mgr.schedule_job(cfg)
    mgr.run_job(cfg.job_id)
    with pytest.raises(InvalidTransition):
        mgr.run_job(cfg.job_id)  # COMPLETED → RUNNING is illegal
    with pytest.raises(InvalidTransition):
        mgr.cancel_job(cfg.job_id)  # COMPLETED → CANCELLED is illegal


def test_cancel_pending(spark, tmp_path):
    mgr = ETLJobManager(spark, clock=ticking_clock())
    cfg = full_etl_config(tmp_path, job_id="job_4_1234")
    mgr.schedule_job(cfg)
    mgr.cancel_job(cfg.job_id)
    assert mgr.get_job(cfg.job_id).status == JobStatus.CANCELLED.value
    assert mgr.get_job(cfg.job_id).completed_at is not None


def test_jobs_df_feeds_monitor_pipeline(spark, tmp_path):
    """The runner's jobs table drives the §3.1 monitor pipeline directly —
    the reference's GET /api/monitor/jobs over real runner output."""
    mgr = ETLJobManager(spark, clock=ticking_clock())
    for i in range(3):
        cfg = full_etl_config(tmp_path / str(i), job_id=f"job_5_{1000 + i}")
        mgr.schedule_job(cfg)
        mgr.run_job(cfg.job_id)
    df = mgr.jobs_df()
    assert df.count() == 3
    assert json.loads(df.limit(1).collect()[0]["source_config"])["path"] == DOCS

    monitored = monitor_jobs(
        df,
        status="COMPLETED",
        limit=10,
        status_col="status",
        type_col="job_type",
        created_col="created_at",
        key_col="job_id",
        records_col="records_processed",
        completed_col="completed_at",
        now="2024-06-02 00:00:00",
    )
    rows = monitored.collect()
    assert len(rows) == 3
    assert all(r["execution_time_ms"] > 0 for r in rows)


def test_upsert_parquet_merge(spark, tmp_path):
    """MERGE semantics: matching keys replaced, new keys appended, staged
    commit (table never half-written)."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.etl.upsert import upsert_parquet

    path = str(tmp_path / "jobs")
    base = spark.createDataFrame(
        [("j1", "PENDING", 0), ("j2", "PENDING", 0)],
        "job_id string, status string, records int",
    )
    base.write.parquet(path)

    updates = spark.createDataFrame(
        [("j2", "COMPLETED", 500), ("j3", "PENDING", 0)],
        "job_id string, status string, records int",
    )
    upsert_parquet(spark, path, updates, key_cols=["job_id"])

    got = {
        r["job_id"]: (r["status"], r["records"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        "j1": ("PENDING", 0),
        "j2": ("COMPLETED", 500),
        "j3": ("PENDING", 0),
    }
    # fresh path: behaves as plain write
    p2 = str(tmp_path / "new")
    upsert_parquet(spark, p2, updates, key_cols=["job_id"])
    assert spark.read.parquet(p2).count() == 2


def test_swap_into_place_restores_on_failure(tmp_path, monkeypatch):
    """A failure between the two swap renames must restore the live table
    (and never delete both old and new data)."""
    import os

    from rclabsapi_spark.etl.runner import _swap_into_place

    live = tmp_path / "table"
    live.mkdir()
    (live / "part-0.parquet").write_bytes(b"old")
    staging = tmp_path / "table.staging-x"
    staging.mkdir()
    (staging / "part-0.parquet").write_bytes(b"new")

    real_rename = os.rename

    def failing_rename(src, dst):
        if src == str(staging):
            raise OSError("simulated rename failure")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="simulated"):
        _swap_into_place(str(staging), str(live))
    # live table restored with the OLD contents; staging left for caller cleanup
    assert (live / "part-0.parquet").read_bytes() == b"old"
    assert not list(tmp_path.glob("table.old-*"))


def test_swap_into_place_success(tmp_path):
    from rclabsapi_spark.etl.runner import _swap_into_place

    live = tmp_path / "table"
    live.mkdir()
    (live / "part-0.parquet").write_bytes(b"old")
    staging = tmp_path / "table.staging-x"
    staging.mkdir()
    (staging / "part-0.parquet").write_bytes(b"new")

    _swap_into_place(str(staging), str(live))
    assert (live / "part-0.parquet").read_bytes() == b"new"
    assert not list(tmp_path.glob("table.old-*"))


def test_run_dag_orders_waves_and_skips_dependents(spark, tmp_path):
    """DAG drain: prerequisites complete before dependents start, a
    failed job's transitive dependents are SKIPPED (never run), and
    independent jobs still complete."""
    from rclabsapi_spark.etl import ETLJobConfig, JobType
    from rclabsapi_spark.etl.runner import ETLJobManager, run_dag

    mgr = ETLJobManager(spark, clock=ticking_clock())
    order: list[str] = []

    def note(job_id, pct):
        if pct == 100:
            order.append(job_id)

    mgr.add_progress_listener(note)

    a = mgr.schedule_job(full_etl_config(tmp_path / "a", job_id="dag_a"))
    b = mgr.schedule_job(full_etl_config(tmp_path / "b", job_id="dag_b"))
    c = mgr.schedule_job(full_etl_config(tmp_path / "c", job_id="dag_c"))
    bad = mgr.schedule_job(
        ETLJobConfig(
            job_id="dag_bad",
            job_type=JobType.EXTRACT,
            source_config={"path": "/nonexistent.parquet"},
        )
    )
    dep = mgr.schedule_job(full_etl_config(tmp_path / "d", job_id="dag_dep"))
    grand = mgr.schedule_job(
        full_etl_config(tmp_path / "e", job_id="dag_grand")
    )

    results = run_dag(
        mgr,
        {
            "dag_c": ["dag_a", "dag_b"],   # waits for both
            "dag_dep": ["dag_bad"],        # parent fails → skipped
            "dag_grand": ["dag_dep"],      # transitively skipped
        },
        max_concurrent=3,
    )
    assert results[a] == results[b] == results[c] == "COMPLETED"
    assert results[bad] == "FAILED"
    assert results[dep] == "SKIPPED" and results[grand] == "SKIPPED"
    # c finished after both prerequisites
    assert order.index("dag_c") > order.index("dag_a")
    assert order.index("dag_c") > order.index("dag_b")
    assert "dag_dep" not in order and "dag_grand" not in order


def test_run_dag_detects_cycles(spark, tmp_path):
    from rclabsapi_spark.etl.runner import ETLJobManager, run_dag

    mgr = ETLJobManager(spark, clock=ticking_clock())
    mgr.schedule_job(full_etl_config(tmp_path / "x", job_id="cyc_x"))
    mgr.schedule_job(full_etl_config(tmp_path / "y", job_id="cyc_y"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cycle"):
        run_dag(mgr, {"cyc_x": ["cyc_y"], "cyc_y": ["cyc_x"]})


def test_run_pending_stress_no_lost_updates(spark, tmp_path):
    """Thread-safety under load: 16 concurrent jobs all complete, every
    output lands, per-job metrics rows are all present, and progress
    emission (shared listener list + throttle map) never drops a
    terminal event."""
    from rclabsapi_spark.etl.runner import ETLJobManager

    mgr = ETLJobManager(spark, clock=ticking_clock())
    terminal = []
    mgr.add_progress_listener(
        lambda job_id, pct: terminal.append(job_id) if pct == 100 else None
    )
    ids = [
        mgr.schedule_job(
            full_etl_config(tmp_path / f"s{i}", job_id=f"stress_{i}")
        )
        for i in range(16)
    ]
    results = mgr.run_pending(max_concurrent=8)
    assert all(results[j] == "COMPLETED" for j in ids), results
    assert sorted(terminal) == sorted(ids)  # exactly one terminal emit each
    for i in range(16):
        out = spark.read.parquet(str(tmp_path / f"s{i}" / "out"))
        assert out.count() == 500
