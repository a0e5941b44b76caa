"""S1 — JDBC source/sink roundtrip through the ETL runner.

The reference's primary source modality is a Postgres scan
(database_manager.hpp:33-35; etl_job_repository.cpp:99-120 for the
INSERT path). Spark's JDBC connector is the Spark-first mapping; these
tests drive it end-to-end against embedded Derby (ships in pyspark's
jars), proving the runner's format/options plumbing carries a real
non-parquet database source AND target.
"""

from __future__ import annotations

import datetime as dt
import itertools

from rclabsapi_spark.etl import ETLJobConfig, ETLJobManager, JobStatus, JobType

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _clock(start="2024-06-01 00:00:00"):
    t0 = dt.datetime.fromisoformat(start)
    counter = itertools.count()
    return lambda: t0 + dt.timedelta(seconds=next(counter))


def _jdbc_opts(url, table):
    return {"url": url, "dbtable": table, "driver": DERBY_DRIVER}


def test_jdbc_source_to_parquet_load(spark, tmp_path):
    """jdbc extract → rule transform → staged parquet load."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0)],
        "id int, name string, value double",
    )
    src.write.format("jdbc").options(**_jdbc_opts(url, "src_rows")).save()

    mgr = ETLJobManager(spark, clock=_clock())
    cfg = ETLJobConfig(
        job_id="job_jdbc_src",
        job_type=JobType.FULL_ETL,
        source_config={"format": "jdbc", "options": _jdbc_opts(url, "src_rows")},
        target_config={"format": "parquet", "path": str(tmp_path / "out")},
        transformation_rules=[
            {
                "sourceField": "name",
                "targetField": "name_u",
                "transformationType": "uppercase",
            },
            {
                "sourceField": "value",
                "targetField": "value_x2",
                "transformationType": "multiply",
                "parameters": {"factor": "2"},
            },
        ],
    )
    mgr.schedule_job(cfg)
    job = mgr.run_job(cfg.job_id)

    assert job.status == JobStatus.COMPLETED.value
    assert job.records_processed == 3
    out = spark.read.parquet(str(tmp_path / "out"))
    got = {(r["name_u"], r["value_x2"]) for r in out.collect()}
    assert got == {("ALPHA", 20.0), ("BETA", 40.0), ("GAMMA", 60.0)}


def test_parquet_source_to_jdbc_sink(spark, tmp_path):
    """parquet extract → jdbc load (connector sink, no staging dir)."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    src_path = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "id int, tag string"
    ).write.parquet(src_path)

    mgr = ETLJobManager(spark, clock=_clock())
    cfg = ETLJobConfig(
        job_id="job_jdbc_sink",
        job_type=JobType.LOAD,
        source_config={"format": "parquet", "path": src_path},
        target_config={
            "format": "jdbc",
            "mode": "append",
            "options": _jdbc_opts(url, "sink_rows"),
        },
    )
    mgr.schedule_job(cfg)
    job = mgr.run_job(cfg.job_id)

    assert job.status == JobStatus.COMPLETED.value
    back = (
        spark.read.format("jdbc").options(**_jdbc_opts(url, "sink_rows")).load()
    )
    assert {(r["id"], r["tag"]) for r in back.collect()} == {(1, "x"), (2, "y")}
