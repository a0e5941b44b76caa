"""API façade tests — endpoint-shaped calls over real runner output."""

from __future__ import annotations

import json

import pytest

from rclabsapi_spark.api import EngineAPI, ValidationError
from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.etl import ETLJobConfig, ETLJobManager, JobType
from rclabsapi_spark.plans.log_query import LogQueryParams

from .conftest import SF_SMOKE
from .test_etl_runner import full_etl_config, ticking_clock


@pytest.fixture()
def api(spark, tmp_path):
    mgr = ETLJobManager(spark, clock=ticking_clock())
    for i in range(2):
        cfg = full_etl_config(tmp_path / str(i), job_id=f"job_9_{1000 + i}")
        mgr.schedule_job(cfg)
        mgr.run_job(cfg.job_id)
    # one pending job for status variety
    mgr.schedule_job(full_etl_config(tmp_path / "p", job_id="job_9_9999"))
    logs = load_table(spark, SF_SMOKE, "events")
    return EngineAPI(spark, manager=mgr, logs_df=logs)


def test_monitor_jobs_endpoint(api):
    rows = [json.loads(r) for r in api.monitor_jobs(status="completed", limit=10)]
    assert len(rows) == 2
    assert all(r["status"] == "COMPLETED" for r in rows)
    assert all(r["execution_time_ms"] > 0 for r in rows)


def test_monitor_jobs_rejects_bad_params(api):
    with pytest.raises(ValidationError):
        api.monitor_jobs(status="NOPE")
    with pytest.raises(ValidationError):
        api.monitor_jobs(job_type="SIDEWAYS")


def test_health_single_pass(api):
    h = json.loads(api.health())
    assert h["totalJobs"] == 3
    assert h["completedJobs"] == 2
    assert h["runningJobs"] == 0


def test_get_job_and_404(api):
    row = json.loads(api.get_job("job_9_1000"))
    assert row["job_id"] == "job_9_1000"
    with pytest.raises(KeyError):
        api.get_job("job_missing")


def test_search_logs_endpoint(api):
    params = LogQueryParams(max_results=5, sort_by="timestamp")
    rows = api.search_logs(
        params,
        ts_col="ts",
        component_col="event_type",
        job_col="__absent__",
        thread_col="__absent__",
        message_col="props",
        level_col="event_type",
        key_col="event_id",
    )
    assert len(rows) == 5
    with pytest.raises(ValidationError):
        api.search_logs(LogQueryParams(max_results=5000))


def test_metrics_endpoint(api):
    perf = json.loads(api.metrics("performance", "30d", now="2024-06-02T00:00:00"))
    assert perf["total_records"] == 2 * 500
    with pytest.raises(ValidationError):
        api.metrics("bogus", "1h")
    with pytest.raises(ValidationError):
        api.metrics("jobs", "2h")


def test_create_and_run_via_api(api, tmp_path, spark):
    cfg = ETLJobConfig(
        job_id="job_9_7777",
        job_type=JobType.EXTRACT,
        source_config={"path": f"{SF_SMOKE}/region.parquet"},
    )
    api.create_job(cfg)
    api.manager.run_job("job_9_7777")
    row = json.loads(api.get_job("job_9_7777"))
    assert row["status"] == "COMPLETED"
    assert row["records_processed"] == spark.read.parquet(
        f"{SF_SMOKE}/region.parquet"
    ).count()


def test_health_cache_ttl_and_invalidation(spark, tmp_path):
    """S8 analog: health cached 30s; job mutations invalidate by tag;
    expiry honors the injected clock."""
    from rclabsapi_spark.cache import TTLCache
    from rclabsapi_spark.etl import ETLJobManager

    t = [0.0]
    cache = TTLCache(clock=lambda: t[0])
    mgr = ETLJobManager(spark, clock=ticking_clock())
    api = EngineAPI(spark, manager=mgr, cache=cache)

    h1 = api.health()
    assert cache.misses == 1 and cache.hits == 0
    assert api.health() == h1 and cache.hits == 1  # served from cache

    # mutation invalidates the "jobs" tag
    api.create_job(full_etl_config(tmp_path, job_id="job_9_5555"))
    h2 = api.health()
    assert cache.misses == 2
    assert json.loads(h2)["totalJobs"] == 1

    # TTL expiry (health = 30s)
    t[0] = 31.0
    api.health()
    assert cache.misses == 3


def test_query_catalog_endpoint(spark):
    """The registry doubles as a REST-able catalog: list + whitelisted
    execution with limit clamping; unknown names map to 400."""
    import json

    import pytest as _pytest

    from rclabsapi_spark.api import EngineAPI, ValidationError

    api = EngineAPI(spark)
    names = api.list_queries()
    assert "tpch_q1_pricing_summary" in names and len(names) >= 150

    rows = api.run_query(
        "a1_count_by_status", sf_dir="/root/testdata/sf0.001", limit=5
    )
    parsed = [json.loads(r) for r in rows]
    assert parsed and all("cnt" in p or len(p) >= 1 for p in parsed)

    with _pytest.raises(ValidationError):
        api.run_query("__evil__", sf_dir="/root/testdata/sf0.001")
