from rclabsapi_spark.plans import log_query, metrics, monitor_jobs

__all__ = ["log_query", "metrics", "monitor_jobs"]
