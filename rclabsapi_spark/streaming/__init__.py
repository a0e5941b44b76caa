from rclabsapi_spark.streaming import alerts, rate_limiter, routing, sources

__all__ = ["alerts", "rate_limiter", "routing", "sources"]
