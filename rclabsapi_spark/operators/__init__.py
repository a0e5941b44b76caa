from rclabsapi_spark.operators import aggregates, joins, relational, setops, windows

__all__ = ["aggregates", "joins", "relational", "setops", "windows"]
