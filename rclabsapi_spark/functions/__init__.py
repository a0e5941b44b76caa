from rclabsapi_spark.functions import scalars, transformer, validation

__all__ = ["scalars", "transformer", "validation"]
