from rclabsapi_spark.etl.models import (
    ETLJob,
    ETLJobConfig,
    JobStatus,
    JobType,
)
from rclabsapi_spark.etl.runner import ETLJobManager

__all__ = [
    "ETLJob",
    "ETLJobConfig",
    "ETLJobManager",
    "JobStatus",
    "JobType",
]
