"""rclabsapi_spark — a PySpark-native analytics/ETL engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference ETL backend ("ETL Plus", surveyed in /root/repo/SURVEY.md):

- a rule-based record transformation engine (``functions.transformer``)
- relational query pipelines: filter/range/in-list/limit/sort/group-by
  (``operators.relational``, ``operators.joins``, ``operators.aggregates``)
- exact derived-metric rollups with divide-by-zero guard semantics
  (``operators.aggregates``, ``plans.metrics``)
- a log/event query engine (time-range, level-range, field, substring,
  regex search — ``plans.log_query``)
- window-shaped computations: running peaks, ring buffers, EWMA
  (``operators.windows``)
- a filtered real-time event layer: per-subscriber predicate routing,
  tumbling-window rate limiting, threshold alerting, progress throttling
  (``streaming``)
- large-scale training-data pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), embedding similarity search, text analysis,
  multimodal column plumbing (``llm``)

Everything is expressed with the DataFrame/SQL API so Catalyst can plan it;
Python UDFs appear only where built-ins genuinely cannot express the
semantics (Arrow-batched, never per-row).
"""

from rclabsapi_spark.session import get_spark
from rclabsapi_spark.catalog import TABLES, load_table, load_catalog, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_catalog", "register_views"]

__version__ = "0.1.0"
