"""Query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string over the fixture
views. ``__spark_entry__.py`` re-exports this registry to the driver.

Cross-engine determinism rules used throughout the suites:

- column names are aliased identically on both sides (the driver's compare
  sorts columns by name before hashing).
- per-row arithmetic (IEEE doubles) is bit-identical across engines when
  both evaluate the same expression tree — no rounding needed.
- multi-row float aggregates (SUM/AVG over doubles) can differ in the last
  ulp due to accumulation order → both sides round the *final* aggregate
  (round(x, N)); integral-valued double sums are exact and not rounded.
- LIMIT queries sort on a key-unique prefix so the selected set is
  deterministic.
- casts from fractional doubles to integers are avoided (Spark truncates,
  DuckDB rounds); ``floor()`` first when integer semantics are wanted.
- "now" is frozen per domain (orders: 2002-01-01, events: 2024-02-01).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None = rows-only check
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, bench: bool = False):
    """Register a query. ``oracle=None`` → driver runs a weaker rows-only
    check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def get_registry() -> dict[str, QuerySpec]:
    """Import all suites (idempotent) and return the full registry."""
    from rclabsapi_spark.suites import (  # noqa: F401
        core,
        events,
        llm,
        metrics_ext,
        tpch_ext,
        transform,
    )

    return dict(_REGISTRY)
