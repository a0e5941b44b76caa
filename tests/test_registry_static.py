"""Static registry hygiene — catches the two cheapest-to-make,
costliest-to-miss driver mismatches without executing anything:
oracle SQL that doesn't parse, and Spark/oracle column-name drift
(the driver hashes by sorted column names)."""

from __future__ import annotations

import duckdb
import pytest

from rclabsapi_spark.registry import get_registry

from .conftest import SF_CORRECT

_REG = get_registry()
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    return con


def test_every_oracle_parses(duck_views):
    bad = {}
    for name, spec in _REG.items():
        if not spec.oracle:
            continue
        try:
            duck_views.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e).split("\n")[0][:120]
    assert not bad, bad


def test_spark_and_oracle_column_names_align(spark, duck_views):
    """Analysis-only: compare each query's Spark schema column set with
    its oracle's projected columns — the exact property the driver's
    sorted-by-name value hash depends on."""
    bad = {}
    for name, spec in sorted(_REG.items()):
        if not spec.oracle:
            continue
        scols = sorted(spec.fn(spark, SF_CORRECT).columns)
        rel = duck_views.execute(
            f"SELECT * FROM ({spec.oracle}) LIMIT 0"
        )
        ocols = sorted(d[0] for d in rel.description)
        if scols != ocols:
            bad[name] = (scols, ocols)
    assert not bad, bad
