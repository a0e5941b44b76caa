"""Static registry hygiene — catches the two cheapest-to-make,
costliest-to-miss driver mismatches without executing anything:
oracle SQL that doesn't parse, and Spark/oracle column-name drift
(the driver hashes by sorted column names)."""

from __future__ import annotations

import duckdb
import pytest

from rclabsapi_spark.registry import get_registry

from .conftest import SF_CORRECT, build_query_df

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
    sorted-by-name value hash depends on. Uses the session-memoized
    plan builder (r17): the production path here previously RAN the
    eager-checkpoint queries just to read their columns (~98 s), and
    the ``materialize`` kwarg never changes the column set."""
    bad = {}
    for name, spec in sorted(_REG.items()):
        if not spec.oracle:
            continue
        scols = sorted(build_query_df(spark, name).columns)
        rel = duck_views.execute(
            f"SELECT * FROM ({spec.oracle}) LIMIT 0"
        )
        ocols = sorted(d[0] for d in rel.description)
        if scols != ocols:
            bad[name] = (scols, ocols)
    assert not bad, bad


def test_digest_covers_shared_operator_sources():
    """VERDICT r9 Missing #1: the pre-r10 digest hashed only the query fn
    + oracle SQL, so editing a shared operator (llm/dedup.py etc.) left
    dependent queries' verified status formally intact. The r10 digest
    walks the query fn's bytecode and transitively hashes every
    in-package function/class it calls — pin that the canonical case
    (dedup_duplicate_spans -> llm.dedup::duplicate_spans) is captured and
    that a dep-source change flips the digest."""
    from rclabsapi_spark.registry import spec_deps, spec_digest

    spec = _REG["dedup_duplicate_spans"]
    deps = spec_deps(spec)
    assert "rclabsapi_spark.llm.dedup:duplicate_spans" in deps

    # Reconstruct the digest payload by hand; perturbing a dep source must
    # change it (i.e. the dep sources are genuinely inside the hash).
    import hashlib
    import inspect

    from rclabsapi_spark.registry import _strip_decorators

    src = _strip_decorators(inspect.getsource(spec.fn))
    payload = src + "\x00" + (spec.oracle or "")
    for key in sorted(deps):
        payload += "\x00" + key + "\x00" + deps[key]
    assert (
        hashlib.sha256(payload.encode()).hexdigest() == spec_digest(spec)
    )
    perturbed = src + "\x00" + (spec.oracle or "")
    for key in sorted(deps):
        body = deps[key]
        if key == "rclabsapi_spark.llm.dedup:duplicate_spans":
            body += "  # simulated operator edit"
        perturbed += "\x00" + key + "\x00" + body
    assert (
        hashlib.sha256(perturbed.encode()).hexdigest() != spec_digest(spec)
    )


def test_every_query_reaches_an_operator_dep():
    """Every registered query should resolve at least one in-package dep
    (load_table at minimum) — a zero-dep closure would mean the bytecode
    walker silently broke and the digest regressed to fn+oracle only."""
    from rclabsapi_spark.registry import spec_deps

    empty = [n for n, s in _REG.items() if not spec_deps(s)]
    assert not empty, empty


def test_function_local_imports_are_captured():
    """Queries that import their operator inside the function body (not
    at module level) must still contribute the operator's source to the
    digest — the walker resolves dotted import targets from co_names."""
    from rclabsapi_spark.registry import spec_deps

    # q_duplicate_spans does `from rclabsapi_spark.llm.dedup import
    # duplicate_spans` inside the function body.
    deps = spec_deps(_REG["dedup_duplicate_spans"])
    assert "rclabsapi_spark.llm.dedup:duplicate_spans" in deps
