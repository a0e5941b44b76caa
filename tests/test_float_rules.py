"""Fleet-wide float-rule invariant (the registry.py docstring contract,
closed in r12): no RAW rounded double SUM/AVG may enter the package —
every multi-row double aggregate rides an integer grid
(``grid_sum`` / ``grid_mean`` / ``grid_ratio`` or an inline
FLOOR(x·grid+0.5) DECIMAL/HUGEINT accumulator) or appears in the
exemption table below with its documented class:

(a) integral-valued sums/averages (counts, 0/1 flags, token counts) —
    exact in any accumulation order;
(b) window frames with a pinned ORDER BY — both engines accumulate the
    frame in the same order.

A new ``F.round(F.sum(...))`` / ``ROUND(SUM(...))`` over genuine
doubles fails here before it can reintroduce the cross-engine
ulp-divergence class the r10-r12 sweeps eliminated. To exempt a new
site, add (file, line-substring, class) below — the substring must
appear on the matched line, so an exemption cannot silently cover a
different aggregate added later to the same file.
"""

from __future__ import annotations

import re
from pathlib import Path

_PKG = Path(__file__).resolve().parents[1] / "rclabsapi_spark"

# (relative file, substring that must appear on the matched line, class)
_EXEMPT = [
    # (a) integral sums: n_tokens is an integer column; leaked / CASE
    # branches are 0/1; vocab-membership flags are 0/1
    ("suites/training.py", 'F.round(F.sum("n_tokens")', "a"),
    ("llm/training.py", 'F.sum(F.coalesce(F.col("in_vocab"), F.lit(0)))', "a"),
    ("suites/training.py", "ROUND(SUM(n_tokens)", "a"),
    ("suites/training.py", "F.round(F.sum(leaked)", "a"),
    ("llm/training.py", "F.round(F.sum(leaked)", "a"),
    ("suites/training.py", "ROUND(SUM(CASE WHEN word IN", "a"),
    ("suites/training.py", "ROUND(SUM(CASE WHEN s.n_src > 1", "a"),
    ("suites/training.py", "ROUND(SUM(CASE WHEN f.n_splits > 1", "a"),
    # (a) integral averages: token counts, |count − count| forecasts
    ("suites/training.py", 'round_half_up(F.avg("n_tokens")', "a"),
    ("operators/analytics.py", "round_half_up(F.avg(err))", "a"),
    # (b) pinned-order window frame (w_moving_avg): ORDER BY ts,
    # event_id fixes the fold order on both engines
    ("suites/core.py", "ROUND(AVG(value) OVER (PARTITION BY user_id", "b"),
    ("suites/core.py", 'F.round(F.avg("value").over(w), 6)', "b"),
    # docstring mentions of the forbidden form (registry float rules,
    # grid_sum's own documentation)
    ("registry.py", "ROUND(SUM(double))", "doc"),
    ("functions/scalars.py", "``ROUND(SUM(x), d)``", "doc"),
]

_PATTERNS = [
    re.compile(r"F\.round\(\s*F\.sum\("),
    re.compile(r"F\.round\(\s*F\.avg\("),
    re.compile(r"ROUND\(SUM\("),
    re.compile(r"ROUND\(AVG\("),
    re.compile(r"round_half_up\(F\.avg\("),
    re.compile(r"round_half_up\(\s*F\.sum\(\s*F\.col"),
]


def _line_of(text: str, pos: int) -> str:
    start = text.rfind("\n", 0, pos) + 1
    end = text.find("\n", pos)
    return text[start : end if end >= 0 else len(text)]


def _call_span(text: str, pos: int) -> str:
    """The matched aggregate call itself: from the match to the
    balanced close of its first '(' — an exemption snippet can only
    match inside the SAME call, never an adjacent statement's."""
    i = text.find("(", pos)
    if i < 0:
        return _line_of(text, pos)
    depth = 0
    for j in range(i, min(len(text), i + 4000)):
        c = text[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[pos : j + 1]
    return _line_of(text, pos)


def test_no_raw_rounded_double_aggregates():
    offenders = []
    for py in sorted(_PKG.rglob("*.py")):
        rel = py.relative_to(_PKG).as_posix()
        text = py.read_text()
        for pat in _PATTERNS:
            for m in pat.finditer(text):
                # exemption snippets match only inside the matched
                # call's own paren-balanced span, so a new raw
                # aggregate cannot inherit an adjacent exemption
                ctx = _call_span(text, m.start())
                line = _line_of(text, m.start())
                if any(
                    rel == f and (snip in line or snip in ctx)
                    for f, snip, _cls in _EXEMPT
                ):
                    continue
                lineno = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{rel}:{lineno}: {line.strip()}")
    assert not offenders, (
        "raw rounded double aggregate(s) found — use grid_sum/grid_mean/"
        "grid_ratio (functions/scalars.py) or add a documented exemption "
        "in tests/test_float_rules.py:\n" + "\n".join(offenders)
    )


def test_exemption_table_is_live():
    """Every exemption row must still match a line in its file —
    stale rows get deleted, not accumulated."""
    dead = []
    for f, snip, _cls in _EXEMPT:
        text = (_PKG / f).read_text()
        if snip not in text:
            dead.append(f"{f}: {snip!r}")
    assert not dead, "stale exemption rows:\n" + "\n".join(dead)


# ---------------------------------------------------------------------------
# BIGINT grid-accumulator allowlist (bounded groups only)
# ---------------------------------------------------------------------------

# Grid accumulators whose GROUP can grow with the corpus must be
# DECIMAL(38,0) (Spark) / HUGEINT (oracle) — the r12 widening class.
# BIGINT/long accumulators are allowed ONLY where the group is
# structurally bounded (a document, a fixed query-term set): listed
# here with the bound, so a new corpus-scale BIGINT sum fails review.
_BIGINT_GRID_ALLOWED = {
    # per-(doc, query-terms) retrieval score sums: ≤|terms| rows/group;
    # the scorer-agreement micro terms are PER-ROW values whose
    # corpus-scale sufficient-statistic SUMS are DECIMAL(38,0)/HUGEINT
    "llm/retrieval.py",
    "suites/retrieval.py",
    # per-doc LM log-prob sums (≤|doc tokens| rows/group) and the
    # per-source quality micro sums: 1e6/row wraps at 9.2e12 rows per
    # source — ≥2-3 orders above 100 TB per-source row counts
    # (documented headroom class, registry.py float rules)
    "llm/training.py",
    "suites/training.py",
    # streaming twin of the incremental card: the SAME per-source
    # quality micro sums as suites/training.py — row-for-row parity
    # with the registered card requires the identical BIGINT class,
    # and the bound is the same headroom argument (batch deltas are
    # strictly smaller than the snapshot totals they fold into)
    "streaming/cards.py",
    # per-domain quality micro sums — same headroom class
    "suites/cleaning.py",
    # |dim|-bounded centroid-component micro second levels (cm/gm)
    "suites/llm.py",
    # same |dim|-bounded micro second level (lm/bm) in the streaming
    # centroid-drift twin — sums are Σ over |dim| terms of (≤2e6)²,
    # ≤ ~4e12·dim, orders below 2^63; the first-level accumulation is
    # DECIMAL(38,0) deltas
    "streaming/drift.py",
    # per-threshold mean over the CAPPED candidate-pair relation —
    # headroom class (1e6/row, capped pair counts)
    "suites/metrics_ext.py",
}

_BIGINT_GRID_PATTERNS = [
    re.compile(r"0\.5\)\s*AS BIGINT\)\)"),
    re.compile(r'F\.lit\(0\.5\)\s*\)\s*\.cast\(\s*"long"\s*\)'),
    # ROUND-based micro-int grid terms (score·1e6 as BIGINT/long) —
    # the form the FLOOR patterns above do not reach
    re.compile(r"ROUND\([^\n]{0,100}\* 1000000(?:\.0)?, 0\) AS BIGINT"),
    re.compile(
        r'F\.round\([^\n]{0,100}\* 1000000(?:\.0)?, 0\)'
        r'\s*\.cast\(\s*"long"\s*\)'
    ),
]


def test_bigint_grid_accumulators_are_bounded_group_only():
    offenders = []
    for py in sorted(_PKG.rglob("*.py")):
        rel = py.relative_to(_PKG).as_posix()
        text = py.read_text()
        for pat in _BIGINT_GRID_PATTERNS:
            for m in pat.finditer(text):
                if rel in _BIGINT_GRID_ALLOWED:
                    continue
                lineno = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{rel}:{lineno}: {_line_of(text, m.start()).strip()}")
    assert not offenders, (
        "BIGINT/long grid accumulator outside the bounded-group "
        "allowlist — widen to DECIMAL(38,0)/HUGEINT (corpus-scale "
        "groups wrap BIGINT) or document the bound here:\n"
        + "\n".join(offenders)
    )


# ---------------------------------------------------------------------------
# grid_term: the guarded large-magnitude grid conversion (ADVICE r13)
# ---------------------------------------------------------------------------


def test_grid_term_bit_identical_to_duckdb_below_ceiling(spark):
    """grid_term must equal DuckDB's CAST(FLOOR(x*grid+0.5) AS HUGEINT)
    for doubles through the ENTIRE supported domain — including
    (2^53, 2^63) where Spark's floor->long stays exact but a
    double->decimal cast would already diverge (shortest-repr
    conversion vs exact binary value)."""
    import duckdb
    from pyspark.sql import functions as F

    from rclabsapi_spark.functions.scalars import grid_term

    xs = [
        0.0,
        123.456789123,
        -987.000000001,
        9.8e6,          # grid value ~9.8e15 > 2^53: the exactness zone
        1.23456789e9,   # grid value ~1.2e18, deep in (2^53, 2^63)
        9.2e9,          # grid value 9.2e18, just under 2^63
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        int(r["g"])
        for r in df.select(grid_term(F.col("x")).alias("g"))
        .orderBy("g")
        .collect()
    ]
    want = sorted(
        int(row[0])
        for row in duckdb.sql(
            f"SELECT CAST(FLOOR(x * 1e9 + 0.5) AS HUGEINT) AS g FROM "
            f"(SELECT UNNEST({xs!r}::DOUBLE[]) AS x)"
        ).fetchall()
    )
    assert got == want


def test_grid_term_raises_loudly_past_2_63(spark):
    """Above the 2^63 grid ceiling Spark's long floor would silently
    saturate (and NO decimal path matches DuckDB's exact double
    conversion) — the contract is a loud per-row error instead."""
    import pytest
    from pyspark.sql import functions as F

    from rclabsapi_spark.functions.scalars import grid_term

    df = spark.createDataFrame([(1.0e10,)], "x double")  # 1e19 > 2^63
    with pytest.raises(Exception, match="grid ceiling"):
        df.select(grid_term(F.col("x")).alias("g")).collect()


def test_grid_term_null_propagates_and_sum_skips(spark):
    """ADVICE r14: a NULL term must floor to NULL (SUM skips it), the
    pre-guard behavior and DuckDB's CAST(FLOOR(NULL) AS HUGEINT) — not
    trip assert_true's raise-on-NULL-condition path with the literal
    message 'null'. NULL priority reaching crawl_budget_allocation or a
    NULL tokens_col in epoch_mixture_schedule skips the row instead of
    hard-failing the job."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.functions.scalars import grid_term

    df = spark.createDataFrame(
        [(1.0,), (None,), (2.5,)], "x double"
    )
    rows = df.select(grid_term(F.col("x")).alias("g")).collect()
    vals = sorted(
        (int(r["g"]) if r["g"] is not None else None for r in rows),
        key=lambda v: (v is None, v),
    )
    assert vals == [1_000_000_000, 2_500_000_000, None]
    total = df.agg(F.sum(grid_term(F.col("x"))).alias("s")).collect()[0]
    assert int(total["s"]) == 3_500_000_000


def test_grid_term_error_message_survives_null_neighbors(spark):
    """A real ceiling violation stays diagnosable even when other rows
    are NULL: the message coalesces the offending value, never the
    bare string 'null'."""
    import pytest
    from pyspark.sql import functions as F

    from rclabsapi_spark.functions.scalars import grid_term

    df = spark.createDataFrame([(None,), (1.0e10,)], "x double")
    with pytest.raises(Exception, match="grid ceiling"):
        df.select(grid_term(F.col("x")).alias("g")).collect()
