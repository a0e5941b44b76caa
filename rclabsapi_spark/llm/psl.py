"""Public-Suffix-List registrable domains, engine-portable.

The registrable domain ("eTLD+1") of a host is the public suffix the
host falls under plus one more label — ``bbc.co.uk`` for
``news.bbc.co.uk``, NOT ``co.uk`` (what a naive last-two-labels rule
returns for every UK site). Rules and matching algorithm follow the
public specification at publicsuffix.org/list (Mozilla Public Suffix
List, public data):

- a **normal** rule is a suffix (``co.uk``);
- a **wildcard** rule ``*.ck`` makes every direct child of ``ck`` a
  public suffix;
- an **exception** rule ``!www.ck`` prevails over any other matching
  rule and declares its own parent the public suffix (so ``www.ck``
  itself is registrable);
- the prevailing rule is the exception if one matches, else the
  LONGEST matching rule, else the implicit default ``*`` (the bare
  TLD) — exactly the naive fallback, so unknown TLDs behave as before.

The FULL public list (ICANN + private sections, ~9.5k rules) is
vendored verbatim at ``psl.dat`` next to this module (MPL-2.0 data,
license header inside the file; obtained from the OS's publicsuffix
package, same bytes as publicsuffix.org). ``_load_rules`` parses it
once per process and pins its sha256 — a data swap that skips the pin
fails at first use, and updating the pin (a function-source edit)
re-stales every dependent query's digest, so rule-table changes go
through the verification ledger like code changes do. ``_MAX_K`` (how
many trailing labels can carry a prevailing rule) is derived from the
parsed rules, not hard-coded: a longer future rule extends the lookup
chain automatically instead of silently mis-resolving.

At 100 TB the lookup stays an **expression-level map literal**, NOT a
broadcast join: the ~9.5k-entry map packs into ONE string literal that
``str_to_map`` over foldable arguments turns into a single map
constant at optimization time (verified: the optimized plan carries
the folded literal, zero per-row parsing), and it is ``let``-bound so
the plan holds exactly one copy however many lookups reference it.
One ~130 KB constant in the plan beats shipping a build side to every
exchange, and keeps callers single exchange-free Projects. Building
the same map from per-entry ``F.lit`` calls would cost ~19k py4j
round-trips per plan — the packed-literal shape is also the fast path
on the driver.

Reference parity note: the reference has no URL/domain layer (its ETL
is log/metric-shaped); this module serves the web-corpus curation tier
(SURVEY §2 extensions) where domain rollups and crawl budgets need
real eTLD+1 semantics.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

# rule -> type: 1 = normal, 2 = wildcard parent (``*.<rule>`` in the
# list), 3 = exception (``!<rule>``). Parsed lazily from psl.dat; no
# name is both a normal rule and a wildcard parent in the public list
# (asserted at parse), so a flat map is collision-free.
_RULES: tuple[tuple[str, int], ...] | None = None


def _load_rules() -> tuple[tuple[str, int], ...]:
    """Parse the vendored public list (skip blanks/comments; ``!`` and
    ``*.`` prefixes mark exception / wildcard rules). The sha256 pin
    below is the ledger hook described in the module docstring."""
    import hashlib

    global _RULES
    if _RULES is not None:
        return _RULES
    raw = (Path(__file__).with_name("psl.dat")).read_bytes()
    digest = hashlib.sha256(raw).hexdigest()
    pinned = "87d2e11f3602b504fc5dbea9218429a4ce3c0f62aa6ce7a1371024add024baed"
    if digest != pinned:
        raise ValueError(
            f"psl.dat sha256 {digest} != pinned {pinned}: update the pin "
            "in _load_rules so dependent query digests re-stale"
        )
    rules: list[tuple[str, int]] = []
    for line in raw.decode("utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            rules.append((line[1:], 3))
        elif line.startswith("*."):
            rules.append((line[2:], 2))
        else:
            rules.append((line, 1))
    seen = {r for r, _ in rules}
    if len(seen) != len(rules):
        raise ValueError("psl.dat has a name with two rule types")
    _RULES = tuple(rules)
    return _RULES


def _max_k() -> int:
    """Longest trailing-label window a prevailing rule can need: a
    normal/exception rule matches at its own label count; a wildcard
    parent of L labels makes (L+1)-label public suffixes, so the
    normal/wildcard branch probes one past the parent."""
    return max(
        r.count(".") + 1 + (1 if t == 2 else 0) for r, t in _load_rules()
    )


def _rule_map() -> Column:
    """The rule table as one foldable ``str_to_map`` literal (module
    docstring has the plan-size/py4j rationale). Values are the type
    codes as strings. Rules never contain ``,`` or ``:`` (domain-label
    charset), so the packing is unambiguous."""
    packed = ",".join(f"{r}:{t}" for r, t in _load_rules())
    return F.str_to_map(F.lit(packed), F.lit(","), F.lit(":"))


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a bare (already lowercased, port-free) host, per the
    PSL algorithm above. One split + a fixed chain of map-literal
    lookups — no join, no shuffle, rides along any plan. When the host
    IS a public suffix (or has a single label), the host itself is
    returned so downstream rollup keys are never null.

    The host, its label array, the rule map, and the prevailing-rule
    length are each bound ONCE via ``let`` (functions/scalars.py): the
    rule chain references them many times, and since the caller's
    ``host`` is itself a composed canonical-URL tree, unbound reuse
    multiplied copies into 47 MB task binaries / 60 s sf0.01 plans in
    the r9 shape."""
    from rclabsapi_spark.functions.scalars import let

    return let(
        host,
        lambda h: let(
            F.split(h, r"\."),
            lambda ps: let(_rule_map(), lambda m: _prevailing(h, ps, m)),
        ),
    )


def _prevailing(host: Column, parts: Column, m: Column) -> Column:
    from rclabsapi_spark.functions.scalars import let

    n = F.size(parts)
    max_k = _max_k()

    def cand(k: int) -> Column:
        return F.array_join(F.slice(parts, -k, k), ".")

    # typ[k] = rule type matching the last k labels (null: no rule);
    # map values are the type codes as strings (see _rule_map)
    typ = {
        k: F.when(n >= k, F.try_element_at(m, cand(k)))
        for k in range(1, max_k + 1)
    }

    branches: list[Column] = []
    # exception rules prevail over everything; public suffix = parent
    for k in range(max_k, 0, -1):
        branches.append(F.when(typ[k] == "3", F.lit(k - 1)))
    # else the longest match: a normal rule of length k, or a wildcard
    # whose parent is the last k-1 labels (needs a k-th label present)
    for k in range(max_k, 1, -1):
        branches.append(
            F.when(
                (typ[k] == "1") | ((typ[k - 1] == "2") & (n >= k)), F.lit(k)
            )
        )
    branches.append(F.when(typ[1] == "1", F.lit(1)))
    ps_len = F.coalesce(*branches, F.lit(1))  # implicit ``*`` default

    return let(
        ps_len,
        lambda pl: F.when(
            n > pl,
            F.array_join(F.slice(parts, -(pl + F.lit(1)), pl + F.lit(1)), "."),
        ).otherwise(host),
    )


def psl_values_sql() -> str:
    """The same rules as a SQL VALUES list ``psl(rule, typ)`` for the
    DuckDB oracles — the oracle re-implements the matching algorithm
    independently (decorrelated rule lookups + CASE chain), so a
    cross-engine run exercises the algorithm, not a shared
    implementation. ~9.5k rows inline; DuckDB parses and hashes the
    list in milliseconds and the oracle side only runs at verification
    scale (sf0.01/sf0.1), never at production scale."""
    rows = ", ".join(f"('{r}', {t})" for r, t in _load_rules())
    return f"(VALUES {rows}) AS psl(rule, typ)"


def psl_match_sql(*, host: str = "chost") -> dict[str, str]:
    """SQL fragments of the PSL matching chain for the DuckDB oracles,
    generated from the same derived ``_max_k`` as the Spark side so a
    rule-table swap cannot leave the two engines probing different
    window lengths (the hard-coded k≤4 chain would silently mis-rank
    the full list's 5-label rules). Returns pieces the caller splices
    into its CTE pipeline:

    - ``split``:  ``sp`` / ``n`` column defs over ``host``;
    - ``cands``:  ``c1..cK`` trailing-label candidate defs;
    - ``typed``:  ``t1..tK`` scalar-subquery rule lookups (expects a
      CTE named ``psl(rule, typ)`` in scope);
    - ``pslen``:  the prevailing-rule COALESCE producing ``pl``;
    - ``domain``: the final eTLD+1 CASE over ``sp``/``n``/``pl``.
    """
    k_max = _max_k()
    cands = []
    for k in range(k_max, 1, -1):
        cands.append(
            f"CASE WHEN n >= {k} THEN "
            f"array_to_string(list_slice(sp, n - {k - 1}, n), '.') "
            f"END AS c{k}"
        )
    cands.append("sp[n] AS c1")
    typed = [
        f"(SELECT typ FROM psl WHERE rule = c{k}) AS t{k}"
        for k in range(k_max, 0, -1)
    ]
    lens = []
    for k in range(k_max, 0, -1):  # exceptions: suffix = parent
        lens.append(f"CASE WHEN t{k} = 3 THEN {k - 1} END")
    for k in range(k_max, 1, -1):  # longest normal/wildcard match
        lens.append(
            f"CASE WHEN t{k} = 1 OR (t{k - 1} = 2 AND n >= {k}) "
            f"THEN {k} END"
        )
    lens.append("CASE WHEN t1 = 1 THEN 1 END")
    return {
        "split": (
            f"string_split({host}, '.') AS sp, "
            f"len(string_split({host}, '.')) AS n"
        ),
        "cands": ",\n           ".join(cands),
        "typed": ",\n           ".join(typed),
        "pslen": "COALESCE(\n               "
        + ",\n               ".join(lens)
        + ",\n               1) AS pl",
        "domain": (
            f"CASE WHEN n > pl "
            f"THEN array_to_string(list_slice(sp, n - pl, n), '.') "
            f"ELSE {host} END"
        ),
    }
