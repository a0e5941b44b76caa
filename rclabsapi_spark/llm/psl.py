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

At 100 TB the lookup stays an **expression-level literal**, NOT a
broadcast join — one few-hundred-KB constant in the plan beats
shipping a build side to every exchange, and keeps callers single
exchange-free Projects. The structure is an **open-addressed hash
table built at plan time**: slot = md5(rule)[:8 hex] mod N (N =
``_N_SLOTS`` = 65536, load factor ~0.15), linear probing, packed into
ONE separator-joined
string that a foldable ``F.split`` turns into a single array constant
at optimization time. Each lookup is one md5 + ≤``_PROBES``
element_at/compare steps — O(1). A literal MAP is the wrong structure
here: Spark's ``element_at`` on an ArrayBasedMapData literal is a
LINEAR key scan, which at 9.5k rules × 6 probes/row measured 27×
slower (8.5 s vs 0.3 s per sf0.1 pass) than this table. Building
either structure from per-entry ``F.lit`` calls would cost ~19k py4j
round-trips per plan — the packed-literal shape is also the fast path
on the driver. (Foldable literals of this kind never compare
canonically equal across optimizer copies, so downstream operators
must NOT rely on exchange reuse — callers were made structurally
single-scan in r11.)

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


# open-addressed table parameters: N slots (power of two, ~0.15 load
# at 9.5k rules — short clusters keep both the build-time max probe
# bound AND the expected miss walk near 1) and the build-time max
# probe length (computed once)
_N_SLOTS = 65536
_TABLE: tuple[str, int] | None = None  # (packed slots, max probes)


def _slot(rule: str) -> int:
    import hashlib

    return int(hashlib.md5(rule.encode("utf-8")).hexdigest()[:8], 16) % (
        _N_SLOTS
    )


def _build_table() -> tuple[str, int]:
    """Insert every rule at md5-slot with linear probing; each occupied
    slot stores ``<typ-digit><rule>`` (rules never contain the \\x01
    separator — domain-label charset). Returns the packed slot string
    and the max probe distance, which bounds the lookup chain."""
    global _TABLE
    if _TABLE is not None:
        return _TABLE
    slots: list[str] = [""] * _N_SLOTS
    max_probe = 1
    for rule, typ in _load_rules():
        i = _slot(rule)
        d = 1
        while slots[i % _N_SLOTS]:
            i += 1
            d += 1
        slots[i % _N_SLOTS] = f"{typ}{rule}"
        max_probe = max(max_probe, d)
    _TABLE = ("\x01".join(slots), max_probe)
    return _TABLE


def _rule_arr() -> tuple[Column, int]:
    """The hash table as one foldable split-array literal plus the
    probe bound (module docstring has the O(1)-vs-linear-map and
    plan-size/py4j rationale)."""
    packed, max_probe = _build_table()
    return F.split(F.lit(packed), "\x01"), max_probe


def _lookup(arr: Column, max_probe: int, cand: Column) -> Column:
    """Rule-type lookup for a candidate suffix: md5-slot + ≤max_probe
    linear-probe steps over the folded array; returns the type digit
    ('1'/'2'/'3') or NULL. The Spark-side md5-hex-prefix arithmetic is
    byte-identical to the Python build (_slot), so hit slots match.
    The probe chain nests in the OTHERWISE branch so evaluation
    short-circuits: an EMPTY slot proves absence under linear probing
    (STOP, null), a key match returns its digit (STOP) — only a
    same-cluster collision walks on, so the expected interpreted work
    per candidate is ~1 probe at the table's 0.15 load, not
    max_probe. Both the candidate and its slot hash are ``let``-bound:
    interpreted evaluation re-computes every textual occurrence, so an
    unbound ``h`` would re-run md5+conv once per probe (and the caller
    binds each lookup RESULT once per k — branch logic references it
    several times)."""
    from rclabsapi_spark.functions.scalars import let

    def chain(c: Column, h: Column) -> Column:
        expr = F.lit(None).cast("string")
        for j in range(max_probe - 1, -1, -1):
            s = F.element_at(
                arr, ((h + F.lit(j)) % _N_SLOTS + 1).cast("int")
            )
            expr = (
                F.when(s == "", F.lit(None).cast("string"))
                .when(F.substring(s, 2, 64) == c, F.substring(s, 1, 1))
                .otherwise(expr)
            )
        return expr

    return let(
        cand,
        lambda c: let(
            F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
            % _N_SLOTS,
            lambda h: chain(c, h),
        ),
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a bare (already lowercased, port-free) host, per the
    PSL algorithm above. One split + a fixed chain of map-literal
    lookups — no join, no shuffle, rides along any plan. When the host
    IS a public suffix (or has a single label), the host itself is
    returned so downstream rollup keys are never null.

    The host, its label array, the rule table, and the prevailing-rule
    length are each bound ONCE via ``let`` (functions/scalars.py): the
    rule chain references them many times, and since the caller's
    ``host`` is itself a composed canonical-URL tree, unbound reuse
    multiplied copies into 47 MB task binaries / 60 s sf0.01 plans in
    the r9 shape."""
    from rclabsapi_spark.functions.scalars import let

    arr, max_probe = _rule_arr()
    return let(
        host,
        lambda h: let(
            F.split(h, r"\."),
            lambda ps: let(
                arr, lambda a: _prevailing(h, ps, a, max_probe)
            ),
        ),
    )


def _prevailing(
    host: Column, parts: Column, arr: Column, max_probe: int
) -> Column:
    from rclabsapi_spark.functions.scalars import let

    n = F.size(parts)
    max_k = _max_k()

    def cand(k: int) -> Column:
        return F.array_join(F.slice(parts, -k, k), ".")

    # typ[k] = rule type matching the last k labels (null: no rule);
    # values are the type digits as strings (see _build_table). Each
    # lookup result is let-bound so it evaluates ONCE per row: the
    # branch chain references typ[k] up to three times, and interpreted
    # evaluation re-runs every textual occurrence (unbound, that was
    # ~3x the md5+probe work per row).
    def with_typ(k: int, typ: dict[int, Column]) -> Column:
        if k > max_k:
            return _branches(host, parts, n, max_k, typ)
        return let(
            F.when(n >= k, _lookup(arr, max_probe, cand(k))),
            lambda t: with_typ(k + 1, {**typ, k: t}),
        )

    return with_typ(1, {})


def _branches(
    host: Column,
    parts: Column,
    n: Column,
    max_k: int,
    typ: dict[int, Column],
) -> Column:
    from rclabsapi_spark.functions.scalars import let

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
