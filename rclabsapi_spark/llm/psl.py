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

``PSL_RULES`` ships a curated subset of the public list (the full list
is ~9k rules; swapping it in is a data change, not a code change — the
lookup is rule-count-agnostic). At 100 TB the lookup stays a
**map-literal expression** (the PQ-codebook pattern), NOT a broadcast
join: a few-KB literal in the plan beats shipping a build side to
every exchange, and keeps callers single exchange-free Projects.

Reference parity note: the reference has no URL/domain layer (its ETL
is log/metric-shaped); this module serves the web-corpus curation tier
(SURVEY §2 extensions) where domain rollups and crawl budgets need
real eTLD+1 semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (rule, type): 1 = normal, 2 = wildcard parent (``*.<rule>``),
# 3 = exception (``!<rule>``). Curated from the public list at
# publicsuffix.org — ICANN TLDs/ccTLD second-levels plus a few private
# hosting suffixes; max rule length 3 labels.
PSL_RULES: tuple[tuple[str, int], ...] = (
    # generic TLDs
    ("com", 1), ("org", 1), ("net", 1), ("edu", 1), ("gov", 1),
    ("io", 1), ("co", 1), ("dev", 1), ("app", 1), ("info", 1),
    # ccTLDs with registrations at the second level only
    ("de", 1), ("fr", 1), ("nl", 1), ("ch", 1), ("se", 1), ("us", 1),
    ("ca", 1), ("eu", 1), ("es", 1), ("it", 1), ("pl", 1), ("ru", 1),
    ("cn", 1), ("kr", 1), ("mx", 1), ("ar", 1),
    # ccTLDs with mandated second-level suffixes
    ("uk", 1), ("co.uk", 1), ("org.uk", 1), ("gov.uk", 1),
    ("ac.uk", 1), ("net.uk", 1), ("me.uk", 1), ("ltd.uk", 1),
    ("plc.uk", 1), ("sch.uk", 1), ("nhs.uk", 1),
    ("au", 1), ("com.au", 1), ("net.au", 1), ("org.au", 1),
    ("edu.au", 1), ("gov.au", 1), ("id.au", 1), ("asn.au", 1),
    ("jp", 1), ("co.jp", 1), ("or.jp", 1), ("ne.jp", 1),
    ("ac.jp", 1), ("go.jp", 1), ("ad.jp", 1), ("ed.jp", 1),
    ("br", 1), ("com.br", 1), ("net.br", 1), ("org.br", 1),
    ("gov.br", 1), ("edu.br", 1),
    ("in", 1), ("co.in", 1), ("net.in", 1), ("org.in", 1),
    ("gov.in", 1), ("ac.in", 1), ("firm.in", 1), ("gen.in", 1),
    ("nz", 1), ("co.nz", 1), ("org.nz", 1), ("govt.nz", 1),
    ("za", 1), ("co.za", 1), ("org.za", 1), ("gov.za", 1),
    ("sg", 1), ("com.sg", 1), ("edu.sg", 1), ("gov.sg", 1),
    ("tw", 1), ("com.tw", 1), ("org.tw", 1),
    ("hk", 1), ("com.hk", 1),
    ("tr", 1), ("com.tr", 1), ("gov.tr", 1),
    # wildcard families (every direct child is a public suffix)
    ("ck", 2), ("er", 2), ("fk", 2), ("bd", 2), ("kawasaki.jp", 2),
    ("kitakyushu.jp", 2),
    # exceptions (registrable despite a matching wildcard)
    ("www.ck", 3), ("city.kawasaki.jp", 3), ("city.kitakyushu.jp", 3),
    # private-section hosting suffixes
    ("github.io", 1), ("gitlab.io", 1), ("blogspot.com", 1),
    ("herokuapp.com", 1), ("netlify.app", 1), ("pages.dev", 1),
)

# Longest rule is 3 labels → a wildcard can make a 4-label public
# suffix; exceptions are checked at up to _MAX_K labels.
_MAX_K = 4


def _rule_map() -> Column:
    pairs: list[Column] = []
    for rule, typ in PSL_RULES:
        pairs.append(F.lit(rule))
        pairs.append(F.lit(typ))
    return F.create_map(*pairs)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a bare (already lowercased, port-free) host, per the
    PSL algorithm above. One split + a fixed chain of map-literal
    lookups — no join, no shuffle, rides along any plan. When the host
    IS a public suffix (or has a single label), the host itself is
    returned so downstream rollup keys are never null.

    The host, its label array, and the prevailing-rule length are each
    bound ONCE via ``let`` (functions/scalars.py): the rule chain
    references them ~15/11/3 times respectively, and since the caller's
    ``host`` is itself a composed canonical-URL tree, unbound reuse
    multiplied copies into 47 MB task binaries / 60 s sf0.01 plans in
    the r9 shape."""
    from rclabsapi_spark.functions.scalars import let

    return let(
        host,
        lambda h: let(F.split(h, r"\."), lambda ps: _prevailing(h, ps)),
    )


def _prevailing(host: Column, parts: Column) -> Column:
    from rclabsapi_spark.functions.scalars import let

    n = F.size(parts)

    def cand(k: int) -> Column:
        return F.array_join(F.slice(parts, -k, k), ".")

    m = _rule_map()
    # typ[k] = rule type matching the last k labels (null: no rule)
    typ = {
        k: F.when(n >= k, F.try_element_at(m, cand(k)))
        for k in range(1, _MAX_K + 1)
    }

    branches: list[Column] = []
    # exception rules prevail over everything; public suffix = parent
    for k in range(_MAX_K, 0, -1):
        branches.append(F.when(typ[k] == 3, F.lit(k - 1)))
    # else the longest match: a normal rule of length k, or a wildcard
    # whose parent is the last k-1 labels (needs a k-th label present)
    for k in range(_MAX_K, 1, -1):
        branches.append(
            F.when((typ[k] == 1) | ((typ[k - 1] == 2) & (n >= k)), F.lit(k))
        )
    branches.append(F.when(typ[1] == 1, F.lit(1)))
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
    independently (correlated lookups + CASE chain), so cross-engine
    parity exercises the algorithm, not a shared implementation."""
    rows = ", ".join(f"('{r}', {t})" for r, t in PSL_RULES)
    return f"(VALUES {rows}) AS psl(rule, typ)"
