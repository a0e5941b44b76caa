"""Corpus-cleaning suite: PII scrub, benchmark decontamination, repetition
metrics, and the composite C4/Gopher-style keep/drop audit — the cleaning
tier of a training-data pipeline over the ``documents`` fixture.

Oracle parity notes:

- PII patterns are RE2-compatible so the literal pattern text runs in both
  Java regex (Spark) and RE2 (DuckDB); Spark ``regexp_replace`` is global
  by default ↔ DuckDB needs the ``'g'`` flag.
- the fixture corpus contains no PII, so the PII query injects a
  deterministic synthetic tail (email/IP/phone/SSN derived from doc_id) on
  BOTH sides before scrubbing — the redaction itself is what's verified.
- integer-ratio floats (count/count) divide bit-identically in both
  engines; only the final ROUND(…, 6) is for display stability.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.layout import spread_by
from rclabsapi_spark.llm.cleaning import (
    PII_PATTERNS,
    corpus_filter,
    decontaminate,
    pii_scrub,
    repetition_metrics,
)
from rclabsapi_spark.registry import query

# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

_PII_TAIL_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 call 555-867-5309 ssn 123-45-6789'"
)

_PII_REDACT_SQL = "text"
for _name, _pat in PII_PATTERNS:
    _PII_REDACT_SQL = (
        f"regexp_replace({_PII_REDACT_SQL}, '{_pat}',"
        f" '<{_name.upper()}>', 'g')"
    )

_PII_ORACLE = f"""
WITH inj AS (SELECT doc_id, {_PII_TAIL_SQL} AS text FROM documents)
SELECT doc_id,
       {", ".join(
           f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{name}"
           for name, pat in PII_PATTERNS
       )},
       md5({_PII_REDACT_SQL}) AS clean_hash
FROM inj
"""


@query("clean_pii_scrub", _PII_ORACLE)
def q_pii(spark, sf_dir):
    """PII detection counts + redaction over documents with a synthetic
    PII tail (fixture corpus is PII-free). Pure regexp Project — zero
    shuffle; extends input_validator.cpp sanitizeString (field hygiene)
    to corpus hygiene."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-867-5309 ssn 123-45-6789"),
        ).alias("text"),
    )
    return pii_scrub(docs).select(
        "doc_id",
        *[f"n_{name}" for name, _ in PII_PATTERNS],
        F.md5("clean_text").alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

# Word-3-gram posting with the short-doc guard — mirrors
# llm.dedup.shingle_posting (and llm suite _SHINGLES_SQL) exactly.
_GRAMS3_SQL = """
    SELECT doc_id,
           UNNEST(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1] || ' '
                    || string_split(text, ' ')[i+2])) AS shingle
    FROM documents
"""

_DECONTAM_ORACLE = f"""
WITH grams AS ({_GRAMS3_SQL}),
eval_g AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 97 = 0),
tg AS (SELECT DISTINCT doc_id, shingle FROM grams WHERE doc_id % 97 <> 0),
agg AS (
    SELECT tg.doc_id, COUNT(*)::BIGINT AS total_ngrams,
           COUNT(e.shingle)::BIGINT AS overlap_ngrams
    FROM tg LEFT JOIN eval_g e USING (shingle)
    GROUP BY tg.doc_id
)
SELECT d.doc_id,
       COALESCE(total_ngrams, 0) AS total_ngrams,
       COALESCE(overlap_ngrams, 0) AS overlap_ngrams,
       ROUND(COALESCE(overlap_ngrams / total_ngrams, 0), 6)
           AS contamination_ratio,
       COALESCE(overlap_ngrams, 0) >= 3 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN agg USING (doc_id)
"""


@query("clean_decontaminate", _DECONTAM_ORACLE, bench=True)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing ≥ 3 distinct 3-grams with
    the pseudo-eval slice (doc_id % 97 == 0) are flagged. Eval n-gram set
    broadcasts; the training corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=3,
        min_overlap=3,
    )


# ---------------------------------------------------------------------------
# Repetition / boilerplate metrics
# ---------------------------------------------------------------------------

_GRAMS2_SQL = """
    SELECT doc_id,
           UNNEST(list_transform(
               range(1, greatest(len(string_split(text, ' ')), 1)),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1])) AS shingle
    FROM documents
"""

_REPETITION_CORE_SQL = f"""
counts AS (
    SELECT doc_id, shingle, COUNT(*)::BIGINT AS cnt
    FROM ({_GRAMS2_SQL}) AS g GROUP BY doc_id, shingle
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY cnt DESC, shingle) AS rn
    FROM counts
),
per_doc AS (
    SELECT doc_id, SUM(cnt)::BIGINT AS total_bigrams,
           COUNT(*)::BIGINT AS distinct_bigrams,
           MAX(CASE WHEN rn = 1 THEN shingle END) AS top_bigram,
           MAX(CASE WHEN rn = 1 THEN cnt END)::BIGINT AS top_bigram_count
    FROM ranked GROUP BY doc_id
),
words AS (
    SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_words,
           ROUND(len(list_distinct(string_split(text, ' ')))
                 / len(string_split(text, ' ')), 6) AS distinct_word_ratio,
           ROUND(COALESCE(p.top_bigram_count / p.total_bigrams, 0), 6)
               AS top_bigram_frac,
           p.top_bigram, p.top_bigram_count, p.total_bigrams,
           p.distinct_bigrams
    FROM documents LEFT JOIN per_doc p USING (doc_id)
)
"""

_REPETITION_ORACLE = f"""
WITH {_REPETITION_CORE_SQL}
SELECT doc_id, n_words, distinct_word_ratio,
       COALESCE(top_bigram, '') AS top_bigram,
       COALESCE(top_bigram_count, 0) AS top_bigram_count,
       top_bigram_frac,
       ROUND(COALESCE(1 - distinct_bigrams / total_bigrams, 0), 6)
           AS dup_bigram_frac
FROM words
"""


@query("clean_repetition_metrics", _REPETITION_ORACLE, bench=True)
def q_repetition(spark, sf_dir):
    """Gopher-style per-doc repetition features (distinct-word ratio, top
    bigram fraction, duplicate-bigram fraction). One doc-partitioned
    window + one groupBy; word ratios are shuffle-free array math."""
    return repetition_metrics(
        load_table(spark, sf_dir, "documents")
    ).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "distinct_word_ratio",
        "top_bigram",
        "top_bigram_count",
        "top_bigram_frac",
        "dup_bigram_frac",
    )


# ---------------------------------------------------------------------------
# Composite keep/drop audit
# ---------------------------------------------------------------------------

_CORPUS_STATS_ORACLE = f"""
WITH {_REPETITION_CORE_SQL},
audit AS (
    SELECT d.lang,
           CASE WHEN length(d.text) < 100 THEN 'too_short'
                WHEN length(d.text) > 500 THEN 'too_long'
                WHEN w.distinct_word_ratio < 0.45
                    THEN 'low_lexical_diversity'
                WHEN w.top_bigram_frac > 0.12 THEN 'repeated_bigram'
                ELSE '' END AS drop_reason
    FROM documents d JOIN words w USING (doc_id)
)
SELECT lang, drop_reason, COUNT(*)::BIGINT AS n_docs
FROM audit GROUP BY lang, drop_reason
"""


@query("clean_corpus_stats", _CORPUS_STATS_ORACLE)
def q_corpus_stats(spark, sf_dir):
    """C4/Gopher-style cleaning audit: per (lang, drop_reason) doc counts
    after length + repetition rules ('' = kept). The decision is a CASE
    chain over already-computed features — no extra pass."""
    return (
        corpus_filter(load_table(spark, sf_dir, "documents"))
        .groupBy("lang", "drop_reason")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Boilerplate span mining (repeated n-grams across documents)
# ---------------------------------------------------------------------------

_BOILERPLATE_ORACLE = """
WITH sh AS (
    SELECT doc_id,
           list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 3, 1)),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1] || ' '
                    || string_split(text, ' ')[i+2] || ' '
                    || string_split(text, ' ')[i+3] || ' '
                    || string_split(text, ' ')[i+4]) AS gs
    FROM documents
),
posting AS (SELECT doc_id, UNNEST(gs) AS gram FROM sh)
SELECT gram, COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_occurrences
FROM posting GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, gram
LIMIT 20
"""


@query("clean_boilerplate_ngrams", _BOILERPLATE_ORACLE, bench=True)
def q_boilerplate(spark, sf_dir):
    """Top-20 word 5-grams repeated across the most documents — the
    boilerplate-span detector run before near-dup scoring (repeated
    navigation/footer text inflates Jaccard between unrelated pages).
    Same shingle construction as the n-gram index; one exploded
    aggregate, TakeOrdered top-k. llm/cleaning.py::boilerplate_ngrams."""
    from rclabsapi_spark.llm.cleaning import boilerplate_ngrams

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_ngrams(docs, n=5, min_docs=2, k=20)


# ---------------------------------------------------------------------------
# Percentile winsorization (robust value clipping)
# ---------------------------------------------------------------------------

_WINSORIZE_ORACLE = f"""
WITH bounds AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo,
           quantile_cont(value, 0.95) AS hi
    FROM events GROUP BY 1
)
SELECT e.event_type,
       COUNT(*)::BIGINT AS n,
       SUM(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT AS n_clipped_lo,
       SUM(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped_hi,
       -- 9dp-integer-grid means (order-independent): per-row values
       -- are bit-identical across engines, accumulation order is not
       FLOOR((SUM(CAST(FLOOR(value * 1000000000.0 + 0.5) AS HUGEINT))::DOUBLE
              / (COUNT(*) * 1000000000.0)) * 1000000.0 + 0.5)
           / 1000000.0 AS mean_raw,
       FLOOR((SUM(CAST(FLOOR(LEAST(GREATEST(value, lo), hi)
                             * 1000000000.0 + 0.5) AS HUGEINT))::DOUBLE
              / (COUNT(*) * 1000000000.0)) * 1000000.0 + 0.5)
           / 1000000.0 AS mean_winsorized
FROM events e JOIN bounds b ON e.event_type = b.event_type
GROUP BY 1
"""


@query("clean_winsorize_value", _WINSORIZE_ORACLE, bench=True)
def q_winsorize(spark, sf_dir):
    """Per-type p05/p95 winsorization audit: how many values clip at
    each tail and what the clipped mean looks like — the robust
    preprocessing step before feeding heavy-tailed metrics to a model
    (outliers cap instead of dominating). Exact per-group percentiles
    broadcast back; clipping is per-row arithmetic; at scale the
    GK-sketch percentile swap applies (operators/approx.py). Means sum
    9dp-integer-grid values (order-independent — raw F.avg of doubles
    is accumulation-ordered across shuffle partitions)."""
    from rclabsapi_spark.functions.scalars import round_half_up

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))

    def nano(c):
        return F.floor(c * 1000000000.0 + F.lit(0.5)).cast("decimal(38,0)")

    def grid_mean(c):
        return round_half_up(
            F.sum(nano(c)).cast("double")
            / (F.count(F.lit(1)) * 1000000000.0),
            6,
        )

    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias(
            "n_clipped_lo"
        ),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias(
            "n_clipped_hi"
        ),
        grid_mean(F.col("value")).alias("mean_raw"),
        grid_mean(clipped).alias("mean_winsorized"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + domain-level dedup rollup (web-corpus hygiene)
# ---------------------------------------------------------------------------

# The fixture has no URL column, so BOTH engines derive the same
# deterministic pseudo-URL per document (the _PII_TAIL_SQL precedent:
# the operator under test is the canonicalizer, not the synthesis).
# md5-derived hex digits toggle the case/port/slash/tracking/fragment
# variance a real crawl exhibits; the canonical form collapses it.


def _v(h, k):
    # hex digit k of the doc's url-hash, first-half test (P=0.5)
    return F.substring(h, k, 1) < "8"


_PSEUDO_TLDS = (".com", ".co.uk", ".gov.uk", ".com.au",
                ".co.jp", ".github.io", ".ck", ".org")


def _pseudo_url_col():
    h = F.md5(F.concat(F.lit("url:"), F.col("doc_id").cast("string")))
    scheme = F.when(_v(h, 1), F.lit("HTTPS")).otherwise(F.lit("https"))
    www = F.when(_v(h, 2), F.lit("WWW.")).otherwise(F.lit(""))
    # TLD from hash nibble 9 (2 hex chars per suffix) — exercises the
    # PSL tiers: mandated second levels (co.uk/gov.uk/com.au/co.jp),
    # a private hosting suffix (github.io), a wildcard family (ck),
    # and plain TLDs; nibble 10 adds a subdomain so multi-label hosts
    # exist (news.SOURCE.co.uk must roll up to SOURCE.co.uk, not
    # co.uk — the bug the PSL closes).
    c9 = F.substring(h, 9, 1)
    tld = F.lit(_PSEUDO_TLDS[-1])
    for i, t in enumerate(reversed(_PSEUDO_TLDS[:-1])):
        bound = format(2 * (len(_PSEUDO_TLDS) - 1 - i), "x")
        tld = F.when(c9 < bound, F.lit(t)).otherwise(tld)
    base = F.concat(
        F.when(_v(h, 10), F.lit("news.")).otherwise(F.lit("")),
        F.col("source"),
        tld,
    )
    host = F.when(_v(h, 3), F.upper(base)).otherwise(base)
    port = F.when(_v(h, 4), F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/p/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(_v(h, 5), F.lit("/")).otherwise(F.lit("")),
    )
    idp = F.concat(F.lit("id="), (F.col("doc_id") % 10).cast("string"))
    params = F.when(
        _v(h, 8), F.concat(F.lit("lang="), F.col("lang"), F.lit("&"), idp)
    ).otherwise(idp)
    params = F.when(
        _v(h, 6), F.concat(F.lit("utm_source=feed&"), params)
    ).otherwise(params)
    frag = F.when(_v(h, 7), F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), www, host, port, path, F.lit("?"), params, frag
    )


def _vsql(k):
    return f"substring(md5('url:' || CAST(doc_id AS VARCHAR)), {k}, 1) < '8'"


def _tld_sql():
    c9 = "substring(md5('url:' || CAST(doc_id AS VARCHAR)), 9, 1)"
    arms = "".join(
        f"WHEN {c9} < '{format(2 * (j + 1), 'x')}' THEN '{t}' "
        for j, t in enumerate(_PSEUDO_TLDS[:-1])
    )
    return f"(CASE {arms}ELSE '{_PSEUDO_TLDS[-1]}' END)"


_PSEUDO_HOST_SQL = f"""
    (CASE WHEN {_vsql(3)}
          THEN upper((CASE WHEN {_vsql(10)} THEN 'news.' ELSE '' END)
                     || source || {_tld_sql()})
          ELSE (CASE WHEN {_vsql(10)} THEN 'news.' ELSE '' END)
               || source || {_tld_sql()} END)
"""

_PSEUDO_URL_SQL = f"""
    (CASE WHEN {_vsql(1)} THEN 'HTTPS' ELSE 'https' END) || '://'
    || (CASE WHEN {_vsql(2)} THEN 'WWW.' ELSE '' END)
    || {_PSEUDO_HOST_SQL}
    || (CASE WHEN {_vsql(4)} THEN ':443' ELSE '' END)
    || '/p/' || CAST(doc_id % 25 AS VARCHAR)
    || (CASE WHEN {_vsql(5)} THEN '/' ELSE '' END)
    || '?'
    || (CASE WHEN {_vsql(6)} THEN 'utm_source=feed&' ELSE '' END)
    || (CASE WHEN {_vsql(8)}
        THEN 'lang=' || lang || '&id=' || CAST(doc_id % 10 AS VARCHAR)
        ELSE 'id=' || CAST(doc_id % 10 AS VARCHAR) END)
    || (CASE WHEN {_vsql(7)} THEN '#sec' ELSE '' END)
"""

# the DuckDB mirror of llm/cleaning.py::canonicalize_url — same regex
# text (RE2-compatible), same param-drop list, same sort
from rclabsapi_spark.llm.psl import psl_match_sql as _psl_match_sql
from rclabsapi_spark.llm.psl import psl_values_sql as _psl_values_sql

_PSL_VALUES = _psl_values_sql()
_PSL_MATCH = _psl_match_sql(host="chost")

_URL_CANON_CTE = f"""
raw AS (
    SELECT doc_id, {_PSEUDO_URL_SQL} AS raw_url FROM documents
),
parts AS (
    SELECT doc_id, raw_url,
           regexp_replace(raw_url, '#.*$', '') AS no_frag
    FROM raw
),
comp AS (
    SELECT doc_id, raw_url,
           lower(regexp_extract(no_frag,
               '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
           lower(regexp_extract(no_frag,
               '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?]+)', 1)) AS hostport,
           regexp_extract(no_frag,
               '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?]+([^?]*)', 1) AS rawpath,
           regexp_extract(no_frag, '\\?(.*)$', 1) AS qs
    FROM parts
),
canon AS (
    SELECT doc_id, raw_url,
           scheme || '://'
           || regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                             '^www\\.', '')
           || (CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) <> ''
                     AND NOT ((scheme = 'https' AND
                               regexp_extract(hostport, ':([0-9]+)$', 1)
                                   = '443')
                           OR (scheme = 'http' AND
                               regexp_extract(hostport, ':([0-9]+)$', 1)
                                   = '80'))
                    THEN ':' || regexp_extract(hostport, ':([0-9]+)$', 1)
                    ELSE '' END)
           || (CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
                    ELSE regexp_replace(rawpath, '/+$', '') END)
           || (CASE WHEN len(list_sort(list_filter(string_split(qs, '&'),
                        p -> p <> ''
                         AND NOT starts_with(split_part(p, '=', 1), 'utm_')
                         AND split_part(p, '=', 1) NOT IN
                             ('fbclid', 'gclid', 'ref', 'sessionid')))) > 0
                    THEN '?' || array_to_string(list_sort(list_filter(
                             string_split(qs, '&'),
                             p -> p <> ''
                              AND NOT starts_with(split_part(p, '=', 1),
                                                  'utm_')
                              AND split_part(p, '=', 1) NOT IN
                                  ('fbclid', 'gclid', 'ref', 'sessionid'))),
                             '&')
                    ELSE '' END) AS canon_url
    FROM comp
),
chost AS (
    SELECT doc_id, raw_url, canon_url,
           regexp_replace(regexp_extract(canon_url,
               '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?]+)', 1),
               ':[0-9]+$', '') AS chost
    FROM canon
),
psl AS (
    SELECT * FROM {_PSL_VALUES}
),
spx AS (
    SELECT doc_id, raw_url, canon_url, chost,
           {_PSL_MATCH["split"]}
    FROM chost
),
cand AS (
    SELECT *,
           {_PSL_MATCH["cands"]}
    FROM spx
),
typed AS (
    SELECT *,
           {_PSL_MATCH["typed"]}
    FROM cand
),
-- PSL prevailing rule: exception first (public suffix = its parent),
-- else the LONGEST match (normal rule of length k, or a wildcard whose
-- parent is the last k-1 labels), else the implicit '*' default;
-- candidate/lookup/COALESCE chains are generated from the same derived
-- max rule length as the Spark side (llm/psl.py::psl_match_sql)
pslen AS (
    SELECT *,
           {_PSL_MATCH["pslen"]}
    FROM typed
),
dom AS (
    SELECT doc_id, raw_url, canon_url,
           {_PSL_MATCH["domain"]} AS domain
    FROM pslen
)"""

_URL_CANON_ORACLE = f"""
WITH {_URL_CANON_CTE}
SELECT doc_id, raw_url, canon_url, domain FROM dom
"""


@query("clean_url_canonicalize", _URL_CANON_ORACLE, bench=True)
def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization — the normalization a web corpus applies
    before URL-level dedup: lowercase scheme/host, strip www. and
    default ports, drop fragments and utm_*/click-id params, sort the
    surviving params, trim trailing slashes. Per-doc (raw, canonical,
    registrable-domain) rows hash-verify every rule at once. Pure
    codegen string expressions over one scan — no UDF, no shuffle.
    llm/cleaning.py::canonicalize_url/url_registrable_domain."""
    from rclabsapi_spark.llm.cleaning import (
        canonicalize_url,
        url_registrable_domain,
    )

    # The url/canon/domain chain derives entirely from
    # (doc_id, source, lang) — never the text — so the spread exchange
    # carries ~tens of bytes per row while parallelizing the
    # regex-heavy canonicalization (guide §2.5: a single unsplittable
    # fixture file is one scan task; at scale the scan splits and the
    # narrow exchange stays negligible vs the string CPU it spreads).
    docs = spread_by(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang"
        ),
        "doc_id",
    )
    canon = canonicalize_url(_pseudo_url_col())
    return docs.select(
        "doc_id",
        _pseudo_url_col().alias("raw_url"),
        canon.alias("canon_url"),
        url_registrable_domain(canon).alias("domain"),
    )


_DOMAIN_ROLLUP_ORACLE = f"""
WITH {_URL_CANON_CTE}
SELECT domain,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT canon_url)::BIGINT AS n_canon_urls,
       (COUNT(*) - COUNT(DISTINCT canon_url))::BIGINT AS n_dup_docs,
       ROUND((COUNT(*) - COUNT(DISTINCT canon_url))
             / COUNT(*)::DOUBLE, 6) AS dup_rate
FROM dom GROUP BY domain
"""


@query("dedup_domain_rollup", _DOMAIN_ROLLUP_ORACLE)
def q_domain_rollup(spark, sf_dir):
    """Domain-level dedup rollup — the per-site accounting step before
    doc-level dedup: docs per registrable domain, distinct canonical
    URLs, and the implied URL-duplicate count/rate (case/tracking
    variants of one page collapsing under canonicalization). One
    groupBy(domain) with a partial-aggregated count-distinct; the
    domain key is low-cardinality but count-distinct is two-phase, so
    no single reducer sees the corpus.
    llm/cleaning.py::canonicalize_url/url_registrable_domain."""
    from rclabsapi_spark.llm.cleaning import (
        canonicalize_url,
        url_registrable_domain,
    )

    docs = load_table(spark, sf_dir, "documents")
    canon = canonicalize_url(_pseudo_url_col())
    per_doc = docs.select(
        url_registrable_domain(canon).alias("domain"),
        canon.alias("canon_url"),
    )
    return per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canon_url").alias("n_canon_urls"),
        (F.count(F.lit(1)) - F.countDistinct("canon_url")).alias(
            "n_dup_docs"
        ),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("canon_url"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


_URL_KEEPER_ORACLE = f"""
WITH {_URL_CANON_CTE},
keyed AS (
    SELECT d.doc_id, d.canon_url, doc.source
    FROM dom d JOIN documents doc USING (doc_id)
),
keepers AS (
    SELECT canon_url, MIN(doc_id) AS keeper_doc_id
    FROM keyed GROUP BY canon_url
)
SELECT k.source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN k.doc_id = p.keeper_doc_id
                THEN 1 ELSE 0 END)::BIGINT AS n_keepers,
       SUM(CASE WHEN k.doc_id = p.keeper_doc_id
                THEN 0 ELSE 1 END)::BIGINT AS n_losers
FROM keyed k JOIN keepers p USING (canon_url)
GROUP BY k.source
"""


@query("dedup_url_keeper", _URL_KEEPER_ORACLE)
def q_url_keeper(spark, sf_dir):
    """URL-level dedup DECISION applied: canonicalize, keep the
    min-doc_id document per canonical URL, report survivors/losers per
    source — the web-corpus step that runs BEFORE content-level dedup
    (case/tracking variants of one page never reach the MinHash tier).
    Keeper selection is one aggregate on the canonical key + one
    equi-join back; the md5-free min-key rule matches exact_dedup's.
    llm/cleaning.py::canonicalize_url."""
    from rclabsapi_spark.llm.cleaning import canonicalize_url

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", canonicalize_url(_pseudo_url_col()).alias("cu")
    )
    keepers = keyed.groupBy("cu").agg(
        F.min("doc_id").alias("keeper_doc_id")
    )
    return (
        keyed.join(keepers, "cu")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("doc_id") == F.col("keeper_doc_id"), 1
                ).otherwise(0)
            ).alias("n_keepers"),
            F.sum(
                F.when(
                    F.col("doc_id") == F.col("keeper_doc_id"), 0
                ).otherwise(1)
            ).alias("n_losers"),
        )
    )


# ---------------------------------------------------------------------------
# Per-domain quality prior (crawl-budget ranking)
# ---------------------------------------------------------------------------

def _domain_quality_cte() -> str:
    # composes the URL-canonicalization CTE (PSL domains) with the
    # text-quality oracle (imported from the llm suite — ONE source of
    # truth for the score SQL) — mirrors the Spark side's single-scan
    # carry composition. Ends with a ``prior`` CTE carrying the full
    # per-domain stats row (shared by the quality-prior query and the
    # crawl-budget allocator built on top of it).
    from rclabsapi_spark.functions.scalars import sql_round_half_up as rhu
    from rclabsapi_spark.suites.llm import _QUALITY_ORACLE

    return f"""
WITH {_URL_CANON_CTE},
quality AS ({_QUALITY_ORACLE}),
per_doc AS (
    SELECT d.domain, d.canon_url, q.quality_score
    FROM dom d JOIN quality q USING (doc_id)
),
agg AS (
    -- mean via exact integer-micro sums: quality_score is already
    -- 6dp-rounded, so summing round(score * 1e6) as BIGINT is exact and
    -- accumulation-order-independent (a raw AVG of doubles diverged by
    -- one ulp at a 6dp boundary: src15.gov.uk, 0.7550175)
    SELECT domain,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT canon_url)::BIGINT AS n_canon_urls,
           {rhu("(COUNT(*) - COUNT(DISTINCT canon_url)) / COUNT(*)::DOUBLE", 6)} AS dup_rate,
           {rhu("CAST(SUM(CAST(ROUND(quality_score * 1000000, 0) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1000000.0)", 6)} AS mean_quality
    FROM per_doc GROUP BY domain
),
prior AS (
    SELECT domain, n_docs, n_canon_urls, dup_rate, mean_quality,
           {rhu("mean_quality * (1.0 - dup_rate)", 6)} AS priority
    FROM agg
)"""


def _domain_quality_oracle() -> str:
    return f"""
{_domain_quality_cte()}
SELECT domain, n_docs, n_canon_urls, dup_rate, mean_quality, priority
FROM prior
"""


def _domain_quality_frame(spark, sf_dir):
    """Per-domain stats frame (domain, n_docs, n_canon_urls, dup_rate,
    mean_quality, priority) — the single-scan carry composition shared
    by the quality-prior query and the crawl-budget allocator."""
    from rclabsapi_spark.functions.scalars import round_half_up
    from rclabsapi_spark.llm.cleaning import (
        canonicalize_url,
        url_registrable_domain,
    )
    from rclabsapi_spark.llm.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    canon = canonicalize_url(_pseudo_url_col())
    qf = quality_features(
        docs,
        carry=(
            url_registrable_domain(canon).alias("domain"),
            canon.alias("canon_url"),
        ),
    )
    agg = qf.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canon_url").alias("n_canon_urls"),
        round_half_up(
            (F.count(F.lit(1)) - F.countDistinct("canon_url"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
        # exact integer-micro sum (order-independent) — see oracle note
        round_half_up(
            F.sum(
                F.round(F.col("quality_score") * 1000000, 0).cast("long")
            ).cast("double")
            / (F.count(F.lit(1)) * 1000000.0),
            6,
        ).alias("mean_quality"),
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_canon_urls",
        "dup_rate",
        "mean_quality",
        round_half_up(
            F.col("mean_quality") * (1.0 - F.col("dup_rate")), 6
        ).alias("priority"),
    )


@query("clean_domain_quality_prior", _domain_quality_oracle())
def q_domain_quality_prior(spark, sf_dir):
    """Per-domain quality prior — the crawl-budget/ sampling-weight
    table a web curation pipeline keeps per registrable domain: mean
    text quality x (1 - URL-duplicate rate), composed from two
    verified operators (PSL domain rollup + quality_features) in ONE
    corpus scan: the domain/canon-URL columns ride the quality scan
    via ``carry`` (no doc-key self-join), then a single groupBy(domain)
    with two-phase count-distinct. mean_quality rounds half-up at the
    aggregate edge (multi-row double sum); priority is derived from
    the two ROUNDED aggregates, so it is bit-identical across engines.
    llm/text.py::quality_features + llm/psl.py::registrable_domain."""
    return _domain_quality_frame(spark, sf_dir)


# ---------------------------------------------------------------------------
# Crawl-budget allocation (temperature-flattened priority targets)
# ---------------------------------------------------------------------------

_BUDGET_TAU = 0.5
_BUDGET_MULT = 1.25


def _crawl_budget_oracle() -> str:
    from rclabsapi_spark.functions.scalars import sql_round_half_up as rhu

    w_raw = (
        f"CASE WHEN z.z_g > 0 THEN"
        f" (pow(n_docs::DOUBLE, {_BUDGET_TAU}) * priority)"
        f" / (z.z_g::DOUBLE / 1000000000.0)"
        f" ELSE 0.0 END"
    )
    return f"""
{_domain_quality_cte()},
z AS (
    -- Z = Σ n^τ·p on the 9dp integer grid (HUGEINT ≙ DECIMAL(38,0)):
    -- order-independent, mirroring crawl_budget_allocation
    SELECT SUM(CAST(FLOOR(pow(n_docs::DOUBLE, {_BUDGET_TAU}) * priority
                          * 1000000000.0 + 0.5) AS HUGEINT)) AS z_g,
           SUM(n_docs)::BIGINT AS total
    FROM prior
),
sched AS (
    SELECT domain, n_docs, priority,
           {w_raw} AS w_raw,
           CAST(FLOOR(({_BUDGET_MULT} * z.total::DOUBLE) * ({w_raw}))
                AS BIGINT) AS target_docs
    FROM prior, z
)
SELECT domain, n_docs, priority,
       {rhu("w_raw", 6)} AS w_temp,
       target_docs,
       LEAST(target_docs, n_docs) AS effective_docs,
       target_docs > n_docs AS capped
FROM sched
"""


@query("clean_crawl_budget", _crawl_budget_oracle())
def q_crawl_budget(spark, sf_dir):
    """Crawl-budget allocation: allocate a 1.25×-growth crawl/
    sampling budget (multiplier 1.25) across registrable
    domains by temperature-flattened priority — w_d ∝ √n_d · priority_d
    (τ=0.5, the mT5-style flattening at domain granularity) — and
    report each domain's floor-integer target, the effective target
    after capping at availability, and whether the cap bit (the signal
    to raise that domain's crawl frequency, not its sample weight).
    Composes the verified quality-prior stats; the |domains| relation
    caches once and fans out to the stats side and a 1-row gridded
    (Z, total) normalizer broadcast (the epoch-mixture pattern — no
    task ever holds the whole relation in one array row), τ=0.5 ⇒ pow
    = IEEE sqrt and floor-derived integers are bit-identical.
    llm/sampling.py::crawl_budget_allocation."""
    from rclabsapi_spark.llm.sampling import crawl_budget_allocation

    stats = _domain_quality_frame(spark, sf_dir).select(
        "domain", "n_docs", "priority"
    )
    return crawl_budget_allocation(
        stats,
        strat_col="domain",
        size_col="n_docs",
        priority_col="priority",
        tau=_BUDGET_TAU,
        budget_multiplier=_BUDGET_MULT,
    )


# ---------------------------------------------------------------------------
# Per-domain contamination report (which domains leak eval data)
# ---------------------------------------------------------------------------

def _domain_contamination_oracle() -> str:
    from rclabsapi_spark.functions.scalars import sql_round_half_up as rhu

    return f"""
{_domain_quality_cte()},
grams AS ({_GRAMS3_SQL}),
eval_g AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 97 = 0),
tg AS (SELECT DISTINCT doc_id, shingle FROM grams WHERE doc_id % 97 <> 0),
fl AS (
    SELECT tg.doc_id, COUNT(e.shingle)::BIGINT AS overlap_ngrams
    FROM tg LEFT JOIN eval_g e USING (shingle)
    GROUP BY tg.doc_id
),
tflag AS (
    SELECT t.doc_id,
           COALESCE(f.overlap_ngrams, 0) AS overlap_ngrams,
           COALESCE(f.overlap_ngrams, 0) >= 3 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) t
    LEFT JOIN fl f USING (doc_id)
),
perdom AS (
    SELECT d.domain,
           COUNT(*)::BIGINT AS n_train_docs,
           SUM(CASE WHEN tf.contaminated THEN 1 ELSE 0 END)::BIGINT
               AS n_contaminated,
           SUM(tf.overlap_ngrams)::BIGINT AS overlap_ngrams
    FROM tflag tf JOIN dom d USING (doc_id)
    GROUP BY d.domain
)
SELECT p.domain,
       p.n_docs,
       pd.n_train_docs,
       pd.n_contaminated,
       pd.overlap_ngrams,
       {rhu("pd.n_contaminated / pd.n_train_docs::DOUBLE", 6)}
           AS contamination_rate,
       p.mean_quality,
       p.priority
FROM perdom pd JOIN prior p USING (domain)
"""


@query("clean_domain_contamination", _domain_contamination_oracle())
def q_domain_contamination(spark, sf_dir):
    """Per-domain contamination report — WHICH registrable domains leak
    eval data, joined to the quality prior: the table a curation owner
    reads to decide whether a domain's priority survives its leak rate
    (a high-priority domain shedding eval n-grams is a crawl-config
    bug, not a sampling win). Composes three verified operators:
    ``decontaminate`` (eval 3-gram set broadcasts, corpus explodes
    once), the PSL registrable-domain expression (per-row, no join),
    and the quality-prior frame. The doc→domain relation and the
    per-doc flags join on the doc key — narrow rows (id, domain, two
    counts), never text — then reduce to |domains| before meeting the
    prior. contamination_rate divides exact integer counts;
    overlap_ngrams is an integral sum (exact in any order).
    llm/cleaning.py::decontaminate + llm/psl.py::registrable_domain."""
    from rclabsapi_spark.functions.scalars import round_half_up
    from rclabsapi_spark.llm.cleaning import (
        canonicalize_url,
        url_registrable_domain,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    flags = decontaminate(
        train,
        docs.filter(F.col("doc_id") % 97 == 0),
        n=3,
        min_overlap=3,
    ).select("doc_id", "overlap_ngrams", "contaminated")
    dom = train.select(
        "doc_id",
        url_registrable_domain(canonicalize_url(_pseudo_url_col())).alias(
            "domain"
        ),
    )
    perdom = (
        dom.join(flags, "doc_id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.sum(F.col("contaminated").cast("int"))
            .cast("long")
            .alias("n_contaminated"),
            F.sum("overlap_ngrams").alias("overlap_ngrams"),
        )
    )
    prior = _domain_quality_frame(spark, sf_dir).select(
        "domain", "n_docs", "mean_quality", "priority"
    )
    return perdom.join(F.broadcast(prior), "domain").select(
        "domain",
        "n_docs",
        "n_train_docs",
        "n_contaminated",
        "overlap_ngrams",
        round_half_up(
            F.col("n_contaminated") / F.col("n_train_docs").cast("double"),
            6,
        ).alias("contamination_rate"),
        "mean_quality",
        "priority",
    )
