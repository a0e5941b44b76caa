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
       ROUND(AVG(value), 6) AS mean_raw,
       ROUND(AVG(LEAST(GREATEST(value, lo), hi)), 6) AS mean_winsorized
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
    GK-sketch percentile swap applies (operators/approx.py)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias(
            "n_clipped_lo"
        ),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias(
            "n_clipped_hi"
        ),
        F.round(F.avg("value"), 6).alias("mean_raw"),
        F.round(F.avg(clipped), 6).alias("mean_winsorized"),
    )
