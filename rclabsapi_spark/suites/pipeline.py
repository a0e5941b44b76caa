"""End-to-end training-data pipeline composites: the queries a corpus
owner actually runs — "apply the dedup decisions and show me what
survives", "sample to my target domain mixture".

These compose operators that are each individually oracle-verified
(exact dedup, LSH pair-gen, cluster resolution, hash sampling) into the
full decision pipeline, and hash-verify the COMPOSED result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.llm.dedup import (
    dedup_clusters,
    exact_dedup,
    lsh_candidate_pairs,
)
from rclabsapi_spark.llm.sampling import mixture_sample
from rclabsapi_spark.registry import query
from rclabsapi_spark.suites.llm import _CLUSTERS_ORACLE

# ---------------------------------------------------------------------------
# Dedup applied end-to-end: exact keepers ∩ near-dup cluster keepers
# ---------------------------------------------------------------------------

_DEDUP_APPLY_ORACLE = f"""
WITH exact_keep AS (
    SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
cl AS ({_CLUSTERS_ORACLE}),
near_losers AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
SELECT source, COUNT(*)::BIGINT AS n_kept
FROM documents
WHERE doc_id IN (SELECT doc_id FROM exact_keep)
  AND doc_id NOT IN (SELECT doc_id FROM near_losers)
GROUP BY source
"""


@query("pipeline_dedup_apply", _DEDUP_APPLY_ORACLE, bench=True)
def q_dedup_apply(spark, sf_dir):
    """The dedup DECISION applied: drop exact-dup non-keepers (min doc_id
    per text hash) and near-dup cluster non-keepers (cluster_id ≠ doc_id
    from connected components over verified LSH pairs), then count the
    surviving corpus per source.

    Plan shape: keepers arrive via one semi join, losers via one anti
    join — the corpus is scanned once for the verdict; the pair/cluster
    machinery runs over the (much smaller) edge relation."""
    docs = load_table(spark, sf_dir, "documents")
    exact_keep = exact_dedup(docs).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    pairs = lsh_candidate_pairs(
        docs, num_hashes=8, bands=4, max_bucket_size=50
    ).filter(F.col("jaccard") >= 0.5)
    near_losers = dedup_clusters(pairs).filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    kept = docs.join(exact_keep, "doc_id", "semi").join(
        near_losers, "doc_id", "anti"
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


# ---------------------------------------------------------------------------
# Target-mixture sampling
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.25}
_MIX_DEFAULT = 0.0125
_MIX_TARGET = 200.0

_MIX_WEIGHT_SQL = (
    "CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25"
    " ELSE 0.0125 END"
)

_MIXTURE_ORACLE = f"""
WITH rates AS (
    SELECT source,
           least(1.0, {_MIX_TARGET} * {_MIX_WEIGHT_SQL} / COUNT(*))
               AS _rate
    FROM documents GROUP BY source
),
kept AS (
    SELECT d.source, d.doc_id
    FROM documents d JOIN rates r USING (source)
    WHERE r._rate >= 1.0
       OR substring(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', CAST(floor(65536.0 * r._rate) AS BIGINT))
)
SELECT source, COUNT(*)::BIGINT AS n_kept FROM kept GROUP BY source
"""


@query("pipeline_mixture_sample", _MIXTURE_ORACLE)
def q_mixture(spark, sf_dir):
    """Domain-mixture sampling toward a target mix (src0 50%, src1 25%,
    long tail 1.25% each) at a 200-row target size: per-source keep rate
    min(1, target·w/n), membership a pure function of doc_id. The
    realized per-source counts hash-verify the whole mechanism —
    rate computation, threshold encoding, and bucket membership."""
    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs,
        key_col="doc_id",
        strat_col="source",
        weights=_MIX_WEIGHTS,
        default_weight=_MIX_DEFAULT,
        target_total=_MIX_TARGET,
        salt="mix",
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


# ---------------------------------------------------------------------------
# Temperature-flattened mixture sampling (mT5/XLM-R rebalancing)
# ---------------------------------------------------------------------------

_TEMP_TAU = 0.5
_TEMP_TARGET = 200.0

# Z = Σ n^τ on the 9dp integer grid (HUGEINT ≙ DECIMAL(38,0)) —
# order-independent on both engines, so Z is bit-identical without
# pinning a fold order (a last-ulp difference in Z could flip
# floor(65536·rate) at a boundary and change membership).
_TEMPERATURE_ORACLE = f"""
WITH counts AS (
    SELECT source, COUNT(*)::DOUBLE AS n FROM documents GROUP BY source
),
z AS (
    SELECT SUM(CAST(FLOOR(pow(n, {_TEMP_TAU}) * 1000000000.0 + 0.5)
                    AS HUGEINT))::DOUBLE / 1000000000.0 AS z
    FROM counts
),
rates AS (
    SELECT source,
           least(1.0, {_TEMP_TARGET} * pow(n, {_TEMP_TAU}) / z.z / n)
               AS _rate
    FROM counts, z
),
kept AS (
    SELECT d.source, d.doc_id
    FROM documents d JOIN rates r USING (source)
    WHERE r._rate >= 1.0
       OR substring(md5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', CAST(floor(65536.0 * r._rate) AS BIGINT))
)
SELECT source, COUNT(*)::BIGINT AS n_kept FROM kept GROUP BY source
"""


@query("sample_temperature", _TEMPERATURE_ORACLE)
def q_temperature(spark, sf_dir):
    """Temperature-flattened mixture sampling (τ=0.5, target 200):
    stratum share ∝ n^τ, so low-resource sources upweight relative to
    raw frequency without hand-written weights — the multilingual
    rebalancing of mT5/XLM-R. Keep rate min(1, target·p_s/n_s),
    membership the same pure-function-of-key md5 bucket as every
    sampler; realized per-source counts hash-verify rates, threshold
    encoding, and membership. llm/sampling.py::temperature_sample."""
    from rclabsapi_spark.llm.sampling import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = temperature_sample(
        docs,
        key_col="doc_id",
        strat_col="source",
        tau=_TEMP_TAU,
        target_total=_TEMP_TARGET,
        salt="temp",
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


# ---------------------------------------------------------------------------
# Token budget accounting
# ---------------------------------------------------------------------------

_TOKEN_BUDGET_ORACLE = """
WITH t AS (
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(len(regexp_extract_all(
               text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))::BIGINT
               AS total_tokens
    FROM documents GROUP BY source
)
SELECT source, n_docs, total_tokens,
       (SUM(total_tokens) OVER (
            ORDER BY total_tokens DESC, source))::BIGINT AS cum_tokens,
       ROUND(total_tokens / (SUM(total_tokens) OVER ()), 6) AS token_share
FROM t
"""


@query("pipeline_token_budget", _TOKEN_BUDGET_ORACLE)
def q_token_budget(spark, sf_dir):
    """Token-budget accounting: per-source token totals with cumulative
    consumption in descending-contribution order and corpus share — the
    'which domains eat my budget' view that sizes mixture weights. One
    corpus aggregation; the windows run over the tiny per-source
    relation."""
    from pyspark.sql import Window

    from rclabsapi_spark.llm.text import bpe_ish_count

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_ish_count(F.col("text"))).alias("total_tokens"),
    )
    w_cum = (
        Window.orderBy(F.col("total_tokens").desc(), F.col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    return per_src.select(
        "source",
        "n_docs",
        "total_tokens",
        F.sum("total_tokens").over(w_cum).alias("cum_tokens"),
        F.round(
            F.col("total_tokens") / F.sum("total_tokens").over(w_all), 6
        ).alias("token_share"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (target-tilted data selection)
# ---------------------------------------------------------------------------

_DSIR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, (lang = 'en') AS t, i AS pos, l[i] AS w
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS l
          FROM documents),
         UNNEST(range(1, len(l) + 1)) AS u(i)
    WHERE l[i] <> ''
),
bk AS (
    SELECT doc_id, t, pos,
           CAST(concat('0x', substring(md5(w), 1, 8)) AS BIGINT) % 1024
               AS b
    FROM toks
),
counts AS (
    SELECT b, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
           SUM(CASE WHEN t THEN 0 ELSE 1 END) AS nr
    FROM bk GROUP BY b
),
tot AS (SELECT SUM(nt) AS tot_t, SUM(nr) AS tot_r FROM counts),
ratios AS (
    SELECT b, ln((nt + 0.5) / (tot_t + 0.5 * 1024))
              - ln((nr + 0.5) / (tot_r + 0.5 * 1024)) AS lr
    FROM counts, tot
),
folded AS (
    SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
           list_reduce(list(lr ORDER BY pos), (a, x) -> a + x) AS w_raw
    FROM bk JOIN ratios USING (b)
    GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       {{_w}} AS dsir_logweight
FROM folded
""".replace("{_w}", __import__("rclabsapi_spark.functions.scalars",
            fromlist=["sql_round_half_up"]).sql_round_half_up("w_raw", 6))


@query("sample_dsir_weights", _DSIR_ORACLE, bench=True)
def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023) with target = English
    docs: per-doc log-likelihood ratio of hashed-unigram distributions
    (1024 md5 buckets, add-0.5 smoothing) — the classifier-free way to
    tilt a raw corpus toward a target domain. One token posting, ONE
    conditional bucket histogram for both sides, a 1024-row broadcast
    log-ratio table, and a position-sorted per-doc fold (bit-identical
    across engines). llm/sampling.py::dsir_logweights."""
    from rclabsapi_spark.llm.sampling import dsir_logweights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_logweights(docs, is_target=F.col("lang") == "en")


# ---------------------------------------------------------------------------
# Corpus-curation funnel (lang gate → quality gate → dedup gate)
# ---------------------------------------------------------------------------

def _funnel_oracle() -> str:
    from rclabsapi_spark.suites.llm import _LANGID_ORACLE, _QUALITY_ORACLE

    return f"""
WITH pred AS ({_LANGID_ORACLE}),
q AS ({_QUALITY_ORACLE}),
keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT d.source,
       COUNT(*)::BIGINT AS n_total,
       SUM(CASE WHEN p.predicted_lang = d.lang THEN 1 ELSE 0 END)::BIGINT
           AS n_lang_ok,
       SUM(CASE WHEN p.predicted_lang = d.lang
                 AND q.quality_score >= 0.5 THEN 1 ELSE 0 END)::BIGINT
           AS n_quality_ok,
       SUM(CASE WHEN p.predicted_lang = d.lang
                 AND q.quality_score >= 0.5
                 AND k.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_kept
FROM documents d
JOIN pred p ON p.doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
LEFT JOIN keep k ON k.doc_id = d.doc_id
GROUP BY d.source
"""


@query("pipeline_curation_funnel", _funnel_oracle(), bench=True)
def q_curation_funnel(spark, sf_dir):
    """The corpus owner's funnel view: per source, documents surviving
    each curation gate cumulatively — language-ID agrees with the
    label, composite quality ≥ 0.5, exact-dedup keeper. All three gate
    signals are per-row functions of the text, so they ride ONE corpus
    scan (quality_features' ``carry`` + the ``lang_pred_expr`` argmax +
    md5); the exact-dedup keeper verdict (doc_id = min doc_id of its
    text-hash group) is a window MIN over that hash — one narrow
    exchange where the previous three-branch shape scanned the corpus
    four times and re-joined it on the doc key three times (guide §2.4:
    remove shuffles outright; the semantics are byte-identical and
    oracle-hash-verified). The quality threshold compares the 6dp
    half-up-rounded score, identical on both engines."""
    from pyspark.sql import Window

    from rclabsapi_spark.llm.text import lang_pred_expr, quality_features

    docs = load_table(spark, sf_dir, "documents")
    stamped = quality_features(
        docs,
        carry=(
            F.col("source"),
            F.col("lang"),
            lang_pred_expr(F.col("text")).alias("predicted_lang"),
            F.md5(F.col("text")).alias("__h"),
        ),
    ).select(
        "doc_id", "source", "lang", "predicted_lang", "quality_score", "__h"
    )
    # keeper ⇔ doc_id == MIN(doc_id) over the doc's text-hash group —
    # exactly exact_dedup's keeper_doc_id, stamped in place instead of
    # aggregated and left-joined back
    marked = stamped.withColumn(
        "__kmin", F.min("doc_id").over(Window.partitionBy("__h"))
    )
    lang_ok = F.col("predicted_lang") == F.col("lang")
    qual_ok = lang_ok & (F.col("quality_score") >= 0.5)
    kept = qual_ok & (F.col("doc_id") == F.col("__kmin"))
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(lang_ok.cast("long")).alias("n_lang_ok"),
        F.sum(qual_ok.cast("long")).alias("n_quality_ok"),
        F.sum(kept.cast("long")).alias("n_kept"),
    )
