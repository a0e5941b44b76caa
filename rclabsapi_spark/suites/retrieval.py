"""Ranked retrieval suite: TF-IDF and BM25 top-k keyword search over the
``documents`` fixture — the ranked extension of the reference's boolean
keyword search (P12 substring / P13 regex, log_file_manager.hpp:236-300).

Oracle notes: both engines build the identical token relation
(whitespace split ≙ ``string_split``), integer-valued tf/df/N/dl are
exact doubles, and the scoring expression trees match literal-for-literal
(Python pre-folds ``k1+1`` → 2.2 and ``1-b`` → 0.25; the SQL writes those
folded literals). Final per-doc sums round half-up at 6 decimals before
the (score desc, doc_id) rank order, so the top-k boundary is
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import round_half_up
from rclabsapi_spark.llm.retrieval import bm25_topk, tfidf_topk
from rclabsapi_spark.registry import query

# A mixed-rarity query: 'dup' is the rarest fixture term (df≈5% of docs),
# 'spark'/'scan' are common (~77%) — exercises the idf spread.
_TERMS = ("dup", "spark", "scan")
_TERMS_SQL = "('dup', 'spark', 'scan')"
_K = 15

_TFIDF_ORACLE = f"""
WITH w0 AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
    SELECT doc_id, word, COUNT(*)::DOUBLE AS tf
    FROM w0 WHERE word IN {_TERMS_SQL} GROUP BY 1, 2
),
df AS (SELECT word, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents)
SELECT tf.doc_id,
       FLOOR((SUM(CAST(FLOOR(tf.tf * ln(n.n_docs / df.df)
                             * 1000000000.0 + 0.5) AS BIGINT))::DOUBLE
              / 1000000000.0) * 1000000.0 + 0.5)
           / 1000000.0 AS score,
       COUNT(*)::BIGINT AS n_terms
FROM tf JOIN df USING (word) CROSS JOIN n
GROUP BY 1
ORDER BY score DESC, doc_id
LIMIT {_K}
"""


@query("retr_tfidf_topk", _TFIDF_ORACLE, bench=True)
def q_tfidf(spark, sf_dir):
    """Top-15 documents by TF-IDF for a 3-term query. The term filter sits
    under the postings aggregate (only query-term tokens shuffle); df/N
    broadcast; TakeOrdered top-k — no full sort. llm/retrieval.py."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, _TERMS, k=_K)


_BM25_ORACLE = f"""
WITH w0 AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
w AS (SELECT * FROM w0 WHERE word <> ''),
tf_all AS (
    SELECT doc_id, word, COUNT(*)::DOUBLE AS tf FROM w GROUP BY 1, 2
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf_all GROUP BY 1),
avgdl AS (SELECT AVG(dl) AS avgdl FROM dl),
tf AS (SELECT * FROM tf_all WHERE word IN {_TERMS_SQL}),
df AS (SELECT word, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents)
SELECT tf.doc_id,
       FLOOR((SUM(CAST(FLOOR((
           ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl.avgdl)))
       ) * 1000000000.0 + 0.5) AS BIGINT))::DOUBLE
              / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0 AS score,
       COUNT(*)::BIGINT AS n_terms
FROM tf
JOIN dl USING (doc_id)
JOIN df USING (word)
CROSS JOIN n CROSS JOIN avgdl
GROUP BY 1
ORDER BY score DESC, doc_id
LIMIT {_K}
"""


@query("retr_bm25_topk", _BM25_ORACLE, bench=True)
def q_bm25(spark, sf_dir):
    """Top-15 documents by Okapi BM25 (k1=1.2, b=0.75). One corpus-sized
    explode+combine builds (doc, term, tf); dl re-aggregates it; avgdl,
    df, N are 1-row/terms-row broadcasts. llm/retrieval.py."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _TERMS, k=_K)


# ---------------------------------------------------------------------------
# PMI collocations (corpus multiword-expression mining)
# ---------------------------------------------------------------------------

_PMI_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
uni AS (
    SELECT unnest(l) AS w FROM toks
),
uni_counts AS (
    SELECT w, COUNT(*)::BIGINT AS n_w FROM uni GROUP BY 1
),
bi AS (
    SELECT unnest(l[1:len(l) - 1]) AS w1, unnest(l[2:len(l)]) AS w2
    FROM toks
),
bi_counts AS (
    SELECT w1, w2, COUNT(*)::BIGINT AS n_ab FROM bi GROUP BY 1, 2
),
totals AS (
    SELECT (SELECT COUNT(*) FROM uni)::DOUBLE AS n_uni,
           (SELECT COUNT(*) FROM bi)::DOUBLE AS n_bi
)
SELECT w1, w2, n_ab, ua.n_w AS n_a, ub.n_w AS n_b,
       FLOOR(LN((n_ab::DOUBLE * n_uni * n_uni)
                / (n_bi * ua.n_w::DOUBLE * ub.n_w::DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS pmi
FROM bi_counts
JOIN uni_counts ua ON bi_counts.w1 = ua.w
JOIN uni_counts ub ON bi_counts.w2 = ub.w
CROSS JOIN totals
WHERE n_ab >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Scorer agreement (TF-IDF vs BM25 ranking-evaluation audit)
# ---------------------------------------------------------------------------

# Pearson r over EXACT integer-micro score sums: both scores are already
# 6dp-rounded doubles, so round(score·1e6) is an exact integer; the five
# sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact
# integers (HUGEINT / DECIMAL(38,0)) — accumulation-order-independent —
# and the correlation formula then runs on bit-identical doubles.
_PEARSON_SQL = (
    "(s.n::DOUBLE * s.sxy::DOUBLE - s.sx::DOUBLE * s.sy::DOUBLE)"
    " / (sqrt(s.n::DOUBLE * s.sxx::DOUBLE - s.sx::DOUBLE * s.sx::DOUBLE)"
    " * sqrt(s.n::DOUBLE * s.syy::DOUBLE - s.sy::DOUBLE * s.sy::DOUBLE))"
)

_AGREEMENT_ORACLE = f"""
WITH w0 AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tfx AS (
    SELECT doc_id, word, COUNT(*)::DOUBLE AS tf
    FROM w0 WHERE word IN {_TERMS_SQL} GROUP BY 1, 2
),
dfx AS (SELECT word, COUNT(*)::DOUBLE AS df FROM tfx GROUP BY 1),
nx AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
xs AS (
    SELECT tfx.doc_id,
           FLOOR((SUM(CAST(FLOOR(tfx.tf * ln(nx.n_docs / dfx.df)
                                 * 1000000000.0 + 0.5) AS BIGINT))::DOUBLE
                  / 1000000000.0) * 1000000.0 + 0.5)
               / 1000000.0 AS x
    FROM tfx JOIN dfx USING (word) CROSS JOIN nx
    GROUP BY 1
),
w AS (SELECT * FROM w0 WHERE word <> ''),
tf_all AS (
    SELECT doc_id, word, COUNT(*)::DOUBLE AS tf FROM w GROUP BY 1, 2
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf_all GROUP BY 1),
avgdl AS (SELECT AVG(dl) AS avgdl FROM dl),
tfb AS (SELECT * FROM tf_all WHERE word IN {_TERMS_SQL}),
dfb AS (SELECT word, COUNT(*)::DOUBLE AS df FROM tfb GROUP BY 1),
ys AS (
    SELECT tfb.doc_id,
           FLOOR((SUM(CAST(FLOOR((
               ln((nx.n_docs - dfb.df + 0.5) / (dfb.df + 0.5) + 1.0)
               * ((tfb.tf * 2.2)
                  / (tfb.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl.avgdl)))
           ) * 1000000000.0 + 0.5) AS BIGINT))::DOUBLE
                  / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0 AS y
    FROM tfb
    JOIN dl USING (doc_id)
    JOIN dfb USING (word)
    CROSS JOIN nx CROSS JOIN avgdl
    GROUP BY 1
),
j AS (
    SELECT xs.doc_id,
           CAST(ROUND(x * 1000000.0, 0) AS BIGINT) AS xm,
           CAST(ROUND(y * 1000000.0, 0) AS BIGINT) AS ym
    FROM xs JOIN ys USING (doc_id)
),
s AS (
    SELECT COUNT(*)::BIGINT AS n,
           SUM(xm) AS sx, SUM(ym) AS sy,
           SUM(xm * ym) AS sxy, SUM(xm * xm) AS sxx, SUM(ym * ym) AS syy
    FROM j
),
ov AS (
    SELECT COUNT(*)::BIGINT AS top15_overlap
    FROM ((SELECT doc_id FROM ({_TFIDF_ORACLE}) ta)
          INTERSECT
          (SELECT doc_id FROM ({_BM25_ORACLE}) tb)) t
)
SELECT s.n AS n_docs,
       FLOOR(({_PEARSON_SQL}) * 1000000.0 + 0.5) / 1000000.0 AS pearson_r,
       ov.top15_overlap
FROM s, ov
"""


@query("retr_score_agreement", _AGREEMENT_ORACLE)
def q_score_agreement(spark, sf_dir):
    """Scorer-agreement audit: Pearson correlation between the TF-IDF
    and BM25 score distributions over every matching document, plus the
    top-15 set overlap — the ranking-evaluation check run before
    swapping retrieval scorers in a curation pipeline (high r + high
    overlap ⇒ the cheaper scorer is a safe stand-in). Both score
    relations re-aggregate the SAME cached (doc, term, tf) index (one
    corpus explode); the correlation reduces to five exact integer-micro
    sufficient statistics in a single 1-row aggregate (no window, no
    corpus sort), and the top-15 sets are TakeOrdered heaps joined on
    15-row relations. llm/retrieval.py::tfidf_scores/bm25_scores."""
    from rclabsapi_spark.llm.retrieval import bm25_scores, tfidf_scores

    docs = load_table(spark, sf_dir, "documents")
    xs = tfidf_scores(docs, _TERMS).select(
        "doc_id", F.round(F.col("score") * 1000000.0, 0).cast("long").alias("xm")
    )
    ys = bm25_scores(docs, _TERMS).select(
        "doc_id", F.round(F.col("score") * 1000000.0, 0).cast("long").alias("ym")
    )
    j = xs.join(ys, "doc_id")
    dec = "decimal(38,0)"
    sums = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("sx"),
        F.sum("ym").alias("sy"),
        F.sum((F.col("xm") * F.col("ym")).cast(dec)).alias("sxy"),
        F.sum((F.col("xm") * F.col("xm")).cast(dec)).alias("sxx"),
        F.sum((F.col("ym") * F.col("ym")).cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    overlap = (
        tfidf_topk(docs, _TERMS, k=_K)
        .select("doc_id")
        .join(bm25_topk(docs, _TERMS, k=_K).select("doc_id"), "doc_id")
        .agg(F.count(F.lit(1)).alias("top15_overlap"))
    )
    return (
        sums.crossJoin(F.broadcast(overlap))
        .select(
            F.col("n").alias("n_docs"),
            round_half_up(num / den, 6).alias("pearson_r"),
            "top15_overlap",
        )
    )


@query("text_pmi_collocations", _PMI_ORACLE, bench=True)
def q_pmi_collocations(spark, sf_dir):
    """Top-20 bigram collocations by PMI — which adjacent word pairs
    co-occur far above chance. One doc-key shuffle feeds both the
    adjacency lead and the unigram counts; corpus totals ride as a
    broadcast 1-row relation; identical left-associative expression
    trees keep the PMI doubles bit-identical before the half-up round.
    llm/text.py::pmi_collocations."""
    from rclabsapi_spark.llm.text import pmi_collocations

    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5, k=20)
