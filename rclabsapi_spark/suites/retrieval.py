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

from rclabsapi_spark.catalog import load_table
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
       FLOOR(SUM(tf.tf * ln(n.n_docs / df.df)) * 1000000.0 + 0.5)
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
       FLOOR(SUM(
           ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl.avgdl)))
       ) * 1000000.0 + 0.5) / 1000000.0 AS score,
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
