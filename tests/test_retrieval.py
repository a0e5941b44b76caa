"""Ranked-retrieval unit semantics: hand-checkable corpus, ranking order,
BM25 saturation/length-normalization behavior."""

from __future__ import annotations

import math

from rclabsapi_spark.llm.retrieval import bm25_topk, tfidf_topk

DOCS = [
    (1, "spark spark spark filler filler"),  # tf=3, long-ish
    (2, "spark filler"),                     # tf=1, short
    (3, "filler filler filler"),             # no match
    (4, "spark spark rare"),                 # tf=2 + the rare term
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_tfidf_ranking_and_scores(spark):
    rows = tfidf_topk(_df(spark), ["spark", "rare"], k=10).collect()
    # doc 3 has no query term — absent entirely
    assert [r.doc_id for r in rows] == [4, 1, 2]
    by_id = {r.doc_id: r for r in rows}
    idf_spark = math.log(4 / 3)
    idf_rare = math.log(4 / 1)
    expect4 = 2 * idf_spark + 1 * idf_rare
    assert abs(by_id[4].score - expect4) < 1e-6
    assert by_id[4].n_terms == 2 and by_id[1].n_terms == 1


def test_bm25_rewards_rarity_and_penalizes_length(spark):
    rows = bm25_topk(_df(spark), ["spark", "rare"], k=10).collect()
    by_id = {r.doc_id: r for r in rows}
    assert 3 not in by_id
    # the rare term dominates: doc 4 outranks the tf=3 doc 1
    assert rows[0].doc_id == 4
    # same tf=1 for 'spark' would tie docs 1 vs 2 under raw tf; BM25's
    # length normalization must rank the short doc 2 above doc 1 if both
    # had equal tf — here doc 1 has tf=3 but dl=5 vs doc 2 tf=1 dl=2;
    # saturation caps the tf advantage below 3x
    assert by_id[1].score < 3 * by_id[2].score


def test_topk_limit_and_tiebreak(spark):
    dup = spark.createDataFrame(
        [(i, "spark") for i in range(10)], ["doc_id", "text"]
    )
    rows = tfidf_topk(dup, ["spark"], k=4).collect()
    # identical scores -> doc_id ascending tie-break, limit respected
    assert [r.doc_id for r in rows] == [0, 1, 2, 3]


def test_mmr_rerank_trades_relevance_for_diversity():
    """Three near-identical top candidates + two distinct ones: pure
    relevance keeps the clones; MMR at λ=0.5 interleaves the distinct
    vectors into the top 3. Deterministic (sorted-candidate greedy)."""
    from rclabsapi_spark.llm.retrieval import mmr_rerank

    clone = [1.0, 0.0, 0.0]
    cands = [
        (1, 1.00, clone),
        (2, 0.99, clone),
        (3, 0.98, clone),
        (4, 0.80, [0.0, 1.0, 0.0]),
        (5, 0.70, [0.0, 0.0, 1.0]),
    ]
    pure = [c[0] for c in sorted(cands, key=lambda c: -c[1])][:3]
    assert pure == [1, 2, 3]
    diverse = mmr_rerank(cands, lambda_relevance=0.5, k=3)
    assert diverse[0] == 1            # most relevant always first
    assert set(diverse) == {1, 4, 5}  # clones displaced by distinct vecs
    # λ=1 reduces to pure relevance
    assert mmr_rerank(cands, lambda_relevance=1.0, k=3) == [1, 2, 3]


def test_mmr_rerank_df_matches_driver_side(spark):
    """The distributed MMR rounds must pick the same sequence as the
    collected-list reference implementation on the same candidates."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.llm.retrieval import mmr_rerank, mmr_rerank_df
    from rclabsapi_spark.llm.similarity import _as_double, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cand = cosine_topk(emb, 0, k=15).join(
        emb.select("vec_id", _as_double(F.col("embedding")).alias("v")),
        "vec_id",
    )
    rows = cand.collect()
    driver_picks = mmr_rerank(
        [(r["vec_id"], r["cosine_sim"], list(r["v"])) for r in rows],
        lambda_relevance=0.7,
        k=6,
    )
    dist = (
        mmr_rerank_df(
            cand, key_col="vec_id", rel_col="cosine_sim", vec_col="v",
            lambda_relevance=0.7, k=6,
        )
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r["vec_id"] for r in dist] == driver_picks
    # diversity property: the re-ranked list is not just relevance order
    rel_order = [r["vec_id"] for r in sorted(
        rows, key=lambda r: (-r["cosine_sim"], r["vec_id"]))][:6]
    assert dist[0]["vec_id"] == rel_order[0]  # first pick = pure argmax rel
