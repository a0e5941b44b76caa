"""Large-star/small-star connected components (llm/dedup.py): identical
labels to HashMin where HashMin converges, logarithmic round count on the
long-chain graphs where HashMin's O(diameter) rounds hit the max_iters
cap and silently mislabel — the exact hazard the star variant exists for."""

from __future__ import annotations

import pytest

from rclabsapi_spark.llm.dedup import dedup_clusters, dedup_clusters_star


def _labels(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_star_matches_hashmin_on_shallow_graphs(spark):
    # two near-dup families (a star and a triangle) + one isolated pair —
    # the shape LSH candidate graphs actually have
    edges = [
        (1, 2), (1, 3), (1, 4),          # star rooted at 1
        (10, 11), (11, 12), (10, 12),    # triangle
        (20, 21),                        # pair
        (2, 2),                          # self-loop must be ignored
    ]
    pairs = _pairs(spark, edges)
    star = _labels(dedup_clusters_star(pairs))
    hashmin = _labels(dedup_clusters(pairs))
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert star == expected
    # self-loop node 2 still labeled via its real edges
    assert hashmin == expected


def test_star_contracts_long_chain_in_log_rounds(spark):
    # path 0-1-2-…-255: diameter 255. HashMin moves the min label one
    # hop per round — at its default 20-round cap the tail is silently
    # mislabeled. Star alternation halves depth per round.
    n = 256
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])

    stats: dict = {}
    star = _labels(dedup_clusters_star(pairs, stats=stats))
    assert star == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 10  # ~log₂(256)=8 + fixpoint-confirm slack

    hashmin = _labels(dedup_clusters(pairs))  # default max_iters=20
    assert any(v != 0 for v in hashmin.values()), (
        "HashMin at its round cap should mislabel a 255-diameter chain —"
        " if this starts passing, the cap semantics changed"
    )


def test_star_raises_when_rounds_exhausted(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(63)])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters_star(pairs, max_iters=2)


def test_cluster_quality_audit_flags_weak_links(spark):
    """Synthetic clusters: a tight pair-rich cluster scores high mean
    similarity; a chain glued by one borderline link surfaces it as the
    weakest_link; rejected cross-cluster evidence lands under NULL."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.llm.dedup import cluster_quality_audit

    pairs = spark.createDataFrame(
        [
            # tight cluster A = {1,2,3}: all pairs strong
            (1, 2, 0.95), (1, 3, 0.92), (2, 3, 0.97),
            # chain cluster B = {4,5,6}: 4-5 strong, 5-6 borderline
            (4, 5, 0.90), (5, 6, 0.21),
            # rejected evidence across clusters
            (3, 4, 0.25),
        ],
        "doc_a long, doc_b long, jaccard double",
    )
    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 200)],
        "doc_id long, cluster_id long",
    )
    out = {
        r["cluster_id"]: r
        for r in cluster_quality_audit(pairs, clusters).collect()
    }
    assert out[100]["n_members"] == 3 and out[100]["n_pairs"] == 3
    assert out[100]["mean_sim"] > 0.9
    assert out[200]["weakest_link"] == 0.21  # the chain's glue exposed
    assert out[None]["n_pairs"] == 1  # rejected cross-cluster pair
