"""SemDeDup brute-force verification: the in-cluster prune must match a
numpy all-pairs computation over the SAME clustering, and the output must
be a total partition of the input."""

from __future__ import annotations

import numpy as np

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.llm.similarity import (
    ivf_assign,
    kmeans_centroids,
    semantic_dedup,
)

SF = "/root/testdata/sf0.001"
THRESH = 0.35


def test_semantic_dedup_matches_bruteforce(spark):
    emb = load_table(spark, SF, "embeddings")
    out = semantic_dedup(emb, k=8, iters=2, threshold=THRESH).collect()

    # same clustering the operator used
    cents = kmeans_centroids(emb, k=8, iters=2)
    assigned = ivf_assign(emb, centroids=cents).collect()

    vecs = {r.vec_id: np.array(r.v) for r in assigned}
    clusters: dict[int, list[int]] = {}
    for r in assigned:
        clusters.setdefault(r.centroid_id, []).append(r.vec_id)

    expect_dropped = set()
    for members in clusters.values():
        members.sort()
        for i, b in enumerate(members):
            vb = vecs[b]
            for a in members[:i]:
                va = vecs[a]
                sim = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                # the operator rounds to 9dp before comparing
                if round(sim, 9) >= THRESH:
                    expect_dropped.add(b)
                    break

    got_dropped = {r.vec_id for r in out if r.status == "dropped"}
    assert got_dropped == expect_dropped
    assert len(expect_dropped) > 0  # fixture must actually exercise the prune

    # total partition: every input vector appears exactly once
    assert len(out) == emb.count()
    assert {r.status for r in out} <= {"kept", "dropped"}
    # cluster ids consistent with the assignment
    cid = {r.vec_id: r.centroid_id for r in assigned}
    assert all(cid[r.vec_id] == r.centroid_id for r in out)


def test_semantic_dedup_keeps_everything_at_impossible_threshold(spark):
    emb = load_table(spark, SF, "embeddings")
    out = semantic_dedup(emb, k=4, iters=1, threshold=0.999)
    assert out.filter(out.status == "dropped").count() == 0
