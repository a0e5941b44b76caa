"""IVF ANN: trained-centroid quality and single-scan build.

The registered ``sim_ivf_topk`` keeps deterministic first-K centroids for
oracle parity; this suite proves the production tier — k-means-trained
centroids plugged into the same broadcast shape — and reports recall vs
the exact brute-force baseline.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.llm.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
K = 10


def _recall(spark, centroids, nprobe):
    emb = load_table(spark, SF, "embeddings")
    exact = {r.vec_id for r in cosine_topk(emb, 0, k=K).collect()}
    approx = {
        r.vec_id
        for r in ivf_topk(
            emb, 0, k=K, n_centroids=8, nprobe=nprobe, centroids=centroids
        ).collect()
    }
    return len(exact & approx) / K


def test_kmeans_centroids_shape(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=2).collect()
    assert len(cents) == 8
    dim = len(cents[0].cvec)
    assert all(len(c.cvec) == dim for c in cents)
    # trained means must differ from the raw seed vectors
    seed = {r.vec_id: list(r.embedding) for r in emb.filter("vec_id < 8").collect()}
    moved = sum(
        1 for c in cents if [float(x) for x in c.cvec] != seed[c.centroid_id]
    )
    assert moved >= 1


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """Recall@10 of the trained-centroid IVF probe vs exact top-10.

    Plan shape is identical to the registered first-K-centroid query
    (broadcast centroids, argmax assign, probe nprobe lists); only the
    centroid table changes. Recall is reported so regressions in the
    training loop are visible."""
    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=2)
    recall_full = _recall(spark, cents, nprobe=8)
    recall_half = _recall(spark, cents, nprobe=4)
    print(f"ivf kmeans recall@10: nprobe=4 {recall_half}, nprobe=8 {recall_full}")
    # probing every list is exhaustive search → exact recall
    assert recall_full == 1.0
    # probing half the lists must retain a useful fraction of the top-k
    assert recall_half >= 0.3


def test_persisted_ivf_index_prunes_and_recalls(spark, tmp_path):
    """Save → search lifecycle: the partitioned layout must (a) prune to
    the probed lists only, and (b) at full probe width reproduce the
    brute-force top-k exactly."""
    from rclabsapi_spark.llm.similarity import (
        cosine_topk,
        save_ivf_index,
        search_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_idx")
    save_ivf_index(emb, path, n_centroids=4, kmeans_iters=3)

    qrow = emb.filter(F.col("vec_id") == 7).collect()[0]
    qvec = [float(x) for x in qrow["embedding"]]

    # full probe width == brute force (exact recall); cosine_topk
    # excludes the query row, the index search returns it at rank 1
    full = search_ivf_index(spark, path, qvec, k=11, nprobe=4)
    got = [r["vec_id"] for r in full.collect()]
    assert got[0] == 7  # the query vector itself, cos=1
    brute = {r["vec_id"] for r in cosine_topk(emb, 7, k=10).collect()}
    assert set(got[1:]) == brute

    # narrow probe reads a subset of partitions (pruning is real)
    narrow = search_ivf_index(spark, path, qvec, k=10, nprobe=1)
    probed = {r["centroid_id"] for r in narrow.collect()}
    assert len(probed) == 1
    plan = narrow._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "centroid_id" in plan  # partition filter present


def test_pq_encode_decode_recall(spark):
    """PQ pipeline: 64-dim float32 → 8 bytes of codes (32× compression);
    ADC top-k by inner product must keep solid overlap with the exact
    dot-product ranking, and encoding must be deterministic under
    repartitioning."""
    from rclabsapi_spark.llm.similarity import (
        _as_double,
        dot,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_train(emb, n_subspaces=8, codebook_size=16, iters=3)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8

    codes = pq_encode(emb, books)
    assert set(codes.columns) == {"vec_id"} | {f"code_{m}" for m in range(8)}

    # determinism under partitioning
    a = sorted(tuple(r) for r in codes.collect())
    b = sorted(tuple(r) for r in pq_encode(emb.repartition(16), books).collect())
    assert a == b

    qrow = emb.filter(F.col("vec_id") == 3).collect()[0]
    qvec = [float(x) for x in qrow["embedding"]]
    got = [r["vec_id"] for r in pq_adc_topk(codes, books, qvec, k=10).collect()]

    q = F.array(*[F.lit(float(x)) for x in qvec])
    exact = [
        r["vec_id"]
        for r in emb.select(
            "vec_id", dot(_as_double(F.col("embedding")), q).alias("s")
        )
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    overlap = len(set(got) & set(exact)) / 10.0
    assert exact[0] == 3  # self-match sanity on the exact side
    assert got[0] == 3  # 32x-compressed codes still find the query itself
    assert overlap >= 0.4, (overlap, got, exact)


def test_ann_recall_evaluator_on_lsh_and_exact(spark):
    """The evaluator scores the exact tier at recall 1.0 by construction
    and produces a sane (0,1] macro recall for the LSH tier on multiple
    queries."""
    from rclabsapi_spark.llm.similarity import (
        _as_double,
        ann_recall_at_k,
        dot,
        sign_bucket,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = [1, 5, 9]
    v = _as_double(F.col("embedding"))

    def scored(filtered, qid, qvec):
        q = F.array(*[F.lit(float(x)) for x in qvec])
        return filtered.select(
            F.lit(qid).alias("query_id"),
            F.col("vec_id"),
            dot(v, q).alias("score"),
        )

    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(queries)).collect()
    }
    exact = None
    lsh = None
    emb_b = emb.withColumn("bucket", sign_bucket(v, 6))
    bucket_of = {
        r["vec_id"]: r["bucket"]
        for r in emb_b.filter(F.col("vec_id").isin(queries)).collect()
    }
    for qid in queries:
        e = scored(emb, qid, qvecs[qid])
        l = scored(
            emb_b.filter(F.col("bucket") == bucket_of[qid]), qid, qvecs[qid]
        )
        exact = e if exact is None else exact.unionByName(e)
        lsh = l if lsh is None else lsh.unionByName(l)

    perfect = ann_recall_at_k(exact, exact, k=10).collect()
    assert all(r["recall_at_k"] == 1.0 for r in perfect)
    approx = {
        r["query_id"]: r["recall_at_k"]
        for r in ann_recall_at_k(lsh, exact, k=10).collect()
    }
    # per-query rows plus the macro-average summary row (query_id NULL)
    per_query = {q: v for q, v in approx.items() if q is not None}
    assert set(per_query) == set(queries)
    assert all(0.0 <= v <= 1.0 for v in per_query.values())
    assert approx[None] == pytest.approx(
        sum(per_query.values()) / len(per_query)
    )
