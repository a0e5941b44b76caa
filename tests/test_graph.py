"""Graph kernels (operators/graph.py): triangle counting vs known
censuses and brute force, PageRank invariants."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from rclabsapi_spark.operators.graph import pagerank, triangle_count


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_count(df).collect()[0]


def test_k4_has_four_triangles(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    r = _tri(spark, k4)
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)


def test_path_graph_has_none(spark):
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert r["n_triangles"] == 0


def test_duplicate_reversed_and_self_edges_collapse(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)]
    r = _tri(spark, edges)
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)


def test_random_graph_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    n = 30
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < 0.2
    ]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    brute = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert _tri(spark, edges)["n_triangles"] == brute


def test_pagerank_sums_to_one_and_uniform_cycle(spark):
    # directed 4-cycle with weight 1: stationary = uniform
    edges = [(i, (i + 1) % 4, 1.0) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    ranks = {r["node"]: r["pagerank"] for r in pagerank(df, iters=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
    assert all(abs(v - 0.25) < 1e-6 for v in ranks.values())


def test_pagerank_sink_free_flow_concentrates(spark):
    # two sources feeding one hub: hub must outrank sources
    edges = [(1, 0, 1.0), (2, 0, 1.0), (0, 1, 0.5), (0, 2, 0.5)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    ranks = {r["node"]: r["pagerank"] for r in pagerank(df, iters=10).collect()}
    assert ranks[0] > ranks[1] and ranks[0] > ranks[2]


def test_service_mode_cache_hygiene_soak(spark):
    """Repeated EngineAPI-style calls must not accumulate storage: the
    loop caches (edges/nodes/oriented, the IVF corpus scan) are
    unpersisted after an eager checkpoint of the small result, so only
    the ≤|result|-sized checkpoint blocks remain, bounded regardless of
    call count (the ContextCleaner purges released ones async)."""
    import gc

    from rclabsapi_spark.catalog import load_table
    from rclabsapi_spark.llm.similarity import ivf_topk

    sc = spark.sparkContext

    def stored() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    edges = ev.groupBy(
        F.col("event_type").alias("src"),
        F.col("user_id").cast("string").alias("dst"),
    ).agg((F.count(F.lit(1)) * 1.0).alias("w"))
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    baseline = stored()
    for _ in range(3):
        pagerank(edges, iters=2).collect()
        triangle_count(
            edges.select(F.col("src"), F.col("dst").alias("dst"))
        ).collect()
        ivf_topk(emb, 0, k=5, n_centroids=4, nprobe=2).collect()
        gc.collect()
    # 3 rounds × 3 ops: without the unpersists this is ≥18 cached
    # relations; with them, only the small checkpointed results linger
    assert stored() - baseline <= 9, stored()


def test_triangles_mega_basket_branch_routing_invariant(spark, monkeypatch):
    """q_triangles' mega-basket guard (r17): baskets over _ARRAY_CAP raw
    rows route through the row-at-a-time self-join branch instead of the
    in-basket array build. The routing must be RESULT-invariant — both
    branches compute the same pair multiset — so running the query with
    the cap forced to 1 (every basket through the self-join branch) must
    reproduce the default-cap result exactly. This exercises the big
    branch end-to-end (it is empty on TPC-H input at the default cap)."""
    import rclabsapi_spark.suites.graph as g

    sf = "/root/testdata/sf0.001"
    base = g.q_triangles(spark, sf).collect()
    monkeypatch.setattr(g, "_ARRAY_CAP", 1)
    forced = g.q_triangles(spark, sf).collect()
    assert base == forced
    assert base[0]["n_triangles"] >= 0
