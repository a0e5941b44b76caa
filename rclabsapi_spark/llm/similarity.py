"""Embedding similarity search over an ``array<float>`` column.

Two tiers:

- ``cosine_topk``        — brute-force exact top-k (the baseline): one
  broadcast of the query vector, one pass, distributed TakeOrdered for the
  top-k. At 100 TB this is a full scan — correct but linear.
- ``lsh_bucketed_topk``  — sign-LSH bucketing: vectors hash to a bucket by
  the sign pattern of selected dimensions; search only probes the query's
  bucket. An IVF-style recall/latency trade controlled by ``num_bits``.

All vector math stays in Catalyst (``zip_with`` + ``aggregate`` fold over
doubles) — no Python in the hot path. The fold is sequential per vector,
which makes results bit-identical to the DuckDB oracle's ``list_reduce``
evaluation of the same expression order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of pairwise products, seeded 0.0 — matches the
    oracle's list_reduce evaluation order exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine vs the row with ``query_vec_id``.

    The 1-row query side is broadcast; the scan is one projection + a
    distributed top-k (TakeOrderedAndProject), no shuffle of the corpus."""
    q = embeddings.filter(F.col(key_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        embeddings.filter(F.col(key_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(key_col),
            F.round(
                cosine(_as_double(F.col(vec_col)), F.col("qvec")), 6
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(key_col)).limit(k)


def sign_bucket(vec: Column, num_bits: int = 8) -> Column:
    """Sign-LSH bucket id: concatenated sign bits of the first
    ``num_bits`` dimensions. Axis-aligned hyperplanes — deterministic and
    engine-portable; swap in seeded random planes for production recall."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(num_bits)
    ]
    return F.concat(*bits)


def lsh_bucket_stats(
    embeddings: DataFrame, *, vec_col: str = "embedding", num_bits: int = 8
) -> DataFrame:
    """Bucket histogram — the data layout a bucketed ANN index would
    shuffle into (bucket = partition key)."""
    v = _as_double(F.col(vec_col))
    return (
        embeddings.select(sign_bucket(v, num_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    num_bits: int = 4,
) -> DataFrame:
    """ANN: probe only the query's sign-bucket, exact cosine within it.
    At scale the corpus is written bucketed (bucketBy(bucket)) so the probe
    reads one bucket's files — the scan cost drops by ~2^num_bits."""
    v = _as_double(F.col(vec_col))
    bucketed = embeddings.withColumn("bucket", sign_bucket(v, num_bits))
    q = bucketed.filter(F.col(key_col) == query_vec_id).select(
        F.col("bucket").alias("qbucket"), v.alias("qvec")
    )
    scored = (
        bucketed.filter(F.col(key_col) != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            F.col(key_col),
            F.col("bucket"),
            F.round(cosine(v, F.col("qvec")), 6).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(key_col)).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    num_bits: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the fifth dedup tier
    (alongside exact / MinHash-LSH / SimHash / n-gram Jaccard).

    Physical shape mirrors llm.dedup.lsh_candidate_pairs: one shuffle on
    the sign-LSH bucket, per-bucket pair generation via array
    combinatorics (no self-join → the embedding scan runs once), exact
    cosine only within buckets. ``num_bits`` trades recall vs bucket
    size; ``max_bucket_size`` guards the B² blowup of degenerate buckets
    at corpus scale."""
    v = _as_double(F.col(vec_col))
    bucketed = embeddings.repartition(F.col(key_col)).select(
        F.col(key_col), v.alias("v"), sign_bucket(v, num_bits).alias("bucket")
    )
    buckets = (
        bucketed.groupBy("bucket")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(key_col), F.col("v")))
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket_size)
    m = F.col("members")
    pair_structs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + F.lit(2), F.size(m) - i - F.lit(1)),
                lambda y: F.struct(
                    x[key_col].alias("id_a"),
                    y[key_col].alias("id_b"),
                    x["v"].alias("va"),
                    y["v"].alias("vb"),
                ),
            ),
        )
    )
    pairs = buckets.select(
        F.col("bucket"), F.explode(pair_structs).alias("p")
    ).select("bucket", "p.id_a", "p.id_b", "p.va", "p.vb")
    out = pairs.select(
        "bucket",
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
    )
    return out.filter(F.col("cosine_sim") >= threshold)
