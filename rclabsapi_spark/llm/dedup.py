"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame ops (no UDFs, no driver loops):

- exact:          hash-groupBy on the normalized text
- MinHash + LSH:  shingle → md5-minhash signature → banded self-join —
                  candidate pairs come from bucket joins, never O(n²)
- n-gram Jaccard: exact pairwise Jaccard over an inverted shingle index
                  (explode → join on shingle → count) — verification tier
- SimHash:        bit-vote fingerprint over token hashes

Determinism/portability: all hashing is md5 (identical hex in every
engine), so the DuckDB oracle reproduces signatures bit-for-bit. md5 of a
seeded prefix is a valid random permutation for MinHash (take the
lexicographic min of hex digests).

Scale notes (100 TB): every step is embarrassingly parallel except the
band-key self-join, which shuffles on (band, key) — exactly the LSH
design goal (each bucket is tiny). The inverted-index Jaccard join is
bounded by document frequency of shingles; a stop-shingle cap
(``max_shingle_df``) drops degenerate hot shingles the way web-dedup
pipelines drop boilerplate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles; safe empty result for short docs. Mirrors the
    DuckDB expression in suites/llm.py exactly."""
    t = tokens(text)
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(n)]
        ),
    )


def distinct_shingles(text: Column, n: int = 3) -> Column:
    return F.array_distinct(shingles(text, n))


def exact_dedup(
    docs: DataFrame, *, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one group per distinct text, keeper = min key.
    Group key is md5(text) — at 100 TB you shuffle 32-byte digests, not
    document bodies."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(key_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_signature(sh: Column, num_hashes: int = 8) -> list[Column]:
    """MinHash via seeded md5: sig_i = min over shingles of md5('i|'+s)."""
    def seeded(i: int):
        # closure (not a default arg — a 2-param lambda would receive the
        # array index as its second argument)
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return [
        F.array_min(F.transform(sh, seeded(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def minhash_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    sh = distinct_shingles(F.col(text_col), n)
    return docs.select(
        F.col(key_col), sh.alias("shingle_set"), *minhash_signature(sh, num_hashes)
    ).filter(F.size("shingle_set") > 0)


def lsh_candidate_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH: docs sharing any band of the signature become a
    candidate pair, then exact Jaccard on the shingle sets verifies.

    Physical shape: explode to (band_id, band_key, doc) → shuffle on the
    band key → per-bucket self-join. Bucket sizes are the knob (bands ×
    rows-per-band), not data size."""
    rows = num_hashes // bands
    mh = minhash_docs(
        docs, text_col=text_col, key_col=key_col, n=n, num_hashes=num_hashes
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = mh.select(
        key_col, "shingle_set", F.explode(F.array(*band_cols)).alias("band")
    ).select(key_col, "shingle_set", "band.band_id", "band.band_key")

    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("doc_a"),
            F.col(f"b.{key_col}").alias("doc_b"),
            F.col("a.shingle_set").alias("set_a"),
            F.col("b.shingle_set").alias("set_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(inter / union, 6).alias("jaccard"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via an inverted shingle index: explode distinct
    shingles, self-join the postings, count common shingles per pair.

    ``max_shingle_df`` drops shingles appearing in more than N docs
    (boilerplate guard — at web scale hot shingles explode the join)."""
    sh = docs.select(
        F.col(key_col), distinct_shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select(key_col, F.size("sh").alias("sh_size"))
    posting = sh.select(key_col, F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        posting = posting.join(hot, "shingle", "left_anti")
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .groupBy(
            F.col(f"a.{key_col}").alias("doc_a"),
            F.col(f"b.{key_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(key_col).alias("doc_a"), F.col("sh_size").alias("size_a"))
    sb = sizes.select(F.col(key_col).alias("doc_b"), F.col("sh_size").alias("size_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "common", "jaccard")


_HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash16(docs: DataFrame, *, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: bit j of each token's md5 = high bit of hex char j;
    tokens vote ±1 per bit; fingerprint bit = (vote sum > 0).

    Expressed as explode → one groupBy with 16 conditional sums → bit
    recombination. All integer math → exact cross-engine parity."""
    tok = docs.select(
        F.col(key_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    votes = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin(*_HEX_HIGH), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = tok.groupBy(key_col).agg(*votes)
    fp = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select(key_col, fp.cast("long").alias("simhash"))
