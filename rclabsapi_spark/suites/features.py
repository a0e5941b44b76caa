"""Feature-engineering queries: the llm/features.py transforms run
against the fixture tables with full DuckDB oracles — z-score / robust
scaling, one-hot, the hashing trick, quantile (CDF) normalization,
leakage-safe target encoding, and deterministic negative sampling.

Reference parity: the reference exposes per-column computed metrics on
its monitoring rollups (job_monitor_service.cpp:1292-1385 computes
derived rate/score columns per row); these queries are that same
"derive a model-ready column from aggregates + row values" contract.

Float rules (registry.py): location/scale parameters are multi-row
float aggregates, so every derived column rounds the FINAL value with
round_half_up at a grain coarse enough to absorb accumulation-order
ulps — 6dp for O(1)-magnitude z-scores/CDF values, 2dp for
price-magnitude (~1e5) target encodings where a 1e-6 grain would sit
inside the ulp noise of a 15k-row sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.scalars import round_half_up, sql_round_half_up
from rclabsapi_spark.llm.features import (
    hash_feature,
    one_hot,
    quantile_transform,
    robust_scale,
    sample_negatives,
    standardize,
    target_encode,
)
from rclabsapi_spark.registry import query

# ---------------------------------------------------------------------------
# Column scaling: z-score and median/MAD
# ---------------------------------------------------------------------------

_STANDARDIZE_ORACLE = f"""
WITH s AS (
    -- exact HUGEINT sufficient statistics on the 6dp grid (mirrors
    -- llm/features.py::standardize): raw AVG/STDDEV of doubles are
    -- accumulation-ordered and one ulp would shift every z row
    SELECT COUNT(o_totalprice) AS n,
           SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS HUGEINT)) AS s1,
           SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS HUGEINT)
               * CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS HUGEINT))
               AS s2
    FROM orders
),
d AS (
    SELECT s1::DOUBLE / (n * 1000000.0) AS mu,
           sqrt((s2 * n - s1 * s1)::DOUBLE / (n * (n - 1))) / 1000000.0
               AS sd
    FROM s
)
SELECT o_orderkey,
       CASE WHEN sd > 0
            THEN {sql_round_half_up("(o_totalprice - mu) / sd", 6)}
       END AS price_z
FROM orders, d
"""


@query("feat_standardize_z", _STANDARDIZE_ORACLE)
def q_standardize(spark, sf_dir):
    """z-score scaling of o_totalprice: one global (mean, stddev)
    aggregate broadcast back over the scan, per-row codegen arithmetic —
    no per-column passes. llm/features.py::standardize."""
    orders = load_table(spark, sf_dir, "orders")
    out = standardize(orders, ["o_totalprice"], suffix="_z")
    return out.select(
        "o_orderkey",
        round_half_up(F.col("o_totalprice_z"), 6).alias("price_z"),
    )


_ROBUST_ORACLE = f"""
WITH med AS (SELECT MEDIAN(o_totalprice) AS m FROM orders),
mad AS (
    SELECT MEDIAN(ABS(o_totalprice - m)) AS d FROM orders, med
)
SELECT o_orderkey,
       CASE WHEN d > 0
            THEN {sql_round_half_up("(o_totalprice - m) / d", 6)}
       END AS price_r
FROM orders, med, mad
"""


@query("feat_robust_scale", _ROBUST_ORACLE)
def q_robust_scale(spark, sf_dir):
    """Median/MAD scaling of o_totalprice — the outlier-insensitive twin
    of z-scoring (scaling analog of mad_anomalies). Two tiny aggregates
    broadcast back. llm/features.py::robust_scale."""
    orders = load_table(spark, sf_dir, "orders")
    out = robust_scale(orders, ["o_totalprice"], suffix="_r")
    return out.select(
        "o_orderkey",
        round_half_up(F.col("o_totalprice_r"), 6).alias("price_r"),
    )


# ---------------------------------------------------------------------------
# Categorical encodings: one-hot, hashing trick, target encoding
# ---------------------------------------------------------------------------


@query(
    "feat_one_hot_status",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS status_f,
           CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS status_o,
           CASE WHEN o_orderstatus NOT IN ('F', 'O') THEN 1 ELSE 0 END
               AS status_other
    FROM orders
    """,
)
def q_one_hot(spark, sf_dir):
    """Explicit-vocabulary one-hot of o_orderstatus (+ catch-all): pure
    CASE columns, no distinct pass, no pivot shuffle, deterministic
    column order for the trainer. llm/features.py::one_hot."""
    orders = load_table(spark, sf_dir, "orders")
    out = one_hot(orders, "o_orderstatus", ["F", "O"], other=True)
    return out.select(
        "o_orderkey",
        F.col("o_orderstatus__F").alias("status_f"),
        F.col("o_orderstatus__O").alias("status_o"),
        F.col("o_orderstatus__other").alias("status_other"),
    )


@query(
    "feat_hash_bucket",
    """
    SELECT o_orderkey,
           CAST(concat('0x', substring(
               md5('hf:' || o_orderpriority), 1, 8)) AS BIGINT) % 64
               AS feat_idx
    FROM orders
    """,
)
def q_hash_bucket(spark, sf_dir):
    """Hashing-trick feature index of o_orderpriority into 64 dims:
    md5-derived bucket, memoryless and engine-portable — the
    unbounded-vocabulary escape hatch. llm/features.py::hash_feature."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        hash_feature(F.col("o_orderpriority"), dims=64, salt="hf:").alias(
            "feat_idx"
        ),
    )


_TARGET_ENCODE_ORACLE = f"""
WITH folded AS (
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(concat('0x', substring(
               md5('te:' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % 5 AS f
    FROM orders
),
per_fold AS (
    SELECT o_orderpriority AS cat, f,
           SUM(o_totalprice) AS s, COUNT(*) AS n
    FROM folded GROUP BY 1, 2
),
oof AS (
    SELECT cat, f,
           SUM(s) OVER (PARTITION BY cat) - s AS s_oof,
           SUM(n) OVER (PARTITION BY cat) - n AS n_oof
    FROM per_fold
),
gmu AS (SELECT AVG(o_totalprice) AS mu FROM orders)
SELECT d.o_orderkey,
       {sql_round_half_up(
           "COALESCE((o.s_oof + 10.0 * g.mu) / (o.n_oof + 10.0), g.mu)", 2
       )} AS priority_te
FROM folded d
LEFT JOIN oof o ON o.cat = d.o_orderpriority AND o.f = d.f
CROSS JOIN gmu g
"""


@query("feat_target_encode", _TARGET_ENCODE_ORACLE, bench=True)
def q_target_encode(spark, sf_dir):
    """Leakage-safe (out-of-fold) target encoding of o_orderpriority by
    o_totalprice: deterministic md5 folds, one (category, fold)
    aggregate, per-row OOF smoothing toward the global mean — a row
    never contributes to its own encoding.
    llm/features.py::target_encode. Rounds at 2dp (price grain): the
    encodings are ~1e5-magnitude means of 1000s-row float sums, where a
    1e-6 grain would sit inside accumulation-order ulp noise."""
    orders = load_table(spark, sf_dir, "orders")
    out = target_encode(
        orders,
        cat_col="o_orderpriority",
        target_col="o_totalprice",
        key_col="o_orderkey",
        n_folds=5,
        salt="te:",
        prior_weight=10.0,
    )
    return out.select(
        "o_orderkey",
        round_half_up(F.col("o_orderpriority__te"), 2).alias("priority_te"),
    )


# ---------------------------------------------------------------------------
# Quantile (empirical-CDF) normalization
# ---------------------------------------------------------------------------


@query(
    "feat_quantile_transform",
    """
    SELECT o_orderkey,
           PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey)
               AS price_q
    FROM orders
    """,
)
def q_quantile(spark, sf_dir):
    """Empirical-CDF normalization of o_totalprice: percent_rank over
    (value, key) — distribution-free feature scaling with deterministic
    ties. (rank−1)/(n−1) is exact integer arithmetic divided once, so
    the doubles are bit-identical across engines — no rounding.
    llm/features.py::quantile_transform."""
    orders = load_table(spark, sf_dir, "orders")
    out = quantile_transform(
        orders, ["o_totalprice"], key_col="o_orderkey", suffix="_q"
    )
    return out.select(
        "o_orderkey", F.col("o_totalprice_q").alias("price_q")
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling (contrastive pairs)
# ---------------------------------------------------------------------------

_NEGATIVES_ORACLE = """
WITH ranked AS (
    SELECT doc_id AS k_, lang AS l_,
           ROW_NUMBER() OVER (
               ORDER BY md5('neg:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pos
    FROM documents
),
n AS (SELECT MAX(pos) AS n FROM ranked),
cand AS (
    SELECT a.k_ AS anchor, a.l_ AS anchor_label,
           ((a.pos - 1 + o.off) % n.n) + 1 AS cpos, o.off AS off
    FROM ranked a
    CROSS JOIN n
    CROSS JOIN (SELECT UNNEST(range(1, 5)) AS off) o
),
joined AS (
    SELECT c.anchor, c.anchor_label, r.k_ AS negative, r.l_ AS neg_label,
           c.off
    FROM cand c JOIN ranked r ON r.pos = c.cpos
    WHERE r.l_ <> c.anchor_label
),
dedup AS (
    SELECT * FROM joined
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY anchor, negative ORDER BY off) = 1
),
picked AS (
    SELECT * FROM dedup
    QUALIFY ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY off) <= 2
)
SELECT anchor, anchor_label, negative, neg_label,
       COUNT(*) OVER (PARTITION BY anchor)::BIGINT AS n_negatives
FROM picked
"""


@query("feat_negatives", _NEGATIVES_ORACLE, bench=True)
def q_negatives(spark, sf_dir):
    """Deterministic negative sampling over documents (label = lang,
    k=2): each anchor takes ring neighbors at offsets 1..4 on the
    md5-shuffled corpus ring, keeps the first 2 with a different
    language — linear (no per-anchor scan), identical pairing on every
    engine/run/partitioning. llm/features.py::sample_negatives."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_negatives(docs, key_col="doc_id", label_col="lang", k=2)
