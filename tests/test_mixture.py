"""Semantics of domain-mixture sampling (llm/sampling.py::mixture_sample):
rate math, the rate-1 cap, and key-determinism of the realized sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.llm.sampling import mixture_sample


def _corpus(spark):
    # 1000 rows of 'big', 40 rows of 'small'
    rows = [(i, "big") for i in range(1000)] + [
        (10_000 + i, "small") for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates_hit_target_and_cap(spark):
    df = _corpus(spark)
    kept = mixture_sample(
        df,
        key_col="doc_id",
        strat_col="source",
        weights={"big": 0.5, "small": 0.5},
        target_total=200.0,
    )
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # small: rate = min(1, 200*0.5/40) = 1 → every row kept
    assert by_src["small"] == 40
    # big: rate = 0.1 → ~100 of 1000, md5-uniform within a loose band
    assert 60 <= by_src["big"] <= 140


def test_mixture_is_deterministic_and_key_pure(spark):
    df = _corpus(spark)
    kwargs = dict(
        key_col="doc_id",
        strat_col="source",
        weights={"big": 0.2},
        default_weight=0.8,
        target_total=300.0,
        salt="s1",
    )
    k1 = {r["doc_id"] for r in mixture_sample(df, **kwargs).collect()}
    k2 = {
        r["doc_id"]
        for r in mixture_sample(df.repartition(13), **kwargs).collect()
    }
    assert k1 == k2
    # a different salt draws a different (but same-rate) subset
    kwargs["salt"] = "s2"
    k3 = {r["doc_id"] for r in mixture_sample(df, **kwargs).collect()}
    assert k3 != k1


def test_mixture_default_weight_zero_drops_unlisted(spark):
    df = _corpus(spark)
    kept = mixture_sample(
        df,
        key_col="doc_id",
        strat_col="source",
        weights={"small": 1.0},
        target_total=40.0,
    )
    assert {r["source"] for r in kept.collect()} == {"small"}


def test_dsir_weights_separate_target_like_documents(spark):
    """Documents written in the target's vocabulary must outscore
    documents in the raw vocabulary; scores are deterministic under
    repartitioning (position-sorted fold, not SUM)."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.llm.sampling import dsir_logweights

    target_words = "science research theory experiment data model"
    raw_words = "buy cheap deals discount sale offer"
    rows = []
    for i in range(30):
        rows.append((i, "en", target_words))
        rows.append((100 + i, "de", raw_words))
    # held-out docs: one target-like, one raw-like, both labeled raw
    rows.append((500, "de", target_words))
    rows.append((501, "de", raw_words))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_logweights(
            docs, is_target=F.col("lang") == "en"
        ).collect()
    }
    assert out[500] > out[501]  # target-like raw doc upweighted
    assert out[500] > 0 > out[501]
    again = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_logweights(
            docs.repartition(13), is_target=F.col("lang") == "en"
        ).collect()
    }
    assert out == again  # bit-identical under repartitioning
