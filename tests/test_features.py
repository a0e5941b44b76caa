"""Feature transforms (llm/features.py): numpy/python parity, NULL
guards, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rclabsapi_spark.llm.features import (
    hash_feature,
    one_hot,
    quantile_transform,
    robust_scale,
    standardize,
)


def _df(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "id long, x double"
    )


def test_standardize_matches_numpy(spark):
    xs = [(i * 17) % 23 for i in range(50)]
    got = {
        r["id"]: r["x_z"]
        for r in standardize(_df(spark, xs), ["x"]).collect()
    }
    arr = np.array(xs, dtype="float64")
    mu, sd = arr.mean(), arr.std(ddof=1)
    for i, x in enumerate(xs):
        assert got[i] == pytest.approx((x - mu) / sd, abs=1e-9)

    # constant column → NULL (zero stddev guard)
    const = standardize(_df(spark, [5.0] * 10), ["x"]).collect()
    assert all(r["x_z"] is None for r in const)


def test_robust_scale_matches_python(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 100.0]  # outlier
    got = {
        r["id"]: r["x_r"]
        for r in robust_scale(_df(spark, xs), ["x"]).collect()
    }
    med = 3.0
    mad = float(np.median([abs(x - med) for x in xs]))
    for i, x in enumerate(xs):
        assert got[i] == pytest.approx((x - med) / mad, abs=1e-9)
    # the outlier lands far out while the bulk stays near 0 — unlike
    # z-scoring, where the outlier would compress the bulk
    assert abs(got[4]) > 50 and abs(got[1]) <= 1


def test_one_hot_explicit_vocab(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz")], "id long, c string"
    )
    out = {r["id"]: r for r in one_hot(df, "c", ["a", "b"]).collect()}
    assert (out[1]["c__a"], out[1]["c__b"], out[1]["c__other"]) == (1, 0, 0)
    assert (out[2]["c__a"], out[2]["c__b"], out[2]["c__other"]) == (0, 1, 0)
    assert (out[3]["c__a"], out[3]["c__b"], out[3]["c__other"]) == (0, 0, 1)


def test_hash_feature_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(f"tok{i}",) for i in range(500)], "w string"
    )
    out = df.select(hash_feature(F.col("w"), dims=64).alias("h"))
    vals = [r["h"] for r in out.collect()]
    assert all(0 <= v < 64 for v in vals)
    # deterministic across evaluations
    assert vals == [r["h"] for r in out.collect()]
    # decent spread: ≥half the buckets hit with 500 tokens
    assert len(set(vals)) > 32


def test_quantile_transform_uniformizes(spark):
    xs = [float(x) for x in np.random.RandomState(7).lognormal(0, 1, 200)]
    out = quantile_transform(
        _df(spark, xs), ["x"], key_col="id"
    ).collect()
    pairs = sorted((r["x"], r["x_q"]) for r in out)
    qs = [q for _, q in pairs]
    assert qs[0] == 0.0 and qs[-1] == 1.0
    assert all(a <= b for a, b in zip(qs, qs[1:]))  # monotone in value
    # ranks are uniform by construction: quartile counts equal ±1
    import collections

    quart = collections.Counter(int(min(q * 4, 3)) for q in qs)
    assert max(quart.values()) - min(quart.values()) <= 2


def test_target_encode_out_of_fold_no_leakage(spark):
    """Parity with a python brute force AND the leakage property: a
    row's own fold's targets never enter its encoding."""
    import hashlib

    from rclabsapi_spark.llm.features import target_encode

    rows = [
        (i, ["u", "v", "w"][i % 3], float((i * 7) % 5)) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id long, c string, y double")
    got = {
        r["id"]: r["c__te"]
        for r in target_encode(
            df, cat_col="c", target_col="y", key_col="id", n_folds=5,
            salt="te:", prior_weight=10.0,
        ).collect()
    }

    def fold(i):
        return int(hashlib.md5(f"te:{i}".encode()).hexdigest()[:8], 16) % 5

    mu = sum(y for _, _, y in rows) / len(rows)
    for i, c, _y in rows:
        oof = [
            y for j, cc, y in rows if cc == c and fold(j) != fold(i)
        ]
        expect = (sum(oof) + 10.0 * mu) / (len(oof) + 10.0)
        assert got[i] == pytest.approx(expect, abs=1e-9), i

    # leakage check: perturbing ONLY rows in the same (category, fold)
    # must not change this row's encoding
    probe = 0
    same_cell = [
        j for j, cc, _ in rows
        if cc == rows[probe][1] and fold(j) == fold(probe) and j != probe
    ]
    assert same_cell  # cell is populated
    bumped = [
        (i, c, y + 1000.0 if i in same_cell else y) for i, c, y in rows
    ]
    # global mean shifts slightly; isolate by prior_weight=0
    got0 = {
        r["id"]: r["c__te"]
        for r in target_encode(
            spark.createDataFrame(rows, "id long, c string, y double"),
            cat_col="c", target_col="y", key_col="id", n_folds=5,
            salt="te:", prior_weight=0.0,
        ).collect()
    }
    got_bumped = {
        r["id"]: r["c__te"]
        for r in target_encode(
            spark.createDataFrame(bumped, "id long, c string, y double"),
            cat_col="c", target_col="y", key_col="id", n_folds=5,
            salt="te:", prior_weight=0.0,
        ).collect()
    }
    assert got0[probe] == pytest.approx(got_bumped[probe], abs=1e-9)


def test_sample_negatives_labels_differ_and_deterministic(spark):
    from rclabsapi_spark.llm.features import sample_negatives

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "label")
    out = sample_negatives(emb, key_col="vec_id", label_col="label", k=4)
    rows = out.collect()
    # every pair crosses labels; no anchor pairs with itself
    assert all(r["anchor_label"] != r["neg_label"] for r in rows)
    assert all(r["anchor"] != r["negative"] for r in rows)
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r["anchor"], set()).add(r["negative"])
    n_anchors = emb.count()
    assert len(per_anchor) == n_anchors  # no anchor starved
    assert all(len(v) == 4 for v in per_anchor.values())
    # determinism under repartitioning
    again = {
        (r["anchor"], r["negative"])
        for r in sample_negatives(
            emb.repartition(13), key_col="vec_id", label_col="label", k=4
        ).collect()
    }
    assert again == {(r["anchor"], r["negative"]) for r in rows}
