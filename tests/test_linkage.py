"""Linkage operators (operators/linkage.py): blocked fuzzy matching
ground truth vs brute force within blocks, cap behavior, and basket
pair-support consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.operators.linkage import (
    basket_pair_support,
    blocked_fuzzy_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _block(col: str):
    return F.expr(f"substring({col}, 1, length({col}) - 2)")


def test_fuzzy_pairs_match_bruteforce_within_blocks(spark):
    """Every emitted pair has dist ≤ max_dist, and every within-block
    qualifying pair is emitted (blocking recall is exact inside blocks)."""
    cust = load_table(spark, SF_DIR, "customer")
    got = {
        (r["key_a"], r["key_b"]): r["lev_dist"]
        for r in blocked_fuzzy_pairs(
            cust,
            key_col="c_custkey",
            name_col="c_name",
            block_col=_block("c_name"),
            max_dist=1,
        ).collect()
    }
    base = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        _block("c_name").alias("block"),
    )
    a, b = base.alias("a"), base.alias("b")
    brute = {
        (r["key_a"], r["key_b"]): r["d"]
        for r in a.join(b, "block")
        .filter(F.col("a.key") < F.col("b.key"))
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.levenshtein("a.name", "b.name").alias("d"),
        )
        .filter(F.col("d") <= 1)
        .collect()
    }
    assert got == brute
    assert len(got) > 0


def test_fuzzy_pairs_block_cap_degrades_to_subblocks(spark):
    """A cap smaller than the block size must degrade recall gracefully
    (salted sub-blocks), not collapse to zero: the output is a nonempty
    PROPER subset of the brute-force qualifying pairs, and every
    emitted pair's two keys hash to the same sub-block."""
    cust = load_table(spark, SF_DIR, "customer")
    got = {
        (r["key_a"], r["key_b"])
        for r in blocked_fuzzy_pairs(
            cust,
            key_col="c_custkey",
            name_col="c_name",
            block_col=F.lit("ALL"),  # adversarial: one giant block
            max_dist=1,
            max_block=10,
        ).collect()
    }
    base = cust.select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    a, b = base.alias("a"), base.alias("b")
    brute = {
        (r["key_a"], r["key_b"])
        for r in a.crossJoin(b)
        .filter(F.col("a.key") < F.col("b.key"))
        .filter(F.levenshtein("a.name", "b.name") <= 1)
        .select(
            F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b")
        )
        .collect()
    }
    assert 0 < len(got) < len(brute)
    assert got <= brute
    # sub-block membership is the md5 hash the operator claims — under
    # EITHER of the two independent salts (r14 union contract)
    n = cust.count()
    n_sub = -(-n // 10)
    subs = {}
    for salt in ("sub", "sub2"):
        subs[salt] = {
            r["key"]: r["s"]
            for r in base.select(
                "key",
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(salt), F.col("key").cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % n_sub
                ).alias("s"),
            ).collect()
        }
    assert got == {
        p
        for p in brute
        if any(subs[s][p[0]] == subs[s][p[1]] for s in ("sub", "sub2"))
    }


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,  # each example runs several Spark jobs
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(
    rows=st.dictionaries(
        st.integers(0, 40),
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=3),  # name
            st.sampled_from(["X", "Y"]),  # block
        ),
        min_size=2,
        max_size=25,
    ),
    max_block=st.sampled_from([2, 5, 1000]),
)
def test_fuzzy_subblock_recall_contract(spark, rows, max_block):
    """Property: the emitted pair set is EXACTLY the brute-force
    qualifying pairs restricted to same-sub-block membership under AT
    LEAST ONE of the two salts, where sub is 0 for blocks within the
    cap and md5(salt||key) % ceil(size/cap) per salt otherwise — i.e.
    blocks at/below the cap have exact recall, blocks above degrade to
    the documented 1−(1−1/n_sub)² union recall, and nothing outside
    the contract ever appears (each pair exactly once)."""
    import hashlib
    import math

    import collections

    data = [(k, n, b) for k, (n, b) in rows.items()]
    df = spark.createDataFrame(data, "key long, name string, blk string")
    # Counter, not set (ADVICE/VERDICT r14): multiset equality makes an
    # accidental double-emission (e.g. a regression in the disjoint
    # first-matching-salt branches) fail HERE, not only in the driver's
    # multiplicity-sensitive UNION ALL value-hash.
    got = collections.Counter(
        (r["key_a"], r["key_b"])
        for r in blocked_fuzzy_pairs(
            df,
            key_col="key",
            name_col="name",
            block_col=F.col("blk"),
            max_dist=1,
            max_block=max_block,
        ).collect()
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    sizes = {}
    for _, (_, b) in rows.items():
        sizes[b] = sizes.get(b, 0) + 1

    def subs(key, block):
        n = sizes[block]
        if n <= max_block:
            return [0]
        n_sub = math.ceil(n / max_block)
        return [
            int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)
            % n_sub
            for salt in ("sub", "sub2")
        ]

    want = set()
    for ka, (na, ba) in rows.items():
        for kb, (nb, bb) in rows.items():
            if ka < kb and ba == bb and lev(na, nb) <= 1:
                if any(
                    sa == sb
                    for sa, sb in zip(subs(ka, ba), subs(kb, bb))
                ):
                    want.add((ka, kb))
    assert dict(got) == {p: 1 for p in want}


def test_basket_pairs_symmetric_support(spark):
    """support_ab of an emitted pair equals the brute-force count of
    baskets containing both items, and item order is canonical."""
    li = load_table(spark, SF_DIR, "lineitem")
    top = basket_pair_support(
        li, basket_col="l_orderkey", item_col="l_partkey", k=5
    ).collect()
    assert len(top) == 5
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    for r in top:
        assert r["item_a"] < r["item_b"]
        n = (
            baskets.filter(F.col("l_partkey") == r["item_a"])
            .select("l_orderkey")
            .intersect(
                baskets.filter(F.col("l_partkey") == r["item_b"]).select(
                    "l_orderkey"
                )
            )
            .count()
        )
        assert n == r["support_ab"]


# ---------------------------------------------------------------------------
# Weighted sampling + attribution (suite-mates of the linkage batch)
# ---------------------------------------------------------------------------


def test_weighted_sample_prefers_heavy_weights(spark):
    """With a 1000:1 weight ratio the heavy item family must dominate
    the sample across salts (inclusion probability ∝ weight)."""
    from rclabsapi_spark.llm.sampling import weighted_sample_k

    rows = [(i, "heavy" if i < 50 else "light", 1000.0 if i < 50 else 1.0)
            for i in range(1050)]
    df = spark.createDataFrame(rows, "id long, fam string, w double")
    heavy_share = []
    for salt in ("s1:", "s2:", "s3:"):
        got = weighted_sample_k(
            df, key_col="id", weight_col="w", k=20, salt=salt
        ).collect()
        heavy_share.append(
            sum(1 for r in got if r["fam"] == "heavy") / len(got)
        )
    # 50 heavy ids hold ~98% of total weight; a uniform sample would
    # pick ~5% heavy. Demand a clear majority in every draw.
    assert all(s >= 0.6 for s in heavy_share), heavy_share


def test_weighted_sample_deterministic_under_partitioning(spark):
    from rclabsapi_spark.llm.sampling import weighted_sample_k

    rows = [(i, float(i % 7 + 1)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    outs = []
    for shape in (df, df.repartition(13)):
        outs.append(
            sorted(
                r["id"]
                for r in weighted_sample_k(
                    df=shape, key_col="id", weight_col="w", k=25
                ).collect()
            )
        )
    assert outs[0] == outs[1]
    assert len(outs[0]) == 25


def test_last_touch_attribution_tiny_case(spark):
    from rclabsapi_spark.operators.analytics import last_touch_attribution

    rows = [
        # user 1: view → click → PURCHASE(5) → PURCHASE(7)  (click gets both)
        (1, 1, "view", 0.0), (1, 2, "click", 0.0),
        (1, 3, "purchase", 5.0), (1, 4, "purchase", 7.0),
        # user 2: PURCHASE(3) with no preceding touch → NULL channel
        (2, 5, "purchase", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    got = {
        r["channel"]: (r["n_conversions"], r["attributed_value"], r["share"])
        for r in last_touch_attribution(df, conversion_type="purchase").collect()
    }
    assert got == {"click": (2, 12.0, 2 / 3), None: (1, 3.0, 1 / 3)}


def test_fuzzy_salts_must_be_a_pair(spark):
    """ADVICE r14: the union construction hardcodes exactly two salted
    sub-blockings (first-salt join + one rescue join), so a 1-tuple
    must fail loudly at entry instead of IndexError-ing mid-plan, and
    3+ salts must not be silently ignored under a docstring that
    implies they would widen recall."""
    import pytest

    df = spark.createDataFrame(
        [(1, "ann", "X"), (2, "ann", "X")],
        "key long, name string, blk string",
    )
    for bad in (("one",), ("a", "b", "c")):
        with pytest.raises(ValueError, match="exactly two"):
            blocked_fuzzy_pairs(
                df,
                key_col="key",
                name_col="name",
                block_col=F.col("blk"),
                salts=bad,
            )


def test_basket_pairs_mega_basket_dropped_before_array(spark):
    """Mega-basket guard (r17, VERDICT r16 item 4): a basket exceeding
    ``max_basket`` DISTINCT items must be dropped — and the drop happens
    on spill-safe aggregation rows (distinct count stamped by a window)
    BEFORE any per-basket array is collected, so one corrupt basket can
    never materialize as an unsplittable reducer buffer. Plants a
    basket of 40 distinct items (cap 10) beside normal baskets, with
    duplicate rows to prove the count is of DISTINCT items."""
    rows = [(999, i) for i in range(40)]  # the mega-basket
    rows += [(999, i) for i in range(5)]  # duplicates: distinct=40
    rows += [(1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (3, 10), (3, 11)]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = basket_pair_support(
        df, basket_col="basket", item_col="item", k=10, max_basket=10
    ).collect()
    # pairs exist only among baskets 1-3; (10, 11) co-occurs in all 3
    top = out[0]
    assert (top["item_a"], top["item_b"], top["support_ab"]) == (10, 11, 3)
    # no pair involves any item unique to the mega-basket (ids >= 13)
    assert all(r["item_b"] < 13 for r in out)
    # supports count KEPT baskets only: item 10's support is 3, not 4
    # (the mega-basket also contains item 10 but was dropped)
    assert top["support_a"] == 3
