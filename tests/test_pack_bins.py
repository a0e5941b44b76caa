"""pack_bins salted-path equivalence (llm/training.py): a single giant
shard serializes the prefix-sum window into one task; the
``max_docs_per_task`` escape hatch range-splits it into runs and stitches
with per-run token offsets. bin_id is a function of the shard-global
prefix sum, which decomposes exactly over runs — so the salted output
must be BIT-IDENTICAL to the serial pass, and the salted plan must show
the range split (>1 run actually populated)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.llm.training import pack_bins


def _docs(spark):
    # one pathological shard: 500 docs, varying token counts, all in
    # shard "s0"; plus a small second shard to prove shard isolation.
    rows = [
        (i, "s0", "tok " * (1 + (i * 7) % 23)) for i in range(500)
    ] + [(1000 + i, "s1", "tok " * (1 + i % 5)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_salted_equals_serial_and_splits(spark):
    docs = _docs(spark)
    serial = {
        (r["doc_id"]): (r["source"], r["n_tokens"], r["bin_id"])
        for r in pack_bins(docs, budget=64).collect()
    }
    salted_df = pack_bins(docs, budget=64, max_docs_per_task=50)
    salted = {
        (r["doc_id"]): (r["source"], r["n_tokens"], r["bin_id"])
        for r in salted_df.collect()
    }
    assert salted == serial
    # same output schema either way
    assert salted_df.columns == ["doc_id", "source", "n_tokens", "bin_id"]

    # the giant shard genuinely split: the range stage puts s0's docs in
    # >1 partition (→ >1 window task), visible as >1 populated run.
    ranged = (
        docs.select("doc_id", "source")
        .repartitionByRange(32, F.col("source"), F.col("doc_id"))
        .withColumn("run_id", F.spark_partition_id())
    )
    n_runs_s0 = (
        ranged.filter(F.col("source") == "s0").select("run_id").distinct().count()
    )
    assert n_runs_s0 > 1


def test_salted_bin_boundary_straddle(spark):
    """Docs whose tokens straddle a run boundary keep the serial bin
    assignment (the stitch offset, not a per-run restart, decides)."""
    # 10 docs × 11 tokens each, budget 25, runs of 3 docs (33 tokens) —
    # every run boundary falls mid-bin. Serial starts are 0,11,22,…,99 →
    # bin = start // 25. A per-run *restart* (the naive salt) would give
    # doc 3 (run 1, local start 0) bin 0 — the offset stitch gives 1.
    rows = [(i, "s", "t " * 10) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r["bin_id"]
        for r in pack_bins(
            docs, budget=25, max_docs_per_task=3
        ).collect()
    }
    assert out == {i: (i * 11) // 25 for i in range(10)}


# ---------------------------------------------------------------------------
# Span corruption (T5-style denoising data)
# ---------------------------------------------------------------------------


def test_span_corruption_reconstructs_and_is_deterministic(spark):
    """Masked input + targets must reconstruct the original text exactly
    (sentinels splice back span-for-span), the mask rate lands near
    start_rate·span_len, and the corruption is identical under
    repartitioning."""
    from pyspark.sql import functions as F

    from rclabsapi_spark.llm.training import span_corruption

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    out = span_corruption(
        docs, span_len=3, start_rate=0.05, sentinel="<X>"
    ).collect()
    originals = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    total_tokens = 0
    total_masked = 0
    for r in out:
        words = r["masked_input"].split(" ")
        spans = [t["span_text"] for t in (r["targets"] or [])]
        assert words.count("<X>") == len(spans) == r["n_spans"]
        it = iter(spans)
        rebuilt = " ".join(
            next(it) if w == "<X>" else w for w in words
        )
        assert rebuilt == originals[r["doc_id"]], r["doc_id"]
        total_tokens += len(originals[r["doc_id"]].split(" "))
        total_masked += r["n_masked_tokens"]
    rate = total_masked / total_tokens
    assert 0.05 <= rate <= 0.25, rate  # ≈ start_rate·span_len with overlap

    again = span_corruption(
        docs.repartition(7), span_len=3, start_rate=0.05, sentinel="<X>"
    ).collect()
    assert {(r["doc_id"], r["masked_input"]) for r in again} == {
        (r["doc_id"], r["masked_input"]) for r in out
    }


def test_span_corruption_spanless_doc_contract(spark):
    """A doc where NO span start fires must come back untouched with
    n_spans == 0, n_masked_tokens == 0 and — the pinned contract —
    ``targets == []`` (an empty array, not NULL). The r16 single-pass
    rewrite changed the spanless case from the old left-join-miss NULL
    to the fold's empty array; [] is the declared contract (a consumer
    iterating targets needs no null guard), and this test keeps it from
    drifting silently in either direction."""
    import hashlib

    from rclabsapi_spark.llm.training import span_corruption

    # find a doc id whose 3 token positions all hash ABOVE the 5%
    # start threshold — the same md5(salt + doc + ":" + pos) rule the
    # operator applies, so the doc is spanless by construction
    thr = format(int(65536 * 0.05), "04x")
    doc_id = next(
        d
        for d in range(1000)
        if all(
            hashlib.md5(f"span:{d}:{p}".encode()).hexdigest()[:4] >= thr
            for p in range(3)
        )
    )
    docs = spark.createDataFrame(
        [(doc_id, "alpha beta gamma")], "doc_id long, text string"
    )
    [row] = span_corruption(
        docs, span_len=3, start_rate=0.05, sentinel="<X>"
    ).collect()
    assert row["masked_input"] == "alpha beta gamma"
    assert row["n_spans"] == 0
    assert row["n_masked_tokens"] == 0
    assert row["targets"] == []  # empty array, NOT None — the contract
