#!/usr/bin/env python
"""Frames-twin ingest probe: does per-batch cost stay flat as the
signature store grows?

The twin's 100 TB claim is that each arriving window pays hash(batch) +
a signature-relation read — NOT the full-corpus re-pair the batch query
pays per run. This probe ingests the sf0.1 frame corpus through
``frame_phash_sink`` in K batches, timing each handler call and the
store row count it joined against, then times the registered batch
query (the per-window cost an owner would pay WITHOUT the twin) and
asserts the folded pair report equals it row-for-row at sf0.1.

    python scripts/twin_ingest_probe.py          # K=8 at sf0.1
    SPARK_GRAFT_PROBE_BATCHES=4 python scripts/twin_ingest_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from rclabsapi_spark.llm.multimodal import attach_token_heatmap_frames
    from rclabsapi_spark.registry import get_registry
    from rclabsapi_spark.session import get_spark
    from rclabsapi_spark.streaming.frames import (
        frame_phash_sink,
        hash_store_schema,
        phash_pairs_report,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = int(os.environ.get("SPARK_GRAFT_PROBE_BATCHES", "8"))
    spark = get_spark("twin-ingest-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    with tempfile.TemporaryDirectory() as td:
        hash_dir, pair_dir = f"{td}/hashes", f"{td}/pairs"
        sink = frame_phash_sink(hash_dir, pair_dir)
        print(f"src={sf_dir}  docs={docs.count()}  batches={k}")
        print("| batch | store rows joined | batch wall |")
        print("|---|---|---|")
        for i in range(k):
            try:
                store_rows = (
                    spark.read.schema(hash_store_schema())
                    .parquet(hash_dir)
                    .count()
                )
            except Exception:
                store_rows = 0
            frames_i = attach_token_heatmap_frames(
                docs.filter(F.col("doc_id") % k == i), n_frames=2
            )
            t0 = time.monotonic()
            sink(frames_i, i)
            print(
                f"| {i} | {store_rows} | "
                f"{time.monotonic() - t0:.2f} s |"
            )

        t0 = time.monotonic()
        got = sorted(
            tuple(r) for r in phash_pairs_report(spark, pair_dir).collect()
        )
        fold_wall = time.monotonic() - t0

        spec = get_registry()["mm_frame_phash_neardup"]
        t0 = time.monotonic()
        want = sorted(tuple(r) for r in spec.fn(spark, sf_dir).collect())
        batch_wall = time.monotonic() - t0

        assert got == want, (
            f"twin/batch mismatch at {sf_dir}: {len(got)} vs {len(want)}"
        )
        print(
            f"report fold {fold_wall:.2f} s over {len(got)} pairs; "
            f"batch-query re-run (the no-twin per-window cost) "
            f"{batch_wall:.2f} s; parity EXACT"
        )


if __name__ == "__main__":
    main()
