"""Compaction horizon probe (VERDICT r15 item 7): measure the report
fold wall as a function of live partition-directory count, out to a
~2,000-batch cell, and the post-compaction floor.

SCALE.md's r15 section extrapolated the 130k-directory listing cost
from a single 200-batch cell; this probe measures the slope. Partition
directories are laid down directly with pyarrow in the sink's exact
on-disk layout (``batch_id=<n>/part-0.parquet`` with the delta schema)
— building 2,000 batches through per-batch Spark jobs would measure
job-launch overhead, not the listing/fold cost under test.

Run: ``python scripts/compaction_horizon_probe.py`` (from the repo
root). Prints one line per cell: partitions, cold fold wall, warm fold
wall, then the compacted floor for the largest cell.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def build_store(root: str, n_batches: int) -> str:
    path = os.path.join(root, f"deltas_{n_batches}")
    shutil.rmtree(path, ignore_errors=True)
    for k in range(n_batches):
        part = os.path.join(path, f"batch_id={k}")
        os.makedirs(part)
        pq.write_table(
            pa.table(
                {"domain": ["d.example"], "n_new": pa.array([7], pa.int64())}
            ),
            os.path.join(part, "part-0.parquet"),
        )
    return path


def fold_wall(spark, path: str) -> float:
    from rclabsapi_spark.streaming.accounting import _read_or_empty

    from pyspark.sql import functions as F

    t0 = time.monotonic()
    rows = (
        _read_or_empty(spark, path, "domain string, n_new long, batch_id long")
        .groupBy("domain")
        .agg(F.sum("n_new").alias("n_docs"))
        .collect()
    )
    wall = time.monotonic() - t0
    return wall, {r["domain"]: r["n_docs"] for r in rows}


def main() -> None:
    from rclabsapi_spark.session import get_spark
    from rclabsapi_spark.streaming.compaction import compact_store

    spark = get_spark("compaction-horizon-probe")
    root = "/tmp/compaction_horizon_probe"
    shutil.rmtree(root, ignore_errors=True)

    cells = (200, 500, 1000, 2000)
    results = {}
    for n in cells:
        path = build_store(root, n)
        cold, totals = fold_wall(spark, path)
        warm, totals2 = fold_wall(spark, path)
        assert totals == totals2 == {"d.example": 7 * n}
        results[n] = (cold, warm)
        print(
            f"partitions={n:5d}  fold cold={cold:6.2f}s  warm={warm:6.2f}s",
            flush=True,
        )

    # linear fit of warm wall vs partition count (the steady-state cost
    # an operator pays per report between compactions)
    import numpy as np

    xs = np.array(cells, dtype=float)
    ys = np.array([results[n][1] for n in cells])
    slope, intercept = np.polyfit(xs, ys, 1)
    print(
        f"warm fold ≈ {intercept:.2f}s + {slope * 1000:.2f}s per 1k "
        f"partitions  (r15 extrapolation check: predicted 2000-cell "
        f"warm from the 200-cell alone = "
        f"{results[200][1] * 2000 / 200:.2f}s vs measured "
        f"{results[2000][1]:.2f}s)",
        flush=True,
    )
    print(
        f"130k-directory horizon at this slope ≈ "
        f"{intercept + slope * 130_000:.0f}s per report fold",
        flush=True,
    )

    path = os.path.join(root, "deltas_2000")
    t0 = time.monotonic()
    upto = compact_store(
        spark,
        path,
        "domain string, n_new long, batch_id long",
        group_cols=("domain",),
        sum_cols=("n_new",),
    )
    cwall = time.monotonic() - t0
    cold, totals = fold_wall(spark, path)
    warm, _ = fold_wall(spark, path)
    assert upto == 1999 and totals == {"d.example": 7 * 2000}
    print(
        f"compaction of 2000 partitions: {cwall:.2f}s; post-compaction "
        f"fold cold={cold:.2f}s warm={warm:.2f}s (report unchanged)",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
