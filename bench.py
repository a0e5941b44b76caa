#!/usr/bin/env python3
"""Headline benchmark — runs the bench-flagged queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is fully materialized through a noop sink (forces the complete
plan — scan, shuffles, projections — with no collect-to-driver skew).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rclabsapi_spark.registry import get_registry
from rclabsapi_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("rclabsapi-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = get_registry()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    # Steady-state methodology: run each query once un-timed (JVM
    # classloading + whole-stage-codegen compilation happen here — on a
    # long-lived cluster those are one-time costs), then time the second
    # run. The noop sink forces full plan execution with no driver
    # collect.
    def run(spec):
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for spec in bench_specs.values():
        run(spec)

    # Min of two timed runs per query: a transient load spike on a shared
    # machine (GC, another tenant) inflates one sample, not both — the min
    # is the steady-state cost of the plan, which is what we're measuring.
    # The raw per-run samples are also emitted so rounds stay comparable
    # run-vs-run as well as min-vs-min (r1-r3 were single-run).
    samples: dict[str, list[float]] = {n: [] for n in bench_specs}
    for _ in range(2):
        for name, spec in bench_specs.items():
            t0 = time.perf_counter()
            run(spec)
            samples[name].append(round(time.perf_counter() - t0, 3))
    timings = {name: min(ts) for name, ts in samples.items()}

    # Rows-per-second context for the reference's ops/sec baselines: total
    # input rows consumed by the headline set over its total wall-clock.
    from rclabsapi_spark.catalog import TABLES

    table_rows = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count() for t in TABLES
    }
    # conservative: count the largest table once per query as its input
    rows_scanned = len(timings) * max(table_rows.values())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "sf": sf,
                "rows_per_sec": int(rows_scanned / total) if total > 0 else None,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
