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

    # Warm the JVM/IO once on the smallest query so first-query timing
    # doesn't absorb codegen/classloading costs.
    warm = bench_specs.get("monitor_jobs_pipeline") or next(iter(bench_specs.values()))
    warm.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
