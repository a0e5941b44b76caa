"""Physical-plan introspection helpers (shared by scripts/plan_audit.py
and the plan regression tests).

Walks the FINAL adaptive plan: descends AdaptiveSparkPlan into its
executed plan and QueryStage wrappers into their materialized subtrees,
and does NOT descend into InMemoryTableScan — a cached relation scans
its source once no matter how many consumers read it, so its subtree
must not be re-counted per consumer.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame


def walk_executed_plan(node) -> Iterator:
    name = node.nodeName()
    yield node
    if name == "InMemoryTableScan":
        return  # cached — the relation's subtree ran once at materialization
    if name == "AdaptiveSparkPlan":
        yield from walk_executed_plan(node.executedPlan())
        return
    if name.endswith("QueryStage"):
        yield from walk_executed_plan(node.plan())
        return
    children = node.children()
    for i in range(children.length()):
        yield from walk_executed_plan(children.apply(i))


def audit(df: DataFrame) -> tuple[Counter, Counter]:
    """Execute ``df`` (so AQE settles) and count physical-plan features:
    returns (scans_by_table, counts) where counts has keys
    cached / exch / bhj / smj."""
    df.collect()
    root = df._jdf.queryExecution().executedPlan()
    scans: Counter = Counter()
    counts: Counter = Counter()
    for node in walk_executed_plan(root):
        name = node.nodeName()
        if name.startswith("Scan parquet"):
            head = node.toString().splitlines()[0]
            m = re.search(r"file:([^\],\s]+)", head)
            path = (m.group(1) if m else head).rstrip("/")
            # `<table>.parquet` fixture files or `<dir>` partitioned
            # layouts (e.g. a persisted IVF index's vectors/) — either
            # way the last path segment names the relation
            table = path.rsplit("/", 1)[-1].removesuffix(".parquet")
            scans[table] += 1
        elif name == "InMemoryTableScan":
            counts["cached"] += 1
        elif name in ("Exchange", "BroadcastExchange"):
            counts["exch"] += 1
        elif name == "BroadcastHashJoin":
            counts["bhj"] += 1
        elif name == "SortMergeJoin":
            counts["smj"] += 1
        elif name == "ShuffledHashJoin":
            counts["shj"] += 1
    return scans, counts
