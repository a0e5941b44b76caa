"""Beyond-fixture scale probe — empirical check of SCALE.md's cap-math
adjudications past the sf0.1 fixture ceiling.

Builds N× replicas of the sf0.1 ``documents`` table (doc_id offset per
replica; a per-replica marker token appended to each text so exact-dup
structure stays trivial while every interior word-3-gram shingle's
document frequency multiplies by N — the adversarial regime for the
inverted-index pair generators), then times selected registered queries
at each multiplier.

What this is for: the `dedup_ngram_jaccard` adjudication claims the
sf0.01→sf0.1 slope ~4 is a transient quadratic window BELOW the
``max_shingle_df=100`` guard, and that once measured df crosses the
guard, hot shingles drop out and per-bucket work is bounded by
C(100,2). sf0.1's measured max df is 25, so ×2 (df 50) is still below
the guard and ×4 (df 100) is exactly at it — the probe shows the wall
flattening as the guard engages, which no fixture SF can show.

Usage: python scripts/scale_probe.py [--diverse] [mult ...] (default 1 2 4)
Writes replicas under /tmp/scale_probe/x{N}/ (repo and testdata are
never touched). Output: one line per (query, mult) with wall seconds
and result row count; timings are local[32] and carry the usual
box-state jitter — read trends, not single cells.

``--diverse`` (r15, VERDICT r14 "What's wrong" 2) builds the CONTROL
corpus: same ×N document count, but grown by content diversity instead
of wholesale duplication — every word in replica i is suffixed ``~i``,
so no shingle/hash collides across replicas and the base corpus's
natural dup structure (groups of 2-5) replicates per slice. True-pair
mass grows LINEARLY in N (vs C(N,2) per base doc in replica mode), so
an operator that does bounded work per true pair should show a
near-linear wall here next to the replica corpus's data-inherent
quadratic cell — converting the "a diversity-grown corpus would not
show this" adjudication from argument into measurement.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rclabsapi_spark.registry import get_registry
from rclabsapi_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = "/tmp/scale_probe"
# override with SPARK_GRAFT_PROBE_QUERIES=name1,name2 (any registered
# query reading only the scaled tables below)
QUERIES = tuple(
    q
    for q in os.environ.get(
        "SPARK_GRAFT_PROBE_QUERIES",
        "dedup_ngram_jaccard,dedup_minhash_lsh,link_fuzzy_names",
    ).split(",")
    if q
)
_OFFSET = 10_000_000


def _replicas(df, mult: int, key: str, extra):
    parts = [
        df.select(
            (F.col(key) + F.lit(i * _OFFSET)).alias(key),
            *extra(i),
        )
        for i in range(mult)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.repartition(32)


def build(spark, mult: int, diverse: bool = False) -> str:
    """documents: marker token appended per replica (shingle df ×N,
    exact-dup structure trivial). customer: names kept IDENTICAL per
    replica, so every fuzzy-match block inflates ×N — the hot-block
    regime for Σ block² pair generation (sf0.1 is 150 blocks of
    exactly 100, so ×16 crosses max_block=1000 and ALL blocks salt
    into 2 sub-blocks: partial recall, ~size·cap work — the r13
    graceful-degradation contract).

    ``diverse=True`` swaps the documents transform for the per-word
    ``~i`` suffix (no cross-replica shingle/hash overlap; within-slice
    dup structure preserved) — the content-diversity control corpus.
    customer/lineitem are built identically in both modes."""
    out = f"{BASE}/{'d' if diverse else 'x'}{mult}"
    # Cache keyed on the SOURCE path: a replica built from a different
    # SPARK_GRAFT_SF_DIR must not be silently reused (ADVICE r12).
    marker = f"{out}/.src"
    if os.path.exists(f"{out}/customer.parquet") and (
        os.path.exists(marker)
        and open(marker).read().strip() == SRC
    ):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def doc_text(i: int):
        if diverse:
            # every word suffixed per replica: no shingle, minhash
            # band, or exact hash collides across replicas; docs that
            # were (near-)dups of each other within the base corpus
            # stay (near-)dups within their slice
            return F.regexp_replace(
                F.col("text"), r"(\S+)", rf"$1~{i}"
            ).alias("text")
        return F.concat(F.col("text"), F.lit(f" r{i}")).alias("text")

    _replicas(
        docs,
        mult,
        "doc_id",
        lambda i: [doc_text(i), "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    rest = [c for c in cust.columns if c != "c_custkey"]
    _replicas(cust, mult, "c_custkey", lambda i: rest).write.mode(
        "overwrite"
    ).parquet(f"{out}/customer.parquet")
    # lineitem (pruned to the basket columns): l_orderkey kept IDENTICAL
    # per replica while l_partkey offsets, so every basket's distinct
    # item count inflates ×N — the adversarial mega-basket regime for
    # the Σ basket² pair generator (sf0.1 baskets run 1-17 items, so ×4
    # pushes the head past max_basket=50 and ×8+ drops most of them)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    _replicas(li, mult, "l_partkey", lambda i: ["l_orderkey"]).write.mode(
        "overwrite"
    ).parquet(f"{out}/lineitem.parquet")
    with open(marker, "w") as fh:
        fh.write(SRC)
    return out


def main() -> None:
    argv = sys.argv[1:]
    diverse = "--diverse" in argv
    mults = [int(a) for a in argv if a != "--diverse"] or [1, 2, 4]
    spark = get_spark("scale_probe")
    reg = get_registry()
    print(
        f"src={SRC}  queries={QUERIES}  mults={mults}"
        f"  mode={'diverse' if diverse else 'replica'}",
        flush=True,
    )
    for mult in mults:
        sf_dir = build(spark, mult, diverse=diverse)
        for name in QUERIES:
            fn = reg[name].fn
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            print(
                f"{'d' if diverse else 'x'}{mult:<2d}"
                f" {name:<24s} {time.time() - t0:7.2f}s"
                f"  rows={n}",
                flush=True,
            )


if __name__ == "__main__":
    try:
        main()
    finally:
        # always clean up, even on a failed run — a half-built replica
        # left behind would otherwise survive to the next invocation
        shutil.rmtree(BASE, ignore_errors=True)
