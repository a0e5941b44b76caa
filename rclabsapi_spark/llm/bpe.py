"""Distributed BPE merge training (Sennrich et al. 2016, public
literature): learn the first ``n_merges`` byte-pair-encoding merges of a
corpus as pure DataFrame aggregations — the tokenizer-induction step a
training-data pipeline runs before token counting and packing.

Algorithm, per merge round, entirely declarative (no driver collect):

1. The working vocabulary is (repr, n): each word type's current symbol
   sequence as a space-joined, space-sentineled string
   (`' h e l l o '`), with its corpus frequency.
2. Adjacent-pair counts: explode each word's symbol pairs and sum the
   word frequencies — one |vocab|-sized aggregate, never a corpus
   re-scan (the corpus reduces to word counts ONCE, up front).
3. The best pair is the 1-row argmax (count desc, then lexicographic —
   deterministic across engines); it BROADCAST-joins back and the merge
   applies as a single `replace(' l r ', ' lr ')` over the sentineled
   repr — non-overlapping left-to-right replacement in both Spark and
   DuckDB, which is exactly BPE's leftmost-first greedy application.
4. Each round eagerly localCheckpoints the small vocabulary relation
   (``materialize=True``): a round references its input twice (pair
   counts + the carried repr), so the un-truncated logical plan doubles
   per round — the dedup_clusters_star lineage lesson.
   ``materialize=False`` keeps the full lineage inspectable for plan
   pins.

Scale posture: the corpus is scanned once (word-count reduction); every
round after that runs on the |word types| relation — millions of rows,
not corpus-sized — with one small shuffle (pair aggregate) and one
1-row broadcast per round. End-of-word markers are omitted
(documented simplification: merges never cross the space sentinels, so
word boundaries are already hard).

No end-of-round driver loop state exists beyond the loop index, so a
resumed run re-derives identical merges. Reference parity: extends the
reference's transform-rule compiler family (SURVEY §2.10) with a
corpus-derived rule table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 5,
    materialize: bool = True,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges of the corpus. Returns
    (merge_rank, left, right, merged, pair_count) — one row per round,
    rank 1 = most frequent pair. Deterministic: ties break
    lexicographically on (left, right) in both engines."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    vocab = wc.select(
        F.concat(
            F.lit(" "),
            F.array_join(F.expr("regexp_extract_all(w, '.', 0)"), " "),
            F.lit(" "),
        ).alias("repr"),
        "n",
    )
    merge_rows = []
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("repr")), " ")
        pairs = (
            vocab.select("n", syms.alias("s"))
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(slice(s, 1, size(s) - 1),"
                        " (x, i) -> struct(x AS l, element_at(s, i + 2) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), F.col("l"), F.col("r")
        ).limit(1)
        merge_rows.append(
            best.select(
                F.lit(rank).alias("merge_rank"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                F.concat(F.col("l"), F.col("r")).alias("merged"),
                "pair_count",
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                F.expr(
                    "replace(repr, concat(' ', l, ' ', r, ' '),"
                    " concat(' ', l, r, ' '))"
                ).alias("repr"),
                "n",
            )
        )
        if materialize:
            # truncate lineage: each round reads its input twice, so the
            # un-checkpointed plan doubles per round (the CC lesson)
            vocab = vocab.localCheckpoint(eager=True)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus: returns
    (key, n_tokens_char, n_tokens_bpe) — the compression audit that
    says what the learned merges buy. The merge table is collected
    driver-side (it is n_merges rows — tokenizer-sized metadata, the
    K×dim centroid-pull pattern) and applied as a chain of replace
    expressions in merge-rank order — one exhaustive left-to-right pass
    per merge, a documented single-pass simplification of canonical
    BPE's re-scan-by-priority loop (identical on the training corpus
    itself, where each merge was chosen after the previous one was
    fully applied)."""
    ordered = sorted(
        merges.select("merge_rank", "left", "right").collect(),
        key=lambda r: r["merge_rank"],
    )
    per_word = docs.select(
        F.col(key_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    seg = F.concat(
        F.lit(" "),
        F.array_join(F.expr("regexp_extract_all(w, '.', 0)"), " "),
        F.lit(" "),
    )
    for r in ordered:
        seg = F.replace(
            seg,
            F.lit(f" {r['left']} {r['right']} "),
            F.lit(f" {r['left']}{r['right']} "),
        )
    return (
        per_word.select(
            F.col(key_col),
            F.length("w").alias("n_char"),
            F.size(F.split(F.trim(seg), " ")).alias("n_bpe"),
        )
        .groupBy(key_col)
        .agg(
            F.sum("n_char").alias("n_tokens_char"),
            F.sum("n_bpe").alias("n_tokens_bpe"),
        )
    )
