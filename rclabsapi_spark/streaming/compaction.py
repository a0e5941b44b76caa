"""Delta-store compaction: bound the file count of the batch-id-
partitioned delta/fingerprint stores that back the streaming twins.

Every twin sink writes one partition per micro-batch (exactly-once via
dynamic partition overwrite). Correct — but a long-horizon stream
accumulates one directory per batch forever: at a batch a minute, a
quarter of operation is ~130k partition directories per store, and
every report fold pays the file-listing cost. This module folds the
historical partitions into ONE compacted file set and garbage-collects
them, without giving up the replay contract.

Design — a single atomic manifest pointer (the minimal version of what
table formats do):

- ``_compaction.json`` at the store root holds ``{"upto": U, "file":
  <dir>}``; it is swapped with write-tmp + atomic rename
  (``os.replace`` locally; ``FileContext.rename(OVERWRITE)`` on
  Hadoop filesystems), so a reader sees either the old state or the
  new state, never a half state.
- Compacted data lives under ``<store>/_compacted/...`` — an
  underscore-prefixed path, which Spark's file index HIDES from normal
  directory reads, so the live-partition scan never double-reads it.
- Readers (``accounting._read_or_empty`` — shared by all five twin
  families) resolve the manifest and return
  ``live partitions WHERE batch_id > U  ∪  read(manifest file)``.
  Partition pruning makes the filter free.
- Sinks REFUSE a replayed batch that has been compacted
  (``accept_batch``): its data is inside the compacted file, its
  partition directory is gone, and a dynamic-overwrite re-write would
  double-count. At-least-once replays of live (uncompacted) batches
  keep the existing overwrite semantics.

Crash safety: the compacted file is fully written BEFORE the manifest
swap, and garbage collection runs AFTER it — a crash at any point
leaves the manifest pointing at a complete file set, with at worst
orphaned directories that the next compaction removes. Re-running
compaction is idempotent (it folds the reader-visible view, which is
unchanged by a previous crash).

Operational contract: run compaction from the maintenance path (the
manifest/backfill planner family), not concurrently with a foreachBatch
writer on the SAME store — the sink's accept check and the GC race
otherwise (same contract as every filesystem-table compactor without a
lock service). The contract is DEFENSIVELY checked, not assumed: GC
removes exactly the partitions the fold read (never "everything ≤
upto"), so a batch that lands mid-fold is preserved on disk and
detected by the post-GC scan, which raises loudly — stop the writer and
re-run compaction; nothing was lost. Partitions at/below a PREVIOUS
compaction point are invisible to readers and their content is already
inside the compacted file (the manifest only swaps after a complete
fold; guarded replays rewrite identical content), so they are cleaned
as crash orphans at entry.

Filesystem scope (r16): the control plane — partition listing, GC,
manifest read/swap — goes through ``streaming.storefs``: local POSIX
by default, ``org.apache.hadoop.fs`` for scheme-qualified store paths
(``hdfs://``, ``s3a://``, ``file://``), so the control plane addresses
the SAME filesystem the Spark data plane writes. The shim resolves at
entry, before any fold cost; see storefs.py for the S3
rename-atomicity caveat.

Reference: the reference rotates and archives its log stores on a
cadence (log_file_manager.hpp:78-203); this is that lifecycle applied
to the twins' delta stores.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rclabsapi_spark.streaming.storefs import resolve_fs

_MANIFEST = "_compaction.json"
_CDIR = "_compacted"


def compaction_state(path: str, *, fs=None) -> tuple[int, str | None]:
    """(upto, compacted file dir) — (-1, None) when never compacted.

    ONLY a missing manifest means "never compacted". A torn or
    hand-mangled manifest raises (JSONDecodeError/KeyError) instead:
    silently returning (-1, None) would make readers see only live
    partitions while the folded history sits invisible under
    ``_compacted/`` — a data-loss-shaped failure (VERDICT r15)."""
    fs = fs or resolve_fs(path)
    try:
        m = json.loads(fs.read_text(os.path.join(path, _MANIFEST)))
    except (FileNotFoundError, NotADirectoryError):
        return -1, None
    return int(m["upto"]), m["file"]


def accept_batch(batch_id: int, *paths: str) -> bool:
    """False when ``batch_id`` is already folded into ANY of the given
    stores' compacted files — a replay of it must be a no-op, since its
    partition was garbage-collected and re-writing it would
    double-count. Sinks that write multiple stores pass all of them, so
    a batch is either live in every store or refused for every store
    (a half-accepted batch would skew the statuses⋈batch joins).
    Scheme-qualified store paths resolve through the Hadoop control
    plane (storefs.resolve_fs) — inside a foreachBatch handler the
    active SparkSession supplies the JVM."""
    return int(batch_id) > max(
        (compaction_state(p)[0] for p in paths), default=-1
    )


def _partition_ids(path: str, fs) -> dict[int, str]:
    """batch_id -> partition dir for every live partition directory."""
    out: dict[int, str] = {}
    for name in fs.list_dir(path):
        if name.startswith("batch_id="):
            try:
                out[int(name.split("=", 1)[1])] = os.path.join(path, name)
            except ValueError:
                continue
    return out


def _gc_and_verify(
    path: str, upto: int, seen_ids: set[int], *, fs=None
) -> None:
    """Delete exactly the partitions the fold read, and keep the two
    failure modes DISTINCT (ADVICE r15):

    - a partition that FAILS to delete (EPERM, transient FS error) is
      an I/O failure — reported as such, never misdiagnosed as a
      contract violation;
    - a partition at/below ``upto`` that the fold did NOT read landed
      mid-fold — a writer violated the no-concurrent-compaction
      contract. Its data is still on disk (we did NOT delete it), so
      fail loudly instead of silently dropping it."""
    fs = fs or resolve_fs(path)
    parts = _partition_ids(path, fs)
    failed: dict[int, str] = {}
    for k, p in parts.items():
        if k in seen_ids:
            try:
                fs.remove_tree(p)
            except OSError as exc:
                failed[k] = str(exc)
    if failed:
        raise RuntimeError(
            f"compaction of {path}: failed to DELETE folded partitions "
            f"{sorted(failed)} ({failed}) — an I/O failure, not a "
            f"writer race. Their content is safely inside the "
            f"compacted file and they are invisible to readers "
            f"(batch_id <= upto={upto}); fix the filesystem issue and "
            f"re-run compact_store to clean them."
        )
    leftover = sorted(
        k for k in _partition_ids(path, fs) if k <= upto
    )
    if leftover:
        raise RuntimeError(
            f"compaction of {path}: partitions {leftover} landed during "
            f"the fold — a writer raced compaction (out of contract). "
            f"Nothing was deleted unread. A guarded-late REPLAY of an "
            f"already-folded batch (the only case a monotonic stream "
            f"can produce at/below upto={upto}) rewrites content the "
            f"fold already holds, and re-running compact_store cleans "
            f"it; anything else, inspect before re-running."
        )


def compact_store(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    group_cols: tuple[str, ...] = (),
    sum_cols: tuple[str, ...] = (),
    n_files: int = 8,
    fs=None,
) -> int:
    """Fold the store's reader-visible rows into one compacted file set
    and GC the folded partitions. Returns the new ``upto``.

    ``group_cols``/``sum_cols`` set: delta stores — integer deltas are
    re-aggregated (SUM commutes, so the fold is the same answer the
    report would compute). Unset: row stores (fingerprints, seen ids) —
    rows are rewritten verbatim. Both keep the store's exact schema;
    compacted rows carry ``batch_id = upto`` so existing
    ``batch_id < n`` store-lookup filters keep working unchanged.

    The control-plane shim resolves here, at ENTRY: a scheme-qualified
    path without a usable Hadoop control plane fails before the Spark
    fold cost is paid, never after (ADVICE r15)."""
    from rclabsapi_spark.streaming.accounting import _read_or_empty

    fs = fs or resolve_fs(path, spark)

    # entry orphan cleanup: partitions at/below the CURRENT compaction
    # point are invisible to readers and their content is already in
    # the compacted file (the manifest only swaps after a complete
    # fold; guarded replays rewrite identical content) — crash
    # leftovers from a GC interrupted mid-delete, removed here so they
    # never accrete
    prev_upto = compaction_state(path, fs=fs)[0]
    if prev_upto >= 0 and fs.is_dir(path):
        for k, p in _partition_ids(path, fs).items():
            if k <= prev_upto:
                fs.remove_tree(p)

    visible = _read_or_empty(spark, path, schema)
    data_cols = [c for c in visible.columns if c != "batch_id"]
    # one bounded driver fold: the distinct batch ids the fold reads
    # (#batches rows — this is the relation compaction exists to bound)
    seen_ids = {
        int(r["batch_id"])
        for r in visible.select("batch_id").distinct().collect()
        if r["batch_id"] is not None
    }
    if not seen_ids:
        return compaction_state(path, fs=fs)[0]  # empty store: no-op
    upto = max(seen_ids)

    if group_cols:
        # cast each re-aggregated sum back to ITS OWN column type — the
        # delta stores mix BIGINT counts with DECIMAL(38,0) grid sums
        # (centroid-drift), and widening or narrowing either would
        # change the schema the readers pin
        types = {f.name: f.dataType for f in visible.schema.fields}
        folded = visible.groupBy(*group_cols).agg(
            *[F.sum(c).cast(types[c]).alias(c) for c in sum_cols]
        )
    else:
        folded = visible.select(*data_cols)
    folded = folded.select(*data_cols).withColumn(
        "batch_id", F.lit(upto).cast("long")
    )

    out = os.path.join(path, _CDIR, f"u{upto}-{uuid.uuid4().hex[:8]}")
    folded.coalesce(n_files).write.mode("overwrite").parquet(out)

    # atomic manifest swap: readers flip from old view to new view in
    # one atomic rename; GC below is invisible to both views
    fs.write_text_atomic(
        os.path.join(path, _MANIFEST),
        json.dumps({"upto": upto, "file": out}),
    )

    # GC: superseded compacted file sets, then exactly the partitions
    # the fold READ (never a blanket "everything <= upto" — a partition
    # that landed mid-fold must survive to be detected, not deleted)
    cdir = os.path.join(path, _CDIR)
    for name in fs.list_dir(cdir):
        p = os.path.join(cdir, name)
        if p != out:
            fs.remove_tree(p)
    _gc_and_verify(path, upto, seen_ids, fs=fs)
    return upto


def read_store(
    spark: SparkSession, live: DataFrame, path: str, schema: str, *, fs=None
) -> DataFrame:
    """Manifest-aware view: live partitions newer than the compaction
    point unioned with the compacted file set. Called by
    ``accounting._read_or_empty`` so every twin reader resolves
    compaction without knowing about it; the ``batch_id > upto`` filter
    is partition-pruned (one partition directory per batch)."""
    upto, cfile = compaction_state(path, fs=fs or resolve_fs(path, spark))
    if cfile is None:
        return live
    return live.filter(F.col("batch_id") > upto).unionByName(
        spark.read.schema(schema).parquet(cfile)
    )


def read_compacted_parquet(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """PUBLIC manifest-aware reader for any ``batch_id``-partitioned
    store — including ``idempotent_parquet_sink`` outputs after
    ``compact_store`` (ADVICE r15). A plain ``spark.read.parquet(path)``
    is only correct BEFORE compaction: the fold moves all folded rows
    under the underscore-prefixed ``_compacted/`` directory, which
    Spark's file index hides from normal reads, so a plain reader would
    silently lose the entire compacted history.

    ``schema`` pins the column set (the twin readers' contract). When
    omitted, the live partition layout supplies it — with ``batch_id``
    cast to long, because partition-value inference may narrow it to
    int while compacted files store it as a long data column; when
    every batch has been folded (no visible live files to infer from),
    the compacted set alone supplies both schema and rows."""
    if schema is not None:
        return read_store(
            spark, spark.read.schema(schema).parquet(path), path, schema
        )
    upto, cfile = compaction_state(path)
    if cfile is None:
        return spark.read.parquet(path)
    comp = spark.read.parquet(cfile)
    try:
        live = spark.read.parquet(path).withColumn(
            "batch_id", F.col("batch_id").cast("long")
        )
    except Exception as exc:  # all history folded: no visible live files
        if "UNABLE_TO_INFER_SCHEMA" not in str(exc):
            raise
        return comp
    return live.filter(F.col("batch_id") > upto).unionByName(
        comp.select(*live.columns)
    )
