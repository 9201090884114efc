"""Physical table layout for the 100 TB lake: partitioned writes,
bucketed co-located joins, and small-file compaction.

The reference persists its corpora as single pickle/JSON files
(dee/tasks/base_task.py:306-406) — a shape that cannot exist at crawl
scale. These operators define the lake layout a 1000-executor deployment
actually needs, each with the property that makes it pay at 100 TB:

  * ``write_partitioned`` — hive-style directory partitioning (e.g. the
    corpus by ``lang``, KG edges by predicate): a filter on the partition
    column prunes whole directories at PLANNING time (``PartitionFilters``
    in the scan, asserted in tests/test_layout.py) — the scan never even
    lists the pruned files' footers.
  * ``write_bucketed`` — pre-shuffled, co-located storage: two tables
    bucketed on the same key join with ZERO Exchange (asserted), so the
    recurring joins of this engine (features⋈decode on doc_id, J6;
    triples⋈entities) stop paying their shuffle on every run and pay it
    ONCE at write time. On a real cluster this is the difference between
    re-shuffling 100 TB per join and never shuffling it again.
  * ``compact_parquet`` / ``StageStore.compact`` — the maintenance half
    of an Iceberg deployment (rewrite_data_files): incremental /
    streaming sinks and high-parallelism writes leave thousands of tiny
    files whose per-file open+footer cost dominates the scan; compaction
    coalesces them to a target byte size WITHOUT a shuffle and (for
    stage tables) patches the manifest's per-partition lineage in place,
    preserving the input fingerprint so resume semantics are untouched.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # the classic HDFS/Iceberg target


def _parquet_files(path: str) -> list[tuple[str, int]]:
    return sorted(
        (fn, os.path.getsize(os.path.join(path, fn)))
        for fn in os.listdir(path)
        if fn.endswith(".parquet")
    )


def plan_compaction(path: str, target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Decide whether a parquet directory needs compaction.

    Returns {files, bytes, n_out, needed}: ``n_out`` is the output file
    count that hits ``target_bytes`` per file; ``needed`` is False when
    the directory already has that many files or fewer (rewriting would
    churn bytes for no layout gain — the Iceberg rewrite planner makes
    the same already-compact short-circuit)."""
    files = _parquet_files(path)
    total = sum(b for _, b in files)
    n_out = max(1, math.ceil(total / target_bytes))
    return {
        "files": len(files),
        "bytes": total,
        "n_out": n_out,
        "needed": n_out < len(files),
    }


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Coalesce a fragmented parquet directory to ~``target_bytes`` files.

    ``coalesce`` (not ``repartition``): compaction must MERGE partitions
    without paying a shuffle — at 100 TB the rewrite is I/O-bound and a
    shuffle would double it. The rewrite goes to a sibling temp dir and
    swaps in with two renames, so a killed compaction leaves either the
    old layout or the new one, never a half-written directory (the same
    write-then-swap discipline as StageStore's manifest commit).

    Returns {files_before, files_after, bytes, compacted}.
    """
    plan = plan_compaction(path, target_bytes)
    if not plan["needed"]:
        return {
            "files_before": plan["files"],
            "files_after": plan["files"],
            "bytes": plan["bytes"],
            "compacted": False,
        }
    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".pre-compact"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    spark.read.parquet(path).coalesce(plan["n_out"]).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": plan["files"],
        "files_after": len(_parquet_files(path)),
        "bytes": plan["bytes"],
        "compacted": True,
    }


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet write (directory per partition value).

    Use for LOW-cardinality, high-selectivity columns (lang, predicate,
    crawl date): a reader's equality/IN filter on the partition column
    becomes a ``PartitionFilters`` entry — directories outside the
    predicate are pruned before any file is opened. Do NOT partition on
    high-cardinality keys (url, doc_id): one directory per value is the
    small-files problem by construction."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int,
    path: str,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed on ``keys`` as an external table.

    Each writer task splits its rows into ``n_buckets`` hash buckets —
    the shuffle a join/agg on ``keys`` would pay at read time is paid
    once here and recorded in the catalog, so every later join between
    tables bucketed the same way plans with ZERO Exchange (asserted in
    tests/test_layout.py). ``sort_cols`` additionally sorts within each
    bucket file (saves the sort-merge join's per-task sort). Bucketing
    requires the table catalog (``saveAsTable``); ``path`` keeps the
    data external so the files live with the rest of the lake."""
    w = df.write.format("parquet").mode(mode).option("path", path)
    w = w.bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
