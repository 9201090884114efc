"""Pipeline orchestration: staged, resumable, metered.

Mirrors the reference's epoch-checkpoint resume (dee/tasks/dee_task.py:
746-760, get_latest_cpt_epoch :887-907) with table-snapshot semantics:
each stage writes its output as a parquet "stage table" plus a manifest
JSON committed *after* the data (write-then-rename → atomic visibility).
Re-running the pipeline skips stages whose manifest records the same
input fingerprint — on a real deployment these are Iceberg tables and the
manifest is the snapshot id; parquet+manifest emulates that contract in
this sandbox (Iceberg jars are not on the classpath; gated import below).

Per-stage counters (docs in/out, sentences truncated — A9) are written to
a ``metrics`` table with the same commit, giving per-partition lineage.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Iceberg is the production sink/snapshot layer; its jars are not on this
# image's classpath, so StageStore below emulates the snapshot contract
# with parquet + manifest. Swap: df.writeTo(table).append() + snapshot id
# as the fingerprint.
_HAVE_ICEBERG = False

from .canonicalize import canonicalize
from .decode import decode, score_adjacency
from .evaluate import micro_scores, role_stats
from .ingest import ingest, salted_repartition  # noqa: F401 (salted: scale path)
from .segment import segment
from .tag import (
    drop_empty_span_docs,
    length_bucketed,
    tag_gold,
    tag_heuristic,
    tag_model,
)
from .triples import triples


def _scan_partitions(data_path: str) -> list[dict]:
    """Per-partition lineage from the parquet footers (no Spark action):
    file → rows/bytes, like an Iceberg snapshot's manifest entries — a
    resumed run can verify exactly what each partition contributed."""
    partitions = []
    for fn in sorted(os.listdir(data_path)):
        if fn.endswith(".parquet"):
            fp = os.path.join(data_path, fn)
            try:
                import pyarrow.parquet as pq

                n_rows = pq.ParquetFile(fp).metadata.num_rows
            except Exception:  # footer unreadable → record bytes only
                n_rows = None
            partitions.append(
                {"file": fn, "rows": n_rows, "bytes": os.path.getsize(fp)}
            )
    return partitions


def _total_rows(partitions: list[dict]) -> int | None:
    # an unreadable footer (rows=None) makes the total UNKNOWN, not
    # smaller — a resume audit must be able to tell corruption from an
    # undercount
    if any(p["rows"] is None for p in partitions):
        return None
    return sum(p["rows"] for p in partitions)


def _dirs_of(rec: dict) -> list[str]:
    """A snapshot's full file set as data directories. Pre-append
    records (and lifted legacy manifests) carry only ``data_dir``."""
    return list(rec.get("data_dirs") or [rec["data_dir"]])


class StageStore:
    """Parquet + manifest emulation of Iceberg snapshot-resumable tables.

    Snapshot semantics (the Iceberg contract, emulated faithfully):
    every :meth:`commit` creates a NEW immutable snapshot — data lands in
    a fresh ``<stage>@v<id>`` directory and the manifest's snapshot log
    grows by one entry; earlier snapshots stay readable until explicitly
    expired. That gives the three operations a production table needs
    beyond resume: :meth:`load` with ``snapshot_id=`` (time travel, e.g.
    "re-run evaluation against the KG as the last crawl saw it"),
    :meth:`rollback` (a bad recrawl merge is undone by POINTING current
    back, no data rewrite), and :meth:`expire_snapshots` (retention — the
    only operation that deletes bytes). The manifest file is the single
    commit point: its top level always MIRRORS the current snapshot's
    record, so resume checks (:meth:`is_committed`), the metrics table,
    and pre-snapshot readers of the manifest are unchanged, and the
    write-then-``os.replace`` protocol keeps every transition atomic —
    a crash between the data write and the manifest swap leaves the
    previous snapshot current and the orphan ``@v`` directory is
    overwritten by the retried commit (same id, manifest unchanged).
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.root, name),
            os.path.join(self.root, f"{name}.manifest.json"),
        )

    def _meta(self, name: str) -> dict | None:
        _, manifest = self._paths(name)
        if not os.path.exists(manifest):
            return None
        with open(manifest) as f:
            return json.load(f)

    def _snapshots(self, meta: dict, name: str) -> list[dict]:
        """Snapshot log; a legacy (pre-snapshot) manifest is lifted into
        a single-entry log pointing at the bare <stage> directory."""
        if "snapshots" in meta:
            return meta["snapshots"]
        legacy = {
            k: meta.get(k)
            for k in (
                "input_fingerprint",
                "committed_at",
                "counters",
                "partitions",
                "n_rows",
                "n_partitions",
            )
        }
        legacy.update(snapshot_id=1, parent_id=None, data_dir=name)
        return [legacy]

    def _current(self, meta: dict, name: str) -> dict:
        snaps = self._snapshots(meta, name)
        cur = meta.get("current_snapshot_id", snaps[-1]["snapshot_id"])
        for rec in snaps:
            if rec["snapshot_id"] == cur:
                return rec
        raise ValueError(
            f"stage {name!r}: current snapshot {cur} not in the log"
        )

    def _write_manifest(self, name: str, meta: dict) -> None:
        _, manifest = self._paths(name)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, manifest)  # atomic commit point

    def exists(self, name: str) -> bool:
        """True if the stage has a committed manifest."""
        return self._meta(name) is not None

    def is_committed(self, name: str, input_fingerprint: str) -> bool:
        meta = self._meta(name)
        if meta is None:
            return False
        return meta.get("input_fingerprint") == input_fingerprint

    def commit(
        self,
        name: str,
        df: DataFrame,
        input_fingerprint: str,
        counters: dict[str, float] | Callable[[], dict] | None = None,
        mode: str = "overwrite",
    ) -> DataFrame:
        """Write ``df`` as a new snapshot of the stage table.

        ``mode="overwrite"`` (default): the snapshot's file set is
        exactly this commit's files — the full-rewrite semantics every
        stage uses today. ``mode="append"`` (Iceberg's append
        operation): the new files are ADDED to the parent snapshot's
        file set — the snapshot reads as parent ∪ delta, and the delta
        alone is recoverable later via :meth:`incremental_scan`. Either
        way data lands in a fresh immutable ``<stage>@v<id>`` directory
        and the manifest swap is the single atomic commit point. The
        returned DataFrame reads the full new snapshot (for ``append``
        that is the whole table, not just the delta).
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"commit mode {mode!r}: overwrite or append")
        meta_old = self._meta(name)
        snaps = (
            self._snapshots(meta_old, name) if meta_old is not None else []
        )
        next_id = (
            max(r["snapshot_id"] for r in snaps) + 1 if snaps else 1
        )
        parent = (
            self._current(meta_old, name) if meta_old is not None else None
        )
        parent_id = parent["snapshot_id"] if parent is not None else None
        data_dir = f"{name}@v{next_id}"
        data_path = os.path.join(self.root, data_dir)
        df.write.mode("overwrite").parquet(data_path)
        if callable(counters):
            # evaluated AFTER the write action so Observation-backed
            # counters (collected during the commit scan itself — no
            # second pass) are available
            counters = counters()
        # partitions = the ADDED files (an Iceberg snapshot manifest
        # records the files the operation added; for overwrite that is
        # the whole file set)
        partitions = _scan_partitions(data_path)
        added_rows = _total_rows(partitions)
        if mode == "append" and parent is not None:
            data_dirs = _dirs_of(parent) + [data_dir]
            parent_rows = parent.get("n_rows")
            n_rows = (
                parent_rows + added_rows
                if parent_rows is not None and added_rows is not None
                else None
            )
        else:
            data_dirs = [data_dir]
            n_rows = added_rows
        rec = {
            "snapshot_id": next_id,
            "parent_id": parent_id,
            "operation": mode if parent is not None else "overwrite",
            "data_dir": data_dir,
            "data_dirs": data_dirs,
            "input_fingerprint": input_fingerprint,
            "committed_at": time.time(),
            "counters": counters or {},
            "partitions": partitions,
            "n_rows": n_rows,
            "n_rows_added": added_rows,
            "n_partitions": len(partitions),
        }
        meta = {
            "stage": name,
            "current_snapshot_id": next_id,
            "snapshots": snaps + [rec],
            # top-level mirror of the current snapshot (resume checks,
            # metrics table, pre-snapshot manifest readers)
            **{k: rec[k] for k in rec if k not in ("snapshot_id",)},
        }
        self._write_manifest(name, meta)
        return df.sparkSession.read.parquet(
            *(os.path.join(self.root, d) for d in data_dirs)
        )

    def snapshots(self, name: str) -> list[dict]:
        """The snapshot log (Iceberg's ``table.snapshots()``): one dict
        per retained snapshot, oldest first."""
        meta = self._meta(name)
        if meta is None:
            raise ValueError(f"stage {name!r} has no committed manifest")
        return self._snapshots(meta, name)

    def rollback(self, name: str, snapshot_id: int) -> dict:
        """Point the stage's CURRENT back to ``snapshot_id`` (Iceberg's
        ``rollback_to_snapshot``): no data moves, resume and load now see
        that snapshot; the rolled-past snapshots stay in the log until
        expired. Returns the now-current snapshot record."""
        meta = self._meta(name)
        if meta is None:
            raise ValueError(f"stage {name!r} has no committed manifest")
        snaps = self._snapshots(meta, name)
        for rec in snaps:
            if rec["snapshot_id"] == snapshot_id:
                meta.update(
                    current_snapshot_id=snapshot_id,
                    snapshots=snaps,
                    **{
                        k: rec[k]
                        for k in rec
                        if k not in ("snapshot_id",)
                    },
                )
                self._write_manifest(name, meta)
                return rec
        raise ValueError(
            f"stage {name!r} has no snapshot {snapshot_id} "
            f"(retained: {[r['snapshot_id'] for r in snaps]})"
        )

    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[int]:
        """Retention (Iceberg's ``expire_snapshots``): keep the newest
        ``keep_last`` snapshots plus — always — the current one; delete
        the data directories of the rest. The manifest is swapped BEFORE
        any bytes are deleted, so a crash mid-expiry leaves orphan
        directories (harmless, re-expired next call), never a manifest
        pointing at deleted data. Returns the expired snapshot ids."""
        import shutil

        meta = self._meta(name)
        if meta is None:
            raise ValueError(f"stage {name!r} has no committed manifest")
        snaps = self._snapshots(meta, name)
        cur = self._current(meta, name)["snapshot_id"]
        keep_ids = {
            r["snapshot_id"]
            for r in sorted(snaps, key=lambda r: r["snapshot_id"])[
                -max(1, keep_last):
            ]
        }
        keep_ids.add(cur)
        expired = [r for r in snaps if r["snapshot_id"] not in keep_ids]
        if not expired:
            return []
        kept = [r for r in snaps if r["snapshot_id"] in keep_ids]
        meta.update(snapshots=kept)
        self._write_manifest(name, meta)
        # append snapshots SHARE directories with their ancestors: only
        # delete a directory no retained snapshot still references
        referenced = {d for r in kept for d in _dirs_of(r)}
        for d in {d for r in expired for d in _dirs_of(r)} - referenced:
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        return [r["snapshot_id"] for r in expired]

    def compact(
        self, name: str, target_bytes: int = 128 * 1024 * 1024
    ) -> dict:
        """Rewrite a committed stage's data files to ~``target_bytes``
        each (the Iceberg rewrite_data_files maintenance action) and
        patch the manifest's per-partition lineage in place. The input
        fingerprint, counters, and committed_at are PRESERVED — a
        compaction changes layout, not content, so resume still skips
        the stage; ``compacted_at`` records the rewrite. Refuses to
        touch an uncommitted stage, and verifies the rewrite was
        row-preserving against the manifest before swapping it."""
        from .layout import compact_parquet

        meta = self._meta(name)
        if meta is None:
            raise ValueError(f"stage {name!r} has no committed manifest")
        snaps = self._snapshots(meta, name)
        cur_id = meta.get("current_snapshot_id", snaps[-1]["snapshot_id"])
        rec = next(r for r in snaps if r["snapshot_id"] == cur_id)
        if len(_dirs_of(rec)) > 1:
            # an append chain's file set spans several directories: the
            # in-place rewrite below can't merge across them, so this is
            # the Iceberg rewrite_data_files-as-REPLACE-snapshot path —
            # the union is rewritten into one fresh directory and
            # committed as a new snapshot (operation "replace") that
            # keeps the fingerprint/counters, so resume still skips
            return self._compact_multi(name, meta, snaps, rec, target_bytes)
        data_path = os.path.join(self.root, rec["data_dir"])
        spark = SparkSession.getActiveSession()
        stats = compact_parquet(spark, data_path, target_bytes)
        if not stats["compacted"]:
            return stats
        partitions = _scan_partitions(data_path)
        n_rows = _total_rows(partitions)
        if rec.get("n_rows") is not None and n_rows != rec["n_rows"]:
            raise RuntimeError(
                f"compaction of stage {name!r} changed the row count: "
                f"{rec['n_rows']} → {n_rows}"
            )
        patch = dict(
            partitions=partitions,
            n_rows=n_rows,
            n_partitions=len(partitions),
            compacted_at=time.time(),
        )
        rec.update(patch)  # rec aliases into snaps
        meta.update(
            current_snapshot_id=cur_id,
            snapshots=snaps,
            **patch,  # top-level mirror follows the current snapshot
        )
        self._write_manifest(name, meta)
        return stats

    def _compact_multi(
        self,
        name: str,
        meta: dict,
        snaps: list[dict],
        rec: dict,
        target_bytes: int,
    ) -> dict:
        """Compact a multi-directory (append-chain) snapshot by rewriting
        the union into ONE fresh directory committed as a new REPLACE
        snapshot. Content-preserving: fingerprint and counters carry
        over (resume still skips), row count is verified, and the old
        directories stay owned by the prior snapshots until expired."""
        import math

        from .layout import _parquet_files

        spark = SparkSession.getActiveSession()
        dirs = _dirs_of(rec)
        paths = [os.path.join(self.root, d) for d in dirs]
        files = [f for p in paths for f in _parquet_files(p)]
        total = sum(b for _, b in files)
        n_out = max(1, math.ceil(total / target_bytes))
        if n_out >= len(files):
            return {
                "files_before": len(files),
                "files_after": len(files),
                "bytes": total,
                "compacted": False,
            }
        next_id = max(r["snapshot_id"] for r in snaps) + 1
        data_dir = f"{name}@v{next_id}"
        data_path = os.path.join(self.root, data_dir)
        spark.read.parquet(*paths).coalesce(n_out).write.mode(
            "overwrite"
        ).parquet(data_path)
        partitions = _scan_partitions(data_path)
        n_rows = _total_rows(partitions)
        if rec.get("n_rows") is not None and n_rows != rec["n_rows"]:
            raise RuntimeError(
                f"compaction of stage {name!r} changed the row count: "
                f"{rec['n_rows']} → {n_rows}"
            )
        new_rec = {
            **rec,
            "snapshot_id": next_id,
            "parent_id": rec["snapshot_id"],
            "operation": "replace",
            "data_dir": data_dir,
            "data_dirs": [data_dir],
            "partitions": partitions,
            "n_rows": n_rows,
            "n_rows_added": n_rows,
            "n_partitions": len(partitions),
            "compacted_at": time.time(),
        }
        meta = {
            "stage": name,
            "current_snapshot_id": next_id,
            "snapshots": snaps + [new_rec],
            **{k: new_rec[k] for k in new_rec if k not in ("snapshot_id",)},
        }
        self._write_manifest(name, meta)
        return {
            "files_before": len(files),
            "files_after": len(partitions),
            "bytes": total,
            "compacted": True,
        }

    def load(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        """Read a stage table — the current snapshot by default, or any
        retained one via ``snapshot_id`` (Iceberg time travel)."""
        spark = SparkSession.getActiveSession()
        meta = self._meta(name)
        if meta is None:
            # pre-commit / externally-written stage dir: legacy path
            return spark.read.parquet(self._paths(name)[0])
        if snapshot_id is None:
            rec = self._current(meta, name)
        else:
            recs = [
                r
                for r in self._snapshots(meta, name)
                if r["snapshot_id"] == snapshot_id
            ]
            if not recs:
                raise ValueError(
                    f"stage {name!r} has no snapshot {snapshot_id} "
                    "(expired or never committed)"
                )
            rec = recs[0]
        return spark.read.parquet(
            *(os.path.join(self.root, d) for d in _dirs_of(rec))
        )

    def incremental_scan(
        self,
        name: str,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Read ONLY the rows appended after ``from_snapshot_id``
        (exclusive) up to ``to_snapshot_id`` (inclusive; default the
        current snapshot) — Iceberg's incremental append scan. The
        downstream incremental consumer (re-extract only the new crawl
        batch, then :func:`canonicalize.merge_triples` into the KG)
        processes the delta instead of the table. Every snapshot on the
        parent chain between the two must be an append; an overwrite in
        between means the delta is not defined and this raises — fall
        back to a full recompute, exactly like Iceberg."""
        meta = self._meta(name)
        if meta is None:
            raise ValueError(f"stage {name!r} has no committed manifest")
        snaps = {
            r["snapshot_id"]: r for r in self._snapshots(meta, name)
        }
        if to_snapshot_id is None:
            to_snapshot_id = self._current(meta, name)["snapshot_id"]
        for sid in (from_snapshot_id, to_snapshot_id):
            if sid not in snaps:
                raise ValueError(
                    f"stage {name!r} has no snapshot {sid} "
                    f"(retained: {sorted(snaps)})"
                )
        spark = SparkSession.getActiveSession()
        if to_snapshot_id == from_snapshot_id:
            # no new snapshots: an empty delta with the table's schema
            return self.load(name, to_snapshot_id).limit(0)
        added: list[str] = []
        sid = to_snapshot_id
        while sid != from_snapshot_id:
            rec = snaps.get(sid)
            if rec is None or rec.get("parent_id") is None:
                raise ValueError(
                    f"stage {name!r}: snapshot {from_snapshot_id} is not "
                    f"an ancestor of {to_snapshot_id}"
                )
            if rec.get("operation", "overwrite") != "append":
                raise ValueError(
                    f"stage {name!r}: snapshot {sid} is "
                    f"{rec.get('operation', 'overwrite')!r}, not append — "
                    "the incremental delta is undefined; recompute from "
                    "the full table"
                )
            added.append(rec["data_dir"])
            sid = rec["parent_id"]
        return spark.read.parquet(
            *(os.path.join(self.root, d) for d in reversed(added))
        )

    def fingerprint_in_history(self, name: str, input_fingerprint: str) -> bool:
        """True if any snapshot on the CURRENT snapshot's ancestor chain
        carries ``input_fingerprint`` — the append-mode resume check: a
        crawl batch already appended (even if later batches followed) is
        skipped, but a batch rolled back out of the current lineage is
        re-ingestable."""
        meta = self._meta(name)
        if meta is None:
            return False
        snaps = {
            r["snapshot_id"]: r for r in self._snapshots(meta, name)
        }
        rec = self._current(meta, name)
        while rec is not None:
            if rec.get("input_fingerprint") == input_fingerprint:
                return True
            rec = snaps.get(rec.get("parent_id"))
        return False

    def counters(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".manifest.json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(json.load(f))
        return out

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        """The committed manifests as a QUERYABLE metrics table — the
        Iceberg-metrics-table analog of the north rule: one row per
        (stage, counter) plus the row/partition totals, so operational
        queries ("which stage dropped the most rows", "per-stage commit
        times across snapshots") are plain DataFrame queries instead of
        JSON spelunking."""
        rows = []
        for m in self.counters():
            base = dict(
                stage=m["stage"],
                input_fingerprint=m.get("input_fingerprint", ""),
                committed_at=float(m.get("committed_at") or 0.0),
                n_rows=m.get("n_rows"),
                n_partitions=m.get("n_partitions"),
            )
            cs = m.get("counters") or {}
            if not cs:
                rows.append(dict(base, counter=None, value=None))
            for k, v in sorted(cs.items()):
                rows.append(dict(base, counter=k, value=float(v)))
        return spark.createDataFrame(
            rows,
            "stage string, input_fingerprint string, committed_at double, "
            "n_rows bigint, n_partitions int, counter string, value double",
        )


def run_pipeline(
    webtext: DataFrame,
    gold: DataFrame | None = None,
    entity_dict: dict[str, str] | None = None,
    mode: str = "clique",
    adjacency: str = "sentence",
    store: StageStore | None = None,
    n_partitions: int | None = None,
    input_fingerprint: str = "",
    use_html: bool = True,
    fused: bool | str = False,
    langs: tuple[str, ...] | None = None,
    model=None,
    rearrange_max_len: int | None = None,
    adj_scorer=None,
    ent_fix_mode: str = "n",
    presegmented: bool = False,
    event_types=None,
    type_keywords: dict[str, tuple[str, ...]] | None = None,
    label2id: dict[str, int] | None = None,
    num_triggers: int = -1,
    link_aliases: DataFrame | None = None,
    link_scorer=None,
    link_threshold_e12: int = 0,
) -> dict[str, DataFrame]:
    """webtext (+optional gold) → {docs, tagged, decoded, triples,
    vertices, edges[, stats]}.

    With ``store`` set, each stage materializes + commits and reruns
    resume from the last committed stage for the same input fingerprint.
    ``model``: a trained CharTagger (or its arrays) → the tag stage runs
    the batched model tagger (M1) instead of dictionary/gold modes.

    ``presegmented=True``: ``webtext`` is a (doc_id, lang, sentences)
    docs frame — skip ingest+segment and consume the sentence windows
    as-is, exactly like the reference consumes its post-processed dumps
    (refdata.load_reference_docs produces this shape).
    ``event_types``/``type_keywords``/``label2id``: non-default event
    catalog (e.g. catalogs.WIKIEVENTS_EVENT_TYPES), per-type sentence
    cues, and BIO label space — the reference's template selection by
    name (dee/event_types/__init__.py get_event_template).
    """
    if adj_scorer is not None and mode in ("trigger", "trigger_incremental"):
        # scorers emit SYMMETRIC 0/1 matrices; decode(adjacency="matrix")
        # treats the matrix as a directed-by-declaration digraph, while
        # the trigger modes' semantics are defined over the trigger-role-
        # derived DIRECTED adjacency. Combining them would silently run
        # trigger decode over a symmetric digraph — forbid instead.
        raise ValueError(
            "adj_scorer is incompatible with trigger modes: scorer matrices "
            "are symmetric, trigger decode expects trigger-role-directed "
            "adjacency (use mode='clique'/'edag' with adj_scorer)"
        )
    spark = webtext.sparkSession
    nparts = n_partitions or spark.sparkContext.defaultParallelism

    def staged(name: str, build) -> DataFrame:
        if store is None:
            return build()
        if input_fingerprint and store.is_committed(name, input_fingerprint):
            return store.load(name)
        df = build()
        return store.commit(name, df, input_fingerprint)

    # ingest+segment are cheap codegen'd projections; the single exchange
    # of the staged path sits right before the Arrow UDF work (inside
    # build_tagged: length-bucket + salt), and the fused path avoids even
    # that when the scan is already well-split.
    if presegmented:
        if fused:
            raise ValueError("fused requires the webtext (S1) input shape")
        # sentence windows consumed as-is; counters zeroed (nothing was
        # dropped/clipped by THIS engine — the dump's own truncation
        # history is the reference data-prep's, not ours)
        docs = staged(
            "segment",
            lambda: webtext.withColumn("n_sents_dropped", F.lit(0))
            .withColumn("n_sents_clipped", F.lit(0))
            .withColumn("n_sents", F.size("sentences")),
        )
    else:
        docs = staged(
            "segment",
            lambda: segment(ingest(webtext, langs=langs, use_html=use_html)),
        )

    if fused:
        # one Arrow UDF for (segment+)tag+decode (heuristic path, no stage
        # tables): chained Python UDFs anti-scale, and every column that
        # crosses the Arrow boundary costs serialization — fused="deep"
        # keeps even the sentences array inside the UDF (stages/fused.py)
        if gold is not None or adjacency == "gold" or store is not None:
            raise ValueError("fused requires the heuristic or model, store-less path")
        if model is not None and (
            fused != "deep" or adj_scorer is not None or adjacency != "sentence"
        ):
            # the model slot fuses only at full depth (segment+tag+decode)
            # and with the sentence adjacency the staged model path uses
            raise ValueError(
                "fused model path requires fused='deep', sentence adjacency, "
                "and no adj_scorer"
            )
        # Partitioning: round-robin only when the scan is under-split —
        # NOT length-bucketed (bucketing groups the heavy long-tail docs
        # into the same partitions, which is right for fixed-shape model
        # batching but wrong for per-doc python decode), and NO exchange
        # at all when the source already has enough even splits (an
        # exchange of 1M nested rows costs more than it balances).
        from ..operators.dedup import ensure_parallelism
        from .fused import (
            segment_tag_decode_fused,
            segment_tag_decode_fused_model,
            tag_decode_fused,
        )

        if fused == "deep" and model is not None:
            decoded = segment_tag_decode_fused_model(
                ensure_parallelism(
                    ingest(webtext, langs=langs, use_html=use_html), nparts
                ),
                model,
                mode=mode,
                ent_fix_mode=ent_fix_mode,
                event_types=event_types,
                type_keywords=type_keywords,
                num_triggers=num_triggers,
            )
        elif fused == "deep":
            decoded = segment_tag_decode_fused(
                ensure_parallelism(
                    ingest(webtext, langs=langs, use_html=use_html), nparts
                ),
                entity_dict or {},
                mode=mode,
                event_types=event_types,
                type_keywords=type_keywords,
                num_triggers=num_triggers,
            )
        else:
            decoded = tag_decode_fused(
                ensure_parallelism(docs, nparts),
                entity_dict or {},
                mode=mode,
                event_types=event_types,
                type_keywords=type_keywords,
                num_triggers=num_triggers,
            )
        trip = triples(decoded, event_types=event_types)
        dict_df = None
        if entity_dict:
            dict_df = spark.createDataFrame(
                [(s, s) for s in entity_dict], "surface string, entity_id string"
            )
        vertices, edges = canonicalize(trip, entity_dict=dict_df)
        return {
            "docs": docs,
            "decoded": decoded,
            "triples": trip,
            "vertices": vertices,
            "edges": edges,
        }

    def build_tagged() -> DataFrame:
        bucketed = length_bucketed(docs, nparts)
        if model is not None:
            return tag_model(bucketed, model, ent_fix_mode=ent_fix_mode)
        if gold is not None and entity_dict is None:
            return tag_gold(
                bucketed,
                gold,
                rearrange_max_len=rearrange_max_len,
                label2id=label2id,
            )
        return tag_heuristic(
            bucketed, entity_dict or {}, rearrange_max_len=rearrange_max_len
        )

    tagged = staged("tag", build_tagged)
    nonempty = drop_empty_span_docs(tagged)

    def build_decoded() -> DataFrame:
        src = nonempty
        adj_mode = adjacency
        if adj_scorer is not None:
            # M6: trained pair scorer emits the 0/1 matrix the decode
            # stage consumes (adjacency="matrix" slot)
            src = score_adjacency(nonempty, adj_scorer)
            adj_mode = "matrix"
        elif adjacency == "gold":
            if gold is None:
                raise ValueError("adjacency='gold' requires gold annotations")
            src = nonempty.join(
                gold.select(F.col("guid").alias("doc_id"), "events"), "doc_id"
            )
        # model- AND gold-tagged spans carry exact role fields → the EDAG
        # expansion can branch per role instead of the coarse-field clique
        # fallback (decode's own inference only covers adjacency="gold";
        # gold spans with sentence/matrix adjacency are exact too).
        # Mirrors build_tagged: with gold AND entity_dict both passed the
        # tagging path is the heuristic dictionary tagger (coarse fields),
        # so exact must stay None there or EDAG would branch-none over
        # coarse fields (frontier flood).
        exact = (
            True
            if (model is not None or (gold is not None and entity_dict is None))
            else None
        )
        return decode(
            src,
            mode=mode,
            adjacency=adj_mode,
            exact_fields=exact,
            event_types=event_types,
            type_keywords=type_keywords,
            num_triggers=num_triggers,
        )

    decoded = staged("decode", build_decoded)
    trip = staged("triples", lambda: triples(decoded, event_types=event_types))

    dict_df = None
    if entity_dict:
        dict_df = spark.createDataFrame(
            [(s, s) for s in entity_dict], "surface string, entity_id string"
        )
    if link_aliases is not None:
        # trained entity-link scoring (north-rule canonicalization): fuzzy
        # triple surfaces resolve to curated alias ids before the LSH
        # fallback. Explicit entity_dict entries keep precedence — a
        # curated mapping is ground truth, a link is a model verdict.
        from ..model.link_scorer import LinkScorer
        from .linker import linked_entity_dict

        scorer = link_scorer
        if scorer is None:
            import os

            from ..golden import GOLDEN_DIR
            from ..model.link_scorer import load_scorer

            scorer = load_scorer(os.path.join(GOLDEN_DIR, "link_scorer.npz"))
        elif not isinstance(scorer, LinkScorer):
            scorer = LinkScorer.from_arrays(scorer)
        mentions = trip.select(F.col("subj").alias("mention")).unionByName(
            trip.select(F.col("obj").alias("mention"))
        )
        linked = linked_entity_dict(
            mentions, link_aliases, scorer, link_threshold_e12
        )
        dict_df = (
            linked
            if dict_df is None
            else dict_df.unionByName(linked.join(dict_df, "surface", "left_anti"))
        )
    vertices, edges = canonicalize(trip, entity_dict=dict_df)

    out = {
        "docs": docs,
        "tagged": tagged,
        "decoded": decoded,
        "triples": trip,
        "vertices": vertices,
        "edges": edges,
    }
    if gold is not None:
        out["stats"] = role_stats(
            decoded.select("doc_id", "events"),
            gold.select(
                F.col("guid").alias("doc_id"), "doc_type", "events"
            ),
            event_types=event_types,
        )
    return out


def run_pipeline_demo(n_docs: int = 100, mode: str = "clique") -> dict:
    """Self-contained demo: synthetic corpus → pipeline → micro P/R/F1.
    Used by the repo verify skill."""
    from ..fixtures import generate_corpus
    from ..session import get_spark

    spark = get_spark("pipeline_demo")
    web_rows, gold_rows = generate_corpus(n_docs)
    from ..schema import DOCS_GOLD, WEBTEXT

    web = spark.createDataFrame(web_rows, WEBTEXT)
    gold = spark.createDataFrame(
        [
            {
                "guid": g["guid"],
                "doc_type": g["doc_type"],
                "sentences": g["sentences"],
                "spans": g["spans"],
                "events": [
                    {"recguid": e["recguid"], "type": e["type"], "args": e["args"]}
                    for e in g["events"]
                ],
            }
            for g in gold_rows
        ],
        DOCS_GOLD,
    )
    result = run_pipeline(web, gold=gold, mode=mode, adjacency="gold")
    scores = micro_scores(result["stats"])
    n_triples = result["triples"].count()
    print(
        f"pipeline_demo mode={mode}: triples={n_triples} "
        f"P={scores['precision']:.4f} R={scores['recall']:.4f} F1={scores['f1']:.4f}"
    )
    return {"triples": n_triples, **scores}
