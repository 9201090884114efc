"""StageStore snapshot semantics (stages/pipeline.py): history, time
travel, rollback, expiry — the Iceberg table contract the store
emulates. Reference analog: epoch checkpoints (dee_task.py:746-760) keep
every epoch's dump; this is the table-format generalization."""

from __future__ import annotations

import json
import os

import pytest

from docee_spark.stages.pipeline import StageStore


def df_of(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def rows(df):
    return sorted(r["x"] for r in df.collect())


class TestSnapshots:
    def test_history_and_time_travel(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1, 2]), "fp1")
        store.commit("t", df_of(spark, [3, 4, 5]), "fp2")
        assert rows(store.load("t")) == [3, 4, 5]
        assert rows(store.load("t", snapshot_id=1)) == [1, 2]
        log = store.snapshots("t")
        assert [r["snapshot_id"] for r in log] == [1, 2]
        assert log[1]["parent_id"] == 1
        # resume contract follows the CURRENT snapshot
        assert store.is_committed("t", "fp2")
        assert not store.is_committed("t", "fp1")

    def test_rollback(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "fp1")
        store.commit("t", df_of(spark, [2]), "fp2")
        rec = store.rollback("t", 1)
        assert rec["input_fingerprint"] == "fp1"
        assert rows(store.load("t")) == [1]
        assert store.is_committed("t", "fp1")
        # the rolled-past snapshot is retained, not deleted
        assert rows(store.load("t", snapshot_id=2)) == [2]
        # a commit after rollback parents off the rolled-to snapshot
        store.commit("t", df_of(spark, [3]), "fp3")
        log = store.snapshots("t")
        assert log[-1]["snapshot_id"] == 3 and log[-1]["parent_id"] == 1
        assert rows(store.load("t")) == [3]

    def test_rollback_unknown_raises(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "fp1")
        with pytest.raises(ValueError, match="no snapshot 9"):
            store.rollback("t", 9)

    def test_expire(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        for i in range(1, 5):
            store.commit("t", df_of(spark, [i]), f"fp{i}")
        expired = store.expire_snapshots("t", keep_last=2)
        assert expired == [1, 2]
        assert [r["snapshot_id"] for r in store.snapshots("t")] == [3, 4]
        # expired data directories are gone; retained ones readable
        assert not os.path.exists(str(tmp_path / "t@v1"))
        assert rows(store.load("t", snapshot_id=3)) == [3]
        with pytest.raises(ValueError, match="no snapshot 1"):
            store.load("t", snapshot_id=1)
        # idempotent
        assert store.expire_snapshots("t", keep_last=2) == []

    def test_expire_never_drops_current(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        for i in range(1, 4):
            store.commit("t", df_of(spark, [i]), f"fp{i}")
        store.rollback("t", 1)
        expired = store.expire_snapshots("t", keep_last=1)
        # current (1) survives even though it is not among the newest
        assert 1 not in expired
        assert rows(store.load("t")) == [1]

    def test_legacy_manifest_lifts(self, spark, tmp_path):
        """A pre-snapshot manifest (flat, data in the bare stage dir) is
        read as a single-snapshot log; the next commit appends to it."""
        store = StageStore(str(tmp_path))
        df_of(spark, [7]).write.mode("overwrite").parquet(
            str(tmp_path / "t")
        )
        with open(str(tmp_path / "t.manifest.json"), "w") as f:
            json.dump(
                {
                    "stage": "t",
                    "input_fingerprint": "fp_old",
                    "committed_at": 1.0,
                    "counters": {},
                    "partitions": [],
                    "n_rows": 1,
                    "n_partitions": 1,
                },
                f,
            )
        assert store.is_committed("t", "fp_old")
        assert rows(store.load("t")) == [7]
        assert rows(store.load("t", snapshot_id=1)) == [7]
        store.commit("t", df_of(spark, [8]), "fp_new")
        assert rows(store.load("t")) == [8]
        assert rows(store.load("t", snapshot_id=1)) == [7]
        assert [r["snapshot_id"] for r in store.snapshots("t")] == [1, 2]

    def test_metrics_table_tracks_current(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "fp1", counters={"c": 1.0})
        store.commit("t", df_of(spark, [2, 3]), "fp2", counters={"c": 2.0})
        m = {
            (r["stage"], r["counter"]): (r["value"], r["n_rows"])
            for r in store.metrics_df(spark).collect()
        }
        assert m[("t", "c")] == (2.0, 2)
        store.rollback("t", 1)
        m = {r["stage"]: r["n_rows"] for r in store.metrics_df(spark).collect()}
        assert m["t"] == 1

    def test_compact_patches_current_snapshot(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit(
            "t", df_of(spark, list(range(100))).repartition(8), "fp1"
        )
        stats = store.compact("t", target_bytes=64 * 1024 * 1024)
        assert stats["compacted"]
        assert rows(store.load("t")) == list(range(100))
        rec = store.snapshots("t")[-1]
        assert "compacted_at" in rec and rec["n_rows"] == 100
        # resume identity preserved across compaction
        assert store.is_committed("t", "fp1")


class TestAppendAndIncrementalScan:
    def test_append_reads_as_union(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1, 2]), "b1")
        store.commit("t", df_of(spark, [3]), "b2", mode="append")
        store.commit("t", df_of(spark, [4, 5]), "b3", mode="append")
        assert rows(store.load("t")) == [1, 2, 3, 4, 5]
        # time travel still sees each snapshot's full file set
        assert rows(store.load("t", snapshot_id=2)) == [1, 2, 3]
        log = store.snapshots("t")
        assert [r.get("operation") for r in log] == [
            "overwrite", "append", "append",
        ]
        assert log[-1]["n_rows"] == 5 and log[-1]["n_rows_added"] == 2

    def test_incremental_scan_returns_only_the_delta(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1, 2]), "b1")
        store.commit("t", df_of(spark, [3]), "b2", mode="append")
        store.commit("t", df_of(spark, [4, 5]), "b3", mode="append")
        assert rows(store.incremental_scan("t", 1)) == [3, 4, 5]
        assert rows(store.incremental_scan("t", 2)) == [4, 5]
        assert rows(store.incremental_scan("t", 1, to_snapshot_id=2)) == [3]
        # from == to → empty delta with the table's schema
        empty = store.incremental_scan("t", 3)
        assert empty.count() == 0 and empty.columns == ["x"]

    def test_incremental_scan_rejects_overwrite_in_between(
        self, spark, tmp_path
    ):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "b1")
        store.commit("t", df_of(spark, [2]), "b2", mode="append")
        store.commit("t", df_of(spark, [9]), "rewrite")  # overwrite
        store.commit("t", df_of(spark, [10]), "b4", mode="append")
        with pytest.raises(ValueError, match="not append"):
            store.incremental_scan("t", 1)
        # but the post-overwrite append chain is scannable
        assert rows(store.incremental_scan("t", 3)) == [10]
        with pytest.raises(ValueError, match="no snapshot 99"):
            store.incremental_scan("t", 99)

    def test_incremental_scan_requires_ancestry(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "b1")
        store.commit("t", df_of(spark, [2]), "b2", mode="append")
        store.rollback("t", 1)
        store.commit("t", df_of(spark, [3]), "b3", mode="append")
        # snapshot 2 is a sibling branch, not an ancestor of 3's chain
        with pytest.raises(ValueError, match="not an ancestor"):
            store.incremental_scan("t", 2, to_snapshot_id=3)
        assert rows(store.incremental_scan("t", 1, to_snapshot_id=3)) == [3]

    def test_expire_keeps_directories_shared_with_retained(
        self, spark, tmp_path
    ):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "b1")
        store.commit("t", df_of(spark, [2]), "b2", mode="append")
        store.commit("t", df_of(spark, [3]), "b3", mode="append")
        expired = store.expire_snapshots("t", keep_last=1)
        assert expired == [1, 2]
        # v1/v2 dirs are still REFERENCED by snapshot 3's file set:
        # expiry must not delete them
        assert rows(store.load("t")) == [1, 2, 3]
        assert os.path.exists(str(tmp_path / "t@v1"))

    def test_append_resume_via_fingerprint_history(self, spark, tmp_path):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, [1]), "b1")
        store.commit("t", df_of(spark, [2]), "b2", mode="append")
        store.commit("t", df_of(spark, [3]), "b3", mode="append")
        # a batch already appended (even if not latest) is skippable
        assert store.fingerprint_in_history("t", "b2")
        assert store.fingerprint_in_history("t", "b3")
        assert not store.fingerprint_in_history("t", "b9")
        # rollback drops later batches out of the current lineage
        store.rollback("t", 2)
        assert store.fingerprint_in_history("t", "b2")
        assert not store.fingerprint_in_history("t", "b3")
        assert not store.fingerprint_in_history("nope", "b1")

    def test_compact_append_chain_creates_replace_snapshot(
        self, spark, tmp_path
    ):
        store = StageStore(str(tmp_path))
        store.commit("t", df_of(spark, list(range(50))).repartition(4), "b1")
        store.commit(
            "t",
            df_of(spark, list(range(50, 100))).repartition(4),
            "b2",
            mode="append",
        )
        stats = store.compact("t", target_bytes=64 * 1024 * 1024)
        assert stats["compacted"] and stats["files_after"] < stats["files_before"]
        assert rows(store.load("t")) == list(range(100))
        rec = store.snapshots("t")[-1]
        assert rec["operation"] == "replace"
        assert len(rec["data_dirs"]) == 1 and rec["n_rows"] == 100
        # resume identity carries over (fingerprint preserved)
        assert store.is_committed("t", "b2")
        # a replace breaks the append delta chain, like Iceberg
        with pytest.raises(ValueError, match="not append"):
            store.incremental_scan("t", 1)
        # prior snapshots still time-travel until expired
        assert rows(store.load("t", snapshot_id=1)) == list(range(50))


class TestSnapshotCli:
    def test_rollback_and_expire_maintenance(self, spark, tmp_path, capsys):
        """--rollback / --expire-snapshots are manifest-only maintenance
        actions: no pipeline run, no new Spark session required."""
        from docee_spark.cli import main

        store = StageStore(str(tmp_path))
        for i in (1, 2, 3):
            store.commit("triples", df_of(spark, [i]), f"fp{i}")
        rc = main([
            "--synth", "0", "--output", str(tmp_path / "out"),
            "--store", str(tmp_path), "--rollback", "triples:2",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out == {"rolled_back": "triples", "current_snapshot_id": 2,
                       "input_fingerprint": "fp2"}
        assert rows(store.load("triples")) == [2]
        rc = main([
            "--synth", "0", "--output", str(tmp_path / "out"),
            "--store", str(tmp_path), "--expire-snapshots", "1",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # current (2) always retained; newest (3) retained by keep_last
        assert out == {"expired": {"triples": [1]}}
        assert [r["snapshot_id"] for r in store.snapshots("triples")] == [2, 3]
