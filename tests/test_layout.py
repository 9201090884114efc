"""Physical table layout: partitioned writes prune at planning time,
bucketed tables join with zero Exchange, compaction merges small files
without changing content, and StageStore.compact preserves the resume
contract while patching lineage."""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from docee_spark.stages.layout import (
    compact_parquet,
    plan_compaction,
    write_bucketed,
    write_partitioned,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def docs(spark):
    return spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


class TestPartitionedWrite:
    def test_partition_pruning_at_planning_time(self, spark, docs, tmp_path):
        path = str(tmp_path / "corpus")
        write_partitioned(docs, path, ("lang",))
        # one directory per lang value
        assert sorted(d for d in os.listdir(path) if d.startswith("lang=")) == [
            "lang=0",
            "lang=1",
            "lang=2",
        ]
        df = spark.read.parquet(path).filter(F.col("lang") == "1")
        plan = _plan(df)
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "lang" in m.group(1) and "= 1" in m.group(1), plan
        # the predicate is consumed ENTIRELY at planning time: no
        # row-level Filter node survives and no data filter is pushed
        # (Spark omits the PushedFilters line when there are none)
        assert len(re.findall(r"\(\d+\) Filter\b", plan)) == 0, plan
        assert "PushedFilters" not in plan or "PushedFilters: []" in plan, plan
        assert df.count() == 133 or df.count() == 134

    def test_roundtrip_content(self, spark, docs, tmp_path):
        path = str(tmp_path / "corpus")
        write_partitioned(docs, path, ("lang",))
        back = spark.read.parquet(path)
        assert back.count() == 400
        assert sorted(back.columns) == ["doc_id", "lang", "text"]
        assert (
            back.filter(F.col("doc_id") == 7).select("text").first()[0] == "text-7"
        )


class TestBucketedJoin:
    def test_same_bucketing_joins_with_zero_exchange(self, spark, docs, tmp_path):
        feats = docs.select("doc_id", F.length("text").alias("n_chars"))
        try:
            write_bucketed(
                docs, "t_docs_b", ("doc_id",), 4, str(tmp_path / "docs_b"),
                sort_cols=("doc_id",),
            )
            write_bucketed(
                feats, "t_feats_b", ("doc_id",), 4, str(tmp_path / "feats_b"),
                sort_cols=("doc_id",),
            )
            # hint("merge") pins SMJ so the broadcast path can't mask the
            # exchange this test is about
            joined = spark.table("t_docs_b").join(
                spark.table("t_feats_b").hint("merge"), "doc_id"
            )
            plan = _plan(joined)
            assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0, plan
            assert "SortMergeJoin" in plan, plan
            assert joined.count() == 400
        finally:
            spark.sql("DROP TABLE IF EXISTS t_docs_b")
            spark.sql("DROP TABLE IF EXISTS t_feats_b")

    def test_unbucketed_same_join_pays_the_exchange(self, spark, docs):
        # control: the identical join without bucketing has >=1 Exchange
        feats = docs.select("doc_id", F.length("text").alias("n_chars"))
        plan = _plan(docs.join(feats.hint("merge"), "doc_id"))
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) >= 1, plan


class TestCompaction:
    def _fragmented(self, spark, docs, path: str, n: int = 32) -> None:
        docs.repartition(n).write.mode("overwrite").parquet(path)

    def test_compacts_to_target_and_preserves_rows(self, spark, docs, tmp_path):
        path = str(tmp_path / "frag")
        self._fragmented(spark, docs, path)
        before = spark.read.parquet(path)
        rows_before = sorted(r.doc_id for r in before.collect())
        n_files_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
        assert n_files_before == 32
        stats = compact_parquet(spark, path, target_bytes=1 << 30)
        assert stats["compacted"] and stats["files_before"] == 32
        assert stats["files_after"] == 1
        after = spark.read.parquet(path)
        assert sorted(r.doc_id for r in after.collect()) == rows_before
        # no temp/backup residue
        assert not os.path.exists(path + ".compacting")
        assert not os.path.exists(path + ".pre-compact")

    def test_already_compact_is_a_noop(self, spark, docs, tmp_path):
        path = str(tmp_path / "ok")
        docs.coalesce(2).write.parquet(path)
        mtimes = {
            f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
        }
        # target so small every existing file already exceeds it → n_out
        # >= files → no rewrite
        stats = compact_parquet(spark, path, target_bytes=1)
        assert not stats["compacted"]
        assert {
            f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
        } == mtimes

    def test_plan_compaction_math(self, spark, docs, tmp_path):
        path = str(tmp_path / "plan")
        self._fragmented(spark, docs, path, n=8)
        total = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        plan = plan_compaction(path, target_bytes=total // 3 + 1)
        assert plan["files"] == 8 and plan["n_out"] == 3 and plan["needed"]


class TestStageStoreCompact:
    def test_compact_patches_lineage_preserves_resume(self, spark, docs, tmp_path):
        from docee_spark.stages.pipeline import StageStore

        store = StageStore(str(tmp_path / "stages"))
        store.commit("corpus", docs.repartition(16), "fp-1", {"n_in": 400})
        manifest = os.path.join(str(tmp_path / "stages"), "corpus.manifest.json")
        with open(manifest) as f:
            before = json.load(f)
        assert before["n_partitions"] == 16 and before["n_rows"] == 400

        stats = store.compact("corpus", target_bytes=1 << 30)
        assert stats["compacted"] and stats["files_after"] == 1
        with open(manifest) as f:
            after = json.load(f)
        # layout changed, contract untouched
        assert after["n_partitions"] == 1 and after["n_rows"] == 400
        assert after["input_fingerprint"] == "fp-1"
        assert after["committed_at"] == before["committed_at"]
        assert after["counters"] == {"n_in": 400}
        assert after["compacted_at"] > after["committed_at"]
        assert store.is_committed("corpus", "fp-1")
        assert store.load("corpus").count() == 400

    def test_compact_uncommitted_stage_raises(self, spark, tmp_path):
        from docee_spark.stages.pipeline import StageStore

        store = StageStore(str(tmp_path / "stages"))
        with pytest.raises(ValueError, match="no committed manifest"):
            store.compact("ghost")


@pytest.mark.slow
def test_cli_compact_mb(spark, tmp_path, capsys):
    """--compact-mb compacts every committed stage after the run and
    reports the per-stage file deltas; the store stays resumable."""
    from docee_spark.cli import main
    from docee_spark.stages.pipeline import StageStore

    out = str(tmp_path / "kg")
    store_dir = str(tmp_path / "stages")
    rc = main(
        ["--synth", "60", "--output", out, "--store", store_dir,
         "--fingerprint", "fp-c", "--compact-mb", "1024"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    deltas = summary["compacted_files"]
    assert deltas and all(after <= before for before, after in deltas.values())
    # a 60-doc run at 1 GiB targets must land on single-file stages
    assert all(after == 1 for _, after in deltas.values())
    store = StageStore(store_dir)
    assert store.is_committed("triples", "fp-c")
    assert store.load("triples").count() > 0
