"""Streaming incremental pipeline + sinks (S3/S5/S6 and the additive
Structured-Streaming front-end)."""

import json
import os

from pyspark.sql import functions as F


class TestIncrementalStreaming:
    def test_foreachbatch_pipeline_matches_batch(self, spark, corpus, tmp_path):
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.schema import WEBTEXT
        from docee_spark.stages.pipeline import run_pipeline
        from docee_spark.streaming.incremental import (
            incremental_triples,
            stream_webtext,
        )

        web_rows, _ = corpus
        src = str(tmp_path / "src")
        spark.createDataFrame(web_rows[:40], WEBTEXT).repartition(4).write.parquet(src)

        out = str(tmp_path / "triples")
        ckpt = str(tmp_path / "ckpt")
        q = incremental_triples(
            stream_webtext(spark, src, max_files_per_trigger=2),
            out,
            ckpt,
            entity_dict=heuristic_entity_dict(),
        )
        q.awaitTermination(120)

        got = spark.read.parquet(out)
        batch = run_pipeline(
            spark.createDataFrame(web_rows[:40], WEBTEXT),
            entity_dict=heuristic_entity_dict(),
            mode="clique",
            adjacency="sentence",
        )["triples"]
        key = ["doc_id", "event_type", "subj", "pred", "obj"]
        got_set = {tuple(r) for r in got.select(*key).collect()}
        want_set = {tuple(r) for r in batch.select(*key).collect()}
        assert got_set == want_set
        # multiple micro-batches actually ran
        assert got.select("epoch_id").distinct().count() >= 2

    def test_host_throughput_monitor_watermarked(self, spark, corpus, tmp_path):
        from docee_spark.schema import WEBTEXT
        from docee_spark.streaming.incremental import (
            host_throughput_monitor,
            stream_webtext,
        )

        web_rows, _ = corpus
        src = str(tmp_path / "src2")
        spark.createDataFrame(web_rows[:30], WEBTEXT).write.parquet(src)
        agg = host_throughput_monitor(stream_webtext(spark, src))
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("host_mon")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # append mode emits only watermark-closed windows; the plan must be
        # a valid watermarked streaming agg (ran to completion) — rows may
        # be withheld until more data arrives, so assert on schema + state
        assert {"window", "host", "n_docs", "n_chars"} <= set(
            spark.sql("select * from host_mon").columns
        )


class TestSinks:
    def test_inference_jsonl_shape(self, spark, gold_df, tmp_path):
        from docee_spark.stages.sinks import write_inference_jsonl

        decoded = gold_df.select(F.col("guid").alias("doc_id"), "events").limit(10)
        out = str(tmp_path / "jsonl")
        write_inference_jsonl(decoded, out)
        lines = []
        for fn in os.listdir(out):
            if fn.startswith("part-"):
                with open(os.path.join(out, fn)) as f:
                    lines += [json.loads(ln) for ln in f if ln.strip()]
        assert lines
        rec = lines[0]
        assert set(rec) == {"id", "event_list"}
        for ev in rec["event_list"]:
            assert set(ev) == {"event_type", "arguments"}
            for arg in ev["arguments"]:
                assert set(arg) == {"role", "argument"}
                assert arg["argument"] is not None

    def test_write_and_read_kg(self, spark, gold_df, tmp_path):
        from docee_spark.stages.canonicalize import canonicalize
        from docee_spark.stages.sinks import write_kg
        from docee_spark.stages.triples import triples

        decoded = gold_df.select(F.col("guid").alias("doc_id"), "events")
        trip = triples(decoded)
        v, e = canonicalize(trip)
        out = str(tmp_path / "kg")
        write_kg({"triples": trip, "vertices": v, "edges": e}, out)
        assert spark.read.parquet(f"{out}/vertices").count() == v.count()
        assert spark.read.parquet(f"{out}/edges").count() == e.count()

    def test_read_eval_dumps(self, spark, tmp_path):
        from docee_spark.stages.pipeline import StageStore
        from docee_spark.stages.sinks import read_eval_dumps

        store = StageStore(str(tmp_path))
        df = spark.range(3)
        store.commit("segment", df, "fp1", counters={"docs": 3})
        dumps = read_eval_dumps(spark, str(tmp_path))
        row = dumps.collect()[0]
        assert row["stage"] == "segment" and row["counters"]["docs"] == 3.0
