"""Streaming incremental pipeline + sinks (S3/S5/S6 and the additive
Structured-Streaming front-end)."""

import json
import os

import pytest

# Structured Streaming tests are wait-bound (awaitTermination /
# microbatch polling) — the module sits outside the fast inner loop;
# when touching streaming/, run it directly:
#   python -m pytest tests/test_streaming_sinks.py -q
pytestmark = pytest.mark.slow

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


class TestEpochIdempotence:
    def test_replayed_epoch_overwrites_not_appends(self, spark, corpus, tmp_path):
        """Exactly-once on the file sink: re-writing the same epoch (the
        post-failure replay) must leave the sink unchanged, and other
        epochs untouched."""
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.schema import WEBTEXT
        from docee_spark.stages.pipeline import run_pipeline
        from docee_spark.streaming.incremental import write_epoch_idempotent

        web_rows, _ = corpus
        out = str(tmp_path / "triples_idem")
        half = len(web_rows[:20]) // 2

        def triples_for(rows):
            return run_pipeline(
                spark.createDataFrame(rows, WEBTEXT),
                entity_dict=heuristic_entity_dict(),
                mode="clique",
                adjacency="sentence",
            )["triples"]

        t0 = triples_for(web_rows[:half])
        t1 = triples_for(web_rows[half:20])
        write_epoch_idempotent(t0, out, epoch_id=0)
        write_epoch_idempotent(t1, out, epoch_id=1)
        before = spark.read.parquet(out).collect()

        # replay epoch 1 (same data) — idempotent
        write_epoch_idempotent(t1, out, epoch_id=1)
        after = spark.read.parquet(out).collect()
        assert sorted(map(tuple, before)) == sorted(map(tuple, after))
        # epoch 0 rows untouched by the replay
        n0 = spark.read.parquet(out).filter(F.col("epoch_id") == 0).count()
        assert n0 == t0.count()


class TestIngestFallbackExtractor:
    def test_arbitrary_html_does_not_crash(self, spark):
        """ADVICE r01: a real crawl page without an <article> tag must go
        through the generic boilerplate stripper, not crash the job."""
        from docee_spark.schema import WEBTEXT
        from docee_spark.stages.ingest import ingest

        pages = [
            (
                "https://a/1",
                None,
                b"<html><head><script>x()</script></head>"
                b"<body><nav>menu</nav><p>real content here</p>"
                b"<footer>foot</footer></body></html>",
                None,
                "en",
            ),
            (
                "https://a/2",
                None,
                b"<html><body><article>article payload</article></body></html>",
                None,
                "zh",
            ),
        ]
        web = spark.createDataFrame(pages, WEBTEXT)
        rows = {r["doc_id"]: r["text"] for r in ingest(web, use_html=True).collect()}
        assert rows["https://a/2"] == "article payload"  # byte-identity path
        assert "real content" in rows["https://a/1"]
        assert "menu" not in rows["https://a/1"] and "script" not in rows["https://a/1"]


class TestPipelineCountersShape:
    def test_long_format_counters(self, spark, corpus):
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.operators.analysis import pipeline_counters
        from docee_spark.schema import WEBTEXT
        from docee_spark.stages.pipeline import run_pipeline

        web_rows, _ = corpus
        res = run_pipeline(
            spark.createDataFrame(web_rows[:20], WEBTEXT),
            entity_dict=heuristic_entity_dict(),
            mode="clique",
            adjacency="sentence",
        )
        rows = {
            (r["stage"], r["counter"]): r["value"]
            for r in pipeline_counters(res).collect()
        }
        assert rows[("segment", "n_rows")] == 20
        assert ("tag", "n_spans") in rows  # spans under their own name
        assert ("tag", "sents_dropped") not in rows
        assert rows[("triples", "n_rows")] > 0


class TestSubmissionGuessing:
    """dueefin_post_process analog: type guessing for empty-decode docs."""

    SCHEMA = (
        "doc_id string, "
        "spans array<struct<text:string,field:string,dranges:array<struct<sent_idx:int,char_s:int,char_e:int>>>>, "
        "events array<struct<recguid:int,type:string,args:map<string,string>>>"
    )

    def _df(self, spark):
        span = lambda t, f: {"text": t, "field": f, "dranges": []}  # noqa: E731
        return spark.createDataFrame(
            [
                # decoded doc: passes through untouched
                (
                    "d_ok",
                    [span("张伟明", "EquityHolder")],
                    [{"recguid": 0, "type": "EquityPledge",
                      "args": {"Pledger": "张伟明"}}],
                ),
                # empty decode: CompanyName → {EquityRepurchase},
                # Pledger → {EquityPledge}: "&" intersects to ∅ and
                # re-seeds with the later set (reference loop semantics);
                # "|" keeps both
                (
                    "d_empty",
                    [span("华夏科技股份有限公司", "CompanyName"),
                     span("张伟明", "Pledger"),
                     span("500000股", "PledgedShares")],
                    [],
                ),
            ],
            self.SCHEMA,
        )

    def test_intersection_guessing(self, spark):
        from docee_spark.stages.sinks import submission_records

        rows = {r["id"]: r["event_list"]
                for r in submission_records(self._df(spark)).collect()}
        assert [e["event_type"] for e in rows["d_ok"]] == ["EquityPledge"]
        guessed = rows["d_empty"]
        # {Rep} ∩ {Pledge} = ∅ → third span re-seeds {EquityPledge}
        assert [e["event_type"] for e in guessed] == ["EquityPledge"]
        assert {(a["role"], a["argument"]) for a in guessed[0]["arguments"]} == {
            ("Pledger", "张伟明"),
            ("PledgedShares", "500000股"),
        }

    def test_union_strategy_guesses_more(self, spark):
        from docee_spark.stages.sinks import submission_records

        rows = {r["id"]: r["event_list"]
                for r in submission_records(self._df(spark), "|").collect()}
        types = {e["event_type"] for e in rows["d_empty"]}
        assert types == {"EquityRepurchase", "EquityPledge"}

    def test_no_guessing_drops_empty_docs(self, spark):
        from docee_spark.stages.sinks import submission_records

        ids = {r["id"] for r in submission_records(self._df(spark), None).collect()}
        assert ids == {"d_ok"}

    def test_guessing_is_pure_codegen(self, spark):
        from docee_spark.stages.sinks import submission_records

        plan = submission_records(self._df(spark))._jdf.queryExecution().toString()
        assert "EvalPython" not in plan


class TestStatefulHostCrawl:
    def test_state_accumulates_across_microbatches(self, spark, corpus, tmp_path):
        """applyInPandasWithState: per-host totals must carry over between
        micro-batches (state store), and the budget flag must flip."""
        from docee_spark.schema import WEBTEXT
        from docee_spark.streaming.incremental import host_crawl_state, stream_webtext

        web_rows, _ = corpus
        src = str(tmp_path / "src_state")
        # many small files → several micro-batches with maxFilesPerTrigger
        spark.createDataFrame(web_rows[:40], WEBTEXT).repartition(8).write.parquet(src)

        out = host_crawl_state(
            stream_webtext(spark, src, max_files_per_trigger=2), budget_docs=3
        )
        # memory sink: the parquet sink rejects update output mode
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("host_state")
            .option("checkpointLocation", str(tmp_path / "ckpt_state"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from host_state").collect()
        assert rows, "stateful operator emitted nothing"
        # per host: the max docs_total across updates equals its true count
        import collections

        true_counts = collections.Counter()
        for w in web_rows[:40]:
            host = w["url"].split("/")[2]
            true_counts[host] += 1
        got_max = collections.defaultdict(int)
        n_updates = collections.Counter()
        for r in rows:
            got_max[r["host"]] = max(got_max[r["host"]], r["docs_total"])
            n_updates[r["host"]] += 1
        assert dict(got_max) == dict(true_counts)
        # at least one host appeared in >1 micro-batch → state carried over
        assert any(v > 1 for v in n_updates.values())
        # budget flag: hosts over 3 docs flagged in their final update
        for host, n in true_counts.items():
            if n > 3:
                finals = [r for r in rows if r["host"] == host
                          and r["docs_total"] == n]
                assert finals and all(r["over_budget"] for r in finals)


def _drain_and_stop(q, n_input_rows, timeout=120):
    """Wait until the streaming source is exhausted, then stop the query.

    ``availableNow`` + ``ProcessingTimeTimeout`` never terminates on its
    own: Spark's ``shouldRunAnotherBatch`` is unconditionally true while
    processing-time timers exist, so ``awaitTermination(t)`` just burns
    its full timeout and leaves a zombie query saturating the shared
    session.  Source exhaustion is observable instead: the cumulative
    ``numInputRows`` across distinct batches reaches the known input
    size and a trailing no-data batch has committed (so every data
    batch's emissions are already in the sink).
    """
    import time

    t0 = time.time()
    seen: dict[int, int] = {}
    try:
        while time.time() - t0 < timeout:
            for p in q.recentProgress:
                seen[p["batchId"]] = p["numInputRows"]
            if sum(seen.values()) >= n_input_rows and seen and seen[
                max(seen)
            ] == 0:
                return
            time.sleep(0.5)
        raise AssertionError(
            f"source not exhausted after {timeout}s: batches={seen}"
        )
    finally:
        q.stop()


class TestStreamingMinhashCandidates:
    def test_collisions_emit_star_pairs_across_batches(self, spark, tmp_path):
        """Stream-time near-dup candidates: exact-dup bodies collide in
        every band; the bucket anchor persists in state across
        micro-batches and later arrivals emit (anchor, later) pairs;
        unrelated text never pairs."""
        from docee_spark.streaming.incremental import (
            streaming_minhash_candidates,
        )

        src = str(tmp_path / "mh_src")
        body = "the quick brown fox jumps over the lazy dog again and again"
        other = "totally unrelated words nothing shared in this one at all"
        spark.createDataFrame(
            [(1, body)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(2, body), (3, body), (4, other)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_minhash_candidates(stream, k=4, bands=2)
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "FlatMapGroupsInPandasWithState" in plan

        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("mh_cand")
            .option("checkpointLocation", str(tmp_path / "mh_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _drain_and_stop(q, n_input_rows=4)
        rows = spark.sql("select * from mh_cand").collect()
        pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
        docs = {d for p in pairs for d in p}
        assert docs == {1, 2, 3}, pairs  # the unrelated doc never pairs
        anchors = {a for a, _ in pairs}
        assert len(anchors) == 1  # star around one first-seen anchor
        assert {b for _, b in pairs} == docs - anchors

    def test_bucket_cap_stops_emission(self, spark, tmp_path):
        from docee_spark.streaming.incremental import (
            streaming_minhash_candidates,
        )

        src = str(tmp_path / "mh_cap_src")
        body = "same same body of words repeated across all three documents"
        spark.createDataFrame(
            [(1, body), (2, body), (3, body)], "doc_id long, text string"
        ).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        out = streaming_minhash_candidates(stream, k=4, bands=2, max_bucket=2)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("mh_cap")
            .option("checkpointLocation", str(tmp_path / "mh_cap_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _drain_and_stop(q, n_input_rows=3)
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in spark.sql("select * from mh_cap").collect()
        }
        # bucket capped at 2 members: (1,2) emitted, (1,3) suppressed
        assert pairs == {(1, 2)}


class TestStreamingExactDedup:
    def test_first_seen_wins_and_state_expires(self, spark, tmp_path):
        """Stream-time exact dedup: duplicates within the watermark
        horizon collapse to the first-seen row; the operator must be the
        STATE-EXPIRING variant (DeduplicateWithinWatermark in the plan)
        — plain streaming dropDuplicates accretes state forever."""
        from datetime import datetime, timedelta

        from docee_spark.schema import WEBTEXT
        from docee_spark.streaming.incremental import (
            stream_webtext,
            streaming_exact_dedup,
        )

        t0 = datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # three arrivals of the same body within minutes → keep first
            ("u1", t0, None, "same body of text", "en"),
            ("u2", t0 + timedelta(minutes=1), None, "same body of text", "en"),
            ("u3", t0 + timedelta(minutes=2), None, "same  body   of text", "en"),
            # whitespace-normalized fingerprint → u3 is a dup of u1 too
            ("u4", t0 + timedelta(minutes=3), None, "a different body", "en"),
        ]
        src = str(tmp_path / "dedup_src")
        spark.createDataFrame(rows, WEBTEXT).coalesce(1).write.parquet(src)

        deduped = streaming_exact_dedup(stream_webtext(spark, src))
        plan = deduped._jdf.queryExecution().analyzed().toString()
        assert "DeduplicateWithinWatermark" in plan

        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_dedup")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select url, fingerprint from stream_dedup order by url"
        ).collect()
        # one row per distinct normalized content, first-seen url kept
        assert [r["url"] for r in got] == ["u1", "u4"]
        assert len({r["fingerprint"] for r in got}) == 2


class TestStreamingDecontaminate:
    def test_stateless_plan_and_batch_parity(self, spark, tmp_path):
        """The Bloom literal makes stream-time decontamination a pure
        projection: the streaming plan must carry NO stateful operator
        and NO stream-static join, and per-row output must equal the
        batch decontaminate_bloom on the same rows."""
        from datetime import datetime

        from docee_spark.operators.dedup import decontaminate_bloom
        from docee_spark.schema import WEBTEXT
        from docee_spark.streaming.incremental import (
            stream_webtext,
            streaming_decontaminate,
        )

        t0 = datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            ("u1", t0, None, "copy of the quick brown fox here", "en"),
            ("u2", t0, None, "completely unrelated text tokens", "en"),
            ("u3", t0, None, "quick brown fox appears again", "en"),
        ]
        src = str(tmp_path / "decon_src")
        spark.createDataFrame(rows, WEBTEXT).coalesce(1).write.parquet(src)
        evald = spark.createDataFrame(
            [(100, "the quick brown fox jumps")], "doc_id long, text string"
        )

        flagged = streaming_decontaminate(
            stream_webtext(spark, src), evald, n=3, m_bits=1 << 14
        )
        plan = flagged._jdf.queryExecution().analyzed().toString()
        for stateful in ("Deduplicate", "Join", "Aggregate", "FlatMapGroups"):
            assert stateful not in plan, stateful

        q = (
            flagged.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_decon")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["url"]: (r["n_grams"], r["n_bloom_hits"], r["flagged"])
            for r in spark.sql("select * from stream_decon").collect()
        }
        batch = {
            r["doc_id"]: (r["n_grams"], r["n_bloom_hits"], r["flagged"])
            for r in decontaminate_bloom(
                spark.read.parquet(src).withColumnRenamed("url", "doc_id"),
                evald,
                n=3,
                m_bits=1 << 14,
            ).collect()
        }
        assert got == batch
        assert got["u1"][2] == 1 and got["u2"][2] == 0
