"""The crawl refinery (stages/refinery.py): hygiene → quality → pii →
dedup → decontaminate → extraction → KG as ONE staged resumable job.

The junk fixture plants one corpus slice per refinery stage
(fixtures.make_junk_indexed) so every stage's drop counter is exactly
predictable; the zh corpus must pass through untouched."""
import json
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- units


class TestQualityFlags:
    def _flags(self, spark, rows):
        from docee_spark.stages.refinery import quality_flags

        df = spark.createDataFrame(rows, "doc_id string, text string")
        return {r["doc_id"]: r.asDict() for r in quality_flags(df).collect()}

    def test_rules(self, spark):
        zh = "美国企业考虑到对公司自身的影响，决定停止对外投资。" * 3
        en_ok = (
            "the quick brown fox jumps over a lazy dog and it runs to "
            "the hills for many days while the sun is high and winds "
            "are calm in the valley of long shadows near the river."
        )
        out = self._flags(
            spark,
            [
                ("zh", zh),
                ("en_ok", en_ok),
                ("lorem", "lorem ipsum dolor sit amet consectetur " * 9),
                ("repeat", "buy cheap meds now " * 30),
                ("tiny", "too few tokens here"),
                ("empty", ""),
            ],
        )
        assert out["zh"]["lang_guess"] == "zh" and out["zh"]["keep"] == 1
        assert out["en_ok"]["lang_guess"] == "en" and out["en_ok"]["keep"] == 1
        assert out["lorem"]["blocklist_hits"] > 0 and out["lorem"]["keep"] == 0
        assert out["repeat"]["repetitive"] == 1 and out["repeat"]["keep"] == 0
        # Gopher gate needs >= rep_min_grams 2-grams: short docs exempt
        assert out["tiny"]["repetitive"] == 0 and out["tiny"]["keep"] == 0
        assert out["empty"]["lang_guess"] == "unk" and out["empty"]["keep"] == 0

    def test_zh_exempt_from_c4_but_not_impossible_rep(self, spark):
        # whitespace-tokenized CJK never reaches 20 2-grams → rep gate off
        out = self._flags(spark, [("zh1", "中国公司发布公告。")])
        assert out["zh1"]["n_2grams"] < 20 and out["zh1"]["keep"] == 1

    def test_payload_carries_columns(self, spark):
        from docee_spark.stages.refinery import quality_flags

        df = spark.createDataFrame(
            [("d1", "x", "the a of to in is it that for and words here.")],
            "doc_id string, extra string, text string",
        )
        out = quality_flags(df, payload=True)
        assert {"extra", "text", "keep"} <= set(out.columns)
        assert out.filter(F.col("extra") == "x").count() == 1

    def test_matches_component_operators(self, spark):
        """The fused projection must agree with the standalone
        lang_id / c4_filters / repetition_scores operators."""
        from docee_spark.fixtures import make_doc_indexed, make_junk_indexed
        from docee_spark.operators.textstats import (
            c4_filters,
            lang_id,
            repetition_scores,
        )
        from docee_spark.stages.refinery import quality_flags

        rows = [
            ("zh%d" % i, make_doc_indexed(i)[0]["text"]) for i in range(5)
        ] + [
            ("junk%d" % j, make_junk_indexed(j, 100)["text"])
            for j in range(12)
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        fused = {
            r["doc_id"]: r.asDict() for r in quality_flags(df).collect()
        }
        for r in lang_id(df).collect():
            assert fused[r["doc_id"]]["lang_guess"] == r["lang_guess"]
        for r in c4_filters(df).collect():
            got = fused[r["doc_id"]]
            assert got["n_tokens"] == r["n_tokens"]
            assert got["avg_token_len_e2"] == r["avg_token_len_e2"]
            assert got["blocklist_hits"] == r["blocklist_hits"]
            assert got["c4_keep"] == r["keep"]
        for r in repetition_scores(df).collect():
            got = fused[r["doc_id"]]
            assert got["n_2grams"] == r["n_2grams"]
            assert got["top_2gram_frac_e4"] == r["top_2gram_frac_e4"]


class TestQualityPlan:
    def test_map_only(self, spark):
        """The quality gate (flags + keep filter, payload riding along)
        must stay map-side: no join-back, no Python, no hash shuffle —
        at most the one round-robin that un-serializes tiny scans."""
        from docee_spark.stages.refinery import quality_flags

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).drop("n_chars")
        q = quality_flags(df, payload=True).filter(F.col("keep") == 1)
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "Join" not in plan, plan
        assert "EvalPython" not in plan, plan
        assert "hashpartitioning" not in plan, plan
        assert plan.count("+- Exchange") <= 1, plan

    def test_payload_collision_guard(self, spark):
        from docee_spark.stages.refinery import quality_flags

        df = spark.createDataFrame(
            [("d", 1, "x")], "doc_id string, n_tokens int, text string"
        )
        with pytest.raises(ValueError, match="collide"):
            quality_flags(df, payload=True)


class TestPiiAudit:
    def test_redact_flows_and_scrub_agrees(self, spark):
        from docee_spark.operators.textstats import pii_redact, pii_scrub

        df = spark.createDataFrame(
            [
                ("d1", "mail a@b.co or 1.2.3.4 or +1555123456789 end"),
                ("d2", None),
            ],
            "doc_id string, text string",
        )
        red = {
            r["doc_id"]: r["red"]
            for r in df.select(
                "doc_id", pii_redact(F.col("text")).alias("red")
            ).collect()
        }
        assert red["d1"] == "mail <EMAIL> or <IP> or <PHONE> end"
        assert red["d2"] is None  # NULL stays NULL
        scrub = pii_scrub(df).filter(F.col("doc_id") == "d1").collect()[0]
        assert (scrub["n_emails"], scrub["n_ips"], scrub["n_phones"]) == (1, 1, 1)
        # fingerprint = md5 of the same redacted text
        import hashlib

        assert scrub["redacted_fp"] == hashlib.md5(red["d1"].encode()).hexdigest()


class TestQualityStreaming:
    def test_gate_is_streaming_compatible(self, spark, tmp_path):
        """quality_flags is a stateless projection, so the SAME gate
        runs unchanged under Structured Streaming (the refinery's
        incremental-ingest shape)."""
        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.stages.refinery import quality_flags

        src = str(tmp_path / "src")
        rows = [("zh0", make_doc_indexed(0)[0]["text"])] + [
            ("spam", "lorem ipsum dolor sit amet consectetur " * 9)
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        df.write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = (
            quality_flags(stream, payload=True)
            .filter(F.col("keep") == 1)
            .writeStream.format("memory")
            .queryName("qgate")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("select doc_id from qgate").collect()
        assert [r["doc_id"] for r in got] == ["zh0"]


# ------------------------------------------------------------------ e2e


N_REAL, N_JUNK = 120, 120  # 20 junk docs per kind


@pytest.fixture(scope="module")
def refinery_run(spark, tmp_path_factory):
    from docee_spark.fixtures import (
        distributed_corpus,
        heuristic_entity_dict,
        junk_corpus,
        refinery_tables,
    )
    from docee_spark.stages.pipeline import StageStore
    from docee_spark.stages.refinery import run_refinery

    base = str(tmp_path_factory.mktemp("refinery"))
    web = distributed_corpus(spark, N_REAL).unionByName(
        junk_corpus(spark, N_JUNK, N_REAL)
    )
    robots, blocked, eval_df = refinery_tables(spark)
    store = StageStore(base)
    kwargs = dict(
        robots=robots,
        blocked=blocked,
        eval_df=eval_df,
        entity_dict=heuristic_entity_dict(),
        rank_iters=4,
    )
    cold = run_refinery(web, store, "t-1", **kwargs)
    cold_triples = cold["triples"].count()
    manifests_cold = {
        m["stage"]: m["committed_at"] for m in store.counters()
    }
    resume = run_refinery(web, store, "t-1", **kwargs)
    return {
        "store": store,
        "cold": cold,
        "cold_triples": cold_triples,
        "manifests_cold": manifests_cold,
        "resume": resume,
    }


@pytest.mark.slow
def test_sparse_commit_same_output(spark, tmp_path):
    """commit_stages=SPARSE_COMMIT must produce the identical corpus and
    triples with only the two corpus materializations on disk."""
    from docee_spark.fixtures import (
        distributed_corpus,
        heuristic_entity_dict,
        junk_corpus,
        refinery_tables,
    )
    from docee_spark.stages.pipeline import StageStore
    from docee_spark.stages.refinery import SPARSE_COMMIT, run_refinery

    web = distributed_corpus(spark, 60).unionByName(junk_corpus(spark, 24, 60))
    robots, blocked, eval_df = refinery_tables(spark)
    kwargs = dict(
        robots=robots, blocked=blocked, eval_df=eval_df,
        entity_dict=heuristic_entity_dict(), rank_iters=2,
    )
    full_store = StageStore(str(tmp_path / "full"))
    sparse_store = StageStore(str(tmp_path / "sparse"))
    full = run_refinery(web, full_store, "s-1", **kwargs)
    sparse = run_refinery(
        web, sparse_store, "s-1", commit_stages=SPARSE_COMMIT, **kwargs
    )
    assert sparse["corpus"].count() == full["corpus"].count()
    a = {tuple(r) for r in full["triples"].collect()}
    b = {tuple(r) for r in sparse["triples"].collect()}
    assert a == b
    committed = {m["stage"] for m in sparse_store.counters()}
    # hygiene-chain intermediates lazy; corpus checkpoints + the
    # extraction pipeline's own KG materializations commit
    assert committed == {
        "pii", "decontam", "segment", "tag", "decode", "triples",
    }
    # sparse still audits what it commits
    assert sparse["counters"]["pii"]["n_emails"] == 2.0  # 2 surviving pages


@pytest.mark.slow
def test_cli_refine_ntriples(spark, tmp_path):
    """--refine runs the refinery from the submission entrypoint (store
    defaulting under the output dir) and --ntriples serializes the KG."""
    import re

    from docee_spark.cli import main
    from docee_spark.fixtures import distributed_corpus, junk_corpus

    src = str(tmp_path / "web")
    distributed_corpus(spark, 60).unionByName(
        junk_corpus(spark, 24, 60)
    ).write.parquet(src)
    out = str(tmp_path / "kg")
    rc = main(["--input", src, "--output", out, "--refine", "--ntriples"])
    assert rc == 0
    assert spark.read.parquet(out + "/triples").count() > 0
    lines = [r["line"] for r in spark.read.parquet(out + "/ntriples").collect()]
    assert lines and all(
        re.match(r"^<[^ ]+> <[^ ]+> (<[^ ]+>|\".*\") \.$", ln) for ln in lines
    )
    # the stage store landed under the output dir and is resumable
    assert os.path.exists(out + "/_stages/quality.manifest.json")


@pytest.mark.slow
class TestRefineryE2E:
    def test_per_stage_counters(self, refinery_run):
        c = refinery_run["cold"]["counters"]
        # hygiene: 240 in; -20 blocklist, -20 robots, 20 recrawl
        # captures collapse to 10 freshest
        assert c["clean"]["n_rows"] == N_REAL + N_JUNK - 20 - 20 - 10
        # quality: -10 lorem (C4 blocklist) -10 repeated 2-gram ads
        assert c["quality"]["n_in"] == 190.0
        assert c["quality"]["n_blocklisted"] == 10.0
        assert c["quality"]["n_repetitive"] == 10.0
        assert c["quality"]["n_zh"] == float(N_REAL)
        assert c["quality"]["n_rows"] == 170
        # pii: each surviving recrawl page carries 1 email + 1 ip + 1 phone
        assert c["pii"]["n_emails"] == 10.0
        assert c["pii"]["n_ips"] == 10.0
        assert c["pii"]["n_phones"] == 10.0
        assert c["pii"]["n_rows"] == 170
        # dedup: 5 near-dup families of 4 → exact kills the byte-identical
        # twin (1/family), MinHash the 2 remaining variants (2/family)
        assert c["dedup_exact"]["n_rows"] == 165
        assert c["dedup_near"]["n_rows"] == 155
        # decontamination: all 20 planted eval-13-gram docs die
        assert c["decontam"]["n_contaminated"] == 20.0
        assert c["decontam"]["n_rows"] == 135
        # survivors: zh corpus + 10 recrawl pages + 5 family reps
        assert c["decontam"]["n_rows"] == N_REAL + 10 + 5

    def test_zh_corpus_untouched_and_scrubbed_pii(self, refinery_run, spark):
        corpus = refinery_run["cold"]["corpus"]
        zh = corpus.filter(F.col("lang") == "zh")
        assert zh.count() == N_REAL
        scrubbed = corpus.filter(F.col("text").contains("<EMAIL>"))
        assert scrubbed.count() == 10
        assert corpus.filter(
            F.col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        ).count() == 0

    def test_extraction_produces_kg(self, refinery_run):
        cold = refinery_run["cold"]
        assert refinery_run["cold_triples"] > 0
        assert cold["vertices"].count() > 0
        assert cold["ranks"].count() == cold["vertices"].count()

    def test_resume_skips_every_stage(self, refinery_run):
        store = refinery_run["store"]
        after = {m["stage"]: m["committed_at"] for m in store.counters()}
        assert after == refinery_run["manifests_cold"]  # nothing rewritten
        assert (
            refinery_run["resume"]["triples"].count()
            == refinery_run["cold_triples"]
        )
        # counters survive the resume (read from manifests, not recomputed)
        assert (
            refinery_run["resume"]["counters"]["decontam"]["n_contaminated"]
            == 20.0
        )

    def test_manifest_lineage(self, refinery_run):
        # every stage manifest carries per-partition lineage rows
        for m in refinery_run["store"].counters():
            assert m["n_partitions"] >= 1
            assert m["n_rows"] == sum(p["rows"] for p in m["partitions"])

    def test_metrics_table(self, refinery_run, spark):
        """StageStore.metrics_df: the committed manifests as a queryable
        metrics table (the north rule's Iceberg-metrics analog)."""
        mdf = refinery_run["store"].metrics_df(spark)
        stages = {r["stage"] for r in mdf.select("stage").distinct().collect()}
        assert {"clean", "quality", "pii", "dedup_near", "decontam",
                "triples", "ranks"} <= stages
        blocked = mdf.filter(
            (F.col("stage") == "quality")
            & (F.col("counter") == "n_blocklisted")
        ).collect()
        assert [r["value"] for r in blocked] == [10.0]
        # "which stage dropped the most rows" as a plain window query
        from pyspark.sql import Window

        w = Window.orderBy("committed_at")
        drops = (
            mdf.select("stage", "committed_at", "n_rows")
            .distinct()
            .filter(F.col("stage").isin(
                "clean", "quality", "pii", "dedup_exact", "dedup_near",
                "decontam",
            ))
            .withColumn("dropped", F.lag("n_rows").over(w) - F.col("n_rows"))
        )
        worst = drops.orderBy(F.desc_nulls_last("dropped")).first()
        # quality and decontam tie at -20 in this fixture
        assert worst["dropped"] == 20 and worst["stage"] in (
            "quality", "decontam",
        )


@pytest.mark.slow
class TestAuditStage:
    def test_audit_matches_direct_operators(self, refinery_run, spark):
        """The committed audit stage equals running the sketch/quantile
        operators directly on the refined corpus."""
        from docee_spark.operators.sketches import hll_distinct
        from docee_spark.operators.textstats import binned_quantiles, tokens

        audit = {
            (r.grp, r.metric): r.value
            for r in refinery_run["cold"]["audit"].collect()
        }
        corpus = refinery_run["cold"]["corpus"]
        keyed = corpus.select(
            F.col("lang"), F.explode(tokens(F.lower(F.col("text")))).alias("key")
        )
        for r in hll_distinct(keyed, "key", ["lang"]).collect():
            assert audit[(r.lang, "est_distinct_tokens")] == r.est_distinct
            assert r.est_distinct > 0
        lens = binned_quantiles(
            corpus.select("lang", F.length("text").alias("n_chars")),
            "n_chars",
            ["lang"],
            bin_width=64,
        )
        for r in lens.collect():
            assert audit[(r.lang, "len_p50")] == r.p50
            assert audit[(r.lang, "len_p99")] == r.p99
            assert audit[(r.lang, "len_n_values")] == r.n_values
            assert r.p50 <= r.p90 <= r.p99

    def test_audit_committed_and_resumed(self, refinery_run):
        store = refinery_run["store"]
        stages = {m["stage"] for m in store.counters()}
        assert "audit" in stages
        # resume serves the committed table
        a = sorted(
            (r.grp, r.metric, r.value)
            for r in refinery_run["resume"]["audit"].collect()
        )
        b = sorted(
            (r.grp, r.metric, r.value)
            for r in refinery_run["cold"]["audit"].collect()
        )
        assert a == b
