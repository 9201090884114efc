"""Physical-plan quality gates: these assert the properties that keep the
engine fast at 100 TB — filter/column pushdown into the parquet scan,
broadcast joins on dimensions, no redundant exchanges, whole-stage
codegen on the scan path."""

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_nodes(plan: str, node: str) -> int:
    """Count physical nodes by their detail headers '(k) Node'."""
    return len(re.findall(r"\(\d+\) " + node + r"\b", plan))


SF = "/root/testdata/sf0.001"


class TestPushdown:
    def test_filter_pushed_to_parquet(self, spark):
        df = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .filter(F.col("o_orderstatus") == "O")
            .select("o_orderkey")
        )
        plan = _plan(df)
        assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]" in plan

    def test_column_pruning_reads_only_projection(self, spark):
        df = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        plan = _plan(df)
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(m.group(1).split(",")) == {
            "l_orderkey:bigint",
            "l_quantity:double",
        }, plan

    def test_ingest_lang_filter_pushed(self, spark):
        from docee_spark.stages.ingest import ingest

        web = spark.read.parquet(f"{SF}/documents.parquet").select(
            F.concat(F.lit("https://h/"), F.col("doc_id").cast("string")).alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            "lang",
        )
        plan = _plan(ingest(web, langs=("en",), use_html=False))
        assert "EqualTo(lang,en)" in plan

    def test_ingest_without_html_prunes_binary(self, spark):
        """use_html=False must keep the (huge) binary column out of the
        scan entirely — the single biggest I/O knob at 100 TB."""
        from docee_spark.stages.ingest import ingest

        web = spark.read.parquet(f"{SF}/documents.parquet").select(
            F.concat(F.lit("https://h/"), F.col("doc_id").cast("string")).alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.to_binary(F.col("text"), F.lit("utf-8")).alias("html"),
            "text",
            "lang",
        )
        plan = _plan(ingest(web, use_html=False).select("doc_id", "text"))
        # html not referenced anywhere in the physical plan
        assert "html" not in plan


class TestJoins:
    def test_triples_catalog_join_is_broadcast(self, spark, gold_df):
        from docee_spark.stages.triples import triples

        decoded = gold_df.select(F.col("guid").alias("doc_id"), "events")
        plan = _plan(triples(decoded))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_similarity_query_side_broadcast(self, spark):
        from docee_spark.operators.similarity import brute_force_topk

        em = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = _plan(brute_force_topk(em, em.filter(F.col("vec_id") < 5), k=3))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    def test_dim_joins_broadcast_in_region_revenue(self, spark):
        import __spark_entry__ as em

        plan = _plan(em.q_join_region_revenue(spark, SF))
        assert plan.count("BroadcastHashJoin") >= 2


class TestShuffleBudget:
    def test_pipeline_has_single_pre_udf_exchange(self, spark, web_df):
        """ingest→segment→length_bucket→tag must contain exactly one
        Exchange before the first Arrow UDF (the combined length/salt
        repartition) — no redundant shuffles."""
        from docee_spark.stages.ingest import ingest
        from docee_spark.stages.segment import segment
        from docee_spark.stages.tag import length_bucketed, tag_heuristic

        tagged = tag_heuristic(
            length_bucketed(segment(ingest(web_df, use_html=False)), 8), {}
        )
        plan = _plan(tagged)
        assert _n_nodes(plan, "Exchange") == 1, plan

    def test_minhash_pairs_single_aggregation_path(self, spark):
        from docee_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(minhash_lsh_pairs(docs))
        # no join at all: groupBy band + in-array pair expansion
        assert "Join" not in plan

    def test_exact_dedup_partial_aggregation(self, spark):
        from docee_spark.operators.dedup import exact_duplicates

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(exact_duplicates(docs))
        # map-side combine: two HashAggregates around one Exchange
        assert _n_nodes(plan, "HashAggregate") == 2
        assert _n_nodes(plan, "Exchange") == 1


class TestCodegen:
    def test_segment_stays_in_wholestage_codegen(self, spark, web_df):
        from docee_spark.stages.ingest import ingest
        from docee_spark.stages.segment import segment

        plan = _plan(segment(ingest(web_df, use_html=False)))
        # formatted mode marks codegen'd nodes with '*'; no Python eval
        assert "* Filter" in plan or "* Project" in plan or "* Scan" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_textstats_no_python(self, spark):
        from docee_spark.operators.textstats import quality_scores

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(quality_scores(docs))
        assert "EvalPython" not in plan


class TestCanonicalizeBroadcastGate:
    """The resolved surface map is not provably bounded — its broadcast
    must be opt-in (or AQE-decided at runtime), never unconditional."""

    def _edges_plan(self, spark, gate):
        from docee_spark.stages.canonicalize import canonicalize

        trips = spark.createDataFrame(
            [("d1", "T", 0, "alpha", "T#r", "beta")],
            "doc_id string, event_type string, recguid int, subj string, pred string, obj string",
        )
        _, edges = canonicalize(trips, broadcast_resolved=gate)
        return _plan(edges)

    def test_forced_shuffle_join_above_threshold(self, spark):
        plan = self._edges_plan(spark, False)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_static_broadcast_when_asserted_small(self, spark):
        plan = self._edges_plan(spark, True)
        assert "BroadcastHashJoin" in plan

    def test_default_leaves_decision_to_aqe(self, spark):
        # no static broadcast of the resolved map in the initial plan —
        # AQE sizes it at runtime (local createDataFrame sides may still
        # plan broadcast from known tiny stats; assert no failure and a
        # join exists)
        plan = self._edges_plan(spark, None)
        assert "Join" in plan


class TestDedupScalePlans:
    def test_simhash64_candidate_generation_join_free(self, spark):
        from docee_spark.operators.dedup import simhash_near_duplicates

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(simhash_near_duplicates(docs))
        # candidates come from groupBy(band) + in-array expansion — the
        # only join-like node allowed is none at all
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan

    def test_embedding_pairs_bucket_join_not_cartesian(self, spark):
        from docee_spark.operators.dedup import embedding_cosine_pairs

        em = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = _plan(embedding_cosine_pairs(em, n_sign_bits=6))
        assert "CartesianProduct" not in plan
        assert "Join" in plan  # bucket equi-join

    def test_multiprobe_pairs_still_bucket_join(self, spark):
        """Multi-probe multiplies probe-side rows by 1+flips but must stay
        a bucket equi-join — never a cartesian expansion."""
        from docee_spark.operators.dedup import embedding_cosine_pairs

        em = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = _plan(embedding_cosine_pairs(em, n_sign_bits=6, probe_flips=2))
        assert "CartesianProduct" not in plan
        assert "Join" in plan


class TestNewQueryPlans:
    def test_ingest_html_scan_pruned_and_pushed(self, spark):
        import __spark_entry__ as em

        plan = _plan(em.q_ingest_html(spark, SF))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(m.group(1).split(",")) == {
            "doc_id:bigint",
            "text:string",
        }, plan
        assert "LessThan(doc_id,90)" in plan

    def test_multimodal_query_reads_only_doc_id(self, spark):
        """The image bytes are synthesized in-UDF; the parquet scan must
        read nothing but the id column."""
        import __spark_entry__ as em

        plan = _plan(em.q_multimodal_features(spark, SF))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1) == "doc_id:bigint", plan

    def test_url_dedup_single_exchange_no_join(self, spark):
        """Freshest-capture dedup must be ONE hash-partitioned groupBy
        with map-side partial agg (two HashAggregates, one Exchange) and
        no join-back; canonicalization is codegen expressions."""
        import __spark_entry__ as em

        plan = _plan(em.q_url_dedup(spark, SF))
        assert _n_nodes(plan, "Exchange") == 1, plan
        assert "Join" not in plan, plan
        # struct-max is not hash-aggregable (non-primitive buffer), so the
        # expected plan is partial SortAggregate -> Exchange -> final
        # SortAggregate: still map-side combined, one shuffle
        assert _n_nodes(plan, "SortAggregate") == 2, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_kg_path_2hop_one_join_no_python(self, spark):
        """The 2-hop pattern match is exactly ONE join (on the middle
        entity) with the predicate filters evaluated pre-join, plus the
        distinct; never Python."""
        import __spark_entry__ as em

        plan = _plan(em.q_kg_path_2hop(spark, SF))
        n_joins = sum(
            _n_nodes(plan, j)
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        )
        assert n_joins == 1, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestRound4CrawlOpPlans:
    """The round-4 crawl operators stay JVM-side: robots evaluation,
    LM surprisal scoring and BPE application are hot-path map/agg work
    over the full crawl — a Python eval node in any of them would be a
    10-100x regression at 100 TB."""

    def test_robots_pipeline_no_python(self, spark):
        from docee_spark.stages.robots import robots_rules, robots_verdict

        robots = spark.createDataFrame(
            [("h.com", "User-agent: *\nDisallow: /x\nAllow: /x/y")],
            "host string, body string",
        )
        urls = spark.createDataFrame(
            [(1, "http://h.com/x"), (2, "http://h.com/x/y")],
            "doc_id long, url string",
        )
        plan = _plan(robots_verdict(urls, robots_rules(robots)))
        assert "EvalPython" not in plan

    def test_lm_surprisal_no_python_vocab_broadcast(self, spark):
        from docee_spark.operators.lm import lm_surprisal, train_unigram_lm

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(lm_surprisal(docs, train_unigram_lm(docs)))
        assert "EvalPython" not in plan
        # the vocab and oov-logp joins against the corpus token stream
        # must be broadcast — the corpus side never shuffles for scoring
        assert _n_nodes(plan, "BroadcastHashJoin") >= 1
        assert _n_nodes(plan, "BroadcastNestedLoopJoin") >= 1

    def test_pack_sequences_one_window_no_python(self, spark):
        """Sequence packing: exactly ONE exchange (the per-shard window
        partitioning — never a global sort) + a map-side explode; no
        join, no Python."""
        from docee_spark.operators.sampling import pack_sequences

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(pack_sequences(docs, seq_len=64, n_shards=4))
        assert "EvalPython" not in plan
        assert _n_nodes(plan, "Exchange") == 1, plan
        assert "Join" not in plan, plan
        assert _n_nodes(plan, "Window") == 1, plan

    def test_dsir_scores_map_only_no_python(self, spark):
        """DSIR scoring is a pure map like quality_model: constant-folded
        weight array + one aggregate HOF — zero exchanges, no join, no
        Python. Selection by threshold adds only a codegen Filter."""
        import os

        from docee_spark.golden import GOLDEN_DIR
        from docee_spark.operators.dsir import dsir_select, load_dsir

        model = load_dsir(os.path.join(GOLDEN_DIR, "dsir.npz"))
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(dsir_select(docs, model, keep_threshold_e6=0))
        assert "EvalPython" not in plan
        assert _n_nodes(plan, "Exchange") == 0, plan
        assert "Join" not in plan, plan

    def test_extract_links_map_side_no_python(self, spark):
        """Link extraction is a pure map: two regex branches unioned,
        resolution + canonicalization as expressions — zero exchanges,
        zero joins, no Python. At 100 TB this runs at scan speed."""
        from docee_spark.operators.linkgraph import extract_links

        pages = spark.createDataFrame(
            [("https://h.example.com/a/", '<a href="/x">x</a>')],
            "url string, html string",
        )
        plan = _plan(extract_links(pages))
        assert "EvalPython" not in plan
        assert _n_nodes(plan, "Exchange") == 0, plan
        assert "Join" not in plan, plan

    def test_anchor_surfaces_join_free_two_exchanges(self, spark):
        """The anchor vote is two hash-partitioned groupBys over the
        extracted (surface, dst) pairs — NO join anywhere (the
        per-surface winner is a min_by aggregate, not a self-join), no
        Python, and exactly the two exchanges the two aggregations
        require. At 100 TB the exchanged stream is distinct
        (surface, dst) pairs, already partially aggregated map-side —
        never the raw link table."""
        from docee_spark.operators.linkgraph import anchor_surfaces, extract_links

        pages = spark.createDataFrame(
            [("https://h.example.com/a/", '<a href="/x">x</a>')],
            "url string, html string",
        )
        plan = _plan(anchor_surfaces(extract_links(pages)))
        assert "EvalPython" not in plan
        assert "Join" not in plan, plan
        assert _n_nodes(plan, "Exchange") == 2, plan
        # map-side partial aggregation before each exchange (the
        # min_by vote compiles to ObjectHashAggregate, the counts to
        # HashAggregate — partial+final of each = 4 aggregate nodes)
        n_aggs = sum(
            _n_nodes(plan, a)
            for a in ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
        )
        assert n_aggs >= 4, plan

    def test_dedup_substr_no_python_bounded_shuffles(self, spark):
        """ExactSubstr spans: window hashing + island merge are column
        expressions (no Python); the whole operator is 3 shuffles — the
        dup-hash partial-agg groupBy, the dup-window join, and the
        per-doc groupBy — and the join never pair-expands (one physical
        join node, equi on the hash)."""
        from docee_spark.operators.dedup import duplicated_spans

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(duplicated_spans(docs))
        assert "EvalPython" not in plan
        n_joins = sum(
            _n_nodes(plan, j)
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        )
        assert n_joins == 1, plan
        # window-frame shuffles only: dup-count agg, join sides, doc agg
        assert _n_nodes(plan, "Exchange") <= 4, plan
        # dup-hash count partial-aggregates map-side before its shuffle
        assert _n_nodes(plan, "HashAggregate") >= 2, plan

    def test_bpe_application_codegen_no_python(self, spark):
        from docee_spark.operators.bpe import bpe_tokens_expr

        merges = [
            {"rank": 0, "left": "a", "right": "b", "merged": "ab", "cnt": 3},
            {"rank": 1, "left": "ab", "right": "c", "merged": "abc", "cnt": 2},
        ]
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        toks = docs.select(
            F.explode(F.split(F.col("text"), r"\s+")).alias("word")
        ).select(bpe_tokens_expr(F.col("word"), merges).alias("pieces"))
        plan = _plan(toks)
        assert "EvalPython" not in plan
        # the final Project uses higher-order functions (transform +
        # lambda), which Spark evaluates JVM-interpreted outside
        # whole-stage codegen — the scan/explode path itself stays
        # codegen'd and nothing drops to Python
        assert "* Generate" in plan or "* ColumnarToRow" in plan


class TestRound42AdditionPlans:
    """The r4.2 additions (HLL sketch, BM25, binned quantiles) are
    full-corpus audit/retrieval paths — pure JVM codegen, bounded
    shuffles, and no global sort anywhere."""

    def test_hll_registers_single_exchange_partial_max(self, spark):
        from docee_spark.operators.sketches import hll_registers

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        keyed = docs.select(F.col("lang"), F.col("text").alias("key"))
        plan = _plan(hll_registers(keyed, "key", ["lang"]))
        assert "EvalPython" not in plan
        # r6 shape: a wordcount-shaped (group, key) dedup exchange (so
        # the md5 + rank decode runs once per DISTINCT key — registers
        # are max-idempotent) feeding the register groupBy; both
        # aggregations keep map-side partial combine, and the register
        # table still never exceeds |groups|·256 rows
        assert _n_nodes(plan, "Exchange") == 2
        assert "partial_max" in plan

    def test_bm25_topk_no_sort_broadcast_dims(self, spark):
        from docee_spark.operators.retrieval import bm25_topk

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(bm25_topk(docs, ["spark", "query"]))
        assert "EvalPython" not in plan
        # top-k is TakeOrdered (per-partition heads + driver merge),
        # never a global Sort exchange
        assert "TakeOrderedAndProject" in plan
        assert _n_nodes(plan, "Sort") == 0
        # df and totals are broadcast dimensions; the posting stream
        # never shuffles to meet them
        assert _n_nodes(plan, "BroadcastHashJoin") >= 1
        assert _n_nodes(plan, "BroadcastNestedLoopJoin") >= 1

    def test_binned_quantiles_bounded_exchanges_no_python(self, spark):
        from docee_spark.operators.textstats import binned_quantiles

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(binned_quantiles(docs, "n_chars", ["source"]))
        assert "EvalPython" not in plan
        # histogram groupBy + per-group window repartition; the final
        # per-group aggregate reuses the window's partitioning
        assert _n_nodes(plan, "Exchange") <= 2
        assert "partial_count" in plan or "partial_sum" in plan
