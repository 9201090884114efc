"""End-to-end Spark pipeline tests: webtext → triples → eval, compared
against the pure-Python oracle and golden triples (FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from docee_spark.fixtures import (
    expected_triples,
    heuristic_entity_dict,
    make_html,
)
from docee_spark.stages.evaluate import doc_type_rollup, micro_scores
from docee_spark.stages.ingest import ingest
from docee_spark.stages.pipeline import StageStore, run_pipeline
from docee_spark.stages.segment import segment


@pytest.fixture(scope="module")
def gold_run(web_df, gold_df):
    return run_pipeline(web_df, gold=gold_df, mode="clique", adjacency="gold")


class TestGoldPath:
    def test_micro_prf_is_one(self, gold_run):
        s = micro_scores(gold_run["stats"])
        assert s["precision"] == 1.0 and s["recall"] == 1.0

    def test_triples_match_golden_exactly(self, gold_run, corpus):
        _, gold_rows = corpus
        got = {
            (r.doc_id, r.event_type, r.subj, r.pred, r.obj)
            for r in gold_run["triples"].collect()
        }
        want = {
            (t["doc_id"], t["event_type"], t["subj"], t["pred"], t["obj"])
            for t in expected_triples(gold_rows)
        }
        assert got == want

    def test_doc_type_rollup_covers_slices(self, gold_run):
        rows = doc_type_rollup(gold_run["stats"]).collect()
        slices = {r["doc_type"] for r in rows}
        assert {"o2o", None} <= slices  # None row = overall

    def test_edag_mode_also_perfect(self, web_df, gold_df):
        res = run_pipeline(web_df, gold=gold_df, mode="edag", adjacency="gold")
        s = micro_scores(res["stats"])
        assert s["precision"] == 1.0 and s["recall"] == 1.0


class TestHeuristicPath:
    def test_dictionary_regex_tagger_f1(self, web_df, gold_df):
        res = run_pipeline(
            web_df,
            gold=gold_df,
            entity_dict=heuristic_entity_dict(),
            mode="clique",
            adjacency="sentence",
        )
        s = micro_scores(res["stats"])
        assert s["f1"] >= 0.85, s


class TestIngest:
    def test_html_extraction_when_text_null(self, spark):
        rows = [
            ("https://a.example.com/1", None, make_html("正文内容。", "t"), None, "zh"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        out = ingest(df).collect()
        assert out[0]["text"] == "正文内容。"

    def test_lang_filter_and_empty_drop(self, spark):
        rows = [
            ("https://a/1", None, None, "hello.", "en"),
            ("https://a/2", None, None, "", "zh"),
            ("https://a/3", None, None, "好。", "zh"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        out = ingest(df, langs=("zh",), use_html=False).collect()
        assert [r["doc_id"] for r in out] == ["https://a/3"]


class TestSegment:
    def test_matches_pyref_on_corpus(self, spark, corpus):
        from docee_spark.pyref.textproc import sent_seg

        web_rows, _ = corpus
        df = spark.createDataFrame(
            [(w["url"], w["text"], w["lang"]) for w in web_rows[:30]],
            "doc_id string, text string, lang string",
        )
        for row in segment(df).collect():
            text = next(w["text"] for w in web_rows if w["url"] == row["doc_id"])
            assert list(row["sentences"]) == sent_seg(text, lang="zh")[: len(row["sentences"])]

    def test_truncation_counted_not_silent(self, spark):
        long_text = "句子。" * 500
        df = spark.createDataFrame(
            [("d1", long_text, "zh")], "doc_id string, text string, lang string"
        )
        row = segment(df, max_sent_num=64).collect()[0]
        assert row["n_sents"] == 64
        assert row["n_sents_dropped"] == 500 - 64

    def test_clip_long_sentences(self, spark):
        df = spark.createDataFrame(
            [("d1", "x" * 700 + "。", "zh")], "doc_id string, text string, lang string"
        )
        row = segment(df, max_sent_len=128).collect()[0]
        assert row["n_sents_clipped"] == 1
        assert len(row["sentences"][0]) == 128


class TestResume:
    def test_stage_store_skips_committed(self, tmp_path, web_df, gold_df):
        store = StageStore(str(tmp_path))
        fp = "fingerprint-v1"
        run_pipeline(
            web_df, gold=gold_df, mode="clique", adjacency="gold",
            store=store, input_fingerprint=fp,
        )
        assert store.is_committed("segment", fp)
        assert store.is_committed("decode", fp)
        assert not store.is_committed("segment", "other-input")
        # second run resumes: stage tables reused (manifest timestamps stable)
        before = {m["stage"]: m["committed_at"] for m in store.counters()}
        run_pipeline(
            web_df, gold=gold_df, mode="clique", adjacency="gold",
            store=store, input_fingerprint=fp,
        )
        after = {m["stage"]: m["committed_at"] for m in store.counters()}
        assert before == after


class TestCanonicalize:
    def test_vertices_edges_consistent(self, gold_run):
        vertices = gold_run["vertices"]
        edges = gold_run["edges"]
        vids = {r["entity_id"] for r in vertices.collect()}
        erows = edges.select("src", "dst").collect()
        assert erows, "no edges produced"
        assert all(r["src"] in vids and r["dst"] in vids for r in erows)

    def test_near_duplicate_surfaces_cluster(self, spark):
        from docee_spark.stages.canonicalize import canonicalize

        trip = spark.createDataFrame(
            [
                ("d1", "T", 0, "Acme Corporation Ltd", "T#r", "Acme Corporation Ltd"),
                ("d2", "T", 0, "Acme Corporation Ltd.", "T#r", "Acme Corporation Ltd."),
                ("d3", "T", 0, "Zenith Bank", "T#r", "Zenith Bank"),
            ],
            "doc_id string, event_type string, recguid int, subj string, pred string, obj string",
        )
        vertices, _ = canonicalize(trip)
        ids = {
            r["surface"]: r["entity_id"]
            for r in vertices.select("entity_id", "surface").collect()
        }
        n_clusters = len(set(ids.values()))
        assert n_clusters == 2, ids  # the two Acme variants merged

    def test_dictionary_wins_over_lsh(self, spark):
        from docee_spark.stages.canonicalize import canonicalize

        trip = spark.createDataFrame(
            [("d1", "T", 0, "张三", "T#r", "张三")],
            "doc_id string, event_type string, recguid int, subj string, pred string, obj string",
        )
        ed = spark.createDataFrame(
            [("张三", "Q1001")], "surface string, entity_id string"
        )
        vertices, edges = canonicalize(trip, entity_dict=ed)
        assert vertices.collect()[0]["entity_id"] == "Q1001"
        e = edges.collect()[0]
        assert e["src"] == "Q1001" and e["dst"] == "Q1001"


class TestGenericExtractor:
    def test_strip_boilerplate_pure_and_deterministic(self):
        from docee_spark.stages.ingest import strip_boilerplate

        html = (
            b"<html><head><style>x{}</style><script>var a=1;</script></head>"
            b"<body><nav><a href='/'>home</a></nav>"
            b"<p>First paragraph.</p><div>Second block.</div>"
            b"<footer>(c) corp</footer></body></html>"
        )
        out = strip_boilerplate(html)
        assert "First paragraph." in out and "Second block." in out
        assert "var a=1" not in out and "home" not in out and "corp" not in out
        assert strip_boilerplate(html) == out  # frozen/deterministic

    def test_invalid_utf8_never_raises(self):
        from docee_spark.stages.ingest import strip_boilerplate

        assert isinstance(strip_boilerplate(b"\xff\xfe<p>ok</p>"), str)

    def test_comment_open_inside_raw_text_block(self):
        """'<!--' INSIDE a script/style block is raw content, not a
        comment — a separate comments-first pass used to let it eat the
        block's terminator and destroy all following document text
        (leftmost-wins alternation fixes both orders)."""
        from docee_spark.stages.ingest import strip_boilerplate

        assert (
            strip_boilerplate(
                b"<script>var x = '<!--';</script><p>Important text here.</p>"
            )
            == "Important text here."
        )
        assert (
            strip_boilerplate(b"<p>a.</p><style>/* <!-- */ p{} </style><p>b.</p>")
            == "a. b."
        )
        # the converse: markup inside a COMMENT is comment content
        assert strip_boilerplate(b"<!-- <script> --> text") == "text"
        # legacy comment-wrapped script body
        assert (
            strip_boilerplate(
                b"<script><!-- document.write('hi') //--></script><p>body</p>"
            )
            == "body"
        )

    def test_unclosed_structural_block_keeps_body(self):
        """An author-unclosed <nav>/<header>/<footer>/<aside> (common
        malformation, unlike crawl truncation) must NOT eat the document
        body — browsers auto-close at EOF and keep the content. Raw-text
        blocks (script/style) keep the EOF fallback: leaking JS beats
        keeping it."""
        from docee_spark.stages.ingest import strip_boilerplate

        out = strip_boilerplate(
            b"<html><body><nav><a href=x>menu</a>"
            b"Intro. Real content about earnings.</body></html>"
        )
        assert "Real content about earnings." in out
        # closed structural blocks still drop with their contents
        assert strip_boilerplate(b"<nav><a>home</a></nav><p>body</p>") == "body"

    def test_bare_lt_in_prose_is_text(self):
        """'<' not followed by a letter / '/' / '!' / '?' is text per the
        HTML5 tokenizer — it must not swallow prose to the next '>' (or,
        via the truncated-tag EOF fallback, the rest of the document)."""
        from docee_spark.stages.ingest import strip_boilerplate

        assert (
            strip_boilerplate(
                b"<p>Profit was 5 &lt; 10</p> and 3 < 5 so the deal closed."
            )
            == "Profit was 5 < 10 and 3 < 5 so the deal closed."
        )
        # a genuinely truncated tag is still dropped, not leaked
        assert strip_boilerplate(b"<p>keep</p><a href=trunc") == "keep"

    def test_comment_with_gt_and_unterminated_blocks(self):
        from docee_spark.stages.ingest import strip_boilerplate

        html = (
            b"<html><body>"
            b"<!-- comment with > inside -->"
            b"<p>keep one.</p>"
            b"<script>if (a > b) { alert('x'); }</script>"
            b"<p>keep two.</p>"
            b"<style>p > span { color: red }"  # unterminated -> drop to EOF
        )
        out = strip_boilerplate(html)
        assert "keep one." in out and "keep two." in out
        assert "comment" not in out
        assert "alert" not in out
        assert "color" not in out

    def test_unclosed_script_never_leaks_js(self):
        from docee_spark.stages.ingest import strip_boilerplate

        out = strip_boilerplate(b"<p>before.</p><script>var leak = 'x';")
        assert "before." in out and "leak" not in out

    def test_entity_decoding_frozen_table(self):
        from docee_spark.stages.ingest import strip_boilerplate

        html = (
            "<p>A &amp; B &#20013;&#x6587; &nbsp;x &bogus; &#xD800; &#0;</p>"
        ).encode()
        out = strip_boilerplate(html)
        assert "A & B" in out
        assert "中文" in out          # numeric dec + hex refs
        assert "&bogus;" in out       # unknown named ref preserved as text
        assert "&#xD800;" in out      # surrogate rejected
        assert "&#0;" in out          # NUL rejected

    def test_escaped_markup_survives_as_text(self):
        from docee_spark.stages.ingest import strip_boilerplate

        out = strip_boilerplate(b"<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>")
        assert "<script>alert(1)</script>" in out

    def test_nested_unclosed_and_eof_open_tags(self):
        from docee_spark.stages.ingest import strip_boilerplate

        html = (
            b"<div><p>outer <b>bold <i>both</b> flipped</i> tail</p>"
            b"<p>open tag at eof <a href='x"
        )
        out = strip_boilerplate(html)
        assert "outer bold both flipped tail" in out
        assert "open tag at eof" in out
        assert "href" not in out  # tag left open at EOF is dropped

    def test_cdata_dropped(self):
        from docee_spark.stages.ingest import strip_boilerplate

        out = strip_boilerplate(
            b"<p>a.</p><![CDATA[ raw > stuff ]]><p>b.</p><![CDATA[ unterminated"
        )
        assert "a." in out and "b." in out
        assert "stuff" not in out and "unterminated" not in out

    def test_10mb_document_bounded(self):
        import time

        from docee_spark.stages.ingest import strip_boilerplate

        blob = b"<div class='r'><p>sentence %d goes here.</p><!-- pad --></div>"
        html = b"<html><body>" + b"".join(blob % i for i in range(120_000))
        assert len(html) > 7_000_000
        t0 = time.perf_counter()
        out = strip_boilerplate(html)
        took = time.perf_counter() - t0
        assert "sentence 0 goes here." in out
        assert "sentence 119999 goes here." in out
        assert "pad" not in out
        assert took < 30  # linear regex passes, no catastrophic backtracking


class TestAdversarialPipeline:
    """Giant/messy real-web documents must flow through the caps with
    counters, never blow up a task (SURVEY §7 risks 2+5, VERDICT r2 #3/#7)."""

    def test_giant_messy_doc_capped_with_counters(self, spark):
        from docee_spark.config import MAX_SENT_LEN, MAX_SENT_NUM
        from docee_spark.schema import WEBTEXT

        body = "".join(
            f"<p>第{i}句华夏科技股份有限公司。</p>" for i in range(MAX_SENT_NUM * 4)
        )
        long_sent = "<p>" + "长" * (MAX_SENT_LEN * 2) + "。</p>"
        giant = (
            "<html><head><script>junk(" + "x" * 10000 + ")</script></head><body>"
            + body + long_sent + "<footer>boiler"
        ).encode()
        web = spark.createDataFrame(
            [("https://big.example.com/doc", None, giant, None, "zh")], WEBTEXT
        )
        seg = segment(ingest(web)).collect()[0]
        assert seg["n_sents"] == MAX_SENT_NUM
        assert seg["n_sents_dropped"] > 0
        assert seg["n_sents_clipped"] >= 0  # long sentence may fall past cap
        assert all(len(s) <= MAX_SENT_LEN for s in seg["sentences"])
        # and the deep-fused production path completes on the same doc
        res = run_pipeline(
            web, entity_dict=heuristic_entity_dict(), mode="clique", fused="deep"
        )
        assert res["triples"].count() >= 0

    def test_edag_path_cap_engages_with_counter(self, spark):
        """A doc crafted for maximal per-role branching: 4×4×4×2×2 mutually
        adjacent role candidates → 1125 partial paths > MAX_EDAG_PATHS
        (1024). The cap must engage with a counted drop (n_paths_pruned)
        and still emit records (reference risk: doc2edag.py:563-585 path
        explosion)."""
        from docee_spark.schema import DOCS_GOLD, WEBTEXT

        layers = [
            ("EquityHolder", 4),
            ("FrozeShares", 4),
            ("LegalInstitution", 4),
            ("TotalHoldingShares", 2),
            ("TotalHoldingRatio", 2),
        ]
        spans, layer_texts = [], {}
        pos, parts = 0, []
        for li, (role, n) in enumerate(layers):
            texts = [f"{chr(65 + li)}{j:02d}" for j in range(n)]
            layer_texts[role] = texts
            for t in texts:
                spans.append(
                    {
                        "text": t,
                        "field": role,
                        "dranges": [
                            {"sent_idx": 0, "char_s": pos, "char_e": pos + len(t)}
                        ],
                    }
                )
                parts.append(t)
                pos += len(t)
        sent = "".join(parts) + "股权冻结。"  # cue keyword for EquityFreeze
        # events: every cross-layer pair shares a record → the gold
        # adjacency is complete across layers, so every candidate is
        # compatible with every partial path (maximal branching)
        events, recguid = [], 0
        roles = [r for r, _ in layers]
        for i in range(len(roles)):
            for j in range(i + 1, len(roles)):
                for a in layer_texts[roles[i]]:
                    for b in layer_texts[roles[j]]:
                        events.append(
                            {
                                "recguid": recguid,
                                "type": "EquityFreeze",
                                "args": {roles[i]: a, roles[j]: b},
                            }
                        )
                        recguid += 1
        url = "https://adv.example.com/edag"
        web = spark.createDataFrame(
            [(url, None, None, sent, "zh")], WEBTEXT
        )
        gold = spark.createDataFrame(
            [(url, "m2m", [sent], spans, events)], DOCS_GOLD
        )
        res = run_pipeline(web, gold=gold, mode="edag", adjacency="gold")
        dec = res["decoded"].collect()
        assert len(dec) == 1
        assert dec[0]["n_paths_pruned"] > 0  # cap engaged, counted
        # pruning keeps the most-complete paths: full 5-role records survive
        full = [
            e for e in dec[0]["events"]
            if sum(v is not None for v in dict(e["args"]).values()) >= 5
        ]
        assert full
        assert res["triples"].count() > 0


class TestRearrangementWired:
    """T2 wired into the tag stage: drange remap must round-trip through
    the BIO synthesis/decode and the full pipeline (reference applies
    re-arrangement on every doc during prep, dee/helper/dee.py:242-347)."""

    def test_gold_pipeline_prf_survives_rearrangement(
        self, spark, web_df, gold_df
    ):
        from docee_spark.stages.evaluate import micro_scores
        from docee_spark.stages.pipeline import run_pipeline

        res = run_pipeline(
            web_df, gold=gold_df, mode="clique", adjacency="gold",
            rearrange_max_len=64,
        )
        scores = micro_scores(res["stats"])
        assert scores["precision"] == 1.0 and scores["recall"] == 1.0, scores

    def test_rearrangement_counter_and_shorter_sentences(
        self, spark, web_df, gold_df
    ):
        from pyspark.sql import functions as F

        from docee_spark.stages.pipeline import run_pipeline

        res = run_pipeline(
            web_df, gold=gold_df, mode="clique", adjacency="gold",
            rearrange_max_len=64,
        )
        tagged = res["tagged"]
        assert "n_sents_rearranged" in tagged.columns
        row = tagged.agg(
            F.sum("n_sents_rearranged").alias("n"),
            F.max(
                F.array_max(F.transform("sentences", lambda s: F.length(s)))
            ).alias("maxlen"),
        ).collect()[0]
        assert row["n"] > 0  # long fixture sentences actually split
        # no unprotected sentence beyond the cap + an unsplittable span
        assert row["maxlen"] <= 64 + 40

    def test_heuristic_rearrangement_spans_still_found(self, spark, web_df):
        from pyspark.sql import functions as F

        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.stages.ingest import ingest
        from docee_spark.stages.segment import segment
        from docee_spark.stages.tag import tag_heuristic

        docs = segment(ingest(web_df, use_html=False))
        plain = tag_heuristic(docs, heuristic_entity_dict())
        rearr = tag_heuristic(
            docs, heuristic_entity_dict(), rearrange_max_len=64
        )

        def span_texts(df):
            return {
                (r["doc_id"], r["sp"]["text"])
                for r in df.select(
                    "doc_id", F.explode("spans").alias("sp")
                ).collect()
            }

        # re-arrangement never loses or invents spans — only remaps them
        assert span_texts(plain) == span_texts(rearr)


class TestPartitionLineage:
    def test_manifest_records_per_partition_rows(self, spark, web_df, tmp_path):
        import json

        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.stages.pipeline import StageStore, run_pipeline

        store = StageStore(str(tmp_path / "stages"))
        res = run_pipeline(
            web_df.repartition(4),
            entity_dict=heuristic_entity_dict(),
            mode="clique",
            store=store,
            input_fingerprint="snap-1",
        )
        res["triples"].count()
        with open(str(tmp_path / "stages" / "segment.manifest.json")) as f:
            m = json.load(f)
        assert m["n_partitions"] >= 1
        assert m["n_rows"] == web_df.count()
        assert all("file" in p and "bytes" in p for p in m["partitions"])
        assert sum(p["rows"] for p in m["partitions"]) == m["n_rows"]
