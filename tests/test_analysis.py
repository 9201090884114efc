"""Analysis operators vs their pure-Python oracles (A6/A7, U4, J8, U6,
T2 sentence re-arrangement)."""

import pytest
from pyspark.sql import functions as F

from docee_spark.fixtures import generate_corpus
from docee_spark.pyref.analysis import (
    closest_match,
    doc_type,
    merge_non_conflicting,
    negative_combinations,
    trigger_importance_k1,
)
from docee_spark.pyref.rearrange import rearrange_sentences


class TestDocType:
    def test_assignment_rules(self):
        assert doc_type([]) == "unk"
        assert doc_type([{"type": "A"}]) == "o2o"
        assert doc_type([{"type": "A"}, {"type": "A"}]) == "o2m"
        assert doc_type([{"type": "A"}, {"type": "B"}]) == "m2m"

    def test_spark_expr_matches_pyref_on_corpus(self, spark, gold_df, corpus):
        from docee_spark.operators.analysis import doc_type_of

        _, gold_rows = corpus
        got = {
            r["guid"]: r["dt"]
            for r in gold_df.select(
                "guid", doc_type_of(F.col("events")).alias("dt")
            ).collect()
        }
        for g in gold_rows:
            assert got[g["guid"]] == doc_type(g["events"]), g["guid"]


class TestTriggerImportance:
    def test_spark_matches_pyref(self, spark, gold_df, corpus):
        from docee_spark.operators.analysis import trigger_importance

        _, gold_rows = corpus
        oracle = trigger_importance_k1(gold_rows)
        rows = trigger_importance(gold_df).collect()
        assert rows
        for r in rows:
            o = oracle[r["event_type"]][r["role"]]
            assert r["existence_e4"] == int(o["existence"] * 10000 // 1), r
            assert r["disting_e4"] == int(o["distinguishability"] * 10000 // 1), r

    def test_rank_one_is_best(self, spark, gold_df):
        from docee_spark.operators.analysis import trigger_importance

        rows = trigger_importance(gold_df).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append(r)
        for et, rs in by_type.items():
            best = max(rs, key=lambda r: (r["importance_e4"], ))
            top = next(r for r in rs if r["rank"] == 1)
            assert top["importance_e4"] == best["importance_e4"]


class TestDatasetStats:
    def test_counts(self, spark, gold_df, corpus):
        from docee_spark.operators.analysis import dataset_stats

        _, gold_rows = corpus
        rows = {r["doc_type"]: r for r in dataset_stats(gold_df).collect()}
        want = {}
        for g in gold_rows:
            dt = doc_type(g["events"])
            want[dt] = want.get(dt, 0) + 1
        assert {k: v["n_docs"] for k, v in rows.items()} == want


class TestRecordMerge:
    def test_merges_complementary(self):
        a = ["x", None, "z"]
        b = ["x", "y", None]
        out = merge_non_conflicting([a, b], min_coo=1)
        assert out == [["x", "y", "z"]]

    def test_conflict_blocks_merge(self):
        a = ["x", "y1", None]
        b = ["x", "y2", None]
        out = merge_non_conflicting([a, b], min_coo=1)
        assert a in out and b in out and len(out) == 2

    def test_min_coo_threshold(self):
        a = ["x", None]
        b = [None, "y"]  # no co-occurring equal role
        out = merge_non_conflicting([a, b], min_coo=1)
        assert len(out) == 2


class TestCombUtils:
    def test_closest_match_argmax_and_tie(self):
        golds = [(0, 1), (1, 2, 3), (4,)]
        comb = (1, 2)
        g, n = closest_match(comb, golds)
        assert g == (1, 2, 3) and n == 2
        # tie → earliest gold
        g, n = closest_match((9,), golds)
        assert g == (0, 1) and n == 0

    def test_negative_combinations(self):
        assert negative_combinations(5, [(0, 2), (2, 3)]) == (1, 4)


class TestRearrange:
    def test_long_sentence_split_and_spans_remap(self):
        sents = ["甲方为张三，乙方为李四，金额100元，日期不详。", "短句。"]
        spans = [
            ("张三", "Pledger", [(0, 3, 5)]),
            ("李四", "Pledgee", [(0, 9, 11)]),
            ("100元", "money", [(0, 14, 18)]),
        ]
        new_sents, new_spans = rearrange_sentences(sents, spans, max_len=10)
        assert all(len(s) <= 10 for s in new_sents)
        for text, _f, dranges in new_spans:
            for si, s, e in dranges:
                assert new_sents[si][s:e] == text

    def test_never_cuts_inside_span(self):
        # span containing a comma must stay intact
        sents = ["AAAA，BBBB，CCCC，DDDD。"]
        spans = [("BBBB，CCCC", "X", [(0, 5, 14)])]
        new_sents, new_spans = rearrange_sentences(sents, spans, max_len=8)
        [(_, _, [(si, s, e)])] = new_spans
        assert new_sents[si][s:e] == "BBBB，CCCC"

    def test_short_docs_untouched(self):
        sents = ["短句。", "另一句。"]
        new_sents, new_spans = rearrange_sentences(sents, [], max_len=128)
        assert new_sents == sents

    def test_greedy_remerge_fills_to_cap(self):
        sents = ["a，b，c，d，e，f。"]
        new_sents, _ = rearrange_sentences(sents, [], max_len=6)
        assert all(len(s) <= 6 for s in new_sents)
        assert "".join(new_sents) == sents[0]
        # greedy: first piece should have absorbed up to the cap
        assert len(new_sents[0]) > 2


@pytest.mark.parametrize("seed", [7, 11])
def test_rearrange_roundtrip_on_corpus(seed):
    _, gold_rows = generate_corpus(40, seed=seed)
    for g in gold_rows:
        spans = [
            (
                s["text"],
                s["field"],
                [(d["sent_idx"], d["char_s"], d["char_e"]) for d in s["dranges"]],
            )
            for s in g["spans"]
        ]
        new_sents, new_spans = rearrange_sentences(g["sentences"], spans, max_len=64)
        for text, _f, dranges in new_spans:
            for si, s, e in dranges:
                assert new_sents[si][s:e] == text, (g["guid"], text)


class TestEntityStats:
    def test_identical_sets_perfect(self, spark, gold_df):
        from docee_spark.stages.evaluate import entity_stats

        spans = gold_df.select(F.col("guid").alias("doc_id"), "spans")
        [r] = entity_stats(spans, spans).collect()
        assert r["fp"] == 0 and r["fn"] == 0 and r["f1"] == 1.0 and r["tp"] > 0

    def test_counts_asymmetric_sets(self, spark):
        from docee_spark.stages.evaluate import entity_stats

        def mk(surfaces):
            return spark.createDataFrame(
                [("d1", [{"text": s, "field": "X", "dranges": []} for s in surfaces])],
                "doc_id string, spans array<struct<text:string,field:string,dranges:array<struct<sent_idx:int,char_s:int,char_e:int>>>>",
            )

        [r] = entity_stats(mk(["a", "b"]), mk(["b", "c"])).collect()
        assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)


_DECODED_SCHEMA = (
    "doc_id string, "
    "spans array<struct<text:string,field:string,dranges:array<struct<sent_idx:int,char_s:int,char_e:int>>>>, "
    "events array<struct<recguid:int,type:string,args:map<string,string>>>"
)


def _span(text):
    return {"text": text, "field": "X", "dranges": []}


class TestGraphDensity:
    def test_single_complete_record(self, spark):
        from docee_spark.operators.analysis import graph_density

        df = spark.createDataFrame(
            [
                (
                    "d1",
                    [_span("x"), _span("y"), _span("z")],
                    [{"recguid": 0, "type": "T", "args": {"a": "x", "b": "y", "c": "z"}}],
                )
            ],
            _DECODED_SCHEMA,
        )
        [r] = graph_density(df).collect()
        # union matrix of one complete record: 6 off-diagonal + 3 diagonal
        # over 3² spans — density 1.0 (reference arg_rel.py union+diag)
        assert (r["total_connections"], r["total_rels"]) == (9, 9)
        assert r["density_e4"] == 10000

    def test_shared_edge_counted_once(self, spark):
        """Two records sharing the (x,y) edge: union counts it once, and
        the denominator uses ALL doc spans (incl. the unused 4th)."""
        from docee_spark.operators.analysis import graph_density

        df = spark.createDataFrame(
            [
                (
                    "d1",
                    [_span("x"), _span("y"), _span("z"), _span("unused")],
                    [
                        {"recguid": 0, "type": "T", "args": {"a": "x", "b": "y"}},
                        {"recguid": 1, "type": "T", "args": {"a": "x", "b": "y"}},
                        {"recguid": 2, "type": "T", "args": {"a": "y", "b": "z"}},
                    ],
                )
            ],
            _DECODED_SCHEMA,
        )
        [r] = graph_density(df).collect()
        # union pairs: diag(x,y,z)=3 + (x,y),(y,x),(y,z),(z,y)=4 → 7
        assert (r["total_connections"], r["total_rels"]) == (7, 16)
        assert r["density_e4"] == 4375

    def test_empty_docs_zero_density(self, spark):
        from docee_spark.operators.analysis import graph_density

        df = spark.createDataFrame([("d1", [], [])], _DECODED_SCHEMA)
        [r] = graph_density(df).collect()
        assert r["total_connections"] == 0 and r["density_e4"] == 0


class TestKeySentences:
    def test_modal_sentence_matches_python_oracle(self, spark, gold_df, corpus):
        from collections import Counter

        from docee_spark.operators.analysis import key_sentences

        _, gold_rows = corpus
        got = {
            (r["doc_id"], r["recguid"]): r["key_sentence"]
            for r in key_sentences(gold_df).collect()
        }
        for g in gold_rows:
            span_sents = {}
            for sp in g["spans"]:
                span_sents.setdefault(sp["text"], []).extend(
                    d["sent_idx"] for d in sp["dranges"]
                )
            for ev in g["events"]:
                c = Counter()
                for v in ev["args"].values():
                    if v is not None:
                        for si in span_sents.get(v, []):
                            c[si] += 1
                if not c:
                    continue
                best = min(
                    (si for si in c if c[si] == max(c.values()))
                )
                assert got[(g["guid"], ev["recguid"])] == best, (g["guid"], ev)


class TestGitHeteroEdges:
    """G10 graph construction (git.py:930-989) against a hand-computed
    golden: 2 sentences, 2 spans (one with 2 mentions), 3 mentions total.
    Node ids: sentences 0,1; mentions 2,3,4."""

    def test_hand_computed_golden(self, spark):
        from docee_spark.operators.analysis import git_hetero_edges
        from docee_spark.schema import SPANS

        # span "AA": mentions in sent 0 (char 0) and sent 1 (char 3)
        # span "B": mention in sent 0 (char 5)
        # canonical span order: AA (first mention at (0,0)), B (at (0,5))
        # mention order: AA@(0,0)=2, AA@(1,3)=3, B@(0,5)=4
        spans = [
            {
                "text": "B",
                "field": "x",
                "dranges": [{"sent_idx": 0, "char_s": 5, "char_e": 6}],
            },
            {
                "text": "AA",
                "field": "y",
                "dranges": [
                    {"sent_idx": 1, "char_s": 3, "char_e": 5},  # unsorted on purpose
                    {"sent_idx": 0, "char_s": 0, "char_e": 2},
                ],
            },
        ]
        df = spark.createDataFrame(
            [("d1", ["AA...B.", "...AA.."], spans)],
            spark.createDataFrame([("", [""],)], "doc_id string, sentences array<string>")
            .schema.add("spans", SPANS),
        )
        got = {
            (r.edge_type, r.src, r.dst)
            for r in git_hetero_edges(df).collect()
        }
        want = {
            # s-s complete directed over sentences {0,1}
            ("s-s", 0, 1), ("s-s", 1, 0),
            # s-m both directions: mention 2 in sent 0, 3 in sent 1, 4 in sent 0
            ("s-m", 2, 0), ("s-m", 0, 2),
            ("s-m", 3, 1), ("s-m", 1, 3),
            ("s-m", 4, 0), ("s-m", 0, 4),
            # m-m intra-sentence: mentions 2 and 4 share sentence 0
            ("m-m", 2, 4), ("m-m", 4, 2),
            # m-m inter same-entity: mentions 2 and 3 are span "AA"
            ("m-m", 2, 3), ("m-m", 3, 2),
        }
        assert got == want

    def test_same_sentence_repeat_mention_no_duplicate_edges(self, spark):
        """A span with TWO mentions in ONE sentence: the pair qualifies
        for the intra-sentence branch only — the same-entity branch is
        inter-sentence (git.py:985-988), so the edge row must appear
        exactly once per direction, not twice."""
        from docee_spark.operators.analysis import git_hetero_edges
        from docee_spark.schema import SPANS

        spans = [
            {
                "text": "AA",
                "field": "y",
                "dranges": [
                    {"sent_idx": 0, "char_s": 0, "char_e": 2},
                    {"sent_idx": 0, "char_s": 4, "char_e": 6},
                ],
            },
        ]
        df = spark.createDataFrame(
            [("d1", ["AA..AA."], spans)],
            spark.createDataFrame([("", [""],)], "doc_id string, sentences array<string>")
            .schema.add("spans", SPANS),
        )
        rows = [
            (r.edge_type, r.src, r.dst)
            for r in git_hetero_edges(df).collect()
        ]
        assert len(rows) == len(set(rows)), rows  # no duplicate edge rows
        # mentions are nodes 1 and 2 (one sentence node): one intra pair
        assert rows.count(("m-m", 1, 2)) == 1 and rows.count(("m-m", 2, 1)) == 1

    def test_row_counts_match_closed_form(self, spark, gold_df):
        """On the fixture corpus: |s-s| = S(S-1) per doc and every edge
        type present; spot-check totals via closed-form per-doc sums."""
        from docee_spark.operators.analysis import git_hetero_edges

        docs = gold_df.select(
            F.col("guid").alias("doc_id"), "sentences", "spans"
        )
        edges = git_hetero_edges(docs)
        ss = (
            edges.filter(F.col("edge_type") == "s-s")
            .groupBy("doc_id")
            .count()
            .collect()
        )
        S = {
            r["doc_id"]: len(r["sentences"])
            for r in docs.select("doc_id", "sentences").collect()
        }
        for r in ss:
            s = S[r["doc_id"]]
            assert r["count"] == s * (s - 1)
        sm = edges.filter(F.col("edge_type") == "s-m").count()
        n_mentions = docs.select(
            F.sum(
                F.aggregate(
                    F.transform(F.col("spans"), lambda sp: F.size(sp["dranges"])),
                    F.lit(0),
                    lambda a, b: a + b,
                )
            )
        ).collect()[0][0]
        assert sm == 2 * n_mentions
