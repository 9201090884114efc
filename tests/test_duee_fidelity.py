"""DuEE-fin second fidelity source (r4 verdict task #7): the reference
ships full builder semantics for DuEE-fin (Data/DuEEData/build_data.py)
but no raw data, so this suite (a) equality-diffs the transcribed
DUEEFIN_EVENT_TYPES catalog against the reference template, (b)
differentially tests the ported builder functions (reorganise_sents,
get_span_drange — T2/T3 re-arrangement and T5 span matching under
DuEE's parameters) against the reference's own functions exec'd from
its file, on adversarial fixtures including digit-boundary traps and
over-long comma-split sentences, and (c) runs deterministic DuEE-shaped
annotated docs through the gold-span gate and the trained-model slot —
a second, differently-shaped instantiation of the north-rule
P/R ≥ 0.95 requirement (Chinese text, ；-segmentation, trigger-mandatory
events, min_field_num=2, 13 event types with Chinese role names)."""

from __future__ import annotations

import os
import types

import pytest

from docee_spark.catalogs import DUEEFIN_EVENT_TYPES
from docee_spark.pyref.duee import build_rows, get_span_drange, reorganise_sents

BUILDER = "/root/reference/Data/DuEEData/build_data.py"
TEMPLATE = "/root/reference/dee/event_types/dueefin_w_tgg.py"

pytestmark = pytest.mark.slow

EVENT_FIELDS = {et.name: list(et.fields) for et in DUEEFIN_EVENT_TYPES}


def _ref_builder():
    src = open(BUILDER).read().replace(
        "from dee.event_types import get_event_template",
        "get_event_template = None",
    )
    mod = types.ModuleType("duee_ref_builder")
    exec(compile(src, "duee_ref_builder", "exec"), mod.__dict__)
    return mod


def raw_docs() -> list[dict]:
    """Deterministic DuEE-fin-shaped raw docs (the builder's line-JSON
    input: id/title/text/event_list). Every annotated argument occurs
    verbatim; doc shapes cover o2o / o2m / m2m, a trigger that never
    occurs (event dropped), digit-adjacent traps, ；-segmentation, and
    an over-long comma-joined sentence that forces the recursive
    reorganise path."""
    long_tail = "，".join(f"第{i}项审议事项获得通过" for i in range(1, 15))
    return [
        {
            "id": "duee-1",
            "title": "A集团股份有限公司质押公告",
            "text": (
                "A集团股份有限公司的控股股东将所持股份办理了质押。"
                "本次质押50000股，占总股本2.5%；质权方为B证券有限公司。"
                "事件发生于2020年1月5日，披露时间为2020年1月6日。"
            ),
            "event_list": [
                {
                    "event_type": "质押",
                    "trigger": "质押",
                    "arguments": [
                        {"role": "质押方", "argument": "控股股东"},
                        {"role": "质权方", "argument": "B证券有限公司"},
                        {"role": "质押股票/股份数量", "argument": "50000股"},
                        {"role": "质押物占总股比", "argument": "2.5%"},
                        {"role": "事件时间", "argument": "2020年1月5日"},
                        {"role": "披露时间", "argument": "2020年1月6日"},
                    ],
                }
            ],
        },
        {
            "id": "duee-2",
            "title": "C公司连续中标两项目",
            "text": (
                "C建设工程有限公司中标城东隧道项目，中标金额3亿元，招标方为市政建设局。"
                "同日，C建设工程有限公司再次中标西郊大桥项目；中标金额为7000万元。"
                "两项目披露日期均为2021年3月15日。"
            ),
            "event_list": [
                {
                    "event_type": "中标",
                    "trigger": "中标",
                    "arguments": [
                        {"role": "中标公司", "argument": "C建设工程有限公司"},
                        {"role": "中标标的", "argument": "城东隧道项目"},
                        {"role": "中标金额", "argument": "3亿元"},
                        {"role": "招标方", "argument": "市政建设局"},
                        {"role": "披露日期", "argument": "2021年3月15日"},
                    ],
                },
                {
                    "event_type": "中标",
                    "trigger": "中标",
                    "arguments": [
                        {"role": "中标公司", "argument": "C建设工程有限公司"},
                        {"role": "中标标的", "argument": "西郊大桥项目"},
                        {"role": "中标金额", "argument": "7000万元"},
                        {"role": "披露日期", "argument": "2021年3月15日"},
                    ],
                },
            ],
        },
        {
            "id": "duee-3",
            "title": "D公司回购股份并披露年度亏损",
            "text": (
                "D科技股份有限公司实施回购，回购股份数量为120000股，"
                "占公司总股本比例0.8%，每股交易价格12.5元。"
                "子公司丁新材料公司同时披露财报：2020年度净亏损4500万元，亏损变化为扩大。"
                f"{long_tail}。"
                "以上事项披露时间为2021年4月28日。"
            ),
            "event_list": [
                {
                    "event_type": "股份回购",
                    "trigger": "回购",
                    "arguments": [
                        {"role": "回购方", "argument": "D科技股份有限公司"},
                        {"role": "回购股份数量", "argument": "120000股"},
                        {"role": "占公司总股本比例", "argument": "0.8%"},
                        {"role": "每股交易价格", "argument": "12.5元"},
                        {"role": "披露时间", "argument": "2021年4月28日"},
                    ],
                },
                {
                    "event_type": "亏损",
                    "trigger": "亏损",
                    "arguments": [
                        # a distinct surface (no shared roles, no
                        # trigger-substring overlap) rather than the
                        # repurchaser: one surface carrying two ROLES is
                        # unrecoverable by design (the builder's
                        # ann_mspan2guess_field is last-wins per surface)
                        # — pinned separately in
                        # test_shared_surface_role_conflict_is_lossy
                        {"role": "公司名称", "argument": "丁新材料公司"},
                        {"role": "净亏损", "argument": "4500万元"},
                        {"role": "亏损变化", "argument": "扩大"},
                        {"role": "财报周期", "argument": "2020年度"},
                        {"role": "披露时间", "argument": "2021年4月28日"},
                    ],
                },
            ],
        },
        {
            "id": "duee-4",
            "title": "E公司高管变动公告",
            "text": (
                "E控股集团宣布高管变动：王小明辞任总经理，变动类型为辞职。"
                "公司已于2022年7月1日披露该事项。"
            ),
            "event_list": [
                {
                    "event_type": "高管变动",
                    "trigger": "辞任",
                    "arguments": [
                        {"role": "高管姓名", "argument": "王小明"},
                        {"role": "高管职位", "argument": "总经理"},
                        {"role": "变动类型", "argument": "辞职"},
                        {"role": "任职公司", "argument": "E控股集团"},
                    ],
                },
                {
                    # trigger never occurs in the text → event dropped
                    "event_type": "企业破产",
                    "trigger": "破产清算",
                    "arguments": [
                        {"role": "破产公司", "argument": "E控股集团"},
                    ],
                },
            ],
        },
    ]


class TestDueeCatalog:
    @pytest.mark.skipif(not os.path.exists(TEMPLATE), reason="no reference")
    def test_catalog_matches_reference_template(self):
        src = open(TEMPLATE).read()
        mod = types.ModuleType("dueefin_ref")
        exec(compile(src, "dueefin_ref", "exec"), mod.__dict__)
        ref = {
            name: (
                tuple(fields),
                {k: set(v) for k, v in trig.items() if isinstance(k, int)},
                minf,
            )
            for name, fields, trig, minf in mod.event_type_fields_list
        }
        ours = {
            et.name: (
                et.fields,
                {k: set(v) for k, v in et.triggers.items()},
                et.min_field_num,
            )
            for et in DUEEFIN_EVENT_TYPES
        }
        assert ours == ref
        assert mod.common_fields == ["OtherType"]


@pytest.mark.skipif(not os.path.exists(BUILDER), reason="no reference")
class TestBuilderDifferential:
    """Byte-identical behavior vs the reference builder's own functions
    on adversarial fixtures — the T2/T3/T5 port under DuEE parameters."""

    SENTS = [
        "2020年1月5日质押50000股",  # digit-digit boundaries
        "价格为12.5元，比例0.8%；数量7000万元",  # decimal-point guards
        "编号A1.5B段（含*号?与[括号]的文本）",  # regex metachars
        "50000股之后又质押5000股",  # substring-of-number trap
        "x1.5",  # one-sided '0' <= char guard (letter before '.')
    ]
    SPANS = [
        "50000股", "5000股", "0000股", "2020年1月5日", "12.5元", "5元",
        "0.8%", "7000万元", "000万元", "1.5", "5", "A1.5B", "*号?",
        "[括号]", "（含*号?与[括号]的文本）", "x1.5", "不存在",
    ]

    def test_get_span_drange_differential(self):
        ref = _ref_builder()
        for span in self.SPANS:
            assert get_span_drange(self.SENTS, span) == ref.get_span_drange(
                self.SENTS, span
            ), span

    def test_reorganise_sents_differential(self):
        ref = _ref_builder()
        fixtures = [
            ["短句。", "这是第二个短句。", "第三句。"],
            ["a" * 200],  # over-long non-CJK (no comma: final_cut path)
            ["，".join(f"第{i}项决议" for i in range(40))],  # comma recursion
            ["短句" * 70],  # over-long CJK without commas
            ["尾部是字母x", "然后是中文句子", "english tail", "又一句"],
            [],
            ["中文" * 30, "y" * 5, "中文结尾", "短"],
        ]
        for sents in fixtures:
            for max_len in (16, 64, 128):
                for concat in (False, True):
                    for final_cut in (False, True):
                        assert reorganise_sents(
                            sents, max_len, concat, final_cut
                        ) == ref.reorganise_sents(
                            sents, max_len, concat, final_cut
                        ), (sents[:1], max_len, concat, final_cut)

    def test_full_build_differential(self):
        """The whole per-doc conversion against the reference build()
        internals: run their build() on a temp line-JSON file and diff
        every per-doc field."""
        import json
        import tempfile

        ref = _ref_builder()
        classes = {
            name: type(
                "E",
                (),
                {"FIELDS": list(fields)},
            )
            for name, fields in EVENT_FIELDS.items()
        }
        with tempfile.TemporaryDirectory() as td:
            src_fp = os.path.join(td, "raw.jsonl")
            dump_fp = os.path.join(td, "out.json")
            with open(src_fp, "w") as f:
                for d in raw_docs():
                    f.write(json.dumps(d, ensure_ascii=False) + "\n")
            ref.build(classes, src_fp, dump_fp, add_trigger=True)
            theirs = json.load(open(dump_fp))
        ours = build_rows(raw_docs(), EVENT_FIELDS)
        assert len(ours) == len(theirs)
        for mine, (guid, det) in zip(ours, theirs):
            assert mine["guid"] == str(guid)
            assert mine["doc_type"] == det["doc_type"]
            assert mine["sentences"] == det["sentences"]
            assert {
                s["text"]: [
                    [d["sent_idx"], d["char_s"], d["char_e"]]
                    for d in s["dranges"]
                ]
                for s in mine["spans"]
            } == det["ann_mspan2dranges"]
            assert {s["text"]: s["field"] for s in mine["spans"]} == det[
                "ann_mspan2guess_field"
            ]
            assert [
                [e["recguid"], e["type"], e["args"]] for e in mine["events"]
            ] == det["recguid_eventname_eventdict_list"]


@pytest.fixture(scope="module")
def rows():
    return build_rows(raw_docs(), EVENT_FIELDS)


class TestGoldFidelity:
    """North-rule gate, second instantiation: DuEE-shaped docs through
    the gold-span pipeline reconstruct every surviving annotated record
    exactly (micro P/R = 1.0)."""

    def test_builder_semantics_applied(self, rows):
        # duee-4 is m2m: the reference counts an event's TYPE toward
        # doc_type before the trigger-occurrence check drops it
        # (build_data.py:224-231) — the dropped 企业破产 still types the doc
        assert [r["doc_type"] for r in rows] == ["o2o", "o2m", "m2m", "m2m"]
        # the trigger-less 企业破产 event was dropped by the builder
        assert [e["type"] for e in rows[3]["events"]] == ["高管变动"]
        # the over-long comma sentence got recursively re-grouped
        assert all(len(s) <= 128 for s in rows[2]["sentences"][1:])

    @staticmethod
    def _run(spark, rows, mode):
        from docee_spark.refdata import (
            corpus_label_index,
            frames_from_rows,
            trigger_type_keywords,
        )
        from docee_spark.stages.evaluate import micro_scores
        from docee_spark.stages.pipeline import run_pipeline

        docs, gold = frames_from_rows(spark, rows, lang="zh")
        result = run_pipeline(
            docs,
            gold=gold,
            mode=mode,
            adjacency="gold",
            presegmented=True,
            event_types=DUEEFIN_EVENT_TYPES,
            type_keywords=trigger_type_keywords(rows),
            label2id=corpus_label_index(rows, DUEEFIN_EVENT_TYPES),
        )
        return result, micro_scores(result["stats"])

    def test_micro_pr_is_exact_clique(self, spark, rows):
        """The flagship PTPCG-analog decode reconstructs every surviving
        annotated record exactly on ALL doc shapes, m2m included."""
        result, scores = self._run(spark, rows, "clique")
        assert scores["precision"] == pytest.approx(1.0)
        assert scores["recall"] == pytest.approx(1.0)
        n_gold_args = sum(
            1
            for r in rows
            for ev in r["events"]
            for v in ev["args"].values()
            if v is not None
        )
        assert result["triples"].count() == n_gold_args

    def test_micro_pr_is_exact_edag_on_cue_local_docs(self, spark, rows):
        """EDAG mode is exact on docs whose arguments co-locate with cue
        sentences (o2o / o2m — duee-1/2/4)."""
        sub = [r for r in rows if r["guid"] != "duee-3"]
        _, scores = self._run(spark, sub, "edag")
        assert scores["precision"] == pytest.approx(1.0)
        assert scores["recall"] == pytest.approx(1.0)

    def test_edag_cue_gating_loss_is_pinned(self, spark, rows):
        """duee-3 (m2m with a shared cross-sentence 披露时间 in an
        UN-CUED sentence): the deterministic EDAG analog's documented
        cue-sentence gating (pyref/edag.py — the reference's EDAG types
        spans with a learned field classifier instead, doc2edag.py:563)
        drops exactly that argument from both records. Pinned: 33/35
        recall at 1.0 precision on the full fixture, so a semantics
        change here flags itself. The flagship clique decode on the
        same docs is exact (test above)."""
        _, scores = self._run(spark, rows, "edag")
        assert scores["precision"] == pytest.approx(1.0)
        assert scores["recall"] == pytest.approx(33 / 35)


class TestSharedSurfaceConflict:
    def test_shared_surface_role_conflict_is_lossy(self, spark):
        """One surface annotated with two ROLES across events: the
        builder's ann_mspan2guess_field keeps only the LAST role per
        surface (build_data.py:243-246), so the earlier role's argument
        is unrecoverable from the span inventory — precision stays 1.0,
        recall loses exactly that argument. Reference-faithful lossiness,
        pinned so a 'fix' would flag itself as a semantics change."""
        from docee_spark.refdata import (
            corpus_label_index,
            frames_from_rows,
            trigger_type_keywords,
        )
        from docee_spark.stages.evaluate import micro_scores
        from docee_spark.stages.pipeline import run_pipeline

        raw = {
            "id": "duee-conflict",
            "title": "F公司回购并亏损",
            "text": (
                "F实业股份有限公司实施回购，回购股份数量为8000股。"
                "F实业股份有限公司披露净亏损900万元，亏损变化为扩大。"
            ),
            "event_list": [
                {
                    "event_type": "股份回购",
                    "trigger": "回购",
                    "arguments": [
                        {"role": "回购方", "argument": "F实业股份有限公司"},
                        {"role": "回购股份数量", "argument": "8000股"},
                    ],
                },
                {
                    "event_type": "亏损",
                    "trigger": "亏损",
                    "arguments": [
                        {"role": "公司名称", "argument": "F实业股份有限公司"},
                        {"role": "净亏损", "argument": "900万元"},
                        {"role": "亏损变化", "argument": "扩大"},
                    ],
                },
            ],
        }
        rows = build_rows([raw], EVENT_FIELDS)
        # the surface carries the LAST role only
        fields = {s["text"]: s["field"] for s in rows[0]["spans"]}
        assert fields["F实业股份有限公司"] == "公司名称"
        docs, gold = frames_from_rows(spark, rows, lang="zh")
        result = run_pipeline(
            docs,
            gold=gold,
            mode="clique",
            adjacency="gold",
            presegmented=True,
            event_types=DUEEFIN_EVENT_TYPES,
            type_keywords=trigger_type_keywords(rows),
            label2id=corpus_label_index(rows, DUEEFIN_EVENT_TYPES),
        )
        s = micro_scores(result["stats"])
        n_gold = sum(
            1 for e in rows[0]["events"] for v in e["args"].values() if v
        )
        assert s["precision"] == pytest.approx(1.0)
        assert s["recall"] == pytest.approx((n_gold - 1) / n_gold)


class TestTrainedModelFidelity:
    """The trained-model slot on the DuEE shape: the numpy char tagger
    fit on these docs must reproduce every annotated mention drange and
    drive the model pipeline to exact reconstruction — same protocol as
    the WikiEvents gate, different language/segmentation/catalog."""

    @pytest.fixture(scope="class")
    def tagger(self, rows):
        from docee_spark.model.char_tagger import train_char_tagger
        from docee_spark.refdata import corpus_label_index

        l2i = corpus_label_index(rows, DUEEFIN_EVENT_TYPES)
        return train_char_tagger(rows, epochs=150, label2id=l2i)

    def test_trained_tagger_reconstructs_all_mentions(self, rows, tagger):
        for r in rows:
            gold = {
                (d["sent_idx"], d["char_s"], d["char_e"], sp["field"])
                for sp in r["spans"]
                for d in sp["dranges"]
            }
            pred = {
                (d["sent_idx"], d["char_s"], d["char_e"], sp["field"])
                for sp in tagger.doc_spans(r["sentences"])
                for d in sp["dranges"]
            }
            assert pred == gold, r["guid"]

    def test_model_pipeline_micro_pr(self, spark, rows, tagger):
        from docee_spark.refdata import (
            corpus_label_index,
            frames_from_rows,
            trigger_type_keywords,
        )
        from docee_spark.stages.evaluate import micro_scores
        from docee_spark.stages.pipeline import run_pipeline

        docs, gold = frames_from_rows(spark, rows, lang="zh")
        result = run_pipeline(
            docs,
            gold=gold,
            model=tagger,
            mode="clique",
            adjacency="gold",
            presegmented=True,
            event_types=DUEEFIN_EVENT_TYPES,
            type_keywords=trigger_type_keywords(rows),
            label2id=corpus_label_index(rows, DUEEFIN_EVENT_TYPES),
        )
        s = micro_scores(result["stats"])
        assert s["precision"] == pytest.approx(1.0)
        assert s["recall"] == pytest.approx(1.0)
