"""M1 — the trained batched tagger in the tag-stage model slot.

Covers the three claims of the slot contract:
  1. quality: the model reproduces gold-fixture events at P/R ≥ 0.95
     through the FULL pipeline (tag_model → gold-adjacency clique decode
     → evaluate), i.e. the learned spans are pipeline-grade;
  2. once-per-worker load: weight deserialization is cached per
     (process, broadcast) — batches never re-deserialize;
  3. determinism: the committed .npz artifact reproduces the golden
     triples (the driver oracle also pins this at sf0.01).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tagger():
    from docee_spark.golden import ensure_tagger

    return ensure_tagger()


class TestModelQuality:
    def test_pipeline_micro_prf_above_095(self, spark, web_df, gold_df, tagger):
        from docee_spark.stages.evaluate import micro_scores
        from docee_spark.stages.pipeline import run_pipeline

        res = run_pipeline(
            web_df, gold=gold_df, model=tagger, mode="clique", adjacency="gold"
        )
        scores = micro_scores(res["stats"])
        assert scores["precision"] >= 0.95, scores
        assert scores["recall"] >= 0.95, scores

    def test_mention_level_spans(self, corpus, tagger):
        """Span reconstruction vs gold annotations, outside Spark."""
        _, gold_rows = corpus
        tp = fp = fn = 0
        for g in gold_rows:
            pred = {
                (sp["text"], sp["field"], (d["sent_idx"], d["char_s"], d["char_e"]))
                for sp in tagger.doc_spans(g["sentences"])
                for d in sp["dranges"]
            }
            want = {
                (sp["text"], sp["field"], (d["sent_idx"], d["char_s"], d["char_e"]))
                for sp in g["spans"]
                for d in sp["dranges"]
            }
            tp += len(pred & want)
            fp += len(pred - want)
            fn += len(want - pred)
        p, r = tp / (tp + fp), tp / (tp + fn)
        assert p >= 0.95 and r >= 0.95, (p, r)


class TestLoadOnce:
    def test_broadcast_cache_deserializes_once(self, spark, tagger):
        from docee_spark.stages import tag

        bc = spark.sparkContext.broadcast(tagger.to_arrays())
        tag._MODEL_CACHE.clear()
        before = tag.MODEL_LOADS
        t1 = tag._tagger_from_broadcast(bc)
        t2 = tag._tagger_from_broadcast(bc)
        assert t1 is t2
        assert tag.MODEL_LOADS == before + 1
        # a different broadcast is a different model → one more load
        bc2 = spark.sparkContext.broadcast(tagger.to_arrays())
        tag._tagger_from_broadcast(bc2)
        assert tag.MODEL_LOADS == before + 2


class TestBioStructure:
    def test_viterbi_never_emits_dangling_I(self, corpus, tagger):
        """The transition mask must make every I-x follow B-x/I-x."""
        _, gold_rows = corpus
        for g in gold_rows[:10]:
            for labs in tagger.predict_sent_labels(g["sentences"]):
                prev = 0
                for lab in labs:
                    if lab != 0 and lab % 2 == 0:  # I- label
                        assert prev in (lab - 1, lab), labs
                    prev = lab

    def test_artifact_roundtrip(self, tagger, tmp_path):
        import numpy as np

        from docee_spark.model.char_tagger import load_tagger, save_tagger

        p = str(tmp_path / "t.npz")
        save_tagger(tagger, p)
        again = load_tagger(p)
        assert again.labels == tagger.labels
        assert again.offsets == tagger.offsets
        assert np.array_equal(again.W, tagger.W)
        s = "公告EquityPledge事件：Pledger为张伟明。"
        assert again.predict_sent_labels([s]) == tagger.predict_sent_labels([s])


class TestFixEntSnapping:
    """J4 — fix_ent modes n/-/f (reference doc_info.py:196-254)."""

    SENTS = ["公告：TradedShares为5800300股，确认。", "张伟明已知悉。"]

    def _spans(self, text, cs, ce, field="TradedShares", sent=0):
        return [
            {
                "text": text,
                "field": field,
                "dranges": [{"sent_idx": sent, "char_s": cs, "char_e": ce}],
            }
        ]

    def test_mode_n_untouched(self):
        from docee_spark.pyref.textproc import fix_ent_spans

        spans = self._spans("5800300", 16, 23)  # truncated prediction
        assert fix_ent_spans(self.SENTS, spans, "n") == spans

    def test_mode_f_snaps_prefix_to_full_entity(self):
        from docee_spark.pyref.textproc import fix_ent_spans

        spans = self._spans("5800300", 16, 23)  # "股" missing
        [fixed] = fix_ent_spans(self.SENTS, spans, "f")
        assert fixed["text"] == "5800300股"
        assert fixed["dranges"] == [{"sent_idx": 0, "char_s": 16, "char_e": 24}]
        assert fixed["field"] == "TradedShares"

    def test_mode_dash_drops_unmatched(self):
        from docee_spark.pyref.textproc import fix_ent_spans

        spans = self._spans("5800300", 16, 23)
        assert fix_ent_spans(self.SENTS, spans, "-") == []

    def test_exact_match_kept_in_all_modes(self):
        from docee_spark.pyref.textproc import fix_ent_spans

        spans = self._spans("5800300股", 16, 24)
        for mode in ("n", "-", "f"):
            [kept] = fix_ent_spans(self.SENTS, spans, mode)
            assert kept["text"] == "5800300股"

    def test_non_regex_fields_pass_through(self):
        from docee_spark.pyref.textproc import fix_ent_spans

        spans = self._spans("张伟明", 0, 3, field="EquityHolder", sent=1)
        for mode in ("-", "f"):
            assert fix_ent_spans(self.SENTS, spans, mode) == spans

    def test_spark_stage_applies_fix(self, spark, tagger):
        """tag_model(ent_fix_mode='f') through the Spark slot: a doc whose
        model output truncates a share must come back snapped."""
        from pyspark.sql import functions as F

        from docee_spark.stages.segment import segment
        from docee_spark.stages.tag import tag_model

        docs = spark.createDataFrame(
            [("d1", "zh", "公告EquityUnderweight减持事件：TradedShares为5800300股，确认。")],
            "doc_id string, lang string, text string",
        )
        out = tag_model(segment(docs), tagger, ent_fix_mode="f").select(
            F.explode("spans").alias("sp")
        )
        texts = {r["sp"]["text"] for r in out.collect()}
        # whatever the model emitted, no truncated share survives mode f
        assert not any(t.isdigit() for t in texts)


class TestModelEdagPath:
    def test_doc2edag_shape_pipeline_prf(self, spark, web_df, gold_df, tagger):
        """The Doc2EDAG-shaped path — trained tagger (exact role fields)
        → true EDAG per-role expansion → triples — must clear the north
        rule's P/R ≥ 0.95 against gold through the FULL pipeline."""
        from pyspark.sql import functions as F

        from docee_spark.stages.evaluate import micro_scores, role_stats
        from docee_spark.stages.pipeline import run_pipeline

        res = run_pipeline(web_df, model=tagger, mode="edag", adjacency="sentence")
        stats = role_stats(
            res["decoded"].select("doc_id", "events"),
            gold_df.select(F.col("guid").alias("doc_id"), "doc_type", "events"),
        )
        scores = micro_scores(stats)
        assert scores["precision"] >= 0.95 and scores["recall"] >= 0.95, scores
