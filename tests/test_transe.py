"""TransE KG completion (model/transe.py + operators/kgcomplete.py):
frozen-model quality gate on held-out composition facts, exact
Spark-vs-numpy score and rank parity, OOV NULL surfacing, and top-k
prediction shape."""

from __future__ import annotations

import pytest

from docee_spark.golden import ensure_transe
from docee_spark.model.transe import synth_kg
from docee_spark.operators.kgcomplete import (
    emb_tables,
    predict_links,
    ranking_eval,
    score_edges,
)


@pytest.fixture(scope="module")
def model():
    return ensure_transe()


@pytest.fixture(scope="module")
def kg():
    return synth_kg()


class TestTranseModel:
    def test_heldout_quality_gate(self, model, kg):
        # the frozen model must actually have LEARNED the composition:
        # held-out citizen_of facts (never trained) rank near the top
        _, held = kg
        ranks = [model.rank_py(s, r, o) for s, r, o in held]
        hits3 = sum(r <= 3 for r in ranks) / len(ranks)
        assert hits3 >= 0.9, f"held-out hits@3 {hits3:.2f}"
        assert sum(ranks) / len(ranks) <= 3.0

    def test_scores_are_integers(self, model):
        sc = model.score_py("person0", "citizen_of", "country0")
        assert isinstance(sc, int) and sc <= 0


class TestSparkParity:
    def test_score_edges_matches_numpy(self, spark, model, kg):
        train, held = kg
        sample = (train + held)[::7]
        df = spark.createDataFrame(sample, "subj string, pred string, obj string")
        ent, rel = emb_tables(spark, model)
        got = {
            (r["subj"], r["pred"], r["obj"]): r["score_e6"]
            for r in score_edges(df, ent, rel).collect()
        }
        assert got == {
            (s, p, o): model.score_py(s, p, o) for s, p, o in sample
        }

    def test_oov_is_null_not_dropped(self, spark, model):
        df = spark.createDataFrame(
            [("person0", "citizen_of", "atlantis")],
            "subj string, pred string, obj string",
        )
        ent, rel = emb_tables(spark, model)
        [r] = score_edges(df, ent, rel).collect()
        assert r["score_e6"] is None

    def test_ranking_eval_matches_numpy(self, spark, model, kg):
        _, held = kg
        sample = held[::5]
        df = spark.createDataFrame(sample, "subj string, pred string, obj string")
        ent, rel = emb_tables(spark, model)
        got = {
            (r["subj"], r["obj"]): r["rank"]
            for r in ranking_eval(df, ent, rel).collect()
        }
        assert got == {
            (s, o): model.rank_py(s, r, o) for s, r, o in sample
        }

    def test_predict_links_topk(self, spark, model, kg):
        _, held = kg
        df = spark.createDataFrame(held[:4], "subj string, pred string, obj string")
        ent, rel = emb_tables(spark, model)
        rows = predict_links(df, ent, rel, k=3).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault((r["subj"], r["pred"]), []).append(r)
        for (s, p), rs in by_q.items():
            assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == [1, 2, 3]
            # rank-1 prediction agrees with the numpy ranker: the true
            # object of a rank-1 test triple IS the top prediction
        top = {q: min(rs, key=lambda r: r["rank"])["obj"] for q, rs in by_q.items()}
        for s, p, o in held[:4]:
            if model.rank_py(s, p, o) == 1:
                assert top[(s, p)] == o
