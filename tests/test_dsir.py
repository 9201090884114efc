"""DSIR importance resampling (operators/dsir.py): Spark-vs-numpy score
parity on the frozen model, held-out target/source separation, the two
selection policies, and the training estimator's smoothing identity."""

from __future__ import annotations

import numpy as np
import pytest

from docee_spark.operators.dsir import (
    DsirModel,
    dsir_scores,
    dsir_select,
    synth_dsir_corpora,
    train_dsir,
)


def _frozen():
    import os

    from docee_spark.golden import GOLDEN_DIR
    from docee_spark.operators.dsir import load_dsir

    return load_dsir(os.path.join(GOLDEN_DIR, "dsir.npz"))


class TestDsirModel:
    def test_smoothing_identity_on_tiny_corpus(self):
        # one-gram corpora: every bucket weight is derivable by hand
        m = train_dsir(["alpha"], ["beta"], d=8)
        from docee_spark.model.quality_clf import bucket_py

        bt, bs = bucket_py("alpha", 8), bucket_py("beta", 8)
        want_t = round(
            (np.log(2 / 9) - np.log(1 / 9)) * 1e6
        )  # in target only
        assert int(m.logratio_e6[bt]) == int(want_t)
        assert int(m.logratio_e6[bs]) == -int(want_t)
        # untouched buckets: log(1/9) - log(1/9) = 0
        rest = [i for i in range(8) if i not in (bt, bs)]
        assert all(int(m.logratio_e6[i]) == 0 for i in rest)

    def test_heldout_separation_frozen_model(self):
        model = _frozen()
        t2, s2 = synth_dsir_corpora(n_per_side=100, seed=99)
        tw = np.mean([model.logw_e6(t) / max(1, len(t.split())) for t in t2])
        sw = np.mean([model.logw_e6(t) / max(1, len(t.split())) for t in s2])
        assert tw > 0 > sw

    def test_roundtrip(self, tmp_path):
        from docee_spark.operators.dsir import load_dsir, save_dsir

        m = train_dsir(["alpha beta"], ["gamma"], d=16)
        p = str(tmp_path / "m.npz")
        save_dsir(m, p)
        m2 = load_dsir(p)
        assert (m2.logratio_e6 == m.logratio_e6).all() and m2.d == 16


class TestDsirSpark:
    def test_spark_matches_numpy_reference(self, spark):
        model = _frozen()
        t2, s2 = synth_dsir_corpora(n_per_side=10, seed=123)
        rows = [(i, t) for i, t in enumerate(t2 + s2 + ["", "   "])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["logw_e6"])
            for r in dsir_scores(df, model).collect()
        }
        from docee_spark.model.quality_clf import grams_py

        for i, t in rows:
            assert got[i] == (len(grams_py(t)), model.logw_e6(t)), i

    def test_threshold_and_topk_selection(self, spark):
        model = _frozen()
        t2, s2 = synth_dsir_corpora(n_per_side=15, seed=5)
        rows = [(i, t) for i, t in enumerate(t2 + s2)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kept = dsir_select(df, model, keep_threshold_e6=0)
        ids = {r["doc_id"] for r in kept.collect()}
        # every held-out TARGET doc survives a 0 threshold; the pure-web
        # source docs (logw < 0 by construction) do not
        assert set(range(15)) <= ids
        scored = {r["doc_id"]: r["logw_e6"] for r in dsir_scores(df, model).collect()}
        assert ids == {i for i, w in scored.items() if w >= 0}
        top = [r["doc_id"] for r in dsir_select(df, model, top_k=5).collect()]
        want = sorted(scored, key=lambda i: (-scored[i], i))[:5]
        assert top == want

    def test_select_arg_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dsir_select(df, _frozen())
        with pytest.raises(ValueError):
            dsir_select(df, _frozen(), keep_threshold_e6=0, top_k=3)
