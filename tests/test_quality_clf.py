"""Model-based quality classifier (model/quality_clf.py): training
separability, numpy↔Spark scoring parity on both classes, and the
map-only plan contract."""

from __future__ import annotations

import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from docee_spark.golden import GOLDEN_DIR
from docee_spark.model.quality_clf import (
    QualityClassifier,
    grams_py,
    load_classifier,
    quality_model_scores,
    synth_corpus,
    train_quality_clf,
)

NPZ = os.path.join(GOLDEN_DIR, "quality_clf.npz")


@pytest.fixture(scope="module")
def clf() -> QualityClassifier:
    return load_classifier(NPZ)


class TestTraining:
    def test_frozen_model_separates_heldout(self, clf):
        docs, labels = synth_corpus(n_per_class=300, seed=99)  # unseen seed
        pred = np.array([1 if clf.keep(t) else 0 for t in docs])
        acc = float((pred == labels).mean())
        assert acc >= 0.97, acc

    def test_training_is_deterministic(self):
        docs, labels = synth_corpus(n_per_class=60, seed=5)
        a = train_quality_clf(docs, labels, epochs=30)
        b = train_quality_clf(docs, labels, epochs=30)
        assert np.array_equal(a.w_e6, b.w_e6) and a.b_e6 == b.b_e6

    def test_empty_doc_scores_bias_only(self, clf):
        assert clf.margin_e6("") == clf.b_e6
        assert clf.margin_e6("   ") == clf.b_e6


class TestSparkParity:
    def test_margin_matches_numpy_both_classes(self, spark, clf):
        docs, labels = synth_corpus(n_per_class=40, seed=123)
        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["margin_e6"], r["keep"])
            for r in quality_model_scores(df, clf).collect()
        }
        n_keep = 0
        for i, t in enumerate(docs):
            want_m = clf.margin_e6(t)
            assert got[i][0] == len(grams_py(t)), (i, t)
            assert got[i][1] == want_m, (i, t, got[i][1], want_m)
            assert got[i][2] == (1 if want_m > 0 else 0)
            n_keep += got[i][2]
        # both classes must actually appear in the Spark-side output
        assert 0 < n_keep < len(docs)

    def test_negative_margin_floor_division(self, spark, clf):
        # a doc made of pure gibberish grams: margin must be negative and
        # exactly the numpy value (exercises pmod floor-div on negatives)
        t = "qzx zzzz glorp wkwkwk qzx zzzz"
        df = spark.createDataFrame([(0, t)], "doc_id long, text string")
        row = quality_model_scores(df, clf).collect()[0]
        assert row["margin_e6"] == clf.margin_e6(t)
        assert row["margin_e6"] < 0 and row["keep"] == 0


class TestPlan:
    def test_map_only_no_shuffle_no_python(self, spark):
        import __spark_entry__ as em

        df = em.q_quality_model(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the SCORER is exchange-free; the driver query wraps it in ONE
        # round-robin repartition that un-serializes single-split test
        # scans (a no-op at production split counts). Any exchange must
        # be that round-robin — never a hash shuffle.
        assert plan.count("+- Exchange") <= 1, plan  # tree node, once
        assert "hashpartitioning" not in plan, plan
        assert "RoundRobinPartitioning" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # weight lookup must be a folded array literal, not a join
        assert "Join" not in plan, plan
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(m.group(1).split(",")) == {
            "doc_id:bigint",
            "text:string",
        }, plan
