"""M6 — the trained adjacency scorer in the decode matrix slot."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def scorer():
    from docee_spark.golden import ensure_scorer

    return ensure_scorer()


class TestTriggerModeGuard:
    def test_adj_scorer_with_trigger_mode_raises(self, spark, web_df, scorer):
        """Scorer matrices are symmetric; trigger decode is defined over
        the trigger-role-derived DIRECTED adjacency. run_pipeline must
        refuse the combination instead of silently changing semantics."""
        from docee_spark.stages.pipeline import run_pipeline

        for mode in ("trigger", "trigger_incremental"):
            with pytest.raises(ValueError, match="trigger"):
                run_pipeline(web_df, entity_dict={}, mode=mode, adj_scorer=scorer)


class TestScorerQuality:
    def test_pair_auc_beats_chance(self, corpus, scorer):
        """Scored adjacency must reconstruct the gold pair labels well on
        held-out fixture docs (pair accuracy ≥ 0.9)."""
        from docee_spark.pyref.graph import adjacency_from_records

        _, gold_rows = corpus
        correct = total = 0
        for g in gold_rows:
            spans = g["spans"]
            if len(spans) < 2:
                continue
            fields = [s["field"] for s in spans]
            sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
            t2i = {s["text"]: i for i, s in enumerate(spans)}
            records = [
                [t2i[v] for v in ev["args"].values() if v is not None and v in t2i]
                for ev in g["events"]
            ]
            want = adjacency_from_records(len(spans), records)
            got = scorer.score_doc(fields, sents)
            for i in range(len(spans)):
                for j in range(i + 1, len(spans)):
                    total += 1
                    correct += int(got[i][j] == want[i][j])
        assert total > 0 and correct / total >= 0.9, correct / total

    @pytest.mark.slow  # e2e sweep; full suite covers it
    def test_pipeline_f1_close_to_sentence_adjacency(self, spark, web_df, gold_df, scorer):
        """decode over the scored matrix must be competitive with the
        deterministic sentence adjacency through the full pipeline."""
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.stages.evaluate import micro_scores, role_stats
        from docee_spark.stages.pipeline import run_pipeline

        res = run_pipeline(
            web_df, entity_dict=heuristic_entity_dict(), mode="clique",
            adj_scorer=scorer,
        )
        stats = role_stats(
            res["decoded"].select("doc_id", "events"),
            gold_df.select(
                __import__("pyspark.sql.functions", fromlist=["col"]).col(
                    "guid"
                ).alias("doc_id"),
                "doc_type",
                "events",
            ),
        )
        scores = micro_scores(stats)
        assert scores["f1"] >= 0.85, scores

    def test_matrix_shape_and_diagonal(self, scorer):
        adj = scorer.score_doc(["EquityHolder", "TradedShares"], [[0], [5]])
        assert len(adj) == 2 and all(len(r) == 2 for r in adj)
        assert adj[0][0] == 1 and adj[1][1] == 1
        # distant, but type-compatible pair — whatever the verdict, it is
        # symmetric
        assert adj[0][1] == adj[1][0]

    def test_artifact_roundtrip(self, scorer, tmp_path):
        import numpy as np

        from docee_spark.model.adj_scorer import load_scorer, save_scorer

        p = str(tmp_path / "s.npz")
        save_scorer(scorer, p)
        again = load_scorer(p)
        assert np.array_equal(again.w, scorer.w)
        assert again.threshold == scorer.threshold
