"""G10 — GIT RGCN scorer analog: graph construction, exact gradients,
trained quality, pipeline slot parity (model/rgcn.py vs reference
dee/models/git.py:892-1020)."""

from __future__ import annotations

import numpy as np
import pytest


class TestGitGraph:
    def test_typed_adjacencies_shape_and_normalization(self):
        from docee_spark.model.rgcn import RELATIONS, git_graph_mats

        # 3 spans: 0 in sent 0; 1 in sents 0,1; 2 in sent 2 — 3 sentences
        mats = git_graph_mats(3, [[0], [0, 1], [2]], 3)
        assert set(mats) == set(RELATIONS)
        n = 6
        for A in mats.values():
            assert A.shape == (n, n)
            rs = A.sum(axis=1)
            assert np.all((np.isclose(rs, 1.0)) | (rs == 0.0))
        # ss: every sentence node receives from both others
        assert mats["ss"][3, 4] > 0 and mats["ss"][3, 5] > 0
        assert mats["ss"][3, 3] == 0
        # sm: span 1 receives from sentence nodes 3 (sent 0) and 4 (sent 1)
        assert mats["sm"][1, 3] > 0 and mats["sm"][1, 4] > 0
        assert mats["sm"][1, 5] == 0
        # ms: sentence 0 (node 3) receives from spans 0 and 1
        assert mats["ms"][3, 0] > 0 and mats["ms"][3, 1] > 0
        assert mats["ms"][3, 2] == 0
        # mm: spans 0 and 1 share sentence 0; span 2 is isolated
        assert mats["mm"][0, 1] > 0 and mats["mm"][1, 0] > 0
        assert mats["mm"][0, 2] == 0 and mats["mm"][2, 0] == 0

    def test_span_level_graph_matches_git_edge_semantics(self):
        """The scorer's span-level relations are the git.py edge types
        with mentions collapsed to spans: s-s complete, s-m containment,
        m-m co-sentence (the same-entity branch is degenerate — a span IS
        its entity)."""
        from docee_spark.model.rgcn import git_graph_mats

        rng = np.random.default_rng(3)
        for _ in range(20):
            n_spans = int(rng.integers(1, 6))
            n_sents = int(rng.integers(1, 5))
            sids = [
                sorted(
                    rng.choice(
                        n_sents,
                        size=int(rng.integers(1, n_sents + 1)),
                        replace=False,
                    ).tolist()
                )
                for _ in range(n_spans)
            ]
            mats = git_graph_mats(n_spans, sids, n_sents)
            for i in range(n_spans):
                for j in range(n_spans):
                    want = i != j and bool(set(sids[i]) & set(sids[j]))
                    assert (mats["mm"][i, j] > 0) == want


class TestRelGraphConv:
    def test_backward_matches_numerical(self):
        from docee_spark.model.rgcn import (
            RELATIONS,
            RelGraphConv,
            git_graph_mats,
        )

        rng = np.random.default_rng(11)
        gcn = RelGraphConv.init(4, rng)
        mats = git_graph_mats(3, [[0], [0, 1], [1]], 2)
        Z = rng.normal(size=(5, 4))
        G = rng.normal(size=(5, 4))
        _, cache = gcn.forward(Z, mats)
        gWs, gZ = gcn.backward(cache, G)

        eps = 1e-6
        for r in RELATIONS:
            M = gcn.Ws[r]
            for idx in ((0, 0), (1, 2), (3, 1)):
                M[idx] += eps
                lp = float((gcn.forward(Z, mats)[0] * G).sum())
                M[idx] -= 2 * eps
                lm = float((gcn.forward(Z, mats)[0] * G).sum())
                M[idx] += eps
                assert abs(gWs[r][idx] - (lp - lm) / (2 * eps)) < 1e-6
        for idx in ((0, 1), (4, 3)):
            Zs = Z.copy()
            Zs[idx] += eps
            lp = float((gcn.forward(Zs, mats)[0] * G).sum())
            Zs[idx] -= 2 * eps
            lm = float((gcn.forward(Zs, mats)[0] * G).sum())
            assert abs(gZ[idx] - (lp - lm) / (2 * eps)) < 1e-6

    def test_messages_propagate_across_graph(self):
        """Perturbing a sentence node must change span rows it feeds
        (doc-level enrichment, the point of the GNN)."""
        from docee_spark.model.rgcn import RelGraphConv, git_graph_mats

        rng = np.random.default_rng(7)
        gcn = RelGraphConv(
            {r: rng.normal(0, 0.5, (4, 4)) for r in ("ss", "sm", "ms", "mm")}
        )
        mats = git_graph_mats(2, [[0], [1]], 2)
        Z = rng.normal(size=(4, 4))
        base, _ = gcn.forward(Z, mats)
        Z2 = Z.copy()
        Z2[2] += 1.0  # sentence 0's node
        out2, _ = gcn.forward(Z2, mats)
        assert not np.allclose(base[0], out2[0])  # span 0 ← sent 0
        assert np.allclose(base[1] - Z[1], out2[1] - Z2[1])  # span 1 ↚ sent 0


class TestTrainedGitRgcn:
    def test_trained_pair_quality_held_out(self):
        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.golden import ensure_git_rgcn
        from docee_spark.pyref.graph import adjacency_from_records

        sc = ensure_git_rgcn()
        tot = ok = 0
        for i in range(60):
            g = make_doc_indexed(i, seed=999)[1]
            spans = g["spans"]
            if len(spans) < 2:
                continue
            t2i = {s["text"]: k for k, s in enumerate(spans)}
            records = [
                [t2i[v] for v in ev["args"].values() if v in t2i]
                for ev in g["events"]
            ]
            gold = adjacency_from_records(len(spans), records)
            adj = sc.score_doc(g["sentences"], spans)
            for a in range(len(spans)):
                for b in range(a + 1, len(spans)):
                    tot += 1
                    ok += int(adj[a][b] == gold[a][b])
        assert ok / tot >= 0.95, ok / tot

    def test_roundtrip_serialization(self):
        from docee_spark.golden import ensure_git_rgcn
        from docee_spark.model.rgcn import GitRgcnScorer
        from docee_spark.fixtures import make_doc_indexed

        sc = ensure_git_rgcn()
        sc2 = GitRgcnScorer.from_arrays(sc.to_arrays())
        g = make_doc_indexed(0, seed=999)[1]
        assert sc.score_doc(g["sentences"], g["spans"]) == sc2.score_doc(
            g["sentences"], g["spans"]
        )

    @pytest.mark.usefixtures()
    def test_spark_matrix_slot_matches_pyref(self, spark, web_df):
        """Pipeline with adj_scorer=git_rgcn == the pyref twin doc for
        doc (broadcast dispatch via the rgcn_* artifact keys)."""
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.golden import (
            _heuristic_spans,
            _matrix_events,
            _segment,
            ensure_git_rgcn,
        )
        from docee_spark.stages.pipeline import run_pipeline

        sc = ensure_git_rgcn()
        ed = heuristic_entity_dict()
        res = run_pipeline(web_df, entity_dict=ed, mode="clique", adj_scorer=sc)
        got = {}
        for r in res["decoded"].select("doc_id", "events").collect():
            got[r["doc_id"]] = {
                (
                    e["type"],
                    tuple(sorted((k, v) for k, v in dict(e["args"]).items() if v)),
                )
                for e in r["events"]
            }
        checked = 0
        for w in web_df.collect():
            sents = _segment(w["text"], lang=w["lang"])
            spans = _heuristic_spans(sents, ed)
            adj = sc.score_doc(sents, spans) if spans else []
            want = {
                (
                    e["type"],
                    tuple(sorted((k, v) for k, v in e["args"].items() if v)),
                )
                for e in _matrix_events(sents, spans, adj)
            }
            if w["url"] in got:
                assert got[w["url"]] == want, w["url"]
                checked += 1
        assert checked >= 50
