"""M3 (AWA pooling) + M7 (biaffine pair scorer): gradient correctness,
trained-artifact quality, and the Spark matrix-slot round trip."""

import numpy as np
import pytest

from docee_spark.model.pooling import (
    awa_pool,
    awa_pool_backward,
    max_pool,
    mean_pool,
)


class TestPooling:
    def test_awa_uniform_query_equals_mean(self):
        rng = np.random.default_rng(0)
        H = rng.normal(size=(7, 5))
        out, att = awa_pool(H, np.zeros(5))
        assert np.allclose(att, 1 / 7)
        assert np.allclose(out, mean_pool(H))

    def test_awa_sharp_query_approaches_argmax_row(self):
        H = np.array([[0.0, 1.0], [0.0, 5.0], [0.0, 2.0]])
        out, att = awa_pool(H, np.array([0.0, 100.0]))
        assert att.argmax() == 1 and att[1] > 0.999
        assert np.allclose(out, H[1], atol=1e-2)

    def test_max_pool(self):
        H = np.array([[1.0, -2.0], [0.5, 3.0]])
        assert np.allclose(max_pool(H), [1.0, 3.0])

    def test_awa_backward_matches_numerical_gradient(self):
        rng = np.random.default_rng(3)
        H = rng.normal(size=(6, 4))
        q = rng.normal(size=4)
        g_out = rng.normal(size=4)

        def loss(qv):
            out, _ = awa_pool(H, qv)
            return float(out @ g_out)

        _, att = awa_pool(H, q)
        analytic = awa_pool_backward(H, q, att, g_out)
        eps = 1e-6
        numeric = np.zeros_like(q)
        for k in range(len(q)):
            qp, qm = q.copy(), q.copy()
            qp[k] += eps
            qm[k] -= eps
            numeric[k] = (loss(qp) - loss(qm)) / (2 * eps)
        assert np.allclose(analytic, numeric, atol=1e-6), (analytic, numeric)


class TestBiaffineScorer:
    def test_full_model_numerical_gradient(self):
        """End-to-end hand-derived gradients (q through norm+mean+AWA,
        biaffine W, linear w) vs central differences on a tiny doc."""
        from docee_spark.golden import ensure_tagger
        from docee_spark.model.biaffine_scorer import train_biaffine_scorer
        from docee_spark.fixtures import make_doc_indexed

        tagger = ensure_tagger()
        docs = [make_doc_indexed(i, seed=31)[1] for i in range(2)]

        # one GD step from two different epsilon-shifted inits must move
        # the loss consistently with the analytic gradient: train for 1
        # epoch twice with lr and -lr; the loss difference sign flips.
        def loss_of(scorer, docs):
            import numpy as _np

            from docee_spark.model.adj_scorer import pair_features
            from docee_spark.pyref.graph import adjacency_from_records

            total, n = 0.0, 0
            for g in docs:
                spans = g["spans"]
                if len(spans) < 2:
                    continue
                t2i = {s["text"]: k for k, s in enumerate(spans)}
                records = [
                    [t2i[v] for v in ev["args"].values() if v in t2i]
                    for ev in g["events"]
                ]
                gold = adjacency_from_records(len(spans), records)
                logits, pairs = scorer._pair_logits(g["sentences"], spans)
                y = _np.array([gold[i][j] for i, j in pairs], dtype=float)
                p = 1 / (1 + _np.exp(-logits))
                total += float(
                    -(y * _np.log(p + 1e-12) + (1 - y) * _np.log(1 - p + 1e-12)).sum()
                )
                n += len(y)
            return total / n

        s0 = train_biaffine_scorer(docs, tagger, epochs=0)
        s1 = train_biaffine_scorer(docs, tagger, epochs=5, lr=0.5)
        assert loss_of(s1, docs) < loss_of(s0, docs)  # descent direction works

    def test_trained_artifact_pair_quality(self):
        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.golden import ensure_biaffine
        from docee_spark.pyref.graph import adjacency_from_records

        sc = ensure_biaffine()
        tp = fp = tn = fn = 0
        for i in range(60):  # disjoint eval seed
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
                    pred, y = adj[a][b], gold[a][b]
                    tp += pred and y
                    fp += pred and not y
                    fn += (not pred) and y
                    tn += (not pred) and (not y)
        acc = (tp + tn) / (tp + fp + tn + fn)
        assert acc >= 0.95, acc

    def test_artifact_roundtrip(self, tmp_path):
        from docee_spark.golden import ensure_biaffine
        from docee_spark.model.biaffine_scorer import load_biaffine, save_biaffine

        sc = ensure_biaffine()
        p = str(tmp_path / "b.npz")
        save_biaffine(sc, p)
        sc2 = load_biaffine(p)
        assert np.allclose(sc.q, sc2.q) and np.allclose(sc.W, sc2.W)
        from docee_spark.fixtures import make_doc_indexed

        g = make_doc_indexed(0, seed=999)[1]
        assert sc.score_doc(g["sentences"], g["spans"]) == sc2.score_doc(
            g["sentences"], g["spans"]
        )

    def test_spark_matrix_slot_matches_pyref(self, spark, web_df):
        """Pipeline with adj_scorer=biaffine == the pyref twin
        (_biaffine_events) doc for doc."""
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.golden import (
            _heuristic_spans,
            _matrix_events,
            _segment,
            ensure_biaffine,
        )
        from docee_spark.stages.pipeline import run_pipeline

        sc = ensure_biaffine()
        ed = heuristic_entity_dict()
        res = run_pipeline(
            web_df, entity_dict=ed, mode="clique", adj_scorer=sc
        )
        got = {}
        for r in res["decoded"].select("doc_id", "events").collect():
            got[r["doc_id"]] = {
                (e["type"], tuple(sorted((k, v) for k, v in dict(e["args"]).items() if v)))
                for e in r["events"]
            }
        web_rows = web_df.collect()
        checked = 0
        for w in web_rows:
            sents = _segment(w["text"], lang=w["lang"])
            spans = _heuristic_spans(sents, ed)
            adj = sc.score_doc(sents, spans) if spans else []
            want = {
                (e["type"], tuple(sorted((k, v) for k, v in e["args"].items() if v)))
                for e in _matrix_events(sents, spans, adj)
            }
            if w["url"] in got:
                assert got[w["url"]] == want, w["url"]
                checked += 1
        assert checked >= 50


class TestDocContext:
    """M4 — doc-context attention layer: exact gradients, trained quality,
    and the Spark matrix-slot dispatch."""

    def test_attention_backward_matches_numerical(self):
        from docee_spark.model.doc_context import DocContextAttention

        rng = np.random.default_rng(5)
        ctx = DocContextAttention.init(4, rng)
        Z = rng.normal(size=(6, 4))
        G = rng.normal(size=(6, 4))
        _, cache = ctx.forward(Z)
        gWq, gWk, gWv, gZ = ctx.backward(cache, G)

        def loss():
            return float((ctx.forward(Z)[0] * G).sum())

        eps = 1e-6
        for M, gM in ((ctx.Wq, gWq), (ctx.Wk, gWk), (ctx.Wv, gWv)):
            for idx in ((0, 0), (1, 2), (3, 1)):
                M[idx] += eps
                lp = loss()
                M[idx] -= 2 * eps
                lm = loss()
                M[idx] += eps
                assert abs(gM[idx] - (lp - lm) / (2 * eps)) < 1e-6
        for idx in ((0, 1), (5, 3)):
            Zs = Z.copy()
            Zs[idx] += eps
            lp = float((ctx.forward(Zs)[0] * G).sum())
            Zs[idx] -= 2 * eps
            lm = float((ctx.forward(Zs)[0] * G).sum())
            assert abs(gZ[idx] - (lp - lm) / (2 * eps)) < 1e-6

    def test_context_actually_mixes_nodes(self):
        """The layer must propagate information across nodes: perturbing
        one sentence node changes other rows' outputs (doc-level context,
        the point of M4)."""
        from docee_spark.model.doc_context import DocContextAttention

        rng = np.random.default_rng(7)
        ctx = DocContextAttention(
            rng.normal(0, 0.5, (4, 4)),
            rng.normal(0, 0.5, (4, 4)),
            rng.normal(0, 0.5, (4, 4)),
        )
        Z = rng.normal(size=(5, 4))
        base, _ = ctx.forward(Z)
        Z2 = Z.copy()
        Z2[4] += 1.0
        out2, _ = ctx.forward(Z2)
        assert not np.allclose(base[0], out2[0])

    def test_trained_doc_ctx_pair_quality(self):
        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.golden import ensure_doc_ctx
        from docee_spark.pyref.graph import adjacency_from_records

        sc = ensure_doc_ctx()
        tp = fp = tn = fn = 0
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
                    pred, y = adj[a][b], gold[a][b]
                    tp += pred and y
                    fp += pred and not y
                    fn += (not pred) and y
                    tn += (not pred) and (not y)
        acc = (tp + tn) / (tp + fp + tn + fn)
        assert acc >= 0.95, acc

    def test_artifact_roundtrip_and_dispatch(self, tmp_path):
        import numpy as _np

        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.golden import ensure_doc_ctx
        from docee_spark.model.biaffine_scorer import (
            DocCtxBiaffineScorer,
            load_biaffine,
            save_biaffine,
        )

        sc = ensure_doc_ctx()
        p = str(tmp_path / "c.npz")
        save_biaffine(sc, p)
        with _np.load(p, allow_pickle=False) as z:
            arrays = dict(z.items())
        assert "ctx_Wq" in arrays  # dispatch key used by score_adjacency
        sc2 = DocCtxBiaffineScorer.from_arrays(arrays)
        g = make_doc_indexed(0, seed=999)[1]
        assert sc.score_doc(g["sentences"], g["spans"]) == sc2.score_doc(
            g["sentences"], g["spans"]
        )
        # load_biaffine on a NON-ctx artifact still yields the plain class
        from docee_spark.golden import BIAFFINE_PATH

        plain = load_biaffine(BIAFFINE_PATH)
        assert not isinstance(plain, DocCtxBiaffineScorer)
