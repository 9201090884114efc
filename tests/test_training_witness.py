"""Independent SQL witness for the TRAINING of the frozen logistic scorers.

The round-4 verdict listed "independent witness for model training" as the
last evidential gap: inference carries decode-independent SQL oracles
(`docee_triples_scored`, `quality_model`, `model_spans_spot`), but the
training loops only carried held-out accuracy pins — the frozen weights
were trusted as the spec. For the two purely logistic trained components
the training itself is relational and therefore *replayable by an
independent engine*: one full-batch gradient-descent epoch is

    p_i    = sigmoid(Σ_j X_ij · w_j)          -- join + groupBy over i
    g_j    = Σ_i X_ij · (p_i − y_i) / n       -- join + groupBy over j
    w_j   ←  w_j − lr · (g_j + λ·w_j)         -- projection

so DuckDB can re-run every epoch from the committed initialization over
the exact training matrix and must land on the shipped artifact.

Scope of the witness: the gradient/update MATH is re-executed by DuckDB
(float64) against numpy's result; the featurization and the seeded
initial weights are shared *inputs* (data, not math — the featurization
is independently oracle-checked at inference time by `quality_model` and
`docee_triples_scored`). The non-convex trained components (char tagger,
TransE, biaffine, doc-context, RGCN) have no such replay — their
evidence remains held-out accuracy pins + decode-independent inference
oracles (`model_spans_spot` re-derives the tagger's Viterbi in SQL).

Reference anchor: the adj scorer fills the PTPCG pair-scorer slot
(dee/models/trigger_aware.py:375-387); training semantics documented in
docee_spark/model/adj_scorer.py.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docee_spark.golden import (  # noqa: E402
    SCORER_PATH,
    SCORER_TRAIN_DOCS,
    SCORER_TRAIN_SEED,
)


def _long_form(X: np.ndarray) -> pd.DataFrame:
    """Dense (n, d) matrix → sparse long table (i, j, x), zeros dropped."""
    ii, jj = np.nonzero(X)
    return pd.DataFrame(
        {"i": ii.astype(np.int64), "j": jj.astype(np.int64),
         "x": X[ii, jj].astype(np.float64)}
    )


class TestAdjScorerTrainingWitness:
    """M6 pair scorer: 30 epochs, lr=0.5, no regularization, float32."""

    def test_sql_gd_replay_matches_shipped_artifact(self):
        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.model.adj_scorer import load_scorer, training_matrix

        shipped = load_scorer(SCORER_PATH)
        train_docs = [
            make_doc_indexed(i, seed=SCORER_TRAIN_SEED)[1]
            for i in range(SCORER_TRAIN_DOCS)
        ]
        X, y = training_matrix(train_docs)

        # The seeded init is an input, not math: reproduce it and hand the
        # floats to SQL as literals (same role as the committed artifact's
        # random seed — nothing about the *training* is taken on faith).
        rng = np.random.default_rng(17)
        w0 = rng.normal(0.0, 0.01, size=X.shape[1]).astype(np.float32)

        con = duckdb.connect()
        con.register("feat_v", _long_form(X))
        con.register(
            "lab_v",
            pd.DataFrame(
                {"i": np.arange(len(y), dtype=np.int64),
                 "y": y.astype(np.float64)}
            ),
        )
        con.execute("CREATE TABLE feat AS SELECT * FROM feat_v")
        con.execute("CREATE TABLE lab AS SELECT * FROM lab_v")
        w0_vals = ", ".join(
            "({}, {!r})".format(j, float(w0[j])) for j in range(len(w0))
        )
        con.execute(
            "CREATE TABLE w AS SELECT * FROM (VALUES {}) t(j, w)".format(w0_vals)
        )
        n = len(y)
        # One epoch = one CREATE OR REPLACE (materialized per pass — a
        # single 30-deep CTE chain would be inlined and re-evaluated
        # exponentially, the same reason the engine's iterative graph ops
        # localCheckpoint per pass).
        step = f"""
        CREATE OR REPLACE TABLE w AS
        SELECT wp.j, wp.w - 0.5 * COALESCE(g.g, 0) AS w
        FROM w wp LEFT JOIN (
          SELECT f.j, SUM(f.x * (p.p - p.y)) / {n} AS g
          FROM feat f JOIN (
            SELECT l.i, l.y, 1.0/(1.0+exp(-COALESCE(z.z, 0))) AS p
            FROM lab l LEFT JOIN (
              SELECT f2.i, SUM(f2.x * wq.w) AS z
              FROM feat f2 JOIN w wq USING (j) GROUP BY f2.i
            ) z ON l.i = z.i
          ) p ON f.i = p.i
          GROUP BY f.j
        ) g ON wp.j = g.j
        """
        for _ in range(30):
            con.execute(step)
        w_sql = np.array(
            [r[1] for r in con.execute("SELECT j, w FROM w ORDER BY j").fetchall()]
        )

        # numpy trains in float32, DuckDB replays in float64: agreement is
        # bounded by 30 epochs of float32 rounding (measured ~3e-6).
        assert w_sql.shape == shipped.w.shape
        assert float(np.abs(w_sql - shipped.w.astype(np.float64)).max()) < 1e-4

        # And the part that feeds decode — the binarized adjacency decision
        # sigmoid(X·w) ≥ τ — agrees EXACTLY on every training pair.
        cut = np.log(shipped.threshold / (1.0 - shipped.threshold))
        dec_np = (X.astype(np.float64) @ shipped.w.astype(np.float64)) >= cut
        dec_sql = (X.astype(np.float64) @ w_sql) >= cut
        assert bool((dec_np == dec_sql).all())


class TestQualityClfTrainingWitness:
    """Quality filter: 200 epochs, lr=0.5, L2=1e-4 on weights (not bias),
    float64 on both sides → the e6-quantized shipped integers must be
    reproduced BIT-EXACTLY by the SQL replay."""

    @pytest.mark.slow
    def test_sql_gd_replay_is_bit_exact_on_quantized_artifact(self):
        from docee_spark.model.quality_clf import (
            D_BUCKETS,
            load_classifier,
            synth_corpus,
            training_features,
        )

        path = os.path.join(
            os.path.dirname(__file__), "..", "golden_fixtures", "quality_clf.npz"
        )
        clf = load_classifier(path)
        docs, labels = synth_corpus(n_per_class=1500, seed=42)
        docs, labels = docs[:-600], labels[:-600]  # tools/train_quality_clf.py split
        feats = training_features(docs, D_BUCKETS)
        n_docs, d = feats.shape
        assert d == clf.d

        con = duckdb.connect()
        con.register("feat_v", _long_form(feats))
        con.register(
            "lab_v",
            pd.DataFrame(
                {"i": np.arange(n_docs, dtype=np.int64),
                 "y": labels.astype(np.float64)}
            ),
        )
        con.execute("CREATE TABLE feat AS SELECT * FROM feat_v")
        con.execute("CREATE TABLE lab AS SELECT * FROM lab_v")
        # j = d is the bias: implicit all-ones feature, excluded from L2 —
        # exactly train_quality_clf's update (w gets l2·w, b does not).
        con.execute(
            f"CREATE TABLE w AS SELECT range AS j, 0.0 AS w FROM range({d + 1})"
        )
        lr, l2 = 0.5, 1e-4
        step = f"""
        CREATE OR REPLACE TABLE w AS
        SELECT wp.j,
               wp.w - {lr} * (COALESCE(g.g, 0)
                              + CASE WHEN wp.j < {d} THEN {l2} * wp.w
                                     ELSE 0 END) AS w
        FROM w wp LEFT JOIN (
          SELECT f.j, SUM(f.x * p.g) / {n_docs} AS g
          FROM (
            SELECT i, j, x FROM feat
            UNION ALL
            SELECT i, {d} AS j, 1.0 AS x FROM lab
          ) f JOIN (
            SELECT l.i, 1.0/(1.0+exp(-(COALESCE(z.z, 0) + b.w))) - l.y AS g
            FROM lab l
            CROSS JOIN (SELECT w FROM w WHERE j = {d}) b
            LEFT JOIN (
              SELECT f2.i, SUM(f2.x * wq.w) AS z
              FROM feat f2 JOIN w wq USING (j) GROUP BY f2.i
            ) z ON l.i = z.i
          ) p ON f.i = p.i
          GROUP BY f.j
        ) g ON wp.j = g.j
        """
        for _ in range(200):
            con.execute(step)
        res = con.execute("SELECT j, w FROM w ORDER BY j").fetchall()
        w_sql = np.array([r[1] for r in res])

        w_e6_sql = np.round(w_sql[:d] * 1e6).astype(np.int64)
        b_e6_sql = int(round(w_sql[d] * 1e6))
        # e6 quantization absorbs cross-engine float64 summation-order
        # drift entirely: every one of the 512 shipped integers + the bias
        # is reproduced exactly.
        assert bool((w_e6_sql == clf.w_e6).all())
        assert b_e6_sql == clf.b_e6


class TestCharTaggerTrainingWitness:
    """M1 char tagger: per-char softmax-CE SGD over shuffled sentence
    minibatches (10 epochs × 21 steps of 256 sentences), replayed step
    by step in SQL — each step is emissions (join+groupBy), softmax
    (two window functions), gradient scatter (join+groupBy), update
    (left join).

    Unlike the two convex-to-quantization components above, this
    trajectory is CHAOTIC at the weight level: the objective is convex
    but minibatch SGD with per-char steps never converges, so the
    endpoint depends on the exact float trajectory — measured: a
    float64 numpy re-run of the identical schedule differs from the
    shipped float32 artifact by up to ~5 in a 3% tail of cells (median
    1e-9), and even two float64 executions that differ only in
    summation order separate by ~4 at those same cells. No weight-level
    pin is possible at ANY precision, so the honest witness is
    behavioral: the SQL-trained weights must (a) agree with the shipped
    artifact on the bulk of the tensor, (b) make identical span
    decisions on ≥98% of training docs and ≥97% of a held-out stream,
    and (c) clear the SAME held-out mention-P/R ≥ 0.95 quality gate the
    shipped artifact is pinned to (tests/test_model_tagger.py)."""

    @pytest.mark.slow
    def test_sql_sgd_replay_is_behaviorally_equivalent(self):
        from docee_spark.golden import (
            TAGGER_TRAIN_DOCS,
            TAGGER_TRAIN_SEED,
            ensure_tagger,
        )
        from docee_spark.fixtures import make_doc_indexed
        from docee_spark.model import char_tagger as ct

        shipped = ensure_tagger()
        train_docs = [
            make_doc_indexed(i, seed=TAGGER_TRAIN_SEED)[1]
            for i in range(TAGGER_TRAIN_DOCS)
        ]
        # golden.ensure_tagger's exact hyperparameters
        epochs, lr, batch_sents, seed = 10, 0.2, 256, 13
        offsets = tuple(range(-14, 9))
        sents_all, labs_all, labels = ct.training_sentences(train_docs)
        vocab = ct._build_vocab([[s] for s in sents_all])
        assert vocab == shipped.vocab
        n_labels = len(labels)
        V = len(vocab) + 2

        # ---- input relations: per-(char, offset) feature ids and gold
        # labels. Out-of-sentence neighbours map to PAD — a real feature
        # (the boundary indicator) that both receives gradient and feeds
        # emissions, exactly as the numpy scatter does.
        ids_cat = np.concatenate(
            [
                np.array([vocab.get(c, ct._UNK) for c in s], dtype=np.int32)
                for s in sents_all
            ]
        )
        lens = np.array([len(s) for s in sents_all], dtype=np.int64)
        sent_col = np.repeat(np.arange(len(sents_all), dtype=np.int32), lens)
        pos_col = np.concatenate([np.arange(n, dtype=np.int32) for n in lens])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        f_sent, f_pos, f_o, f_v = [], [], [], []
        for oi, off in enumerate(offsets):
            tgt = pos_col + off
            valid = (tgt >= 0) & (tgt < lens[sent_col])
            v = np.full(len(pos_col), ct._PAD, dtype=np.int32)
            v[valid] = ids_cat[starts[sent_col[valid]] + tgt[valid]]
            f_sent.append(sent_col)
            f_pos.append(pos_col)
            f_o.append(np.full(len(pos_col), oi, dtype=np.int32))
            f_v.append(v)
        feats = pd.DataFrame(
            {"sent": np.concatenate(f_sent), "pos": np.concatenate(f_pos),
             "o": np.concatenate(f_o), "v": np.concatenate(f_v)}
        )
        gold = pd.DataFrame(
            {"sent": sent_col, "pos": pos_col,
             "y": np.concatenate([np.array(li, dtype=np.int32) for li in labs_all])}
        )
        # The seeded minibatch schedule is an input (data, not math),
        # like the two initializations above.
        rng = np.random.default_rng(seed)
        order = np.arange(len(sents_all))
        sched_step, sched_sent = [], []
        step = 0
        for _ in range(epochs):
            rng.shuffle(order)
            for s0 in range(0, len(order), batch_sents):
                idx = order[s0 : s0 + batch_sents]
                sched_step.append(np.full(len(idx), step, dtype=np.int32))
                sched_sent.append(idx.astype(np.int32))
                step += 1
        batches = pd.DataFrame(
            {"step": np.concatenate(sched_step), "sent": np.concatenate(sched_sent)}
        )

        con = duckdb.connect()
        con.register("feats_v", feats)
        con.register("gold_v", gold)
        con.register("batches_v", batches)
        con.execute("CREATE TABLE feats AS SELECT * FROM feats_v")
        con.execute("CREATE TABLE gold AS SELECT * FROM gold_v")
        con.execute("CREATE TABLE batches AS SELECT * FROM batches_v")
        # dense weight tensor as a relation — 23 × 184 × 51 ≈ 216k rows
        con.execute(
            f"""CREATE TABLE w AS
            SELECT o.range AS o, v.range AS v, l.range AS l, 0.0 AS wt
            FROM range({len(offsets)}) o, range({V}) v, range({n_labels}) l"""
        )
        step_sql = """
        CREATE OR REPLACE TABLE g AS
        WITH bsent AS (SELECT sent FROM batches WHERE step = {STEP}),
        bchars AS (SELECT g.sent, g.pos, g.y FROM gold g JOIN bsent USING (sent)),
        bfeat AS (SELECT f.sent, f.pos, f.o, f.v FROM feats f JOIN bsent USING (sent)),
        z AS (
          SELECT f.sent, f.pos, w.l, SUM(w.wt) AS z
          FROM bfeat f JOIN w ON w.o = f.o AND w.v = f.v
          GROUP BY f.sent, f.pos, w.l
        ),
        sm AS (
          SELECT sent, pos, l,
                 exp(z - max(z) OVER (PARTITION BY sent, pos)) AS ez
          FROM z
        ),
        p AS (
          SELECT sent, pos, l, ez / SUM(ez) OVER (PARTITION BY sent, pos) AS p
          FROM sm
        ),
        delta AS (
          SELECT p.sent, p.pos, p.l,
                 {LR} * (p.p - CASE WHEN p.l = c.y THEN 1.0 ELSE 0.0 END) AS d
          FROM p JOIN bchars c ON c.sent = p.sent AND c.pos = p.pos
        )
        SELECT f.o, f.v, d.l, SUM(d.d) AS gt
        FROM delta d JOIN bfeat f ON f.sent = d.sent AND f.pos = d.pos
        GROUP BY f.o, f.v, d.l
        """
        upd_sql = """
        CREATE OR REPLACE TABLE w AS
        SELECT w.o, w.v, w.l, w.wt - COALESCE(g.gt, 0) AS wt
        FROM w LEFT JOIN g ON g.o = w.o AND g.v = w.v AND g.l = w.l
        """
        for st in range(step):
            con.execute(step_sql.format(STEP=st, LR=lr))
            con.execute(upd_sql)
        wr = con.execute("SELECT o, v, l, wt FROM w").df()
        W_sql = np.zeros((len(offsets), V, n_labels))
        W_sql[wr["o"].values, wr["v"].values, wr["l"].values] = wr["wt"].values

        # (a) bulk of the tensor pinned; only trajectory-sensitive cells
        # drift (measured median 1.2e-9, 3.2% of cells past 1e-3).
        d = np.abs(W_sql - shipped.W.astype(np.float64))
        assert float(np.median(d)) < 1e-6
        assert float((d > 1e-3).mean()) < 0.10

        # (b) decision-level agreement (measured 594/600 and 199/200).
        sql_tagger = ct.CharTagger(
            vocab, W_sql.astype(np.float32), labels, offsets
        )
        same_train = sum(
            shipped.doc_spans(g["sentences"]) == sql_tagger.doc_spans(g["sentences"])
            for g in train_docs
        )
        assert same_train >= int(0.98 * len(train_docs)), same_train
        held = [make_doc_indexed(i, seed=999)[1] for i in range(200)]
        same_held = sum(
            shipped.doc_spans(g["sentences"]) == sql_tagger.doc_spans(g["sentences"])
            for g in held
        )
        assert same_held >= int(0.97 * len(held)), same_held

        # (c) the SQL-trained weights clear the SAME quality gate the
        # shipped artifact is pinned to: held-out mention P/R ≥ 0.95.
        tp = fp = fn = 0
        for g in held:
            pred = {
                (sp["text"], sp["field"], (dd["sent_idx"], dd["char_s"], dd["char_e"]))
                for sp in sql_tagger.doc_spans(g["sentences"])
                for dd in sp["dranges"]
            }
            want = {
                (sp["text"], sp["field"], tuple(dd) if not isinstance(dd, dict)
                 else (dd["sent_idx"], dd["char_s"], dd["char_e"]))
                for sp in g["spans"]
                for dd in sp["dranges"]
            }
            tp += len(pred & want)
            fp += len(pred - want)
            fn += len(want - pred)
        p, r = tp / (tp + fp), tp / (tp + fn)
        assert p >= 0.95 and r >= 0.95, (p, r)
