"""G10 — a trained numpy RGCN analog over the GIT heterogeneous doc graph.

Reference: GIT (``dee/models/git.py:892-1020``) builds a typed
sentence+mention document graph and enriches node embeddings with torch
RGCN layers (``git.py:1003+``) before event decoding. The graph
construction half is covered by ``operators.analysis.git_hetero_edges``;
this module is the torch-free analog of the GNN half: ONE relational
graph-convolution layer over the joint ``[spans ∥ sentences]`` node
matrix,

    Z' = Z + Σ_r Â_r Z W_r

with ``Â_r`` the row-normalized typed adjacency of relation ``r`` and a
learned weight matrix ``W_r`` per relation. The relations mirror
``git.py``'s edge types at span level (the same documented deviation as
the M4 analog: span-level nodes to bound the node count, one layer):

    ``ss``  sentence → sentence (complete digraph, git.py:930-934)
    ``sm``  span ← containing sentence (:958-960)
    ``ms``  sentence ← contained span (:958-960)
    ``mm``  span ← co-sentence span (:978-982 intra-sentence branch;
            the same-entity inter-sentence branch (:985-988) is
            degenerate at span level — a span IS its entity)

The residual carries the self-loop (the dgl placeholder self-edge,
git.py:991-995). The layer is linear in Z, so the backward pass is exact
by construction (numerically checked in tests):

    ∂L/∂W_r = (Â_r Z)ᵀ ∂L/∂Z'
    ∂L/∂Z   = ∂L/∂Z' + Σ_r Â_rᵀ (∂L/∂Z') W_rᵀ

Trained jointly with the M7 biaffine head and the M3 attention queries by
seeded full-batch gradient descent (same harness shape as
``train_doc_context_scorer``). Same execution contract as the other
scorers: one broadcast artifact, one deserialization per worker, batched
per-document inference inside the existing Arrow UDF, 0/1 ``adj`` matrix
consumed unchanged by ``decode(adjacency="matrix")``.
"""

from __future__ import annotations

import numpy as np

from .adj_scorer import N_FEATURES, pair_features
from .biaffine_scorer import (
    _EPS,
    BiaffineAdjScorer,
    _sentence_embed_forward,
    _span_embed_forward,
)
from .char_tagger import CharTagger

RELATIONS = ("ss", "sm", "ms", "mm")


def git_graph_mats(
    n_spans: int, span_sent_idxs: list[list[int]], n_sents: int
) -> dict[str, np.ndarray]:
    """Row-normalized typed adjacencies over [spans 0..n_spans-1 ∥
    sentences n_spans..n_spans+n_sents-1]. ``A[i, j] = 1`` means node i
    RECEIVES a message from node j (row i of Â_r Z W_r aggregates over
    the row's neighbours)."""
    n = n_spans + n_sents
    mats = {r: np.zeros((n, n)) for r in RELATIONS}
    for i in range(n_sents):
        for j in range(n_sents):
            if i != j:
                mats["ss"][n_spans + i, n_spans + j] = 1.0
    for sp, sids in enumerate(span_sent_idxs):
        for si in sids:
            if si < n_sents:
                mats["sm"][sp, n_spans + si] = 1.0
                mats["ms"][n_spans + si, sp] = 1.0
    for i in range(n_spans):
        for j in range(n_spans):
            if i != j and set(span_sent_idxs[i]) & set(span_sent_idxs[j]):
                mats["mm"][i, j] = 1.0
    for A in mats.values():
        s = A.sum(axis=1, keepdims=True)
        np.divide(A, s, out=A, where=s > 0)
    return mats


class RelGraphConv:
    """One residual relational graph convolution: Z' = Z + Σ_r Â_r Z W_r."""

    def __init__(self, Ws: dict[str, np.ndarray]):
        self.Ws = {r: np.asarray(W, dtype=np.float64) for r, W in Ws.items()}

    @classmethod
    def init(cls, d: int, rng: np.random.Generator) -> "RelGraphConv":
        # near-identity start, like the M4 attention layer: small weights
        # → messages ≈ 0 and the residual passes embeddings through
        return cls({r: rng.normal(0.0, 0.05, (d, d)) for r in RELATIONS})

    def forward(self, Z: np.ndarray, mats: dict[str, np.ndarray]):
        """→ (Z', cache)."""
        Z = np.asarray(Z, dtype=np.float64)
        out = Z.copy()
        for r in RELATIONS:
            out += mats[r] @ Z @ self.Ws[r]
        return out, (Z, mats)

    def backward(self, cache, gZp: np.ndarray):
        """∂L/∂({W_r}, Z) given ∂L/∂Z'."""
        Z, mats = cache
        gZ = gZp.copy()
        gWs = {}
        for r in RELATIONS:
            gWs[r] = (mats[r] @ Z).T @ gZp
            gZ += mats[r].T @ gZp @ self.Ws[r].T
        return gWs, gZ


class GitRgcnScorer(BiaffineAdjScorer):
    """G10+M7+M3: biaffine pair scoring over span embeddings enriched by
    one RGCN layer on the GIT-typed document graph — every parameter
    (attention query q, sentence query q_s, per-relation W_r, biaffine W,
    linear w) trained jointly."""

    def __init__(self, tagger, q, q_s, gcn: RelGraphConv, W, w_base,
                 threshold: float = 0.5):
        super().__init__(tagger, q, W, w_base, threshold)
        self.q_s = np.asarray(q_s, dtype=np.float64)
        self.gcn = gcn

    def _span_context_forward(self, sentences, spans):
        span_embs = _span_embed_forward(self.tagger, sentences, spans, self.q)
        sent_embs = _sentence_embed_forward(self.tagger, sentences, self.q_s)
        n_s = len(span_embs)
        sids = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
        mats = git_graph_mats(n_s, sids, len(sentences))
        # span rows enter PRE-normalization (u); normalize after the GCN
        us = [cache[1] for _, cache in span_embs]
        Z = np.stack(us + [s for s, _ in sent_embs])
        Zp, gcn_cache = self.gcn.forward(Z, mats)
        es, norms = [], []
        for i in range(n_s):
            nrm = float(np.linalg.norm(Zp[i])) + _EPS
            es.append(Zp[i] / nrm)
            norms.append(nrm)
        return es, (span_embs, sent_embs, Z, Zp, gcn_cache, norms)

    def _span_embeddings(self, sentences, spans) -> list[np.ndarray]:
        return self._span_context_forward(sentences, spans)[0]

    def to_arrays(self) -> dict[str, np.ndarray]:
        out = super().to_arrays()
        out["q_s"] = self.q_s
        for r in RELATIONS:
            out[f"rgcn_W{r}"] = self.gcn.Ws[r]
        return out

    @classmethod
    def from_arrays(cls, arrays) -> "GitRgcnScorer":
        tagger = CharTagger.from_arrays(
            {k[4:]: np.asarray(arrays[k]) for k in arrays if k.startswith("tag_")}
        )
        gcn = RelGraphConv(
            {r: np.asarray(arrays[f"rgcn_W{r}"]) for r in RELATIONS}
        )
        return cls(
            tagger,
            np.asarray(arrays["q"]),
            np.asarray(arrays["q_s"]),
            gcn,
            np.asarray(arrays["W"]),
            np.asarray(arrays["w_base"]),
            float(np.asarray(arrays["threshold"])[0]),
        )


def train_git_rgcn_scorer(
    train_docs: list[dict],
    tagger: CharTagger,
    epochs: int = 40,
    lr: float = 0.5,
    seed: int = 31,
) -> GitRgcnScorer:
    """Joint seeded full-batch GD through the whole chain: biaffine W and
    linear w, the four relation weights W_r (exact linear backward), the
    span attention query q and the sentence query q_s (AWA backward).
    Deterministic; gradients numerically checked in tests."""
    from .biaffine_scorer import prep_pair_training_docs
    from .pooling import awa_pool_backward

    rng = np.random.default_rng(seed)
    d = tagger.n_labels
    scorer = GitRgcnScorer(
        tagger,
        rng.normal(0.0, 0.1, d),
        rng.normal(0.0, 0.1, d),
        RelGraphConv.init(d, rng),
        rng.normal(0.0, 0.01, (d, d)),
        np.zeros(N_FEATURES, dtype=np.float64),
    )

    prep = prep_pair_training_docs(train_docs)
    n_pairs_total = sum(len(y) for *_, y in prep)
    for _ in range(epochs):
        g_q = np.zeros(d)
        g_qs = np.zeros(d)
        g_W = np.zeros((d, d))
        g_w = np.zeros(N_FEATURES)
        g_Wr = {r: np.zeros((d, d)) for r in RELATIONS}
        for sentences, spans, X, pairs, y in prep:
            es, cache = scorer._span_context_forward(sentences, spans)
            span_embs, sent_embs, Z, Zp, gcn_cache, norms = cache
            n_s = len(span_embs)
            e = np.stack(es)
            logits = X @ scorer.w_base
            for r, (i, j) in enumerate(pairs):
                logits[r] += 0.5 * (
                    e[i] @ scorer.W @ e[j] + e[j] @ scorer.W @ e[i]
                )
            p = 1.0 / (1.0 + np.exp(-logits))
            gl = (p - y) / n_pairs_total
            g_w += X.T @ gl
            g_e = np.zeros_like(e)
            for r, (i, j) in enumerate(pairs):
                g_W += gl[r] * 0.5 * (np.outer(e[i], e[j]) + np.outer(e[j], e[i]))
                g_e[i] += gl[r] * 0.5 * (scorer.W @ e[j] + scorer.W.T @ e[j])
                g_e[j] += gl[r] * 0.5 * (scorer.W @ e[i] + scorer.W.T @ e[i])
            # back through normalization into Z'
            gZp = np.zeros_like(Zp)
            for i in range(n_s):
                gZp[i] = (g_e[i] - es[i] * float(es[i] @ g_e[i])) / norms[i]
            # back through the graph layer
            dWr, gZ = scorer.gcn.backward(gcn_cache, gZp)
            for r in RELATIONS:
                g_Wr[r] += dWr[r]
            # span rows entered PRE-normalization: mean over mentions →
            # AWA(q) (no norm backward here — it was applied in gZp)
            for i in range(n_s):
                if np.any(gZ[i]):
                    caches, _u, _nrm = span_embs[i][1]
                    g_m = gZ[i] / len(caches)
                    for H, att in caches:
                        g_q += awa_pool_backward(H, scorer.q, att, g_m)
            # sentence rows: AWA(q_s)
            for j in range(len(sent_embs)):
                gs = gZ[n_s + j]
                if np.any(gs):
                    H, att = sent_embs[j][1]
                    g_qs += awa_pool_backward(H, scorer.q_s, att, gs)
        scorer.q -= lr * g_q
        scorer.q_s -= lr * g_qs
        scorer.W -= lr * g_W
        scorer.w_base -= lr * g_w
        for r in RELATIONS:
            scorer.gcn.Ws[r] -= lr * g_Wr[r]
    return scorer
