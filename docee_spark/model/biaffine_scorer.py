"""M7 — a trained biaffine adjacency scorer over AWA-pooled span embeddings.

Reference chain this mirrors (numpy, torch-free):
  * token→mention reduction: AWA attentive pooling with a LEARNED query
    (M3 — reference AttentiveReducer, ``dee/modules/__init__.py:104-141``;
    selected by ``seq_reduce_type`` in ``doc2edag.py:87-155`` /
    ``git.py:944-955``) over the char-level emission features of the
    trained M1 tagger (model/char_tagger.py);
  * mention→span reduction: mean pooling (the reference's
    'MeanPooling' alternative), then L2 normalization;
  * pair scoring: a biaffine form eᵢᵀ W eⱼ (symmetrized) plus the linear
    pair features of the logistic M6 scorer — reference
    ``dee/modules/biaffine.py`` (the PTPCG ``--biaffine`` edge-scorer
    alternative to the q/k dot scorer, trigger_aware.py:375-387).

All parameters (attention query q, biaffine W, linear w) are trained
JOINTLY by seeded full-batch gradient descent on gold pair labels —
hand-derived gradients, numerically checked in tests. Same execution
contract as AdjScorer: one broadcast artifact, one deserialization per
worker, per-document batched inference inside the existing Arrow UDF,
0/1 ``adj`` matrix consumed unchanged by ``decode(adjacency="matrix")``.
"""

from __future__ import annotations

import numpy as np

from .adj_scorer import N_FEATURES, pair_features
from .char_tagger import CharTagger
from .pooling import awa_pool, awa_pool_backward

_EPS = 1e-8


def _span_embed_forward(tagger: CharTagger, sentences: list[str], spans: list[dict], q):
    """→ per span: (e (d,), cache for backward). Mention features = the
    M1 tagger's emission rows for the mention chars (token→mention AWA),
    span = mean of mention vectors, L2-normalized."""
    ids, _ = tagger._char_ids(list(sentences) or [""])
    em = tagger.emissions(ids)  # (S, L, d)
    d = tagger.n_labels
    out = []
    for sp in spans:
        caches = []
        ms = []
        for dr in sp["dranges"]:
            si, cs, ce = dr["sent_idx"], dr["char_s"], dr["char_e"]
            if si < em.shape[0] and ce > cs:
                H = em[si, cs : min(ce, em.shape[1]), :].astype(np.float64)
            else:
                H = np.zeros((1, d))
            if not len(H):
                H = np.zeros((1, d))
            m, att = awa_pool(H, q)
            caches.append((H, att))
            ms.append(m)
        u = np.mean(ms, axis=0)
        nrm = float(np.linalg.norm(u)) + _EPS
        e = u / nrm
        out.append((e, (caches, u, nrm)))
    return out


def _span_embed_backward(cache, q, g_e) -> np.ndarray:
    """∂L/∂q for one span given ∂L/∂e (through L2 norm → mean → AWA)."""
    caches, u, nrm = cache
    e = u / nrm
    g_u = (g_e - e * float(e @ g_e)) / nrm
    g_m = g_u / len(caches)
    g_q = np.zeros_like(q)
    for H, att in caches:
        g_q += awa_pool_backward(H, q, att, g_m)
    return g_q


class BiaffineAdjScorer:
    """Frozen trained scorer: (tagger, q, W, w_base, threshold)."""

    #: score_adjacency must hand this scorer sentences+spans (it computes
    #: char-level features), not just (fields, sent_idxs)
    needs_sentences = True

    def __init__(self, tagger: CharTagger, q, W, w_base, threshold: float = 0.5):
        self.tagger = tagger
        self.q = np.asarray(q, dtype=np.float64)
        self.W = np.asarray(W, dtype=np.float64)
        self.w_base = np.asarray(w_base, dtype=np.float64)
        self.threshold = float(threshold)

    def _span_embeddings(self, sentences, spans) -> list[np.ndarray]:
        """Hook: per-span embedding vectors. Context-enriched subclasses
        (doc-context attention, GIT RGCN) override ONLY this."""
        return [
            e for e, _ in _span_embed_forward(self.tagger, sentences, spans, self.q)
        ]

    def _pair_logits(self, sentences, spans):
        fields = [s["field"] for s in spans]
        sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
        X, pairs = pair_features(fields, sents)
        es = self._span_embeddings(sentences, spans)
        e = np.stack(es) if es else np.zeros((0, self.tagger.n_labels))
        logits = X.astype(np.float64) @ self.w_base
        for r, (i, j) in enumerate(pairs):
            logits[r] += 0.5 * (e[i] @ self.W @ e[j] + e[j] @ self.W @ e[i])
        return logits, pairs

    def score_doc(self, sentences, spans) -> list[list[int]]:
        n = len(spans)
        adj = [[0] * n for _ in range(n)]
        for i in range(n):
            adj[i][i] = 1
        if n < 2:
            return adj
        logits, pairs = self._pair_logits(sentences, spans)
        cut = np.log(self.threshold / (1.0 - self.threshold))
        for (i, j), z in zip(pairs, logits):
            if z >= cut:
                adj[i][j] = adj[j][i] = 1
        return adj

    def to_arrays(self) -> dict[str, np.ndarray]:
        out = {f"tag_{k}": v for k, v in self.tagger.to_arrays().items()}
        out.update(
            q=self.q, W=self.W, w_base=self.w_base,
            threshold=np.array([self.threshold]),
        )
        return out

    @classmethod
    def from_arrays(cls, arrays) -> "BiaffineAdjScorer":
        tagger = CharTagger.from_arrays(
            {k[4:]: np.asarray(arrays[k]) for k in arrays if k.startswith("tag_")}
        )
        return cls(
            tagger,
            np.asarray(arrays["q"]),
            np.asarray(arrays["W"]),
            np.asarray(arrays["w_base"]),
            float(np.asarray(arrays["threshold"])[0]),
        )


def save_biaffine(scorer: BiaffineAdjScorer, path: str) -> None:
    np.savez_compressed(path, **scorer.to_arrays())


def load_biaffine(path: str) -> BiaffineAdjScorer:
    with np.load(path, allow_pickle=False) as z:
        return BiaffineAdjScorer.from_arrays(dict(z.items()))


def prep_pair_training_docs(train_docs: list[dict]):
    """Shared per-doc static precomputation for every pair-objective
    trainer (M7 biaffine / M4 doc-context / G10 RGCN): gold adjacency
    revealed from records (arg_rel.py:270-277 semantics), pair features,
    and 0/1 labels → [(sentences, spans, X, pairs, y)]."""
    from ..pyref.graph import adjacency_from_records

    prep = []
    for g in train_docs:
        spans = g["spans"]
        if len(spans) < 2:
            continue
        fields = [s["field"] for s in spans]
        sent_idxs = [sorted({dd["sent_idx"] for dd in s["dranges"]}) for s in spans]
        t2i = {s["text"]: i for i, s in enumerate(spans)}
        records = [
            [t2i[v] for v in ev["args"].values() if v is not None and v in t2i]
            for ev in g["events"]
        ]
        gold = adjacency_from_records(len(spans), records)
        X, pairs = pair_features(fields, sent_idxs)
        y = np.array([gold[i][j] for i, j in pairs], dtype=np.float64)
        prep.append((g["sentences"], spans, X.astype(np.float64), pairs, y))
    return prep


def train_biaffine_scorer(
    train_docs: list[dict],
    tagger: CharTagger,
    epochs: int = 40,
    lr: float = 0.5,
    seed: int = 23,
) -> BiaffineAdjScorer:
    """Joint seeded full-batch GD on gold pair labels (gold adjacency
    revealed from records, arg_rel.py:270-277 semantics): the attention
    query q (M3), the biaffine W (M7) and the linear pair weights w_base
    (M6) all receive exact hand-derived gradients. Deterministic."""
    rng = np.random.default_rng(seed)
    d = tagger.n_labels
    q = rng.normal(0.0, 0.1, size=d)
    W = rng.normal(0.0, 0.01, size=(d, d))
    w_base = np.zeros(N_FEATURES, dtype=np.float64)

    prep = prep_pair_training_docs(train_docs)
    n_pairs_total = sum(len(y) for *_, y in prep)
    for _ in range(epochs):
        g_q = np.zeros_like(q)
        g_W = np.zeros_like(W)
        g_w = np.zeros_like(w_base)
        for sentences, spans, X, pairs, y in prep:
            embs = _span_embed_forward(tagger, sentences, spans, q)
            e = np.stack([em for em, _ in embs])
            logits = X @ w_base
            for r, (i, j) in enumerate(pairs):
                logits[r] += 0.5 * (e[i] @ W @ e[j] + e[j] @ W @ e[i])
            p = 1.0 / (1.0 + np.exp(-logits))
            gl = (p - y) / n_pairs_total  # BCE mean over all pairs
            g_w += X.T @ gl
            g_e = np.zeros_like(e)
            for r, (i, j) in enumerate(pairs):
                g_W += gl[r] * 0.5 * (np.outer(e[i], e[j]) + np.outer(e[j], e[i]))
                g_e[i] += gl[r] * 0.5 * (W @ e[j] + W.T @ e[j])
                g_e[j] += gl[r] * 0.5 * (W @ e[i] + W.T @ e[i])
            for si, (_, cache) in enumerate(embs):
                if np.any(g_e[si]):
                    g_q += _span_embed_backward(cache, q, g_e[si])
        q -= lr * g_q
        W -= lr * g_W
        w_base -= lr * g_w
    return BiaffineAdjScorer(tagger, q, W, w_base)


# --- M4: doc-context variant ------------------------------------------------

def _sentence_embed_forward(tagger: CharTagger, sentences, q_s):
    """Sentence node embeddings: AWA over each sentence's char emission
    rows with a separate learned query (the reference pools token→sentence
    the same way before the doc encoder, doc2edag.py:148-155)."""
    ids, lens = tagger._char_ids(list(sentences) or [""])
    em = tagger.emissions(ids)
    d = tagger.n_labels
    out = []
    for j in range(len(sentences)):
        T = int(lens[j]) if j < len(lens) else 0
        H = em[j, :T, :].astype(np.float64) if T > 0 else np.zeros((1, d))
        s, att = awa_pool(H, q_s)
        out.append((s, (H, att)))
    return out


class DocCtxBiaffineScorer(BiaffineAdjScorer):
    """M4+M7+M3: biaffine pair scoring over DOC-CONTEXTUALIZED span
    embeddings — one residual self-attention layer (model/doc_context.py)
    over the joint [spans ∥ sentences] node matrix, every parameter
    (attention query q, sentence query q_s, context Wq/Wk/Wv, biaffine W,
    linear w) trained jointly."""

    def __init__(self, tagger, q, q_s, ctx, W, w_base, threshold: float = 0.5):
        super().__init__(tagger, q, W, w_base, threshold)
        self.q_s = np.asarray(q_s, dtype=np.float64)
        self.ctx = ctx

    def _span_context_forward(self, sentences, spans):
        span_embs = _span_embed_forward(self.tagger, sentences, spans, self.q)
        sent_embs = _sentence_embed_forward(self.tagger, sentences, self.q_s)
        n_s = len(span_embs)
        # span rows enter PRE-normalization (u); normalize after context
        us = [cache[1] for _, cache in span_embs]
        Z = np.stack(us + [s for s, _ in sent_embs])
        Zp, att_cache = self.ctx.forward(Z)
        es, norms = [], []
        for i in range(n_s):
            nrm = float(np.linalg.norm(Zp[i])) + _EPS
            es.append(Zp[i] / nrm)
            norms.append(nrm)
        return es, (span_embs, sent_embs, Z, Zp, att_cache, norms)

    def _span_embeddings(self, sentences, spans) -> list[np.ndarray]:
        return self._span_context_forward(sentences, spans)[0]

    def to_arrays(self) -> dict[str, np.ndarray]:
        out = super().to_arrays()
        out.update(
            q_s=self.q_s, ctx_Wq=self.ctx.Wq, ctx_Wk=self.ctx.Wk,
            ctx_Wv=self.ctx.Wv,
        )
        return out

    @classmethod
    def from_arrays(cls, arrays) -> "DocCtxBiaffineScorer":
        from .doc_context import DocContextAttention

        tagger = CharTagger.from_arrays(
            {k[4:]: np.asarray(arrays[k]) for k in arrays if k.startswith("tag_")}
        )
        ctx = DocContextAttention(
            np.asarray(arrays["ctx_Wq"]),
            np.asarray(arrays["ctx_Wk"]),
            np.asarray(arrays["ctx_Wv"]),
        )
        return cls(
            tagger,
            np.asarray(arrays["q"]),
            np.asarray(arrays["q_s"]),
            ctx,
            np.asarray(arrays["W"]),
            np.asarray(arrays["w_base"]),
            float(np.asarray(arrays["threshold"])[0]),
        )


def train_doc_context_scorer(
    train_docs: list[dict],
    tagger: CharTagger,
    epochs: int = 40,
    lr: float = 0.5,
    seed: int = 29,
) -> DocCtxBiaffineScorer:
    """Joint seeded full-batch GD through the whole chain: biaffine W and
    linear w, the context layer's Wq/Wk/Wv (via the attention backward),
    the span attention query q and the sentence query q_s (via the AWA
    backward). Deterministic; every gradient hand-derived and numerically
    checked in tests."""
    from .doc_context import DocContextAttention

    rng = np.random.default_rng(seed)
    d = tagger.n_labels
    scorer = DocCtxBiaffineScorer(
        tagger,
        rng.normal(0.0, 0.1, d),
        rng.normal(0.0, 0.1, d),
        DocContextAttention.init(d, rng),
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
        g_Wq = np.zeros((d, d))
        g_Wk = np.zeros((d, d))
        g_Wv = np.zeros((d, d))
        for sentences, spans, X, pairs, y in prep:
            es, cache = scorer._span_context_forward(sentences, spans)
            span_embs, sent_embs, Z, Zp, att_cache, norms = cache
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
            # back through the context layer
            dWq, dWk, dWv, gZ = scorer.ctx.backward(att_cache, gZp)
            g_Wq += dWq
            g_Wk += dWk
            g_Wv += dWv
            # span rows: mean over mentions → AWA(q)
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
        scorer.ctx.Wq -= lr * g_Wq
        scorer.ctx.Wk -= lr * g_Wk
        scorer.ctx.Wv -= lr * g_Wv
    return scorer
