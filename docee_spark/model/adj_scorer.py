"""M6/M7 — a trained adjacency scorer for the decode stage's matrix slot.

Numpy analog of the PTPCG pair scorer (reference
dee/models/trigger_aware.py:375-387: q/k linear maps → scaled dot →
sigmoid ≥ τ → 0/1 matrix; biaffine variant dee/modules/biaffine.py): the
"span embedding" here is a deterministic feature vector per span PAIR
(sentence co-occurrence, distance buckets, coarse-type pair, shared
event-type compatibility), scored by a trained logistic layer. Same
execution contract as the reference scorer: weights in one artifact,
broadcast once, batched inference per document inside the existing Arrow
UDF, output a per-doc 0/1 ``adj`` matrix consumed unchanged by
``decode(adjacency="matrix")``.

Training: logistic regression on gold adjacencies revealed from the
index-pure fixture stream (adjacency_from_records) — seeded numpy SGD,
bit-reproducible, artifact committed like the M1 tagger.
"""

from __future__ import annotations

import numpy as np

from ..config import CHFINANN_EVENT_TYPES, ROLE_COARSE_TYPE

_COARSE = ("person", "company", "institution", "share", "ratio", "date", "money")
_C2I = {c: i for i, c in enumerate(_COARSE)}
_N_DIST = 5  # sentence-distance buckets: 0, 1, 2, 3, ≥4

#: per event type: the set of coarse types its roles can take
_TYPE_COARSE: dict[str, frozenset[str]] = {
    et.name: frozenset(
        ROLE_COARSE_TYPE.get(f, f) for f in et.fields
    )
    for et in CHFINANN_EVENT_TYPES
}

N_FEATURES = (
    1  # bias
    + 1  # share a sentence
    + 1  # number of shared sentences (clipped ≤ 3, scaled)
    + _N_DIST  # min sentence distance bucket
    + len(_COARSE) * len(_COARSE)  # unordered coarse-type pair
    + 1  # both coarse types fit a common event type
)


def _coarse(field: str | None) -> int:
    if field is None:
        return -1
    c = ROLE_COARSE_TYPE.get(field, field)
    return _C2I.get(c, -1)


def pair_features(
    span_fields: list[str | None], span_sent_idxs: list[list[int]]
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """→ (X (n_pairs, N_FEATURES) float32, [(i, j) i<j pair index])."""
    n = len(span_fields)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    X = np.zeros((len(pairs), N_FEATURES), dtype=np.float32)
    sent_sets = [set(s) for s in span_sent_idxs]
    for row, (i, j) in enumerate(pairs):
        X[row, 0] = 1.0  # bias
        shared = sent_sets[i] & sent_sets[j]
        X[row, 1] = 1.0 if shared else 0.0
        X[row, 2] = min(len(shared), 3) / 3.0
        if sent_sets[i] and sent_sets[j]:
            dist = min(
                abs(a - b) for a in span_sent_idxs[i] for b in span_sent_idxs[j]
            )
        else:
            dist = _N_DIST - 1
        X[row, 3 + min(dist, _N_DIST - 1)] = 1.0
        ci, cj = _coarse(span_fields[i]), _coarse(span_fields[j])
        if ci >= 0 and cj >= 0:
            lo, hi = sorted((ci, cj))
            X[row, 3 + _N_DIST + lo * len(_COARSE) + hi] = 1.0
            ti = {
                et
                for et, cs in _TYPE_COARSE.items()
                if _COARSE[ci] in cs and _COARSE[cj] in cs
            }
            X[row, -1] = 1.0 if ti else 0.0
    return X, pairs


class AdjScorer:
    """Frozen logistic pair scorer → per-doc 0/1 adjacency."""

    def __init__(self, w: np.ndarray, threshold: float = 0.5):
        self.w = np.asarray(w, dtype=np.float32)
        self.threshold = float(threshold)

    def score_doc(
        self, span_fields: list[str | None], span_sent_idxs: list[list[int]]
    ) -> list[list[int]]:
        n = len(span_fields)
        adj = [[0] * n for _ in range(n)]
        for i in range(n):
            adj[i][i] = 1
        if n < 2:
            return adj
        X, pairs = pair_features(span_fields, span_sent_idxs)
        # sigmoid(Xw) ≥ τ  ⇔  Xw ≥ logit(τ); gather-free dot is fine here
        # (feature dim is tiny and fixed)
        logits = X @ self.w
        cut = np.log(self.threshold / (1.0 - self.threshold))
        for (i, j), z in zip(pairs, logits):
            if z >= cut:
                adj[i][j] = adj[j][i] = 1
        return adj

    def to_arrays(self) -> dict[str, np.ndarray]:
        return {"w": self.w, "threshold": np.array([self.threshold])}

    @classmethod
    def from_arrays(cls, arrays) -> "AdjScorer":
        return cls(np.asarray(arrays["w"]), float(np.asarray(arrays["threshold"])[0]))


def save_scorer(scorer: AdjScorer, path: str) -> None:
    np.savez_compressed(path, **scorer.to_arrays())


def load_scorer(path: str) -> AdjScorer:
    with np.load(path, allow_pickle=False) as z:
        return AdjScorer.from_arrays(z)


def training_matrix(train_docs: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """(X, y) for :func:`train_adj_scorer` — gold adjacency revealed from
    records (arg_rel.py:270-277 semantics via
    pyref.graph.adjacency_from_records), featurized per pair. Exposed so
    the SQL training witness (tests/test_training_witness.py) replays
    gradient descent on the EXACT matrix the shipped artifact saw."""
    from ..pyref.graph import adjacency_from_records

    X_all: list[np.ndarray] = []
    y_all: list[np.ndarray] = []
    for g in train_docs:
        spans = g["spans"]
        if len(spans) < 2:
            continue
        span_fields = [s["field"] for s in spans]
        span_sents = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
        text_to_idx = {s["text"]: i for i, s in enumerate(spans)}
        records = [
            [
                text_to_idx[v]
                for v in ev["args"].values()
                if v is not None and v in text_to_idx
            ]
            for ev in g["events"]
        ]
        gold = adjacency_from_records(len(spans), records)
        X, pairs = pair_features(span_fields, span_sents)
        y = np.array([gold[i][j] for i, j in pairs], dtype=np.float32)
        X_all.append(X)
        y_all.append(y)
    return np.concatenate(X_all), np.concatenate(y_all)


def train_adj_scorer(
    train_docs: list[dict], epochs: int = 30, lr: float = 0.5, seed: int = 17
) -> AdjScorer:
    """Logistic regression on gold pair labels. Seeded full-batch
    gradient steps; deterministic."""
    X, y = training_matrix(train_docs)

    rng = np.random.default_rng(seed)
    w = rng.normal(0.0, 0.01, size=X.shape[1]).astype(np.float32)
    for _ in range(epochs):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        grad = X.T @ (p - y) / len(y)
        w -= np.float32(lr) * grad.astype(np.float32)
    return AdjScorer(w)
