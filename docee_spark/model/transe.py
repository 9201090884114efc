"""TransE knowledge-graph completion (Bordes et al., NeurIPS 2013) as a
trained numpy analog, following the repo's frozen-quantized-model
discipline (operators/dsir.py, model/adj_scorer.py):

  score(s, r, o) = -|| e_s + w_r - e_o ||_1

trained in float with margin-ranking loss + uniform negative sampling +
per-step entity renormalization (the paper's Algorithm 1), then the
embeddings are QUANTIZED to e6 int64 and frozen — the integers are the
model spec, so scoring and ranking are exact integer arithmetic in
Spark, DuckDB, and numpy alike (no cross-engine float drift).

The training graph is a deterministic synthetic multi-relational KG with
genuinely learnable structure — the ``countries``-style composition
benchmark (Bouchard et al. 2015): persons live in cities, cities sit in
countries, and ``citizen_of`` is the composition ``lives_in ∘
located_in``. A slice of ``citizen_of`` is held OUT of training; ranking
the held-out objects is real link prediction (TransE learns w_lives +
w_located ≈ w_citizen), not memorization.

TransE is transductive: entities outside the frozen vocabulary cannot be
scored (callers filter or map to NULL). That is the algorithm's
published boundary, not an implementation shortcut.
"""
from __future__ import annotations

import random

import numpy as np

__all__ = [
    "TranseModel",
    "synth_kg",
    "train_transe",
    "save_transe",
    "load_transe",
]

E6 = 1_000_000


def synth_kg(
    n_person: int = 300,
    n_city: int = 40,
    n_country: int = 8,
    seed: int = 11,
) -> tuple[list[tuple[str, str, str]], list[tuple[str, str, str]]]:
    """→ (train_triples, heldout_triples).

    Structure: every city is located_in exactly one country; every
    person lives_in exactly one city; citizen_of(person) = the country
    of their city. Every 5th person's citizen_of triple is held out
    (their lives_in/located_in evidence stays in training, so the
    held-out fact is INFERABLE, which is what makes hits@k meaningful).
    """
    rng = random.Random(seed)
    train: list[tuple[str, str, str]] = []
    held: list[tuple[str, str, str]] = []
    city_country = {}
    for c in range(n_city):
        country = f"country{c % n_country}"
        city_country[f"city{c}"] = country
        train.append((f"city{c}", "located_in", country))
    for p in range(n_person):
        city = f"city{rng.randrange(n_city)}"
        person = f"person{p}"
        train.append((person, "lives_in", city))
        cit = (person, "citizen_of", city_country[city])
        (held if p % 5 == 0 else train).append(cit)
    return train, held


class TranseModel:
    """Frozen e6-quantized TransE embeddings + vocabularies."""

    def __init__(
        self,
        entities: list[str],
        relations: list[str],
        ent_e6: np.ndarray,
        rel_e6: np.ndarray,
    ):
        if ent_e6.shape[0] != len(entities) or rel_e6.shape[0] != len(relations):
            raise ValueError("embedding row count != vocabulary size")
        self.entities = list(entities)
        self.relations = list(relations)
        self.ent_e6 = np.asarray(ent_e6, dtype=np.int64)
        self.rel_e6 = np.asarray(rel_e6, dtype=np.int64)
        self.ent_idx = {e: i for i, e in enumerate(self.entities)}
        self.rel_idx = {r: i for i, r in enumerate(self.relations)}

    @property
    def dim(self) -> int:
        return self.ent_e6.shape[1]

    def score_py(self, s: str, r: str, o: str) -> int:
        """Exact integer score: -Σ|e_s + w_r - e_o| (None if OOV)."""
        if s not in self.ent_idx or o not in self.ent_idx or r not in self.rel_idx:
            return None
        d = (
            self.ent_e6[self.ent_idx[s]]
            + self.rel_e6[self.rel_idx[r]]
            - self.ent_e6[self.ent_idx[o]]
        )
        return -int(np.abs(d).sum())

    def rank_py(self, s: str, r: str, o: str) -> int:
        """Raw-setting rank of ``o`` among ALL entities for (s, r, ?):
        1 + #{e != o : score(e) > score(o), ties broken by entity name
        ascending} — the deterministic total order the Spark/SQL rankers
        must reproduce."""
        si, ri, oi = self.ent_idx[s], self.rel_idx[r], self.ent_idx[o]
        target = self.ent_e6[si] + self.rel_e6[ri]
        scores = -np.abs(target[None, :] - self.ent_e6).sum(axis=1)
        better = 0
        for e, sc in zip(self.entities, scores):
            if e == o:
                continue
            if sc > scores[oi] or (sc == scores[oi] and e < o):
                better += 1
        return 1 + better


def train_transe(
    triples: list[tuple[str, str, str]],
    dim: int = 24,
    epochs: int = 300,
    lr: float = 0.05,
    margin: float = 1.0,
    seed: int = 17,
) -> TranseModel:
    """Margin-ranking SGD with uniform corruption (replace head or tail),
    L1 dissimilarity, entities renormalized to the unit ball per epoch —
    the published Algorithm 1, minus minibatching (the graphs this
    trains on are small; the spec of the FROZEN model is its weights,
    not the trainer's batching)."""
    rng = np.random.default_rng(seed)
    entities = sorted({t[0] for t in triples} | {t[2] for t in triples})
    relations = sorted({t[1] for t in triples})
    ei = {e: i for i, e in enumerate(entities)}
    ri = {r: i for i, r in enumerate(relations)}
    ne, nr = len(entities), len(relations)
    bound = 6.0 / np.sqrt(dim)
    E = rng.uniform(-bound, bound, size=(ne, dim))
    R = rng.uniform(-bound, bound, size=(nr, dim))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)
    idx = np.array([(ei[s], ri[r], ei[o]) for s, r, o in triples])
    for _ in range(epochs):
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1.0)
        order = rng.permutation(len(idx))
        for t in order:
            s, r, o = idx[t]
            corrupt_head = rng.random() < 0.5
            c = int(rng.integers(ne))
            cs, co = (c, o) if corrupt_head else (s, c)
            d_pos = E[s] + R[r] - E[o]
            d_neg = E[cs] + R[r] - E[co]
            loss = margin + np.abs(d_pos).sum() - np.abs(d_neg).sum()
            if loss <= 0:
                continue
            g_pos = np.sign(d_pos)
            g_neg = np.sign(d_neg)
            E[s] -= lr * g_pos
            E[o] += lr * g_pos
            R[r] -= lr * (g_pos - g_neg)
            E[cs] += lr * g_neg
            E[co] -= lr * g_neg
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1.0)
    return TranseModel(
        entities,
        relations,
        np.round(E * E6).astype(np.int64),
        np.round(R * E6).astype(np.int64),
    )


def save_transe(model: TranseModel, path: str) -> None:
    np.savez(
        path,
        entities=np.array(model.entities),
        relations=np.array(model.relations),
        ent_e6=model.ent_e6,
        rel_e6=model.rel_e6,
    )


def load_transe(path: str) -> TranseModel:
    with np.load(path, allow_pickle=False) as z:
        return TranseModel(
            [str(x) for x in z["entities"]],
            [str(x) for x in z["relations"]],
            z["ent_e6"],
            z["rel_e6"],
        )
