"""Trained entity-link scorer — the "entity-link scoring" half of the
north rule's canonicalization step (mention detection finds surface
strings; LINKING decides which dictionary entity each surface denotes,
including fuzzy variants the exact-surface broadcast join cannot see:
typos, affix noise, truncated company suffixes).

Model: logistic regression over four EXACT-INTEGER pair features between
a normalized mention ``m`` and a normalized candidate alias ``a``
(normalization = stages.canonicalize.normalize_surface):

    jac_e6      floor(1e6 · |S(m)∩S(a)| / |S(m)∪S(a)|)   char-3 shingles,
                conditional pad (canonicalize.shingles semantics)
    exact_e6    1e6 · [m = a]
    contain_e6  1e6 · [m ⊂ a or a ⊂ m]   (substring containment)
    lend_e6     floor(1e6 · |len(m)−len(a)| / max(len(m), len(a), 1))

    score_e12 = b_e12 + Σᵢ w_e6[i] · f_e6[i],      link ⇔ score_e12 > τ

Every feature and the score are integer arithmetic, so Spark, DuckDB
(driver oracle `entity_link`) and numpy agree bit-for-bit — the same
e6/e12 fixed-point discipline as model/quality_clf.py. Weights are
trained offline on a deterministic synthetic pair corpus (fixture
persons/companies/institutions plus latin entities; positives are
deterministic corruptions — char drops/doubles, affix noise, suffix
truncation, case folds; negatives are cross-entity pairs including
hard shared-suffix company pairs) and frozen quantized into
``golden_fixtures/link_scorer.npz`` — the trained integers ARE the
model spec, like the other npz analogs.

Scale shape: scoring is a pure map over candidate pairs (no UDF, no
shuffle — whole-stage codegen); candidate GENERATION is the bounded
LSH blocking in stages/linker.py. The reference has no linking stage
(it never joins across documents, SURVEY §2.4); this implements the
north star's "entity-link scoring" clause.
"""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

N_FEATURES = 4  # jac, exact, contain, lend
E6 = 1_000_000


# --------------------------------------------------------------------------
# the cross-engine feature contract (python reference side)
# --------------------------------------------------------------------------


def norm_py(s: str) -> str:
    s = s.strip()
    return s.lower() if all(ord(c) < 128 for c in s) else s


def shingles_py(s: str, n: int = 3) -> set[str]:
    padded = s if len(s) >= n else s.ljust(n, "_")
    return {padded[i : i + n] for i in range(len(padded) - n + 1)}


def features_e6_py(m: str, a: str) -> list[int]:
    m, a = norm_py(m), norm_py(a)
    sm, sa = shingles_py(m), shingles_py(a)
    union = len(sm | sa)
    jac = (len(sm & sa) * E6) // union if union else 0
    exact = E6 if m == a else 0
    contain = E6 if (m and a and (m in a or a in m)) else 0
    mx = max(len(m), len(a), 1)
    lend = (abs(len(m) - len(a)) * E6) // mx
    return [jac, exact, contain, lend]


# --------------------------------------------------------------------------
# the trained model
# --------------------------------------------------------------------------


class LinkScorer:
    """Quantized logistic pair scorer: ``w_e6`` int64[4], ``b_e12`` int."""

    def __init__(self, w_e6: np.ndarray, b_e12: int):
        if len(w_e6) != N_FEATURES:
            raise ValueError(f"expected {N_FEATURES} weights, got {len(w_e6)}")
        self.w_e6 = np.asarray(w_e6, dtype=np.int64)
        self.b_e12 = int(b_e12)

    def score_e12(self, mention: str, alias: str) -> int:
        f = features_e6_py(mention, alias)
        return self.b_e12 + int(
            sum(int(w) * int(x) for w, x in zip(self.w_e6, f))
        )

    def links(self, mention: str, alias: str) -> bool:
        return self.score_e12(mention, alias) > 0

    def to_arrays(self) -> dict[str, np.ndarray]:
        return {
            "w_e6": self.w_e6,
            "b_e12": np.array([self.b_e12], dtype=np.int64),
        }

    @classmethod
    def from_arrays(cls, arrays) -> "LinkScorer":
        return cls(
            np.asarray(arrays["w_e6"], dtype=np.int64),
            int(np.asarray(arrays["b_e12"]).ravel()[0]),
        )


def save_scorer(sc: LinkScorer, path: str) -> None:
    np.savez(path, **sc.to_arrays())


def load_scorer(path: str) -> LinkScorer:
    with np.load(path) as z:
        return LinkScorer.from_arrays(z)


# --------------------------------------------------------------------------
# Spark feature/score expressions — pure codegen over candidate pairs
# --------------------------------------------------------------------------


def _norm_expr(col: Column) -> Column:
    from ..stages.canonicalize import normalize_surface

    return normalize_surface(col)


def _shingle_expr(col: Column) -> Column:
    from ..stages.canonicalize import shingles

    return shingles(col, 3)


def _floor_div(num: Column, den: Column) -> Column:
    return ((num - F.pmod(num, den)) / den).cast("long")


def score_expr(scorer: LinkScorer, mention: Column, alias: Column) -> Column:
    """``score_e12`` as one Column over already-NORMALIZED surfaces.

    The shingle arrays bind through 1-element-array lambdas so the
    intersect/union pair evaluates each set once (the bind-once
    discipline of quality_clf/_margin_struct)."""
    # every literal a LONG: feature values reach 1e6 and weights ~1e7, so
    # int32 literals would overflow the w·f products under ANSI mode
    def lit_l(v) -> Column:
        return F.lit(int(v)).cast("long")

    w = [int(v) for v in scorer.w_e6]
    b = int(scorer.b_e12)

    def per_m(sm):
        def per_a(sa):
            union = F.size(F.array_union(sm, sa))
            inter = F.size(F.array_intersect(sm, sa)).cast("long") * lit_l(E6)
            jac = F.when(union > 0, _floor_div(inter, union.cast("long"))).otherwise(
                lit_l(0)
            )
            exact = F.when(mention == alias, lit_l(E6)).otherwise(lit_l(0))
            contain = F.when(
                (F.length(mention) > 0)
                & (F.length(alias) > 0)
                & ((F.instr(alias, mention) > 0) | (F.instr(mention, alias) > 0)),
                lit_l(E6),
            ).otherwise(lit_l(0))
            mx = F.greatest(F.length(mention), F.length(alias), F.lit(1)).cast(
                "long"
            )
            diff = F.abs(F.length(mention) - F.length(alias)).cast("long") * lit_l(
                E6
            )
            lend = _floor_div(diff, mx)
            return (
                lit_l(b)
                + lit_l(w[0]) * jac
                + lit_l(w[1]) * exact
                + lit_l(w[2]) * contain
                + lit_l(w[3]) * lend
            ).cast("long")

        return F.element_at(F.transform(F.array(_shingle_expr(alias)), per_a), 1)

    return F.element_at(F.transform(F.array(_shingle_expr(mention)), per_m), 1)


# --------------------------------------------------------------------------
# offline training on a deterministic synthetic pair corpus
# --------------------------------------------------------------------------

_LATIN_ENTITIES = [
    "acme holdings ltd", "northwind traders", "globex corporation",
    "initech systems", "umbrella research group", "stark industries",
    "wayne enterprises", "cyberdyne labs", "tyrell genetics",
    "oceanic airlines",
]


def _variants(alias: str, rng: random.Random) -> list[str]:
    """Deterministic surface corruptions a crawl actually produces."""
    out = [alias]  # exact re-mention
    if len(alias) >= 4:
        i = rng.randrange(1, len(alias) - 1)
        out.append(alias[:i] + alias[i + 1 :])  # char drop
        j = rng.randrange(1, len(alias) - 1)
        out.append(alias[:j] + alias[j] + alias[j:])  # char double
    out.append(alias + ("公司" if any(ord(c) > 127 for c in alias) else " inc"))
    for suf in ("股份有限公司", "有限公司", "集团"):
        if alias.endswith(suf) and len(alias) > len(suf) + 1:
            out.append(alias[: -len(suf)])  # suffix truncation
            break
    if alias.isascii():
        out.append(alias.upper())  # case fold (norm folds it back)
    return out


def synth_link_pairs(seed: int = 11):
    """→ (pairs, labels): deterministic (mention, alias) pairs. Positives
    are variants of the SAME entity's alias; negatives pair a variant
    with a DIFFERENT entity's alias — including the hard shared-suffix
    company negatives (every zh company ends in the same legal-form
    tokens, so shingle overlap alone cannot separate them)."""
    from ..fixtures import heuristic_entity_dict

    rng = random.Random(seed)
    aliases = sorted(heuristic_entity_dict()) + _LATIN_ENTITIES
    pairs: list[tuple[str, str]] = []
    labels: list[int] = []
    for a in aliases:
        for v in _variants(a, rng):
            pairs.append((v, a))
            labels.append(1)
            # one random negative + one hard negative per positive
            neg = rng.choice(aliases)
            while neg == a:
                neg = rng.choice(aliases)
            pairs.append((v, neg))
            labels.append(0)
            hard = [
                x
                for x in aliases
                if x != a and (x[-2:] == a[-2:] or x[:2] == a[:2])
            ]
            if hard:
                pairs.append((v, rng.choice(hard)))
                labels.append(0)
    return pairs, labels


def mention_universe(seed: int = 11) -> list[str]:
    """The deterministic mention set of the ``entity_link`` driver query:
    every distinct variant surface produced by ``synth_link_pairs`` —
    exact aliases, corruptions, and affix noise — sorted. Both the Spark
    query and the DuckDB oracle inline this list, so the comparison
    exercises blocking + scoring + top-1 end-to-end on identical
    input."""
    pairs, _ = synth_link_pairs(seed)
    return sorted({m for m, _ in pairs})


def train_link_scorer(
    pairs: list[tuple[str, str]],
    labels: list[int],
    lr: float = 0.5,
    epochs: int = 400,
    seed: int = 3,
) -> LinkScorer:
    """Full-batch logistic GD in float, then e6/e12 quantization."""
    X = np.array(
        [[x / E6 for x in features_e6_py(m, a)] for m, a in pairs],
        dtype=np.float64,
    )
    y = np.array(labels, dtype=np.float64)
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.01, N_FEATURES)
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.mean())
    return LinkScorer(
        np.round(w * E6).astype(np.int64), int(round(b * E6)) * E6
    )
