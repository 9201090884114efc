"""fastText-style model-based quality classifier over hashed n-grams —
the DCLM / fineweb-edu-class "model filter" stage of a pre-training data
pipeline, as opposed to the rule features in ``operators/textstats.py``.

Model: logistic regression on the HASHING TRICK — every lowercased word
unigram and bigram is hashed into ``D`` buckets (md5-based so Spark,
DuckDB and numpy agree bit-for-bit), and

    margin = b + (1/n_grams) * sum_g w[bucket(g)]      keep ⇔ margin > 0

Weights are trained offline in numpy on a deterministic synthetic corpus
(clean English-like prose vs gibberish/boilerplate negatives — this
container has no fasttext and no real labeled corpus; the TRAINED
QUANTIZED INTEGERS are the model spec, exactly like the other
``golden_fixtures/*.npz`` analogs) and quantized to e6 fixed-point, so
the score is EXACT integer arithmetic in every engine:

    margin_e6 = b_e6 + (S - pmod(S, n)) / n,   S = sum w_e6[bucket(g)]

(the pmod subtraction makes S exactly divisible — floor division without
ever leaving integers; |S| < 2^40 so the double round-trip in Spark's
``/`` is exact).

Scale shape: scoring is a PURE map — tokens → grams → one ``aggregate``
HOF summing ``element_at`` lookups in a constant-folded D-element weight
array literal. No shuffle, no explode, no Python, no join; at 100 TB the
cost is token-volume linear inside whole-stage codegen. (The oracle
re-derives the same arithmetic as unnest + VALUES-join + groupBy — an
independent formulation.)

Reference scope note: the DocEE reference has no corpus-quality model;
this operator belongs to the LLM-training-data inventory the survey
prescribes alongside dedup/langid/token-budget ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D_BUCKETS = 512

# --------------------------------------------------------------------------
# hashing + featurization (the cross-engine contract)
# --------------------------------------------------------------------------


def bucket_py(gram: str, d: int = D_BUCKETS) -> int:
    """numpy/python side of the md5 bucket hash."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16) % d


def grams_py(text: str) -> list[str]:
    """Lowercased word unigrams + bigrams; mirrors the Spark expression
    (whitespace tokens, empty-filtered) exactly."""
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _spark_grams(col: Column) -> Column:
    toks = F.filter(F.split(F.trim(F.lower(col)), "\\s+"), lambda t: F.length(t) > 0)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _spark_bucket(gram: Column, d: int = D_BUCKETS) -> Column:
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long") % d


# --------------------------------------------------------------------------
# the trained model
# --------------------------------------------------------------------------


class QualityClassifier:
    """Quantized hashed-n-gram logistic model. ``w_e6``: int64[D]."""

    def __init__(self, w_e6: np.ndarray, b_e6: int, d: int = D_BUCKETS):
        if len(w_e6) != d:
            raise ValueError(f"weight table must have {d} buckets, got {len(w_e6)}")
        self.w_e6 = np.asarray(w_e6, dtype=np.int64)
        self.b_e6 = int(b_e6)
        self.d = d

    # -- numpy reference scoring (tests + training parity) ---------------
    def margin_e6(self, text: str) -> int:
        gs = grams_py(text)
        if not gs:
            return self.b_e6
        s = int(sum(int(self.w_e6[bucket_py(g, self.d)]) for g in gs))
        n = len(gs)
        return self.b_e6 + (s - (s % n + n) % n) // n

    def keep(self, text: str) -> bool:
        return self.margin_e6(text) > 0

    # -- persistence ------------------------------------------------------
    def to_arrays(self) -> dict[str, np.ndarray]:
        return {
            "w_e6": self.w_e6,
            "b_e6": np.array([self.b_e6], dtype=np.int64),
            "d": np.array([self.d], dtype=np.int64),
        }

    @classmethod
    def from_arrays(cls, arrays) -> "QualityClassifier":
        return cls(
            np.asarray(arrays["w_e6"], dtype=np.int64),
            int(np.asarray(arrays["b_e6"]).ravel()[0]),
            int(np.asarray(arrays["d"]).ravel()[0]),
        )


def save_classifier(clf: QualityClassifier, path: str) -> None:
    np.savez(path, **clf.to_arrays())


def load_classifier(path: str) -> QualityClassifier:
    with np.load(path) as z:
        return QualityClassifier.from_arrays(z)


# --------------------------------------------------------------------------
# Spark scoring — pure codegen, zero shuffle
# --------------------------------------------------------------------------


def _margin_struct(clf: QualityClassifier, text: Column) -> Column:
    """``struct(n_grams, margin_e6)`` with every expensive subexpression
    bound ONCE per row.

    Two binding disciplines matter here (both measured, same trap as the
    minhash signature work in BENCH.md "how we got there"):
    * the gram array and the weight-array literal are threaded through
      1-element-array lambdas — lambda variables cannot be inlined, so
      neither projection collapse nor multi-reference (n_grams + margin +
      keep all derive from the same grams) re-evaluates them;
    * the weight table binds as a lambda variable W, so the 512-literal
      CreateArray is built once per ROW worst-case instead of once per
      GRAM (measured 35 s → ~2 s on 5k docs)."""
    w_arr = F.array(*[F.lit(int(v)) for v in clf.w_e6])
    d = clf.d
    b_e6 = clf.b_e6

    def per_grams(gs):
        def per_weights(W):
            n = F.size(gs)
            s = F.aggregate(
                gs,
                F.lit(0).cast("long"),
                lambda acc, g: acc
                + F.element_at(W, _spark_bucket(g, d).cast("int") + 1),
            )
            fdiv = ((s - F.pmod(s, n)) / n).cast("long")
            margin = (
                F.lit(b_e6) + F.when(n > 0, fdiv).otherwise(F.lit(0))
            ).cast("long")
            return F.struct(
                n.cast("long").alias("n_grams"), margin.alias("margin_e6")
            )

        return F.element_at(F.transform(F.array(w_arr), per_weights), 1)

    return F.element_at(F.transform(F.array(_spark_grams(text)), per_grams), 1)


def margin_expr(clf: QualityClassifier, text: Column) -> Column:
    """``margin_e6`` as a single Column expression (bind-once plumbing in
    ``_margin_struct``)."""
    return _margin_struct(clf, text)["margin_e6"]


def quality_model_scores(
    df: DataFrame, clf: QualityClassifier, text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_grams, margin_e6, keep) — the model-filter verdict per
    document. ``keep`` is emitted as 0/1 long so oracle hashing never
    compares engine boolean encodings. The verdict struct is computed
    once and fanned out through a projection, so the three outputs share
    one gram pass."""
    st = _margin_struct(clf, F.col(text_col))
    t = df.select("doc_id", st.alias("_q"))
    return t.select(
        "doc_id",
        F.col("_q.n_grams").alias("n_grams"),
        F.col("_q.margin_e6").alias("margin_e6"),
        (F.col("_q.margin_e6") > 0).cast("long").alias("keep"),
    )


# --------------------------------------------------------------------------
# offline training on a deterministic synthetic corpus
# --------------------------------------------------------------------------

_GOOD_VOCAB = (
    "the a and of to in is it that for was with his her they this from "
    "market company report government research people history science "
    "water energy music school city country world system public national "
    "development information building century growth policy"
).split()

_BAD_TOKENS = (
    "qzx vvvv ka7f zzzz xx91 jjjj q0q0 glorp wkwkwk 7h7h "
    "asdf1234 xXx pppppp zq9 kkkkkkkk lorem0 b4b4b4"
).split()


def synth_corpus(n_per_class: int = 1500, seed: int = 42):
    """Deterministic labeled corpus: positives are stopword-rich English-
    like prose; negatives are repeated/gibberish token soup (the spam /
    boilerplate / non-language failure modes model filters exist for)."""
    rng = np.random.RandomState(seed)
    docs: list[str] = []
    labels: list[int] = []
    for _ in range(n_per_class):
        n = rng.randint(12, 40)
        words = [_GOOD_VOCAB[rng.randint(len(_GOOD_VOCAB))] for _ in range(n)]
        docs.append(" ".join(words) + ".")
        labels.append(1)
    for _ in range(n_per_class):
        kind = rng.randint(3)
        if kind == 0:  # gibberish soup
            n = rng.randint(12, 40)
            words = [_BAD_TOKENS[rng.randint(len(_BAD_TOKENS))] for _ in range(n)]
        elif kind == 1:  # one token repeated (spam)
            w = _BAD_TOKENS[rng.randint(len(_BAD_TOKENS))]
            words = [w] * rng.randint(12, 40)
        else:  # keyword-stuffed mix, still no real grammar
            n = rng.randint(12, 40)
            words = [
                (_BAD_TOKENS + ["click", "free", "win"])[rng.randint(len(_BAD_TOKENS) + 3)]
                for _ in range(n)
            ]
        docs.append(" ".join(words))
        labels.append(0)
    order = rng.permutation(len(docs))
    return [docs[i] for i in order], np.array([labels[i] for i in order])


def training_features(docs: list[str], d: int = D_BUCKETS) -> np.ndarray:
    """Mean-of-bucket feature matrix for :func:`train_quality_clf`.
    Exposed so the SQL training witness (tests/test_training_witness.py)
    replays gradient descent on the EXACT matrix the shipped artifact
    saw."""
    feats = np.zeros((len(docs), d), dtype=np.float64)
    for i, t in enumerate(docs):
        gs = grams_py(t)
        if not gs:
            continue
        for g in gs:
            feats[i, bucket_py(g, d)] += 1.0
        feats[i] /= len(gs)
    return feats


def train_quality_clf(
    docs: list[str],
    labels: np.ndarray,
    d: int = D_BUCKETS,
    epochs: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> QualityClassifier:
    """Full-batch gradient descent on mean-of-bucket features. Exact
    logistic gradient, numpy only; quantizes to e6 at the end (the
    quantized integers ARE the shipped model)."""
    n_docs = len(docs)
    feats = training_features(docs, d)
    y = labels.astype(np.float64)
    w = np.zeros(d)
    b = 0.0
    for _ in range(epochs):
        z = feats @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (feats.T @ g / n_docs + l2 * w)
        b -= lr * float(g.mean())
    return QualityClassifier(
        np.round(w * 1e6).astype(np.int64), int(round(b * 1e6)), d
    )
