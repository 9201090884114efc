"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): pick pre-training documents whose hashed-n-gram distribution looks
like a TARGET domain (wiki/books-style formal prose) rather than the raw
web SOURCE.

Model: per-document importance log-weight under two bag-of-hashed-n-grams
unigram models,

    logw(doc) = Σ_g [ log p_target(bucket(g)) − log p_source(bucket(g)) ]

with add-one smoothing over ``D`` buckets. The hashing (md5 → first 8 hex
→ mod D) and featurization (lowercased word unigrams + bigrams) are
SHARED with the model quality filter (``model/quality_clf.py``) — one
cross-engine contract. The per-bucket log-ratios are computed offline in
float, quantized to e6 fixed point, and FROZEN
(``golden_fixtures/dsir.npz``, trained by ``tools/train_dsir.py``) — the
quantized integers are the model spec, so scoring is exact integer
arithmetic in Spark, DuckDB and numpy alike.

Scoring is a PURE map: tokens → grams → one ``aggregate`` HOF summing
``element_at`` lookups into a constant-folded D-element literal array —
no shuffle, no explode, no Python, no join; token-volume linear inside
whole-stage codegen at 100 TB (same plan shape as quality_model, which is
plan-asserted).

Selection: the paper resamples by Gumbel-top-k over logw. Cross-engine
exact Gumbel noise would need transcendental floats, so the engine ships
the deterministic policies — threshold keep (``keep_threshold_e6``) and
exact top-k — and leaves noisy resampling to callers (documented
deviation; with temperature → 0 Gumbel-top-k IS top-k).

Reference scope note: the DocEE reference has no data-selection stage;
this operator belongs to the LLM-training-data inventory the survey
prescribes alongside dedup / quality / mixing ops.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model.quality_clf import (
    D_BUCKETS,
    _spark_bucket,
    _spark_grams,
    bucket_py,
    grams_py,
)


class DsirModel:
    """Frozen per-bucket importance log-ratios, e6-quantized int64[D]."""

    def __init__(self, logratio_e6: np.ndarray, d: int = D_BUCKETS):
        if len(logratio_e6) != d:
            raise ValueError(
                f"log-ratio table must have {d} buckets, got {len(logratio_e6)}"
            )
        self.logratio_e6 = np.asarray(logratio_e6, dtype=np.int64)
        self.d = d

    # -- numpy reference scoring (tests + training parity) ---------------
    def logw_e6(self, text: str) -> int:
        return int(
            sum(
                int(self.logratio_e6[bucket_py(g, self.d)])
                for g in grams_py(text)
            )
        )

    def to_arrays(self) -> dict[str, np.ndarray]:
        return {
            "logratio_e6": self.logratio_e6,
            "d": np.array([self.d], dtype=np.int64),
        }

    @classmethod
    def from_arrays(cls, arrays) -> "DsirModel":
        return cls(
            np.asarray(arrays["logratio_e6"], dtype=np.int64),
            int(np.asarray(arrays["d"]).ravel()[0]),
        )


def save_dsir(model: DsirModel, path: str) -> None:
    np.savez(path, **model.to_arrays())


def load_dsir(path: str) -> DsirModel:
    with np.load(path) as z:
        return DsirModel.from_arrays(z)


def train_dsir(
    target_docs: list[str], source_docs: list[str], d: int = D_BUCKETS
) -> DsirModel:
    """Hashed-n-gram bag-of-words importance weights with add-one
    smoothing (the paper's estimator over the hashing-trick buckets).
    Pure numpy — training inputs are corpus SAMPLES (DSIR trains its
    importance model on a fixture-scale sample, not the full corpus;
    at 100 TB the sample comes from ``sampling.sample_fraction``)."""

    def counts(docs: list[str]) -> np.ndarray:
        c = np.zeros(d, dtype=np.int64)
        for t in docs:
            for g in grams_py(t):
                c[bucket_py(g, d)] += 1
        return c

    ct, cs = counts(target_docs), counts(source_docs)
    logp_t = np.log((ct + 1).astype(np.float64) / float(ct.sum() + d))
    logp_s = np.log((cs + 1).astype(np.float64) / float(cs.sum() + d))
    return DsirModel(np.round((logp_t - logp_s) * 1e6).astype(np.int64), d)


def _logw_struct(model: DsirModel, text: Column) -> Column:
    """``struct(n_grams, logw_e6)`` with the gram array and the weight
    literal each bound ONCE via 1-element-array lambdas (the same two
    binding disciplines as quality_clf._margin_struct — measured there;
    without them the D-literal CreateArray rebuilds per gram)."""
    w_arr = F.array(*[F.lit(int(v)) for v in model.logratio_e6])
    d = model.d

    def per_grams(gs):
        def per_weights(W):
            s = F.aggregate(
                gs,
                F.lit(0).cast("long"),
                lambda acc, g: acc
                + F.element_at(W, _spark_bucket(g, d).cast("int") + 1),
            )
            return F.struct(
                F.size(gs).cast("long").alias("n_grams"),
                s.alias("logw_e6"),
            )

        return F.element_at(F.transform(F.array(w_arr), per_weights), 1)

    return F.element_at(F.transform(F.array(_spark_grams(text)), per_grams), 1)


def dsir_scores(
    df: DataFrame, model: DsirModel, text_col: str = "text"
) -> DataFrame:
    """→ ``(doc_id, n_grams, logw_e6)`` — the importance log-weight per
    document (raw sum, as in the paper; callers wanting length-invariant
    scores divide by n_grams, both columns are here)."""
    st = _logw_struct(model, F.col(text_col))
    t = df.select("doc_id", st.alias("_w"))
    return t.select(
        "doc_id",
        F.col("_w.n_grams").alias("n_grams"),
        F.col("_w.logw_e6").alias("logw_e6"),
    )


def dsir_select(
    df: DataFrame,
    model: DsirModel,
    text_col: str = "text",
    keep_threshold_e6: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """The selection step: keep documents by importance weight.

    * ``keep_threshold_e6`` — stateless map-side filter (the 100 TB
      shape: no shuffle at all; pick the threshold from a sample
      quantile).
    * ``top_k`` — exact global top-k (ties → smaller doc_id), one
      TakeOrdered-style sort; for corpus-scale k prefer the threshold.
    """
    if (keep_threshold_e6 is None) == (top_k is None):
        raise ValueError("pass exactly one of keep_threshold_e6 / top_k")
    scored = dsir_scores(df, model, text_col=text_col)
    if keep_threshold_e6 is not None:
        return scored.filter(F.col("logw_e6") >= keep_threshold_e6)
    return scored.orderBy(
        F.col("logw_e6").desc(), F.col("doc_id").asc()
    ).limit(int(top_k))


# --------------------------------------------------------------------------
# deterministic synthetic training corpora (this container has no real
# wiki/CC sample; the TRAINED QUANTIZED INTEGERS are the model spec)
# --------------------------------------------------------------------------

_TARGET_VOCAB = (
    "the of in a is was and history science century government system "
    "theory university research development national population region "
    "language culture economy structure analysis philosophy literature "
    "established according known referred considered described"
).split()

_WEB_VOCAB = (
    "click here free shipping buy now subscribe newsletter cookie login "
    "lol omg wow best deal sale offer limited amazing check out links "
    "share like follow posted reply thread update wkwkwk glorp qzx"
).split()


def synth_dsir_corpora(
    n_per_side: int = 1200, seed: int = 11
) -> tuple[list[str], list[str]]:
    """→ (target_docs, source_docs): target is encyclopedic prose;
    source is the raw-web mixture DSIR filters (30% target-like — the
    realistic overlap that makes the weights a ratio, not a classifier
    of disjoint vocabularies)."""
    rng = np.random.RandomState(seed)

    def doc(vocab) -> str:
        n = rng.randint(15, 45)
        return " ".join(vocab[rng.randint(len(vocab))] for _ in range(n))

    target = [doc(_TARGET_VOCAB) for _ in range(n_per_side)]
    source = [
        doc(_TARGET_VOCAB) if rng.rand() < 0.3 else doc(_WEB_VOCAB)
        for _ in range(n_per_side)
    ]
    return target, source
