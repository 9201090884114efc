"""Unigram language-model surprisal scoring — the CCNet-style "how
LM-likely is this document" quality signal, completing the quality triad
(rule features in ``textstats``, trained classifier in
``model/quality_clf``, corpus-statistics LM here).

Training is ONE corpus pass (token counts, top-K vocabulary); scoring is
explode → broadcast vocab join → per-doc aggregate — the decontaminate
shape, corpus never shuffles beyond its own doc_id partial sums.

Cross-engine contract: log-probabilities are frozen to e6 fixed point at
the TOKEN level — ``logp_e6(tok) = floor(10⁶·ln(count)) −
floor(10⁶·ln(total))`` — and all downstream arithmetic (sums, the mean
surprisal floor-division) is exact integers, so Spark and DuckDB agree
bit-for-bit (the only double op is ln of an integer, floored at e6 —
the same integerize-at-the-boundary discipline every oracle here uses).
Out-of-vocabulary tokens score as count 1 (``logp = −ln(total)``),
reported separately as ``n_oov`` so a vocabulary mismatch is observable
rather than silently folded into the score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

E6 = 1_000_000


def _ln_e6(c):
    return F.floor(F.log(c.cast("double")) * E6).cast("long")


def train_unigram_lm(
    df: DataFrame, text_col: str = "text", vocab_size: int = 4096
) -> DataFrame:
    """One corpus pass → ``(token, logp_e6)`` for the top-``vocab_size``
    tokens (ties broken token-ascending so the vocabulary boundary is
    deterministic), plus the ``__total__`` row carrying
    ``floor(10⁶·ln(total_tokens))`` — everything a scorer needs."""
    counts = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(vocab_size)
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            (_ln_e6(F.col("n")) - _ln_e6(F.col("t"))).alias("logp_e6"),
        )
    )
    total_row = total.select(
        F.lit("__total__").alias("token"),
        (-_ln_e6(F.col("t"))).alias("logp_e6"),
    )
    return top.unionByName(total_row)


def lm_surprisal(
    df: DataFrame, lm: DataFrame, text_col: str = "text"
) -> DataFrame:
    """→ ``(doc_id, n_tokens, n_oov, surprisal_e6)`` — mean negative
    log-probability per token (e6 fixed point, exact floor division);
    empty docs score 0. Lower is more LM-like; the standard quality cut
    is a band (too low = boilerplate repetition, too high = gibberish)."""
    oov_logp = lm.filter(F.col("token") == "__total__").select(
        F.col("logp_e6").alias("oov_logp_e6")
    )
    vocab = lm.filter(F.col("token") != "__total__")
    toks = df.select(
        F.col("doc_id"), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    scored = (
        toks.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(oov_logp))
        .select(
            "doc_id",
            F.coalesce(F.col("logp_e6"), F.col("oov_logp_e6")).alias("lp"),
            F.col("logp_e6").isNull().cast("long").alias("oov"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        F.sum("lp").alias("s"),
    )
    neg = -F.col("s")
    n = F.col("n_tokens")
    mean = ((neg - F.pmod(neg, n)) / n).cast("long")
    out = agg.select("doc_id", "n_tokens", "n_oov", mean.alias("surprisal_e6"))
    # docs with zero tokens never reach the groupBy — restore them at 0
    empties = (
        df.select("doc_id")
        .join(out.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_oov"),
            F.lit(0).cast("long").alias("surprisal_e6"),
        )
    )
    return out.unionByName(empties)
