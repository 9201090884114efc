"""Deterministic sampling and data-mixture operators.

The corpus-composition steps of a pre-training pipeline: reproducible
document sampling (never ``F.rand`` — a retry or speculative re-execution
of a task must select the same rows) and per-source token budgeting
("mixture building": cap each source's contribution at a token budget).

All selection is keyed on md5 arithmetic shared with the DuckDB oracles
(Spark ``conv(substring(md5 ...))`` ↔ DuckDB ``'0x' || substring(md5
...)``), so results are bit-identical across engines and across reruns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key_e4(col: Column, salt: str = "") -> Column:
    """Deterministic uniform key in [0, 10⁴): the first 8 md5 hex digits
    of ``salt|value`` mod 10⁴. Pure expression — a map-only pass."""
    h = F.md5(F.concat(F.lit(salt + "|"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 10000).alias(
        "sample_key_e4"
    )


def hash_sample(
    df: DataFrame,
    rate_e4: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ≈``rate_e4``/10⁴ of rows, selected by hash of ``key_col`` —
    the reproducible Bernoulli sample. Unlike ``df.sample()`` this is
    stable under task retries, repartitioning and engine versions, and
    the SAME salt selects the SAME documents in every stage that needs a
    coordinated split (train/heldout)."""
    return df.where(sample_key_e4(F.col(key_col), salt) < rate_e4)


def stratified_sample(
    df: DataFrame,
    rates_e4: dict[str, int],
    bucket_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_rate_e4: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the quality-weighted
    downsampling step (keep 100% of high-quality docs, x% of mid, y% of
    tail). ``rates_e4`` maps bucket value → keep rate; unlisted buckets
    get ``default_rate_e4``. The rate table is tiny and inlined as a
    CASE expression (no join, no shuffle — still a map-only scan)."""
    rate = F.lit(default_rate_e4)
    for bucket, r in sorted(rates_e4.items()):
        rate = F.when(F.col(bucket_col) == bucket, F.lit(r)).otherwise(rate)
    return df.where(sample_key_e4(F.col(key_col), salt) < rate)


def mixture_cap(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    default_budget: int = 0,
) -> DataFrame:
    """Per-source token budgeting (mixture building): scan each source's
    documents in deterministic ``doc_id`` order and keep documents while
    the source's running token total stays within its budget (the first
    document to cross the line is kept — budgets are floors of work, and
    dropping it would starve sources whose first doc exceeds the cap).

    → ``(doc_id, source, n_toks, cum_toks, kept)`` — flags, not a
    filter, so the drop volume is observable.

    Scale shape: ONE hash partition + sort by source (the greedy scan is
    inherently sequential per source — that IS the semantics); a hot
    source concentrates on one reducer, but the window carries only
    (doc_id, n_toks) — bytes stay tiny even for a million-doc host, and
    every other column rejoins map-side downstream. The budget table is
    inlined as a CASE expression."""
    from .textstats import token_count

    budget = F.lit(default_budget)
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(b)).otherwise(budget)
    w = Window.partitionBy(source_col).orderBy("doc_id")
    per = df.select(
        "doc_id",
        F.col(source_col).alias("source"),
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
    )
    return per.select(
        "doc_id",
        "source",
        "n_toks",
        F.sum("n_toks").over(w).cast("long").alias("cum_toks"),
        ((F.sum("n_toks").over(w) - F.col("n_toks")) < budget)
        .cast("int")
        .alias("kept"),
    )
