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


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (per shard) into
    one token stream and chunk it into fixed-``seq_len`` training
    sequences — the standard pre-training prep step (GPT-2/3, Pile;
    documents separated by an EOS the tokenizer adds, boundaries fall
    mid-document by design).

    → ``(shard, seq_id, doc_id, tok_start, tok_end, seq_off)``: one row
    per (document, sequence) SLICE — document tokens ``[tok_start,
    tok_end)`` (doc-local, T4 whitespace tokens) land in shard-local
    sequence ``seq_id`` at offset ``seq_off``. A document longer than
    ``seq_len`` spans several sequences; each shard's final sequence is
    partial (trainers pad or drop it). Empty documents vanish (their
    empty slice carries no tokens).

    Determinism/scale shape: a global concatenation order would need a
    global sort, so packing is SHARDED — shard = md5(doc_id) mod
    ``n_shards`` (one shard ≈ one output training file), order within a
    shard = doc_id. ONE window (sum over the shard partition — a
    per-shard sort, never global), then a map-side sequence explode of
    at most ⌈n_tok/seq_len⌉+1 rows per doc. Shards are md5-balanced, so
    the window partitions are even; at 100 TB pick n_shards ≈ the number
    of training files and the sort stays in-memory per shard."""
    from .textstats import token_count

    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    n_tok = token_count(F.col(text_col)).cast("long")
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            (h.cast("long") % n_shards).alias("shard"),
            n_tok.alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    pos = base.select(
        "doc_id",
        "shard",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start"),
    )
    first = F.floor(F.col("start") / seq_len).cast("long")
    last = F.floor((F.col("start") + F.col("n_tok") - 1) / seq_len).cast("long")
    sliced = pos.select(
        "doc_id",
        "shard",
        "n_tok",
        "start",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    tok_start = F.greatest(F.lit(0), F.col("seq_id") * seq_len - F.col("start"))
    tok_end = F.least(
        F.col("n_tok"), (F.col("seq_id") + 1) * seq_len - F.col("start")
    )
    return sliced.select(
        "shard",
        "seq_id",
        "doc_id",
        tok_start.cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        (F.col("start") + tok_start - F.col("seq_id") * seq_len)
        .cast("long")
        .alias("seq_off"),
    )
