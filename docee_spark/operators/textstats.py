"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure Column expressions over a ``text`` column — whole-stage codegen,
no Python in the hot path. Ratios are integerized (×10⁴, rounded) so
results hash identically across engines (floats never cross the oracle
boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# small, fixed stopword inventories for the n-gram/stopword heuristics
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
ZH_STOPCHARS = ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (en branch of T4, dee/utils.py:147-157);
    empty strings filtered so '  ' doesn't yield ghost tokens."""
    return F.filter(F.split(F.trim(col), "\\s+"), lambda t: F.length(t) > 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND on
    letter/digit/other boundaries (a cheap BPE proxy for budget
    estimation): counts maximal runs of [A-Za-z]+ | [0-9]+ | single other
    non-space char."""
    return F.size(
        F.regexp_extract_all(col, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), 0)
    )


def stopword_ratio_e4(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """⌊10⁴ · (#stopword tokens / #tokens)⌋; 0 for empty docs."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, F.floor(hits * 10000 / n)).otherwise(F.lit(0)).cast("long")


def punct_ratio_e4(col: Column) -> Column:
    n = F.length(col)
    punct = n - F.length(F.regexp_replace(col, "[\\p{Punct}]", ""))
    return F.when(n > 0, F.floor(punct * 10000 / n)).otherwise(F.lit(0)).cast("long")


def avg_token_len_e2(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, F.floor(total * 100 / n)).otherwise(F.lit(0)).cast("long")


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (length / punctuation / stopword
    ratios) — the standard pre-training quality gate inputs."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        avg_token_len_e2(c).alias("avg_token_len_e2"),
        stopword_ratio_e4(c).alias("stopword_ratio_e4"),
        punct_ratio_e4(c).alias("punct_ratio_e4"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK-character share vs EN-stopword share.
    Deterministic n-gram/dictionary heuristic (no model): lang_guess ∈
    {zh, en, unk}."""
    c = F.col(text_col)
    n = F.length(c)
    cjk = n - F.length(F.regexp_replace(c, "[\\x{4e00}-\\x{9fff}]", ""))
    en_hits = F.size(F.filter(tokens(F.lower(c)), lambda t: t.isin(*EN_STOPWORDS)))
    guess = (
        F.when(n == 0, F.lit("unk"))
        .when(cjk * 10 >= n, F.lit("zh"))  # ≥10% CJK chars
        .when(en_hits > 0, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return df.select("doc_id", guess.alias("lang_guess"))


def fingerprint_md5(col: Column) -> Column:
    """Exact-content fingerprint (normalized whitespace then md5)."""
    return F.md5(F.regexp_replace(F.trim(col), "\\s+", " "))


def rolling_hash(col: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters: h = Σ h·base + code(c)
    (mod p). Expressed with ``aggregate`` over the char array — stays in
    codegen; the same recurrence is SQL-expressible for the oracle."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


# --------------------------------------------------------------------------
# Repetition / filtering / vocabulary — the standard pre-training corpus
# gates beyond the basic ratio features above (Gopher-style repetition
# signals, C4-style keep rules, vocabulary building).
# --------------------------------------------------------------------------


def token_ngrams(toks: Column, n: int) -> Column:
    """All word n-grams in document order (NON-distinct — counts matter
    for repetition); ``[]`` for docs with fewer than n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gram_stats(grams: Column) -> Column:
    """``struct(total, best, dup)`` over a gram array: ``total`` = its
    size, ``best`` = the count of the most frequent gram, ``dup`` = Σ of
    counts > 1 (grams occurring more than once, with multiplicity).
    Implemented as sort_array + ONE ``aggregate`` run-length pass whose
    accumulator also counts elements, so the entire expensive work is a
    single expression — evaluated once however many ratios are derived
    from the result struct. Pure expression work: no shuffle, no Python.
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("total"),
    )

    def step(acc, x):
        same = x.eqNullSafe(acc["prev"])
        closed_best = F.greatest(acc["best"], acc["run"])
        closed_dup = acc["dup"] + F.when(
            acc["run"] > 1, acc["run"]
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["best"]).otherwise(closed_best).alias("best"),
            F.when(same, acc["dup"]).otherwise(closed_dup).alias("dup"),
            (acc["total"] + 1).alias("total"),
        )

    def finish(acc):
        return F.struct(
            acc["total"].alias("total"),
            F.greatest(acc["best"], acc["run"]).alias("best"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
        )

    return F.aggregate(F.sort_array(grams), acc0, step, finish)


def repetition_scores(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Within-document n-gram repetition signals (the Gopher repetition
    rules' token-count variant): for each n, the total n-gram count, the
    share taken by the single most frequent n-gram (``top``), and the
    share of n-grams occurring more than once (``dup``), both ×10⁴.

    Scale shape: per-row sort_array + one aggregate pass per n — NO
    shuffle, no explode of the corpus; cost is O(tokens · log tokens)
    per document and the stage pipelines with the scan. Evaluation-count
    discipline (the simhash64 lesson): tokenization is bound ONCE via a
    1-element-array lambda, each n's stats are ONE aggregate expression,
    and the packed struct reaches the final projection through a
    Generate (explode of a 1-element array) so deriving six output
    columns cannot re-run any of it."""
    from .dedup import ensure_parallelism  # local: dedup imports us

    toks = tokens(F.col(text_col))
    packed = F.explode(
        F.transform(
            F.array(toks),
            lambda tk: F.struct(
                *[_gram_stats(token_ngrams(tk, n)).alias(f"s{n}") for n in ns]
            ),
        )
    )
    rep = ensure_parallelism(df).select("doc_id", packed.alias("rep"))
    cols = [F.col("doc_id")]
    for n in ns:
        s = F.col("rep").getField(f"s{n}")
        total, best, dup = s["total"], s["best"], s["dup"]
        cols += [
            total.alias(f"n_{n}grams"),
            F.when(total > 0, F.floor(best * 10000 / total))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"top_{n}gram_frac_e4"),
            F.when(total > 0, F.floor(dup * 10000 / total))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"dup_{n}gram_frac_e4"),
        ]
    return rep.select(*cols)


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 30,
    min_avg_token_len_e2: int = 200,
    max_avg_token_len_e2: int = 1000,
    blocklist: tuple[str, ...] = ("lorem", "ipsum"),
) -> DataFrame:
    """C4-style document keep rules as observable per-doc flags: token
    floor, mean-token-length band, blocklist hits, terminal punctuation.
    ``keep`` = floor ∧ band ∧ no blocklist hit (terminal punctuation is
    reported but not gating — it is a line-level rule in C4). All flags
    are ints so results hash identically across engines."""
    c = F.col(text_col)
    ltoks = tokens(F.lower(c))
    n = F.size(ltoks).cast("long")
    avg = avg_token_len_e2(c)
    hits = F.size(F.filter(ltoks, lambda t: t.isin(*blocklist))).cast("long")
    ends = F.trim(c).rlike("[.!?。！？]$")
    keep = (
        (n >= min_tokens)
        & (avg >= min_avg_token_len_e2)
        & (avg <= max_avg_token_len_e2)
        & (hits == 0)
    )
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        avg.alias("avg_token_len_e2"),
        hits.alias("blocklist_hits"),
        ends.cast("int").alias("ends_with_punct"),
        keep.cast("int").alias("keep"),
    )


#: sequential scrub rules: (kind, pattern, replacement). Patterns are
#: restricted to the Java-regex ∩ RE2 common subset so the DuckDB oracle
#: runs the very same expressions. Order matters and is part of the
#: semantics: emails are scrubbed before IPs/phones so the digits inside
#: an address are never double-counted as a phone.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{7,}\d", "<PHONE>"),
)


def pii_audit(col: Column) -> tuple[list[Column], Column]:
    """(per-rule count columns, fully-redacted text) under ``PII_RULES``
    — the shared core of ``pii_scrub`` (audit projection) and
    ``pii_redact`` (text flow). Sequential semantics: each rule counts
    on the text as redacted by the previous rules, so overlapping
    matches resolve deterministically. NULL text counts as empty."""
    red = F.coalesce(col, F.lit(""))  # size(null) is -1
    counts = []
    for kind, pat, repl in PII_RULES:
        counts.append(
            F.size(F.regexp_extract_all(red, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{kind}s")
        )
        red = F.regexp_replace(red, pat, repl)
    return counts, red


def pii_redact(col: Column) -> Column:
    """The fully-scrubbed text column under ``PII_RULES`` — exactly the
    text ``pii_scrub`` fingerprints (same sequential rule order), exposed
    so pipelines can FLOW the redacted text downstream instead of only
    auditing it. NULL text stays NULL (a sink must be able to tell
    "empty document" from "no document"). Pure codegen, map-only."""
    _, red = pii_audit(col)
    return F.when(col.isNull(), col).otherwise(red)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction (CCNet/C4-style pre-training hygiene): count and
    mask emails, IPv4 addresses and international phone numbers.

    Rules apply sequentially (each counts on the text as redacted by the
    previous rules), so overlapping matches resolve deterministically.
    Pure ``regexp_extract_all``/``regexp_replace`` Column expressions —
    whole-stage codegen, no Python, no shuffle; at 100 TB this is a
    map-only pass fused into the scan. Returns
    ``(doc_id, n_emails, n_ips, n_phones, redacted_fp)`` where
    ``redacted_fp`` = md5 of the fully-scrubbed text (the scrubbed text
    itself stays in the plan for sinks; the fingerprint keeps oracle
    rows narrow)."""
    counts, red = pii_audit(F.col(text_col))
    return df.select("doc_id", *counts, F.md5(red).alias("redacted_fp"))


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-level token frequency top-k (vocabulary building — the
    offline aggregation behind the reference's fixed token vocab,
    dee/utils.py:107-145 loads one). explode → two-stage count (map-side
    partial agg collapses each partition to its distinct tokens) →
    TakeOrderedAndProject top-k; total order (n desc, token asc) makes
    the k-boundary deterministic."""
    from .dedup import ensure_parallelism  # local: dedup imports us

    return (
        ensure_parallelism(df)
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def source_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source (host/domain analog) crawl-QA rollup: document count,
    token volume, and exact-duplicate count within the source — the
    aggregation a crawl operator reads to find boilerplate-heavy or
    misbehaving hosts. One groupBy(source) with map-side partial agg;
    the within-group distinct is Spark's two-phase distinct-agg."""
    c = F.col(text_col)
    per = df.select(
        "source",
        token_count(c).alias("n_toks"),
        fingerprint_md5(c).alias("fp"),
    )
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        (F.count("*") - F.countDistinct("fp")).cast("long").alias("n_exact_dups"),
    )


def collocations(
    df: DataFrame, text_col: str = "text", min_pair_count: int = 3
) -> DataFrame:
    """Corpus-level collocation mining: adjacent token bigrams scored by
    pointwise mutual information → ``(w1, w2, pair_n, w1_n, w2_n,
    pmi_e6)``.

    The phrase-mining primitive (word2phrase / "New York"-style
    multi-word-entity discovery) a KG pipeline runs before entity
    linking: high-PMI adjacent pairs are candidate multi-word surfaces.

    Cross-engine contract (same freezing discipline as lm.py): PMI is
    composed from per-count frozen logs —
        pmi_e6 = lnE6(pair_n) + 2·lnE6(N) − lnE6(B) − lnE6(w1_n)
                 − lnE6(w2_n),
    where lnE6(c) = floor(10⁶·ln c), N = total tokens, B = total
    bigrams. Every ln is of an integer and floored at e6, so DuckDB
    reproduces the value bit-for-bit; no float ever crosses the oracle
    boundary. (The additive freeze deviates from float PMI by < 5e-6 —
    irrelevant for ranking, decisive for verifiability.)

    Scale shape: one explode of per-doc bigram arrays → ONE groupBy for
    pair counts (map-side combine), one explode → ONE groupBy for
    unigram counts, two shuffle equi-joins of the (min_pair_count-
    filtered, hence small) pair table against the unigram table, and a
    broadcast of the two scalar totals. ``min_pair_count`` prunes the
    pair table BEFORE the joins — the long tail of hapax bigrams (the
    bulk at web scale) never reaches a shuffle.
    """
    from .lm import _ln_e6

    toks = df.select(tokens(F.col(text_col)).alias("t")).filter(
        F.size("t") >= 2
    )
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_count)
    )
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wn"))
    )
    totals = F.broadcast(
        uni.agg(
            F.sum("wn").cast("long").alias("n_tok"),
        ).crossJoin(bigrams.agg(F.count("*").cast("long").alias("n_bg")))
    )
    out = (
        pair.join(uni.withColumnsRenamed({"w": "w1", "wn": "w1_n"}), "w1")
        .join(uni.withColumnsRenamed({"w": "w2", "wn": "w2_n"}), "w2")
        .crossJoin(totals)
    )
    pmi = (
        _ln_e6(F.col("pair_n"))
        + F.lit(2) * _ln_e6(F.col("n_tok"))
        - _ln_e6(F.col("n_bg"))
        - _ln_e6(F.col("w1_n"))
        - _ln_e6(F.col("w2_n"))
    )
    return out.select(
        "w1", "w2", "pair_n", "w1_n", "w2_n", pmi.alias("pmi_e6")
    )


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bin_width: int = 64,
    quantiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Distribution audit without a global sort: per-group approximate
    quantiles from a fixed-width histogram — the way a 100 TB corpus
    answers "what is the doc-length P99 per source" (an exact quantile
    is a total order over the whole table; a histogram is ONE
    (group, bin) groupBy whose row count is bounded by the value range,
    not the data volume, then a per-group cumulative walk over at most
    that many bins).

    Semantics (deterministic, integer-closed): ``bin = value div
    bin_width`` (non-negative values); quantile q picks the SMALLEST bin
    whose cumulative count reaches ``ceil(q·n/100)`` and reports that
    bin's LOWER edge ``bin·bin_width`` — a value v̂ ≤ true pq < v̂ +
    bin_width. Output: ``(*group_cols, n_values, p<q> ...)``, one wide
    row per group. All arithmetic is exact integers, so the DuckDB
    restatement matches bit-for-bit.
    """
    v = F.col(value_col).cast("long")
    binned = (
        df.filter(v.isNotNull() & (v >= 0))
        .select(*group_cols, (v - F.pmod(v, F.lit(bin_width))).alias("edge"))
        .groupBy(*group_cols, "edge")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("edge")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binned.select(
        *group_cols,
        "edge",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy(*group_cols)).alias("total"),
    )
    # cum ≥ ceil(q·total/100) ⟺ 100·cum ≥ q·total over integers — the
    # ceil never needs materializing
    picks = [
        F.min(
            F.when(F.col("cum").cast("long") * 100 >= F.col("total") * q, F.col("edge"))
        ).alias(f"p{q}")
        for q in quantiles
    ]
    return (
        cum.groupBy(*group_cols)
        .agg(F.max("total").cast("long").alias("n_values"), *picks)
    )


def binned_quantiles_sql(
    source_cte: str,
    group_expr: str,
    value_expr: str,
    bin_width: int = 64,
    quantiles: tuple[int, ...] = (50, 90, 99),
) -> str:
    """The same integer histogram walk restated for DuckDB: bins via
    integer division (the engine uses value − pmod), the cumulative via
    a window, the pick via a filtered min. ``source_cte`` must select
    the group and value columns under their output names."""
    pick_cols = ",\n  ".join(
        f"min(case when cum * 100 >= total * {q} then edge end) as p{q}"
        for q in quantiles
    )
    return f"""
with src as ({source_cte}),
binned as (
  select {group_expr} as grp, ({value_expr} // {bin_width}) * {bin_width} as edge,
         count(*) as n
  from src
  where {value_expr} is not null and {value_expr} >= 0
  group by 1, 2
),
cum as (
  select grp, edge,
    sum(n) over (partition by grp order by edge
                 rows between unbounded preceding and current row) as cum,
    sum(n) over (partition by grp) as total
  from binned
)
select grp as {group_expr}, cast(max(total) as bigint) as n_values,
  {pick_cols}
from cum group by grp
"""


def keywords_tfidf(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document keyword extraction → ``(doc_id, keyword, rank,
    score_e6)``: the top-``k`` tokens by tf·idf — the label a KG
    pipeline attaches to a page when no extractor fires, and the cheap
    doc-topic signal corpus curation mixes on.

    Exactness contract: ``idf_e6 = ln_e6(N + 1) − ln_e6(df_t)`` (both
    logs of integers — the lm.py frozen boundary; +1 smoothing keeps
    corpus-universal tokens at a small positive idf), ``score_e6 =
    tf · idf_e6`` exact bigint products, top-k per doc via row_number
    over the pinned (score desc, token asc) order. Shuffle shape: one
    tf groupBy, a broadcast df-dimension join, one per-doc window — the
    token stream shuffles once.
    """
    toks = (
        df.select(F.col("doc_id"), F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    n_docs = df.select(F.countDistinct("doc_id").alias("n"))
    from .lm import _ln_e6  # local: lm imports textstats.tokens at top

    # the shared floor(ln·1e6) boundary — same helper as lm/retrieval so
    # every ln-consuming operator freezes the identical contract
    idf = _ln_e6(F.col("n") + 1) - _ln_e6(F.col("dfreq"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("token").alias("keyword"),
            (F.col("tf") * idf).alias("score_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_e6").desc(), F.col("keyword").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "keyword", "rank", "score_e6")
    )


def keywords_tfidf_sql(k: int = 3) -> str:
    """The same frozen arithmetic restated for DuckDB over the
    ``documents`` view — list-dedup tf via a grouped unnest, df via a
    distinct-doc count, the identical pinned window order."""
    toks = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0)"
    return f"""
with tk as (select doc_id, unnest({toks}) as token from documents),
tf as (select doc_id, token, count(*) as tf from tk group by 1, 2),
dfreq as (select token, count(distinct doc_id) as dfreq from tf group by 1),
nd as (select count(distinct doc_id) as n from documents),
scored as (
  select tf.doc_id, tf.token as keyword,
    tf.tf * (cast(floor(ln(n + 1) * 1000000) as bigint)
             - cast(floor(ln(dfreq) * 1000000) as bigint)) as score_e6
  from tf join dfreq using (token) cross join nd
),
ranked as (
  select doc_id, keyword, score_e6,
    row_number() over (partition by doc_id
                       order by score_e6 desc, keyword asc) as rank
  from scored
)
select doc_id, keyword, cast(rank as bigint) as rank, score_e6
from ranked where rank <= {k}
"""
