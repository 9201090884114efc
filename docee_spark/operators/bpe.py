"""Distributed BPE tokenizer training — the merge-learning loop as
DataFrame operations.

Classic byte-pair encoding (Sennrich et al. 2016) trains on the WORD
FREQUENCY table, not the corpus: one corpus pass builds (word, count),
then every merge round counts adjacent symbol pairs weighted by word
count, picks the most frequent pair, and fuses it. That structure is
exactly right at 100 TB — the corpus is touched ONCE (a tokens explode +
groupBy), and the iterative part runs over |vocab| rows (sublinear in
corpus size), one tiny groupBy + top-1 per round.

Cross-engine representation: a word's symbol sequence is encoded as a
string with every symbol wrapped in a \\x1f sentinel —
``W(s)=\\x1f s \\x1f``, word = ``W(s1)W(s2)…`` — so applying merge (a,b)
is a LITERAL string replace of ``W(a)W(b)`` with ``W(a+b)``: leftmost
non-overlapping in Spark and DuckDB alike, which is precisely BPE's
application order. The oracle unrolls the same rounds in generated SQL
(counts → deterministic top-1 → replace), sharing no code with this
module.

Tie-breaks are pinned (count desc, left asc, right asc) so training is
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
END_WORD = "</w>"


def _wrap(sym: Column | str) -> Column:
    return F.concat(F.lit(SEP), sym if isinstance(sym, Column) else F.lit(sym), F.lit(SEP))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus pass → (word, n). Words containing the sentinel
    byte are dropped (cannot be encoded; never legitimate text)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), "\\s+"),
        lambda t: (F.length(t) > 0) & ~t.contains(SEP),
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _encode(word: Column) -> Column:
    """word → wrapped symbol string: chars then the end-of-word symbol."""
    syms = F.concat(F.split(word, ""), F.array(F.lit(END_WORD)))
    return F.aggregate(
        syms, F.lit("").cast("string"), lambda acc, s: F.concat(acc, _wrap(s))
    )


def _symbols(enc: Column) -> Column:
    """wrapped string → symbol array (split on the doubled sentinel,
    trim the outer sentinels off the first/last element)."""
    return F.transform(
        F.split(enc, SEP + SEP), lambda x: F.regexp_replace(x, SEP, "")
    )


def _pair_counts(wc: DataFrame) -> DataFrame:
    syms = _symbols(F.col("enc"))
    # guard: a fully-fused word has ONE symbol, and sequence(1, 0) is a
    # DESCENDING sequence in Spark, not empty
    pairs = F.when(F.size(syms) < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        )
    )
    return (
        wc.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def train_bpe(wc: DataFrame, n_merges: int = 10) -> list[dict]:
    """Learn ``n_merges`` merges from a (word, n) table →
    [{rank, left, right, merged, cnt}]. Each round: one groupBy over the
    encoded vocab + a 1-row top-1 fetch; the vocab table re-encodes via
    one literal replace. The vocab is localCheckpointed per round (flat
    lineage across rounds). Stops early if no pair remains."""
    enc = wc.select("word", "n", _encode(F.col("word")).alias("enc")).localCheckpoint()
    merges: list[dict] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(enc)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "cnt": cnt}
        )
        pat = SEP + a + SEP + SEP + b + SEP
        rep = SEP + a + b + SEP
        enc = enc.select(
            "word", "n", F.replace(F.col("enc"), F.lit(pat), F.lit(rep)).alias("enc")
        ).localCheckpoint()
    return merges


def bpe_merge_table(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """Driver-query wrapper: corpus → learned merge table as a DataFrame
    (rank, left, right, merged, cnt)."""
    spark = df.sparkSession
    merges = train_bpe(word_counts(df, text_col), n_merges)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["cnt"]) for m in merges],
        "rank long, left string, right string, merged string, cnt long",
    )


def bpe_tokens_expr(word: Column, merges: list[dict]) -> Column:
    """Corpus-scale application of learned merges as a PURE column
    expression: encode → K chained literal replaces (one per merge, in
    rank order — replace is leftmost non-overlapping, i.e. BPE
    application order) → split back to symbols. Map-only whole-stage
    work, no UDF; K is the merge count, fixed at training time."""
    enc = _encode(word)
    for m in merges:
        enc = F.replace(
            enc,
            F.lit(SEP + m["left"] + SEP + SEP + m["right"] + SEP),
            F.lit(SEP + m["merged"] + SEP),
        )
    return _symbols(enc)


def apply_bpe(word: str, merges: list[dict]) -> list[str]:
    """Reference application (python; tokenizing a corpus at scale would
    reuse the same replace-chain as a column expression): apply merges in
    rank order, leftmost non-overlapping."""
    enc = "".join(SEP + c + SEP for c in list(word) + [END_WORD])
    for m in merges:
        enc = enc.replace(
            SEP + m["left"] + SEP + SEP + m["right"] + SEP,
            SEP + m["merged"] + SEP,
        )
    return [s.strip(SEP) for s in enc.split(SEP + SEP)]


def bpe_sql(n_merges: int = 10) -> str:
    """Generated DuckDB oracle: the same rounds unrolled — counts from
    the re-split symbol arrays, deterministic top-1, re-encode via
    replace with scalar subqueries. Expects a relation ``wc(word, n)``
    already defined in the enclosing WITH list."""
    s = SEP

    def enc_cte(k: int, top: int, prev: str) -> str:
        return f"""e{k} as materialized (
  select word, n,
    replace(enc, (select '{s}' || a || '{s}{s}' || b || '{s}' from t{top}),
                 (select '{s}' || a || b || '{s}' from t{top})) as enc
  from {prev}
)"""

    def top_cte(k: int, prev: str) -> str:
        return f"""p{k} as (
  select sym[i] as a, sym[i + 1] as b, sum(n) as cnt
  from (
    select n, list_transform(string_split(enc, '{s}{s}'),
                             x -> replace(x, '{s}', '')) as sym
    from {prev}
  ), unnest(range(1, len(sym))) as u(i)
  group by 1, 2
),
t{k} as materialized (
  select a, b, cnt from p{k}
  order by cnt desc, a asc, b asc limit 1
)"""

    lines = [
        f"""e0 as materialized (
  select word, n,
    array_to_string(list_transform(
      list_append(string_split(word, ''), '</w>'),
      c -> '{s}' || c || '{s}'), '') as enc
  from wc
)"""
    ]
    prev = "e0"
    selects = []
    for k in range(n_merges):
        lines.append(top_cte(k, prev))
        lines.append(enc_cte(k + 1, k, prev))
        selects.append(
            f"select cast({k} as bigint) as rank, a as left, b as right, "
            f"a || b as merged, cast(cnt as bigint) as cnt from t{k}"
        )
        prev = f"e{k + 1}"
    return ",\n".join(lines) + "\n" + "\nunion all ".join(selects)
