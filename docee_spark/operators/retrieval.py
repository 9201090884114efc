"""BM25 full-text retrieval over the document corpus — the standard
"find the evidence passages" primitive a KG-construction pipeline needs
the moment a human (or a model) asks WHERE a triple came from.

Query model: a fixed bag of lowercase terms; score is Okapi BM25 with
k1 = 1.2, b = 0.75 and the Lucene-style non-negative idf
``ln((N − df + 0.5)/(df + 0.5) + 1) = ln((N+1)/(df+0.5))``.

Cross-engine exactness contract: the idf is decomposed into logs of
INTEGER arguments — ``idf_e6 = ln_e6(2N+2) − ln_e6(2·df+1)`` with
``ln_e6(x) = floor(10⁶·ln(x))``, the same frozen boundary
``operators/lm.py`` pinned — and the tf saturation term is cleared of
fractions algebraically: with avgdl = T/N (T = total corpus tokens),

    tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
      = 22·tf·T / (10·T·tf + 3·T + 9·dl·N)

so each per-term score is ONE exact integer floor-division
``idf_e6·22·tf·T ÷ (10·T·tf + 3·T + 9·dl·N)`` and the document score is
an exact integer sum — Spark and DuckDB agree bit-for-bit. Overflow
bound: the numerator idf_e6·22·tf·T stays under 2⁶³ while
tf·T < 1.6·10¹⁰ (e.g. tf ≤ 10³ with T ≤ 1.6·10⁷ tokens per scored
shard); score larger corpora per-shard and merge top-k across shards —
scores depend only on corpus-level N, T, df, which a first pass
computes globally — asserted in tests/test_retrieval.py.

Scale shape: the posting explode is filtered to the query's terms
BEFORE any shuffle, so only matching postings (∝ query-term frequency,
not corpus size) reach the tf groupBy; document lengths come from a
map-only ``size(tokens)`` projection; N/T/df are a broadcast one-row /
per-term dimension. The final top-k is a total-order sort on
(score desc, doc_id asc) — rank-stable under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import _ln_e6
from .textstats import token_count, tokens

K = 10  # default top-k


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k: int = K,
) -> DataFrame:
    """→ top-``k`` ``(doc_id, n_terms_matched, score_e6)`` under the
    pinned total order (score desc, doc_id asc). Documents matching no
    query term never leave their partition."""
    terms = sorted(set(query_terms))
    arr = tokens(F.lower(F.col(text_col)))
    lengths = df.select(F.col("doc_id"), token_count(F.lower(F.col(text_col))).alias("dl"))
    totals = lengths.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("t_tokens")
    )

    postings = (
        df.select(F.col("doc_id"), F.explode(arr).alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # df_t over the full corpus = distinct docs per (query) term — the
    # early isin filter makes this exact AND cheap (only matching
    # postings were kept; a term's df needs only its own postings).
    dfreq = postings.groupBy("token").agg(
        F.countDistinct("doc_id").alias("dfreq")
    )

    n, t = F.col("n_docs"), F.col("t_tokens")
    idf = _ln_e6(n * 2 + 2) - _ln_e6(F.col("dfreq") * 2 + 1)
    num = (idf * 22 * F.col("tf") * t).cast("long")
    den = (10 * t * F.col("tf") + 3 * t + 9 * F.col("dl") * n).cast("long")
    scored = (
        postings.join(F.broadcast(dfreq), "token")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(totals))
        # `div` is exact bigint floor division (both operands positive)
        # — never a double, so scores stay exact past 2^53
        .select("doc_id", num.alias("num"), den.alias("den"))
        .select("doc_id", F.expr("num div den").alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum("s").cast("long").alias("score_e6"),
        )
        .orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_sql(query_terms: list[str], k: int = K) -> str:
    """The identical frozen arithmetic, differently formulated: tf via
    per-document list filtering (no posting explode), df via a bool-sum,
    a VALUES spine for the query — over the pre-registered ``documents``
    view. ``_TOKENS``-equivalent split inlined."""
    terms = sorted(set(query_terms))
    # SQL-escape inlined literals: a term containing ' must not break
    # (or inject into) the generated oracle
    values = ", ".join("('{}')".format(t.replace("'", "''")) for t in terms)
    toks = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0)"
    return f"""
with q(term) as (values {values}),
dl as (select doc_id, len({toks}) as dl, {toks} as arr from documents),
tot as (select count(*) as n, sum(dl) as t from dl),
tf as (
  select d.doc_id, q.term,
         len(list_filter(d.arr, x -> x = q.term)) as tf, d.dl
  from dl d cross join q
),
m as (select * from tf where tf > 0),
dfreq as (select term, count(*) as dfreq from m group by term),
idf as (
  select term,
    cast(floor(ln(2 * n + 2) * 1000000) as bigint)
      - cast(floor(ln(2 * dfreq + 1) * 1000000) as bigint) as idf_e6
  from dfreq cross join tot
),
per_term as (
  select m.doc_id,
    cast((idf.idf_e6 * 22 * m.tf * tot.t)
         // (10 * tot.t * m.tf + 3 * tot.t + 9 * m.dl * tot.n)
         as bigint) as s
  from m join idf using (term) cross join tot
)
select doc_id, cast(count(*) as bigint) as n_terms_matched,
       cast(sum(s) as bigint) as score_e6
from per_term group by doc_id
order by score_e6 desc, doc_id asc
limit {k}
"""
