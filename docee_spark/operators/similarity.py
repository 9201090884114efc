"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exactness baseline: broadcast the
    (small) query set against the corpus; one scan, no shuffle on the
    corpus side, window-ranked top-k.
  * sign-LSH bucketed ANN — the scale path: random-hyperplane-style
    bucketing on dimension signs blocks the corpus; queries probe only
    their own bucket. At 100 TB the bucket column is a partition key so
    probes prune partitions.

Scores are integerized (×10⁶, floored) — deterministic cross-engine
comparison, ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_e6(a: Column, b: Column) -> Column:
    """⌊10⁶ · cos(a,b)⌋ as long; 0 for zero vectors."""
    denom = norm(a) * norm(b)
    return (
        F.when(denom > 0, F.floor(dot(a, b) * 1_000_000 / denom))
        .otherwise(F.lit(0))
        .cast("long")
    )


def sign_bucket(vec: Column, n_bits: int = 6) -> Column:
    """LSH bucket from the signs of the first n_bits dimensions —
    a fixed, data-independent hyperplane family (axis-aligned). For
    random hyperplanes, pre-project with a broadcast matrix first.
    Dimensions past the vector length contribute bit 0 (F.get returns
    null out of bounds), so n_bits > dim degrades gracefully."""
    out = F.lit(0)
    for j in range(n_bits):
        out = out + F.when(F.get(vec, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("int")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine_e6, rank≤k), excluding self.
    ``queries`` is broadcast: the corpus never shuffles."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_e6(F.col("qvec"), F.col("cvec")).alias("cosine_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_e6", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates = corpus vectors in the query's sign bucket; exact
    cosine + window top-k within candidates. Recall < 1 by design; the
    bucket key is the blocking/partition key at scale."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_e6(F.col("qvec"), F.col("cvec")).alias("cosine_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_e6", "rank")
    )
