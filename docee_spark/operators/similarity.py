"""Similarity search over an embedding column (array<float>).

Three paths:
  * brute-force cosine top-k — the exactness baseline: broadcast the
    (small) query set against the corpus; one scan, no shuffle on the
    corpus side, window-ranked top-k.
  * sign-LSH bucketed ANN — a data-independent scale path: random-
    hyperplane-style bucketing on dimension signs blocks the corpus;
    queries probe only their own bucket.
  * IVF (inverted-file) ANN — the data-ADAPTIVE scale path: a seeded
    numpy spherical k-means (integer-exact arithmetic → bit-reproducible
    centroids) trains a coarse quantizer; every corpus vector is assigned
    to its nearest centroid (at 100 TB the cluster id is the partition
    key), and a query probes only its ``nprobe`` nearest clusters —
    recall/cost tunable, the standard FAISS-IVF shape re-expressed as a
    broadcast-probe equi-join.

Scores are integerized (quantized ×10⁴ integer dot products on unit
vectors ≈ cosine ×10⁸) — deterministic cross-engine comparison, ties
broken by id.
"""

from __future__ import annotations

import numpy as np
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


def probe_buckets(vec: Column, n_bits: int = 6, n_flips: int = 0) -> Column:
    """Multi-probe bucket list: the base sign bucket plus ``n_flips``
    Hamming-1 neighbours, flipping the bits whose dimensions have the
    smallest |value| — the hyperplanes the vector sits closest to, i.e.
    the classic multi-probe LSH probe order (Lv et al., VLDB'07). Recovers
    the recall sign-blocking loses on boundary vectors at a cost of
    ``1 + n_flips`` probe rows per query (corpus side stays 1 bucket)."""
    base = sign_bucket(vec, n_bits)
    if n_flips <= 0:
        return F.array(base)
    # dims past the vector length sort LAST (|value| = +inf), not first:
    # with |0.0| they would win every flip slot and spend all probes on
    # bits where no vector differs — silently disabling multi-probe
    # whenever n_bits > dim
    dims = F.array(
        *[
            F.struct(
                F.coalesce(
                    F.abs(F.get(vec, j)), F.lit(float("inf"))
                ).alias("a"),
                F.lit(j).alias("j"),
                F.lit(1 << j).alias("mask"),
            )
            for j in range(n_bits)
        ]
    )
    flips = F.slice(F.array_sort(dims), 1, min(n_flips, n_bits))
    return F.concat(
        F.array(base),
        F.transform(flips, lambda s: base.bitwiseXOR(s["mask"]).cast("int")),
    )


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
    probe_flips: int = 0,
) -> DataFrame:
    """ANN: candidates = corpus vectors in the query's sign bucket (plus
    ``probe_flips`` Hamming-1 probe buckets — multi-probe, see
    probe_buckets); exact cosine + window top-k within candidates. Recall
    < 1 by design; the bucket key is the blocking/partition key at scale.
    Each corpus vector lives in exactly one bucket, so multi-probe never
    duplicates a (query, neighbor) candidate pair."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            probe_buckets(F.col(vec_col), n_bits, probe_flips)
        ).alias("bucket"),
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


# --- IVF (inverted file) ANN -------------------------------------------------

def quantize_vec(col: Column, scale: int = 10_000) -> Column:
    """float vector → exact integer vector (×scale, rounded): integer dot
    products are then bit-portable across engines (all sums < 2⁵³)."""
    return F.transform(col, lambda x: F.round(x * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def train_ivf_centroids(
    qvecs: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Seeded spherical k-means over QUANTIZED (int64) vectors.

    Assignments use exact integer dot products (numpy int64 matmul takes
    the non-BLAS path → deterministic, no float reduction order), ties →
    lowest centroid id (np.argmax first-max). Centroid update = rounded
    mean, re-quantized each iteration. Bit-reproducible for a given
    (input, seed) — the oracle inlines the resulting centroids.
    """
    qvecs = np.asarray(qvecs, dtype=np.int64)
    rng = np.random.default_rng(seed)
    cents = qvecs[rng.choice(len(qvecs), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(qvecs @ cents.T, axis=1)
        new = []
        for c in range(n_centroids):
            members = qvecs[assign == c]
            new.append(
                np.round(members.mean(axis=0)).astype(np.int64)
                if len(members)
                else cents[c]
            )
        cents = np.stack(new)
    return cents


def _centroid_array(centroids: np.ndarray) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(int(v)) for v in c]).alias("cvec"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def ivf_assign(qvec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id by exact integer dot (ties → lowest cid).
    One aggregate over the centroid literal array; the per-centroid dot
    is bound once through a 1-element-array lambda (projection-collapse
    rule)."""
    init = F.struct(
        F.lit(-1).cast("int").alias("cid"),
        F.lit(-(1 << 62)).cast("long").alias("dot"),
    )

    def merge(acc: Column, c: Column) -> Column:
        return F.element_at(
            F.transform(
                F.array(dot_q(qvec, c["cvec"])),
                lambda d: F.when(
                    d > acc["dot"],
                    F.struct(c["cid"].alias("cid"), d.alias("dot")),
                ).otherwise(acc),
            ),
            1,
        )

    return F.aggregate(_centroid_array(centroids), init, merge)["cid"]


def ivf_probes(qvec: Column, centroids: np.ndarray, nprobe: int) -> Column:
    """The query's nprobe nearest centroid ids (dot desc, cid asc) —
    array_sort on (−dot, cid) structs, one pass."""
    scored = F.transform(
        _centroid_array(centroids),
        lambda c: F.struct(
            (-dot_q(qvec, c["cvec"])).alias("neg"), c["cid"].alias("cid")
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cid"]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, dot_q, rank ≤ k): IVF ANN. The corpus is
    scanned once and blocked by nearest-centroid id (the partition key at
    scale); each query probes its nprobe nearest clusters via a broadcast
    equi-join. Exact integer dot ranks candidates; recall < 1 by design,
    tunable with nprobe."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_vec(F.col(vec_col)).alias("cvec_q"),
    ).select(
        "neighbor_id", "cvec_q", ivf_assign(F.col("cvec_q"), centroids).alias("cluster")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_vec(F.col(vec_col)).alias("q"),
    ).select(
        "query_id",
        "q",
        F.explode(ivf_probes(F.col("q"), centroids, nprobe)).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot_q(F.col("q"), F.col("cvec_q")).alias("dot_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )
