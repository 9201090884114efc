"""Deduplication operators over a document table.

Five families, each shaped for 100 TB:

  * exact            — md5 fingerprint groupBy (one shuffle on the hash)
  * MinHash + LSH    — shingle → k md5-min signature → band buckets →
                       bucket equi-join (candidate pairs only; never a
                       cross join), then exact-Jaccard verify
  * SimHash          — 16-bit sign-aggregated word-hash; near-dup =
                       equal simhash (or banded halves for hamming≤k)
  * n-gram Jaccard   — exact pairwise similarity via shingle inverted
                       index (equi-join on shingle, group by pair)
  * embedding cosine — near-dup by cosine ≥ τ over an embedding column,
                       blocked by sign-LSH buckets (see similarity.py)

Hashes are md5-based: deterministic, engine-portable (bit-identical in
DuckDB for the correctness oracle), and uniformly distributed. Lexico-
graphic MIN over md5 hex digests is a valid min-hash permutation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import fingerprint_md5, tokens


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Small-file inputs (one parquet split) would serialize CPU-heavy
    expression work onto one core — round-robin repartition when the scan
    has too few partitions. At 100 TB the scan already yields thousands of
    splits and this is a no-op (no shuffle inserted)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text."""
    toks = tokens(col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (fingerprint, n_docs, keep_id): one row per distinct content,
    keep_id = min doc_id of the cluster. One hash-partitioned groupBy."""
    return (
        df.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"), F.col("doc_id")
        )
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def drop_exact_duplicates(
    df: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Corpus pre-dedup: keep exactly one document per distinct content
    (the min-id representative). The standard first stage of a webtext
    training pipeline — a window over the fingerprint, one shuffle, no
    join back to the full table."""
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint_md5(F.col(text_col))).orderBy(
        F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signature(shingle_col: Column, k: int = 4) -> Column:
    """k lexicographic-min md5 digests — k permutation min-hashes.

    NOTE: when deriving several values from the signature, select the k
    hashes as separate columns (``minhash_cols``) instead of indexing this
    array with element_at — Catalyst's projection collapse re-evaluates
    the whole array per element_at reference (measured 10× blowup)."""
    return F.array(*minhash_cols(shingle_col, k))


def minhash_cols(shingle_col: Column, k: int = 4) -> list[Column]:
    # NB: the lambda must take exactly one arg (PySpark turns every lambda
    # parameter into a lambda variable); F.lit(f"{i}|") is evaluated
    # eagerly at expression-build time, so the loop variable binds safely.
    return [
        F.array_min(
            F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        )
        for i in range(k)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    bands: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """→ candidate near-duplicate pairs (doc_a < doc_b) that collide in
    ≥1 LSH band. rows-per-band = k/bands. The join is an equi-join on the
    band key — shuffle is proportional to candidates, not to |docs|²."""
    rows = max(1, k // bands)
    df = ensure_parallelism(df)
    mh = minhash_cols(word_shingles(F.col(text_col), shingle_n), k)
    sigd = df.select(
        F.col("doc_id"), *[m.alias(f"m{i}") for i, m in enumerate(mh)]
    )
    band_arr = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[F.col(f"m{b * rows + r}") for r in range(rows)],
            )
            for b in range(bands)
        ]
    )
    banded = sigd.select("doc_id", F.explode(band_arr).alias("band"))
    # one shuffle: group bucket members, expand pairs in-array (a self-join
    # would recompute the signatures for each side — 2× the hashing work)
    grouped = (
        banded.groupBy("band")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x: F.filter(
                        F.transform(
                            F.col("ids"),
                            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                        ),
                        lambda s: s["doc_a"] < s["doc_b"],
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold_e4: int = 8000,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard_e4) for pairs with Jaccard ≥ threshold.
    Inverted-index join: explode shingles, equi-join on shingle, count
    common per pair, |A∪B| = |A|+|B|-common. Never materializes the
    full pair matrix — only pairs sharing ≥1 shingle."""
    sh = ensure_parallelism(df).select(
        "doc_id", F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    # inverted index: group docs per shingle, expand co-occurrence pairs
    # in-array (avoids the self-join recomputing shingles for both sides),
    # then count common shingles per pair
    by_shingle = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_rows = by_shingle.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x: F.filter(
                        F.transform(
                            F.col("ids"),
                            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                        ),
                        lambda s: s["doc_a"] < s["doc_b"],
                    ),
                )
            )
        ).alias("p")
    )
    common = pair_rows.groupBy("p.doc_a", "p.doc_b").agg(
        F.count("*").alias("n_common")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard_e4",
            F.floor(
                F.col("n_common")
                * 10000
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).cast("long"),
        )
    )
    return jac.filter(F.col("jaccard_e4") >= threshold_e4).select(
        "doc_a", "doc_b", "jaccard_e4"
    )


def simhash16(col: Column, shingle_n: int = 1) -> Column:
    """16-bit SimHash over word (or word-shingle) hashes: bit j of the
    result = sign of Σ_words (bit_j(md5(word)) ? +1 : -1). Bits come from
    the first 4 hex chars of the md5 digest — engine-portable."""
    words = word_shingles(col, shingle_n) if shingle_n > 1 else F.array_distinct(tokens(col))
    # per word: int value of first 4 hex chars (16 bits)
    hashes = F.transform(words, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long"))
    def _bit_sum(j: int):
        mask = 1 << j
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    bit_sums = [_bit_sum(j) for j in range(16)]
    out = F.lit(0)
    for j, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("long")


def simhash_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (simhash, n_docs, keep_id): docs sharing a 16-bit simhash.
    Hamming-distance-k variants band the 16 bits into k+1 chunks and
    equi-join per chunk (same shape as minhash_lsh_pairs)."""
    return (
        ensure_parallelism(df)
        .select(simhash16(F.col(text_col)).alias("simhash"), "doc_id")
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def embedding_cosine_pairs(
    df: DataFrame,
    threshold_e6: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sign_bits: int = 6,
) -> DataFrame:
    """→ (id_a, id_b, cosine_e6 ≥ τ): near-duplicate embeddings, blocked
    by a sign-LSH bucket (first ``n_sign_bits`` dimension signs) so the
    pair join is bucket-local; exact cosine verifies candidates."""
    from .similarity import cosine_e6, sign_bucket

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), n_sign_bits).alias("bucket"),
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine_e6(F.col("a.vec"), F.col("b.vec")).alias("cosine_e6"),
    )
    return pairs.filter(F.col("cosine_e6") >= threshold_e6)
