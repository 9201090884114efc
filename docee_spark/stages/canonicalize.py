"""Stage 6 — canonicalize: cross-document entity resolution → vertex/edge
tables.

The reference never joins across documents (SURVEY §2.4) — this stage is
the graft's additive KG step (north rule): argument surface strings from
all documents are canonicalized by
  1. deterministic normalization (trim; lowercase for latin scripts),
  2. MinHash-LSH blocking over character-shingle sets — near-duplicate
     surfaces land in a shared band bucket and the bucket resolves to one
     canonical id (single-pass banding; at 10^12-doc scale the iterative
     union-find closure runs as a few extra self-joins, noted below),
  3. broadcast entity-dictionary resolution: a curated surface → id
     dictionary wins over LSH clusters (broadcast hash join, no shuffle on
     the big side).

Everything is built-in expressions: the MinHash signature is
``array_min(transform(shingles, s -> md5(seed || s)))`` — lexicographic min
of md5 hex digests, k independent permutations via k seeds. JVM-side,
codegen'd, and byte-identical to the DuckDB oracle formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(col: Column, n: int = 3) -> Column:
    """Character n-gram shingle set (distinct), padded for short strings."""
    padded = F.rpad(col, n, "_")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.length(padded) - n),
            lambda i: padded.substr(i + 1, F.lit(n)),
        )
    )


def minhash_cols(shingle_col: Column, k: int = 8) -> list[Column]:
    """k md5-min hashes (hex strings) of the shingle set, as separate
    columns — never index a signature array with element_at (projection
    collapse re-evaluates the array per reference; measured 10× blowup)."""
    return [
        F.array_min(
            F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        )
        for i in range(k)
    ]


def band_keys(bands: int, rows: int) -> Column:
    """Band keys from m0..m{k-1} columns: band b = 'b:' + m[b*r] ⧺ …"""
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[F.col(f"m{b * rows + r}") for r in range(rows)],
            )
            for b in range(bands)
        ]
    )


def normalize_surface(col: Column) -> Column:
    return F.when(
        col.rlike("^[\\x00-\\x7F]*$"), F.lower(F.trim(col))
    ).otherwise(F.trim(col))


def canonicalize(
    triples_df: DataFrame,
    entity_dict: DataFrame | None = None,
    k: int = 8,
    bands: int = 4,
    closure_passes: int = 2,
    broadcast_resolved: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """→ (vertices, edges).

    vertices: (entity_id, surface, n_mentions); edges: (src, pred, dst,
    doc_id, recguid). ``entity_dict``: optional (surface, entity_id) —
    joined broadcast (curated dictionaries are bounded by definition).

    ``closure_passes``: label-propagation iterations over the band
    bipartite graph — pass 1 merges surfaces sharing a band; extra passes
    close chains (A~B in band₁, B~C in band₂ → one cluster). Each pass is
    one groupBy on the band key + one on surface, never a cross join;
    cluster diameter beyond ~3 is vanishingly rare for near-dup surfaces,
    so 2 passes is the default (a fixpoint loop is the same code).

    ``broadcast_resolved`` gates the resolved-surface-map side of the two
    edge joins — the map is |distinct surfaces|, which at web scale (10⁹+
    surfaces) exceeds any broadcast budget and would OOM the driver:
      * None (default) — no static hint; AQE broadcasts at runtime iff
        the built map measures under autoBroadcastJoinThreshold (the
        size gate, evaluated on real sizes, zero extra jobs);
      * True  — caller asserts the map is small: static broadcast hint;
      * False — force the shuffle join.
    """
    rows = bands and max(1, k // bands)
    mentions = (
        triples_df.select(F.col("subj").alias("surface"))
        .unionAll(triples_df.select(F.col("obj").alias("surface")))
        .filter(F.col("surface").isNotNull())
    )
    surfaces = (
        mentions.groupBy("surface")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("norm", normalize_surface(F.col("surface")))
    )

    mh = minhash_cols(shingles(F.col("norm")), k=k)
    sigd = surfaces.select(
        "*", *[m.alias(f"m{i}") for i, m in enumerate(mh)]
    )
    membership = sigd.withColumn("band", F.explode(band_keys(bands, rows))).select(
        "surface", "norm", "band"
    )
    # label propagation: rep(surface) := min over its bands of
    # min(rep of band members); seed rep = normalized surface
    rep = membership.select("surface", F.col("norm").alias("lsh_rep")).distinct()
    for _ in range(max(1, closure_passes)):
        band_min = (
            membership.join(rep, "surface")
            .groupBy("band")
            .agg(F.min("lsh_rep").alias("band_min"))
        )
        rep = (
            membership.join(band_min, "band")
            .groupBy("surface")
            .agg(F.min("band_min").alias("lsh_rep"))
        )
    clustered = surfaces.join(rep, "surface")

    if entity_dict is not None:
        clustered = clustered.join(
            F.broadcast(entity_dict.select("surface", F.col("entity_id").alias("dict_id"))),
            "surface",
            "left",
        )
        canon = F.coalesce(F.col("dict_id"), F.col("lsh_rep"))
    else:
        canon = F.col("lsh_rep")
    resolved = clustered.withColumn("entity_id", canon).select(
        "surface", "entity_id", "n_mentions"
    )

    vertices = resolved.groupBy("entity_id").agg(
        F.min("surface").alias("surface"),
        F.sum("n_mentions").alias("n_mentions"),
    )

    # edges: resolve both endpoints. The resolved map is usually small
    # relative to the triple set (distinct surfaces ≪ mentions) but NOT
    # provably bounded — see the broadcast_resolved gate above.
    res_map = resolved.select("surface", "entity_id")
    if broadcast_resolved is True:
        res_map = F.broadcast(res_map)
    elif broadcast_resolved is False:
        res_map = res_map.hint("shuffle_merge")
    edges = (
        triples_df.join(
            res_map.withColumnRenamed("surface", "subj").withColumnRenamed(
                "entity_id", "src"
            ),
            "subj",
        )
        .join(
            res_map.withColumnRenamed("surface", "obj").withColumnRenamed(
                "entity_id", "dst"
            ),
            "obj",
        )
        .select("src", "pred", "dst", "doc_id", "recguid", "event_type")
    )
    return vertices, edges
