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
    """Character n-gram shingle set (distinct), padded for short strings.

    The pad must be CONDITIONAL: ``rpad(col, n)`` TRUNCATES strings
    longer than n (in Spark and DuckDB alike), which would silently turn
    the shingle set into "the first n characters" and degrade MinHash-LSH
    surface clustering into prefix-equality blocking (every 'o…' order id
    sharing a 3-char prefix would merge into one entity)."""
    padded = F.when(F.length(col) >= n, col).otherwise(F.rpad(col, n, "_"))
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


def merge_triples(
    old_triples: DataFrame,
    delta_triples: DataFrame,
    deleted_docs: DataFrame | None = None,
    **canon_kwargs,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental KG maintenance under a recrawl → ``(triples, vertices,
    edges)``.

    Documents present in ``delta_triples`` REPLACE their previous triples
    wholesale (a re-extracted page re-emits all its triples — partial
    per-triple diffs are not meaningful for extraction output);
    ``deleted_docs`` (a ``doc_id`` frame: 404s, robots-revoked, purged
    pages) drop out entirely; every other document's triples survive
    UNTOUCHED — extraction (the expensive per-document decode/inference
    at 100 TB) never re-runs for survivors.

    Scale shape: survivor selection is ONE anti-join on ``doc_id``
    (recrawl deltas are small relative to the corpus, so AQE plans it
    broadcast; worst case one hash shuffle). Canonicalization then
    re-runs over the merged triples because cluster representatives are
    GLOBAL — a new surface can bridge two old clusters or become a
    cluster's new minimum — so per-cluster patching cannot preserve the
    full-recompute identity this function guarantees (tested:
    merge(old, Δ) ≡ canonicalize(survivors ∪ Δ) exactly). Its expensive
    input is the distinct-surface vocabulary, which grows sublinearly in
    corpus size; the per-mention edge resolution is the same two joins a
    cold build pays.

    Idempotent: re-applying the same delta is a no-op (replacement
    semantics), so a resumed/retried merge job converges. A document in
    BOTH ``delta_triples`` and ``deleted_docs`` is deleted — deletion
    wins (a purge order outranks a concurrent re-extraction)."""
    changed = delta_triples.select("doc_id").distinct()
    if deleted_docs is not None:
        dele = deleted_docs.select("doc_id")
        changed = changed.unionByName(dele).distinct()
        delta_triples = delta_triples.join(dele, "doc_id", "left_anti")
    survivors = old_triples.join(changed, "doc_id", "left_anti")
    merged = survivors.unionByName(delta_triples)
    vertices, edges = canonicalize(merged, **canon_kwargs)
    return merged, vertices, edges


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
    # computed ONCE: surfaces feeds the signature chain AND the final
    # clustered join, and membership is referenced twice per propagation
    # pass — without reuse Spark re-executes the whole upstream
    # union+groupBy per reference (2^passes recompute; measured 35→9 s on
    # 145k triples). persist (LAZY), not localCheckpoint (EAGER): this
    # function is called while pipelines are still BUILDING their plan,
    # and an eager checkpoint here forces the whole upstream pipeline to
    # execute at plan-build time — and then again at action time
    # (measured: the fused-pipeline bench regressed 2.8→8.1 s with
    # checkpoints). |distinct surfaces| is the small vocabulary table, so
    # the cache is cheap; execution reuses the InMemoryRelation across
    # every reference.
    surfaces = (
        mentions.groupBy("surface")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("norm", normalize_surface(F.col("surface")))
    ).persist()

    mh = minhash_cols(shingles(F.col("norm")), k=k)
    sigd = surfaces.select(
        "*", *[m.alias(f"m{i}") for i, m in enumerate(mh)]
    )
    membership = (
        sigd.withColumn("band", F.explode(band_keys(bands, rows)))
        .select("surface", "norm", "band")
        .persist()
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
    return _resolve_tables(
        clustered, triples_df, entity_dict, broadcast_resolved
    )


def _resolve_tables(
    clustered: DataFrame,
    triples_df: DataFrame,
    entity_dict: DataFrame | None,
    broadcast_resolved: bool | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared tail of canonicalize/canonicalize_verified: dictionary
    override, vertex aggregation, edge resolution. ``clustered`` =
    (surface, n_mentions, lsh_rep, …)."""
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


def canonicalize_verified(
    triples_df: DataFrame,
    jaccard_e4: int = 6000,
    entity_dict: DataFrame | None = None,
    k: int = 8,
    bands: int = 4,
    max_bucket: int = 64,
    max_iters: int = 20,
    broadcast_resolved: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Precision-controlled canonicalization → (vertices, edges).

    ``canonicalize`` clusters surfaces by LSH band CO-OCCURRENCE alone —
    recall-oriented, and a single band collision merges two entities for
    good. This variant follows the standard blocking→matching→clustering
    shape instead: LSH bands only BLOCK; every candidate pair is VERIFIED
    by true character-shingle Jaccard (``⌊10⁴·|∩|/|∪|⌋ ≥ jaccard_e4``,
    exact integer floor); clusters are connected components over verified
    edges only (min-label propagation + pointer jumping via
    ``duplicate_clusters``).

    Scale shape: candidate pairs come from banded groupBy buckets with
    the dedup operators' cap discipline (``_cap_buckets`` — over-cap
    bands are boilerplate-norm buckets, dropped with OBSERVED counters,
    never an unbounded self-join); verification touches candidates only;
    node ids are distinct NORMS (strictly smaller than the surface
    vocabulary). Everything downstream (dictionary override, vertex agg,
    edge resolution) is shared with ``canonicalize``."""
    from ..operators.dedup import _cap_buckets, _pairs_from_ids, duplicate_clusters

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
    ).localCheckpoint()

    norms = (
        surfaces.select("norm")
        .distinct()
        .withColumn("sh", shingles(F.col("norm")))
        .localCheckpoint()
    )
    mh = minhash_cols(F.col("sh"), k=k)
    sigd = norms.select("norm", *[m.alias(f"m{i}") for i, m in enumerate(mh)])
    membership = sigd.withColumn("band", F.explode(band_keys(bands, rows))).select(
        "norm", "band"
    )
    buckets = membership.groupBy("band").agg(
        F.sort_array(F.collect_list("norm")).alias("ids")
    )
    pairs = (
        _pairs_from_ids(_cap_buckets(buckets, max_bucket, "canon_verified"))
        .distinct()
        .withColumnRenamed("doc_a", "norm_a")
        .withColumnRenamed("doc_b", "norm_b")
    )
    sh_map = norms.select("norm", "sh")
    cand = pairs.join(
        sh_map.select(F.col("norm").alias("norm_a"), F.col("sh").alias("sh_a")),
        "norm_a",
    ).join(
        sh_map.select(F.col("norm").alias("norm_b"), F.col("sh").alias("sh_b")),
        "norm_b",
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    uni = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("long")
    num = inter * 10000
    jac = ((num - F.pmod(num, uni)) / uni).cast("long")  # exact floor
    verified = cand.filter(jac >= jaccard_e4).select("norm_a", "norm_b")

    clusters = duplicate_clusters(
        verified, a_col="norm_a", b_col="norm_b", max_iters=max_iters
    ).select(F.col("doc_id").alias("norm"), "cluster_id")
    rep = norms.join(clusters, "norm", "left").select(
        "norm", F.coalesce(F.col("cluster_id"), F.col("norm")).alias("lsh_rep")
    )
    clustered = surfaces.join(rep, "norm").select(
        "surface", "n_mentions", "lsh_rep"
    )
    return _resolve_tables(clustered, triples_df, entity_dict, broadcast_resolved)
