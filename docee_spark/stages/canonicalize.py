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

Everything is built-in expressions: the MinHash signature is k
lexicographic-min 32-bit hex lanes, four lanes per md5 (lane i =
``min(substring(md5((i//4) || '|' || s), 8*(i%4)+1, 8))`` — the same
one-hash/k-lanes derivation as the HLL/CM sketches, so k=8 costs 2
hashes per shingle). JVM-side, codegen'd on the hot path
(``_membership_for`` hashes each shingle once), and byte-identical to
the DuckDB oracle formulation.
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
    """k MinHash lanes (8-hex-char strings) as separate columns — never
    index a signature array with element_at (projection collapse
    re-evaluates the array per reference; measured 10× blowup).

    Lane spec — identical to ``operators.dedup.minhash_cols`` and every
    generated DuckDB oracle: lane i = min over shingles of
    ``substring(md5(concat(i//4, '|', s)), 8*(i%4)+1, 8)``; one md5 feeds
    four 32-bit lanes, so k=8 costs 2 hashes per shingle instead of 8.
    Hot batch paths go through ``_membership_for``, which hashes each
    shingle exactly once in whole-stage codegen."""
    def _lane(g: int, off: int):
        # one-arg lambda via closure: PySpark would turn default-arg
        # bindings into extra lambda variables
        return lambda s: F.substring(
            F.md5(F.concat(F.lit(f"{g}|"), s)), off, 8
        )

    return [
        F.array_min(F.transform(shingle_col, _lane(i // 4, 8 * (i % 4) + 1)))
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


def _mentions(triples_df: DataFrame) -> DataFrame:
    return (
        triples_df.select(F.col("subj").alias("surface"))
        .unionAll(triples_df.select(F.col("obj").alias("surface")))
        .filter(F.col("surface").isNotNull())
    )


def _surface_vocab(triples_df: DataFrame) -> DataFrame:
    """(surface, n_mentions, norm) — the distinct-surface vocabulary."""
    return (
        _mentions(triples_df)
        .groupBy("surface")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("norm", normalize_surface(F.col("surface")))
    )


def _membership_for(df: DataFrame, k: int, bands: int) -> DataFrame:
    """LSH band membership (surface, norm, band) for a (surface, norm)
    frame. A surface's bands depend ONLY on its norm (fixed seeds), so
    membership rows are immutable — the property the incremental merge
    relies on to reuse stored membership verbatim."""
    rows = max(1, k // bands)
    from ..operators.dedup import minhash_sig_frame

    sigd = minhash_sig_frame(
        df.select("surface", "norm"), ["surface", "norm"], shingles(F.col("norm")), k
    )
    return sigd.withColumn("band", F.explode(band_keys(bands, rows))).select(
        "surface", "norm", "band"
    )


def _propagate(membership: DataFrame, closure_passes: int) -> DataFrame:
    """Min-label propagation over the band bipartite graph → (surface,
    lsh_rep). Seed rep = normalized surface; each pass takes the min over
    band buckets. Updates never cross band buckets, so running this on
    any band-closed subset of membership (every band's full bucket
    present) yields exactly the full-graph labels for those surfaces —
    the equivalence the incremental path is built on."""
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
    return rep


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


def _active_membership(
    membership: DataFrame, band_sizes: DataFrame, max_bucket: int
) -> DataFrame:
    """Membership restricted to ACTIVE band buckets (size ≤ max_bucket).
    Over-cap buckets are boilerplate-grade hubs (short shared substrings
    make some shingle hash globally low, fusing unrelated surfaces): at
    web scale they percolate the band graph into one giant component, so
    they are DROPPED deterministically — the `_cap_buckets` discipline of
    canonicalize_verified and the dedup operators. Surfaces left with no
    active band become singletons (rep = own norm)."""
    return membership.join(
        band_sizes.filter(F.col("bsz") <= max_bucket).select("band"),
        "band",
        "left_semi",
    )


def _cluster_reps(
    surfaces: DataFrame,
    membership: DataFrame,
    closure_passes: int,
    max_bucket: int | None,
    band_sizes: DataFrame | None = None,
) -> DataFrame:
    """surfaces ⋈ propagated reps → (surface, n_mentions, norm, lsh_rep).
    With a bucket cap, propagation runs on active membership only and
    cap-orphaned surfaces fall back to singleton reps."""
    if max_bucket is None:
        rep = _propagate(membership, closure_passes)
        return surfaces.join(rep, "surface")
    if band_sizes is None:
        band_sizes = membership.groupBy("band").agg(F.count("*").alias("bsz"))
    rep = _propagate(
        _active_membership(membership, band_sizes, max_bucket), closure_passes
    )
    return surfaces.join(rep, "surface", "left").withColumn(
        "lsh_rep", F.coalesce(F.col("lsh_rep"), F.col("norm"))
    )


def canonicalize(
    triples_df: DataFrame,
    entity_dict: DataFrame | None = None,
    k: int = 8,
    bands: int = 4,
    closure_passes: int = 2,
    broadcast_resolved: bool | None = None,
    max_bucket: int | None = None,
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

    ``max_bucket``: optional band-bucket cap (see _active_membership) —
    None preserves the historical uncapped clustering; at web scale a
    cap is what keeps band components (and therefore the incremental
    merge's affected regions) bounded.
    """
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
    surfaces = _surface_vocab(triples_df).persist()
    membership = _membership_for(surfaces, k, bands).persist()
    # label propagation: rep(surface) := min over its bands of
    # min(rep of band members); seed rep = normalized surface
    clustered = _cluster_reps(surfaces, membership, closure_passes, max_bucket)
    return _resolve_tables(
        clustered, triples_df, entity_dict, broadcast_resolved
    )


def _entity_ids(
    clustered: DataFrame, entity_dict: DataFrame | None
) -> DataFrame:
    """Dictionary override: entity_id = coalesce(dict_id, lsh_rep). The
    override is POINTWISE (applied per surface after clustering), which
    is what keeps the incremental path's component-locality argument
    valid — a dict entry never propagates into neighbors' labels."""
    if entity_dict is not None:
        clustered = clustered.join(
            F.broadcast(
                entity_dict.select("surface", F.col("entity_id").alias("dict_id"))
            ),
            "surface",
            "left",
        )
        canon = F.coalesce(F.col("dict_id"), F.col("lsh_rep"))
    else:
        canon = F.col("lsh_rep")
    return clustered.withColumn("entity_id", canon)


EDGE_COLS = ["src", "pred", "dst", "doc_id", "recguid", "event_type"]
# internal state variant: edge rows keep their endpoint SURFACES so a
# later rep change can locate exactly the rows to re-resolve
EDGE_FULL_COLS = EDGE_COLS + ["subj", "obj"]


def _edge_join(
    triples_df: DataFrame, res_map: DataFrame, keep_surfaces: bool = False
) -> DataFrame:
    """Resolve both triple endpoints against a (surface, entity_id) map.
    Inner joins: triples with a NULL endpoint drop out of the edge table
    (mentions of NULL were never in the vocabulary)."""
    cols = EDGE_FULL_COLS if keep_surfaces else EDGE_COLS
    return (
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
        .select(*cols)
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
    resolved = _entity_ids(clustered, entity_dict).select(
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
    edges = _edge_join(triples_df, res_map)
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


class CanonState:
    """Materialized clustering state for DELTA-PROPORTIONAL recrawl
    canonicalization (the r4 design item: ``merge_triples`` pays a full
    re-canonicalization per batch; this state makes the per-batch COMPUTE
    proportional to the delta plus its band-connected neighborhood).

    Tables (all eagerly localCheckpointed — this is a batch-boundary
    artifact, produced at action time, never mid-plan):
      * ``triples``    — the current corpus triple set
      * ``resolved``   — (surface, norm, n_mentions, lsh_rep, entity_id)
      * ``membership`` — (surface, norm, band) LSH band membership;
        immutable per surface (bands depend only on the norm)
      * ``vertices``   — (entity_id, surface, n_mentions)
      * ``edges_full`` — public edge columns PLUS the endpoint surfaces,
        so a rep change can locate exactly the edge rows to re-resolve

    At 10^12-doc scale these live as Iceberg tables; the splice unions
    below become merge-on-read delta writes. In this sandbox they are
    in-memory checkpoints, which still demonstrates the compute shape:
    every corpus-sized table is only ever SCANNED on the stream side of
    a broadcast hash join — the shuffles and the minhash/propagation
    recompute touch delta-proportional row counts only.

    ``stats`` records the merge observability counters (changed docs,
    new/removed surfaces, affected-region size, BFS iterations,
    fallback flag) — the per-batch lineage the north rule asks for.
    """

    def __init__(
        self,
        triples: DataFrame,
        resolved: DataFrame,
        membership: DataFrame,
        vertices: DataFrame,
        edges_full: DataFrame,
        *,
        entity_dict: DataFrame | None,
        k: int,
        bands: int,
        closure_passes: int,
        max_bucket: int | None = None,
        band_sizes: DataFrame | None = None,
        stats: dict | None = None,
        vocab: DataFrame | None = None,
    ) -> None:
        self.triples = triples
        self.resolved = resolved
        self.membership = membership
        self.vertices = vertices
        self.edges_full = edges_full
        self.entity_dict = entity_dict
        self.k = k
        self.bands = bands
        self.closure_passes = closure_passes
        self.max_bucket = max_bucket
        self.band_sizes = band_sizes  # (band, bsz); kept iff max_bucket
        # (surface, n_mentions, norm) WITHOUT the propagated labels --
        # r6: readers that only need the vocabulary (the merge's
        # mention-count splice, the fallback rebuild) go through
        # ``vocab_frame`` so a falling-back batch never has to pay the
        # cold build's label propagation just to read counts
        self.vocab = vocab
        self.stats = stats or {}

    @property
    def edges(self) -> DataFrame:
        return self.edges_full.select(*EDGE_COLS)

    def vocab_frame(self) -> DataFrame:
        """(surface, n_mentions, norm): the label-free vocabulary."""
        if self.vocab is not None:
            return self.vocab
        return self.resolved.select("surface", "n_mentions", "norm")

    def materialize(self) -> "CanonState":
        """Force every state table's lazy checkpoint NOW (one job).

        The state tables are lazily checkpointed — computed and cached at
        first use, so a caller that only reads ``edges`` never pays for
        ``vertices`` or the merged triples. A commit point (persisting
        the state between recrawl batches) or a benchmark timing boundary
        wants the eager semantics back: call this inside the timed /
        committed region."""
        frames = {
            "triples": self.triples,
            "resolved": self.resolved,
            "membership": self.membership,
            "vertices": self.vertices,
            "edges_full": self.edges_full,
        }
        if self.band_sizes is not None:
            frames["band_sizes"] = self.band_sizes
        self.stats.setdefault("materialized_rows", _counts_one_job(frames))
        return self


def _ckpt(df: DataFrame) -> DataFrame:
    """Lineage CAP for batch-boundary state tables.

    Kept as ``localCheckpoint(eager=False)`` — under AQE even the lazy
    variant executes the shuffle stages below it at plan-build time
    (materializing an adaptive plan runs its query stages), but chained
    recrawl batches NEED the cap: every state table feeds the next
    batch's plans, and uncapped lineage doubles per batch (measured: a
    3-batch chain OOMed the driver just RENDERING the plan tree).
    Restrict the cost to the handful of tables that cross a batch
    boundary; everything merge-internal uses :func:`_reuse`."""
    return df.localCheckpoint(eager=False)


def _reuse(df: DataFrame) -> DataFrame:
    """Compute-once cache for merge-INTERNAL intermediates.

    Also a checkpoint: a plain ``persist()`` was tried in r6 and OOMed
    the driver on plan-TREE rendering — Spark expands a multi-referenced
    InMemoryRelation's child plan at EVERY reference when copying or
    printing the tree, and this DAG's ~25 reuse points with fan-out 2-3
    blow up exponentially without truncation, even inside a single
    merge. The lazy localCheckpoint's construction-time AQE stage
    materialization is the price of keeping every reuse point a LogicalRDD
    leaf."""
    return df.localCheckpoint(eager=False)


def _counts_one_job(named: dict[str, DataFrame]) -> dict[str, int]:
    """Row counts for several (already cached) frames in ONE Spark job.

    The stats block previously issued one ``count()`` action per frame —
    8 serialized jobs of pure scheduling overhead on checkpointed data.
    A tagged union + groupBy counts them all at once; absent tags are
    zero-row frames."""
    parts = [df.select(F.lit(name).alias("k")) for name, df in named.items()]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    got = {
        r["k"]: r["n"]
        for r in u.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    return {name: int(got.get(name, 0)) for name in named}


def canonicalize_state(
    triples_df: DataFrame,
    entity_dict: DataFrame | None = None,
    k: int = 8,
    bands: int = 4,
    closure_passes: int = 2,
    max_bucket: int | None = None,
) -> CanonState:
    """Cold build of :class:`CanonState`. Produces vertices/edges
    IDENTICAL to :func:`canonicalize` with the same parameters (same
    vocabulary, same propagation, same dictionary override, same edge
    joins) while retaining the clustering internals that
    :func:`merge_triples_incremental` splices against.

    ``max_bucket`` (recommended at web scale): drop over-cap band
    buckets before propagation — bounds band components, which is what
    makes the incremental merge's affected region delta-local instead of
    percolating through boilerplate hub buckets. The bucket-size table
    is kept in the state and maintained incrementally."""
    triples = _ckpt(triples_df)
    # r6: the vocabulary is its own (checkpointed) state table; the
    # label-carrying ``resolved`` is a lazily persisted view over it, so
    # consumers that never read labels (a merge batch that falls back)
    # never pay the cold propagation
    surfaces = _ckpt(_surface_vocab(triples))
    membership = _ckpt(_membership_for(surfaces, k, bands))
    band_sizes = None
    if max_bucket is not None:
        band_sizes = _ckpt(
            membership.groupBy("band").agg(F.count("*").alias("bsz"))
        )
    resolved = (
        _entity_ids(
            _cluster_reps(
                surfaces, membership, closure_passes, max_bucket, band_sizes
            ),
            entity_dict,
        )
        .select("surface", "norm", "n_mentions", "lsh_rep", "entity_id")
        .persist()
    )
    # r6: vertices/edges_full are DERIVED views over the checkpointed
    # core (one groupBy / two joins over LogicalRDD leaves) — persist()
    # instead of a checkpoint keeps them compute-once but truly LAZY: a
    # consumer that never reads them (e.g. a merge batch that falls back
    # and re-resolves the merged corpus itself) never pays the cold edge
    # join at all, and their shallow plans can't blow up the tree.
    vertices = (
        resolved.groupBy("entity_id").agg(
            F.min("surface").alias("surface"),
            F.sum("n_mentions").alias("n_mentions"),
        )
    ).persist()
    edges_full = _edge_join(
        triples, resolved.select("surface", "entity_id"), keep_surfaces=True
    ).persist()
    return CanonState(
        triples,
        resolved,
        membership,
        vertices,
        edges_full,
        entity_dict=entity_dict,
        k=k,
        bands=bands,
        closure_passes=closure_passes,
        max_bucket=max_bucket,
        band_sizes=band_sizes,
        stats={"mode": "cold"},
        vocab=surfaces,
    )


def merge_triples_incremental(
    state: CanonState,
    delta_triples: DataFrame,
    deleted_docs: DataFrame | None = None,
    *,
    max_expand_iters: int = 16,
    max_affected: int = 1_000_000,
    influence_bounded: bool = True,
) -> CanonState:
    """Recrawl merge with DELTA-PROPORTIONAL canonicalization →
    new :class:`CanonState`.

    Semantics are exactly :func:`merge_triples` (replacement per doc_id,
    deletion wins, idempotent re-apply) and the output vertices/edges are
    PROVEN equivalent to the full recompute (pytest differential in
    tests/test_kg_incremental_canon.py covers cluster MERGE via a new
    bridging surface, cluster SPLIT via deleting the bridge doc, cluster
    RE-LABEL via a new minimum, count-only changes, deletions, chained
    batches, and dictionary overrides).

    Why it is exact: LSH band membership of a surface depends only on
    its normalized form, so the band bipartite graph changes ONLY at
    surfaces added or removed by the batch (S0). A band-bucket BFS from
    bands(S0) closes over every band-connected component touching the
    change; min-label propagation never crosses band buckets, so (a) the
    restricted propagation over that band-closed region equals the full
    recompute's labels there, and (b) every component disjoint from the
    region keeps its old labels verbatim. The dictionary override is
    pointwise and cannot leak across the boundary.

    Scale shape: the corpus-sized state tables (resolved / membership /
    edges_full / triples) are only ever scanned on the STREAM side of
    broadcast hash joins; everything that shuffles, hashes (minhash), or
    iterates (propagation) is bounded by |delta| + |affected region|.
    The state splices are linear map-only unions — on a real lakehouse
    those become merge-on-read delta writes against Iceberg tables.

    ``influence_bounded`` (default, r5): :func:`_propagate` runs exactly
    ``closure_passes`` synchronous min-label passes, so a label can
    travel at most ``closure_passes`` band-hops — a surface farther than
    that from every edit location keeps its label verbatim under a full
    recompute (an old-graph short path to an edit implies a new-graph
    short path through the path's LAST edited element, since unedited
    buckets keep their size and hence their cap-activation). The BFS
    therefore stops at depth ``2*closure_passes``: labels are ADOPTED
    for the ``closure_passes``-ball (the only surfaces whose labels can
    move), and the outer ring up to ``2*closure_passes`` rides along as
    CONTEXT so each adopted surface's own ``closure_passes``-hop
    neighbourhood — every minimum it can receive — is fully present in
    the restricted propagation (truncation at the context boundary can
    only RAISE ring labels, which are discarded, never lower adopted
    ones; every label a restricted walk delivers corresponds to a
    full-graph walk and vice versa within the ball). This keeps the
    walk delta-local even when band buckets chain into giant components
    (measured at 1M docs: the band-closure walk touched 80% of a
    1M-surface vocabulary at cap 64; the bounded walk is 4 hops flat).
    ``influence_bounded=False`` restores the band-closure walk.

    Guard rails: if the BFS has not converged after ``max_expand_iters``
    band hops (band-closure mode — the bounded walk needs no
    convergence), or the affected region exceeds ``max_affected``
    surfaces (a degenerate band acting as a corpus-wide hub), the merge
    falls back to a full ``canonicalize_state`` rebuild — same answer,
    full cost — and says so in ``stats['fallback']``.

    Bucket caps (``state.max_bucket``, from the cold build): without a
    cap, boilerplate-grade hub buckets percolate realistic vocabularies
    into one giant band component — the BFS then legitimately covers it
    (equivalence demands it) and the win shrinks to the avoided minhash
    + edge-join recompute (~3-4× measured). With a cap, over-cap buckets
    carry no connectivity in either graph, so seeds skip them, every
    expansion step is bounded by cap+|delta| members, and the affected
    region is genuinely delta-local; the bucket-size table rides in the
    state and is maintained incrementally (only changed bands move).
    Cap activation/deactivation (a bucket crossing the cap) is handled
    exactly: such a bucket necessarily contains a changed surface, so
    its band is a seed, it is active on one side, and its full bucket
    joins the affected region.
    """
    k, bands, passes = state.k, state.bands, state.closure_passes
    changed = delta_triples.select("doc_id").distinct()
    if deleted_docs is not None:
        dele = deleted_docs.select("doc_id")
        changed = changed.unionByName(dele).distinct()
        delta_triples = delta_triples.join(dele, "doc_id", "left_anti")
    changed = _reuse(changed)
    delta_triples = _reuse(delta_triples.select(*state.triples.columns))

    old = state.triples
    survivors = old.join(changed, "doc_id", "left_anti")
    merged = _ckpt(survivors.unionByName(delta_triples))

    # ── 1. mention-count deltas (removed side = the changed docs' OLD
    # triples, selected by an AQE-broadcast semi join) ──────────────────
    removed_mentions = _mentions(old.join(changed, "doc_id", "left_semi"))
    added_mentions = _mentions(delta_triples)
    delta_counts = _reuse(
        added_mentions.select("surface", F.lit(1).alias("d"))
        .unionAll(removed_mentions.select("surface", F.lit(-1).alias("d")))
        .groupBy("surface")
        .agg(F.sum("d").alias("d"))
        .filter(F.col("d") != 0)
    )

    # ── 2. touched vocabulary: continuing / removed / brand-new ────────
    touched_existing = _reuse(
        state.vocab_frame()
        .join(F.broadcast(delta_counts), "surface", "left")
        .filter(F.col("d").isNotNull())
    )
    removed_s = _reuse(
        touched_existing.filter(F.col("n_mentions") + F.col("d") == 0)
    )
    brand_new = _reuse(
        delta_counts.join(
            F.broadcast(touched_existing.select("surface")),
            "surface",
            "left_anti",
        ).withColumn("norm", normalize_surface(F.col("surface")))
    )
    new_membership = _reuse(_membership_for(brand_new, k, bands))

    # new-graph membership = stored minus removed plus new. One linear
    # map-only pass (the merge-on-read write in a real lakehouse).
    removed_membership = state.membership.join(
        F.broadcast(removed_s.select("surface")), "surface", "left_semi"
    )
    membership2 = _ckpt(
        state.membership.join(
            F.broadcast(removed_s.select("surface")), "surface", "left_anti"
        ).unionByName(new_membership)
    )

    capped = state.max_bucket is not None
    band_sizes2 = None
    if capped:
        # maintain the bucket-size table incrementally: only bands of
        # changed surfaces move; everything else is carried on the
        # stream side of a broadcast join (no corpus shuffle)
        bdelta = _reuse(
            new_membership.select("band", F.lit(1).alias("bd"))
            .unionAll(removed_membership.select("band", F.lit(-1).alias("bd")))
            .groupBy("band")
            .agg(F.sum("bd").alias("bd"))
            .filter(F.col("bd") != 0)
        )
        sized = state.band_sizes.join(F.broadcast(bdelta), "band", "left")
        known_bands = _reuse(
            sized.filter(F.col("bd").isNotNull()).select(
                "band", F.col("bsz").alias("bsz_old")
            )
        )
        fresh_bands = bdelta.join(
            F.broadcast(known_bands.select("band")), "band", "left_anti"
        ).select("band", F.col("bd").alias("bsz"))
        band_sizes2 = _ckpt(
            sized.withColumn(
                "bsz", F.col("bsz") + F.coalesce(F.col("bd"), F.lit(0))
            )
            .select("band", "bsz")
            .filter(F.col("bsz") > 0)
            .unionByName(fresh_bands)
        )

    def _active_only(cand_bands: DataFrame) -> DataFrame:
        """Restrict a SMALL band set to buckets active in the new graph
        (lookup against band_sizes2 on the stream side)."""
        if not capped:
            return cand_bands
        return (
            band_sizes2.join(F.broadcast(cand_bands), "band", "left_semi")
            .filter(F.col("bsz") <= state.max_bucket)
            .select("band")
        )

    # ── 3. affected-region BFS over band buckets ────────────────────────
    # Every band whose bucket CHANGED (member added/removed — the only
    # way a bucket's size or content moves) is a seed. Under a cap, a
    # seed expands only if its bucket is active in the old OR new graph:
    # hub buckets over the cap in both carry no connectivity before or
    # after, so the BFS never walks through them — this is what keeps
    # the affected region delta-local on boilerplate-heavy vocabularies.
    seed_bands_all = _reuse(
        new_membership.select("band")
        .unionByName(removed_membership.select("band"))
        .distinct()
    )
    if capped:
        new_sz = band_sizes2.join(
            F.broadcast(seed_bands_all), "band", "left_semi"
        ).select("band", F.col("bsz").alias("bsz_new"))
        seed_bands = _reuse(
            seed_bands_all.join(known_bands, "band", "left")
            .join(new_sz, "band", "left")
            .filter(
                (F.col("bsz_old") <= state.max_bucket)
                | (F.col("bsz_new") <= state.max_bucket)
            )
            .select("band")
        )
    else:
        seed_bands = seed_bands_all
    affected = _reuse(new_membership.select("surface").distinct())
    # adopt = surfaces whose labels are TAKEN from the restricted
    # propagation: the brand-new surfaces plus everything within
    # `passes` hops of an edit. In band-closure mode adopt == affected.
    adopt = affected
    frontier_bands = seed_bands
    expand_iters = 0
    fallback = False
    # _propagate runs max(1, closure_passes) passes — mirror that here
    eff_passes = max(1, passes)
    depth = 2 * eff_passes if influence_bounded else max_expand_iters
    truncated = depth > max_expand_iters
    depth = min(depth, max_expand_iters)
    converged = seed_bands.isEmpty()
    if not converged:
        # the ring sets are pairwise disjoint by construction (anti-join
        # against the running union), so the max_affected guard tracks
        # the total as a driver-side sum of per-round counts — ONE small
        # action per round instead of isEmpty + a full recount
        n_affected = affected.count()
        for expand_iters in range(1, depth + 1):
            hit = (
                membership2.join(F.broadcast(frontier_bands), "band", "left_semi")
                .select("surface")
                .distinct()
            )
            new_aff = _reuse(
                hit.join(F.broadcast(affected), "surface", "left_anti")
            )
            n_new = new_aff.count()
            if n_new == 0:
                converged = True
                break
            affected = _reuse(affected.unionByName(new_aff))
            if expand_iters <= eff_passes:
                adopt = affected
            n_affected += n_new
            if n_affected > max_affected:
                fallback = True
                break
            if expand_iters == depth:
                break
            frontier_bands = _reuse(
                frontier_bands.unionByName(
                    _active_only(
                        membership2.join(
                            F.broadcast(new_aff), "surface", "left_semi"
                        )
                        .select("band")
                        .distinct()
                    )
                ).distinct()
            )
        if influence_bounded:
            # a bounded walk needs no convergence — only a 2p ball it
            # could not fully certify (max_expand_iters < 2*passes)
            fallback = fallback or (truncated and not converged)
        else:
            fallback = fallback or not converged
            adopt = affected

    if fallback:
        # Full re-clustering, but NOT from scratch (r6): the expensive
        # cold-build inputs are already maintained incrementally —
        # ``membership2`` IS the merged corpus's band membership (bands
        # depend only on the norm; stored minus removed plus new — the
        # module invariant the non-fallback path relies on and the
        # differential suite pins), and the merged vocabulary with exact
        # counts is the same splice arithmetic as step 5. Reusing them
        # skips the minhash re-hash of the whole vocabulary and the
        # corpus-wide mention groupBy; the propagation, dictionary
        # override, vertex aggregation and edge joins below are the
        # verbatim cold-build tail, so the result is identical to
        # canonicalize_state(merged) (pytest differential).
        surfaces2 = (
            state.vocab_frame()
            .join(
                F.broadcast(removed_s.select("surface")), "surface", "left_anti"
            )
            .join(F.broadcast(delta_counts), "surface", "left")
            .withColumn(
                "n_mentions",
                F.col("n_mentions") + F.coalesce(F.col("d"), F.lit(0)),
            )
            .select("surface", "norm", "n_mentions")
            .unionByName(
                brand_new.select(
                    "surface", "norm", F.col("d").cast("long").alias("n_mentions")
                )
            )
        )
        resolved2 = _ckpt(
            _entity_ids(
                _cluster_reps(
                    surfaces2, membership2, passes, state.max_bucket, band_sizes2
                ),
                state.entity_dict,
            ).select("surface", "norm", "n_mentions", "lsh_rep", "entity_id")
        )
        vertices2 = _ckpt(
            resolved2.groupBy("entity_id").agg(
                F.min("surface").alias("surface"),
                F.sum("n_mentions").alias("n_mentions"),
            )
        )
        edges_full2 = _ckpt(
            _edge_join(
                merged,
                resolved2.select("surface", "entity_id"),
                keep_surfaces=True,
            )
        )
        return CanonState(
            merged,
            resolved2,
            membership2,
            vertices2,
            edges_full2,
            entity_dict=state.entity_dict,
            k=k,
            bands=bands,
            closure_passes=passes,
            max_bucket=state.max_bucket,
            band_sizes=band_sizes2,
            stats={
                "mode": "incremental",
                "fallback": True,
                "expand_iters": expand_iters,
                "changed_docs": changed.count(),
            },
        )

    # ── 4. re-cluster the affected region only. Labels are adopted for
    # ``adopt`` (the ``passes``-ball — the only labels that can move);
    # ``affected`` adds the context ring so each adopted surface's own
    # ``passes``-hop neighbourhood is fully present (band-closure mode:
    # adopt == affected and the region is band-closed at convergence).
    # Either way the restricted propagation equals the full recompute's
    # labels on the adopted surfaces exactly. Under a cap, propagation
    # sees active buckets only — cap-orphaned adopted surfaces fall
    # back to singletons in the splice below, mirroring _cluster_reps'
    # cold behavior. ────────────────────────────────────────────────────
    membership_aff = membership2.join(
        F.broadcast(affected), "surface", "left_semi"
    )
    if capped:
        aff_bands = membership_aff.select("band").distinct().localCheckpoint(eager=False)
        membership_aff = membership_aff.join(
            F.broadcast(_active_only(aff_bands)), "band", "left_semi"
        )
    rep_aff = (
        _propagate(membership_aff, passes)
        .withColumnRenamed("lsh_rep", "rep2")
        .localCheckpoint(eager=False)
    )

    # ── 5. splice the resolved vocabulary ───────────────────────────────
    dict_map = None
    if state.entity_dict is not None:
        dict_map = F.broadcast(
            state.entity_dict.select(
                "surface", F.col("entity_id").alias("dict_id")
            )
        )
    # membership in the adopt set is flagged EXPLICITLY: under a cap an
    # adopted surface may have no propagated label (all its buckets
    # dropped) and must become a singleton, not keep its old rep
    aff_flag = adopt.withColumn("_aff", F.lit(1))
    cont = (
        state.resolved.join(
            F.broadcast(removed_s.select("surface")), "surface", "left_anti"
        )
        .join(F.broadcast(delta_counts), "surface", "left")
        .withColumn(
            "n_mentions",
            F.col("n_mentions") + F.coalesce(F.col("d"), F.lit(0)),
        )
        .join(F.broadcast(rep_aff), "surface", "left")
        .join(F.broadcast(aff_flag), "surface", "left")
    )
    new_rep = F.coalesce(F.col("rep2"), F.col("norm"))
    if dict_map is not None:
        cont = cont.join(dict_map, "surface", "left")
        new_eid = F.coalesce(F.col("dict_id"), new_rep)
    else:
        new_eid = new_rep
    in_aff = F.col("_aff").isNotNull()
    cont = (
        cont.withColumn("old_entity_id", F.col("entity_id"))
        .withColumn(
            "entity_id",
            F.when(in_aff, new_eid).otherwise(F.col("entity_id")),
        )
        .withColumn(
            "lsh_rep", F.when(in_aff, new_rep).otherwise(F.col("lsh_rep"))
        )
    )
    rep_changed = (
        cont.filter(F.col("entity_id") != F.col("old_entity_id"))
        .select("surface")
        .localCheckpoint(eager=False)
    )

    new_rows = (
        brand_new.join(rep_aff, "surface", "left")
        .withColumn("lsh_rep", F.coalesce(F.col("rep2"), F.col("norm")))
        .withColumn("n_mentions", F.col("d").cast("long"))
    )
    if dict_map is not None:
        new_rows = new_rows.join(dict_map, "surface", "left").withColumn(
            "entity_id", F.coalesce(F.col("dict_id"), F.col("lsh_rep"))
        )
    else:
        new_rows = new_rows.withColumn("entity_id", F.col("lsh_rep"))
    res_cols = ["surface", "norm", "n_mentions", "lsh_rep", "entity_id"]
    resolved2 = _ckpt(
        cont.select(*res_cols).unionByName(new_rows.select(*res_cols))
    )

    # ── 6. vertex splice: recompute only entity ids whose member set or
    # counts changed (old AND new ids of every touched surface) ─────────
    touched_surf = (
        adopt.unionByName(delta_counts.select("surface"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    changed_eids = (
        state.resolved.join(F.broadcast(touched_surf), "surface", "left_semi")
        .select("entity_id")
        .unionByName(
            resolved2.join(
                F.broadcast(touched_surf), "surface", "left_semi"
            ).select("entity_id")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    vertices = (
        state.vertices.join(
            F.broadcast(changed_eids), "entity_id", "left_anti"
        )
        .unionByName(
            resolved2.join(F.broadcast(changed_eids), "entity_id", "left_semi")
            .groupBy("entity_id")
            .agg(
                F.min("surface").alias("surface"),
                F.sum("n_mentions").alias("n_mentions"),
            )
        )
    )
    vertices = _ckpt(vertices)

    # ── 7. edge splice: drop changed docs' edges and edges touching a
    # re-labeled surface; re-resolve exactly those triples ──────────────
    surviving_edges = (
        state.edges_full.join(changed, "doc_id", "left_anti")
        .join(
            F.broadcast(rep_changed.withColumnRenamed("surface", "subj")),
            "subj",
            "left_anti",
        )
        .join(
            F.broadcast(rep_changed.withColumnRenamed("surface", "obj")),
            "obj",
            "left_anti",
        )
        .select(*EDGE_FULL_COLS)
    )
    flag_subj = rep_changed.withColumnRenamed("surface", "subj").withColumn(
        "_h1", F.lit(1)
    )
    flag_obj = rep_changed.withColumnRenamed("surface", "obj").withColumn(
        "_h2", F.lit(1)
    )
    surv_touched = (
        survivors.join(F.broadcast(flag_subj), "subj", "left")
        .join(F.broadcast(flag_obj), "obj", "left")
        .filter(F.col("_h1").isNotNull() | F.col("_h2").isNotNull())
        .select(*delta_triples.columns)
    )
    need = surv_touched.unionByName(delta_triples).localCheckpoint(eager=False)
    need_surf = (
        need.select(F.col("subj").alias("surface"))
        .unionByName(need.select(F.col("obj").alias("surface")))
        .filter(F.col("surface").isNotNull())
        .distinct()
    )
    lookup = (
        resolved2.join(F.broadcast(need_surf), "surface", "left_semi")
        .select("surface", "entity_id")
        .localCheckpoint(eager=False)
    )
    new_edges = _edge_join(need, F.broadcast(lookup), keep_surfaces=True)
    edges_full = _ckpt(surviving_edges.unionByName(new_edges))

    count_frames = {
        "changed_docs": changed,
        "delta_triples": delta_triples,
        "new_surfaces": brand_new,
        "removed_surfaces": removed_s,
        "affected_surfaces": adopt,
        "context_surfaces": affected,
        "rep_changed_surfaces": rep_changed,
    }
    if capped:
        count_frames["seed_bands_active"] = seed_bands
        count_frames["seed_bands_total"] = seed_bands_all
    stats = {
        "mode": "incremental",
        "fallback": False,
        "expand_iters": expand_iters,
        "influence_bounded": influence_bounded,
        **_counts_one_job(count_frames),
    }
    return CanonState(
        merged,
        resolved2,
        membership2,
        vertices,
        edges_full,
        entity_dict=state.entity_dict,
        k=k,
        bands=bands,
        closure_passes=passes,
        max_bucket=state.max_bucket,
        band_sizes=band_sizes2,
        stats=stats,
    )
