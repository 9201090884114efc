"""Deduplication operators over a document table.

Five families, each shaped for 100 TB:

  * exact            — md5 fingerprint groupBy (one shuffle on the hash)
  * MinHash + LSH    — shingle → k-lane MinHash signature → bands →
                       bucket equi-join (candidate pairs only; never a
                       cross join); optional exact-Jaccard verify of the
                       candidates (``minhash_verified_pairs``)
  * SimHash          — 16-bit equal-hash clustering for the oracle path;
                       64-bit + banded Hamming≤k join
                       (``simhash_near_duplicates``) for real corpora
  * n-gram Jaccard   — exact pairwise similarity via shingle inverted
                       index (equi-join on shingle, group by pair)
  * embedding cosine — near-dup by cosine ≥ τ over an embedding column,
                       blocked by sign-LSH buckets (see similarity.py)

Skew guards (the 100 TB rule — real webtext has boilerplate shingles and
hot LSH bands shared by millions of docs, and any in-bucket pair
expansion is O(|bucket|²)):

  * every bucketed pair expansion takes a ``max_bucket`` cap; buckets
    above the cap are *dropped from pairing, never expanded* — a hot
    bucket's members are near-certainly caught by one of their other
    bands/shingles, and an over-cap bucket is boilerplate, not signal;
  * drops are observable, not silent: each capped operator attaches a
    named ``observe`` metric (n_dropped_buckets, n_dropped_rows) that the
    driver can read from the QueryExecution listener after any action,
    and ``hot_buckets`` exposes the offenders as a DataFrame.

Hashes are md5-based: deterministic, engine-portable (bit-identical in
DuckDB for the correctness oracle), and uniformly distributed. MinHash
lanes are fixed-width hex substrings of the digest (four 32-bit lanes
per md5 — see ``minhash_cols``); lexicographic MIN over fixed-width
lowercase-hex strings is a valid min-hash permutation per lane.
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
    if df.isStreaming:
        # a streaming plan has no inspectable partitioning (toRdd raises
        # on unresolved streaming sources); micro-batch parallelism is
        # the source's knob (maxFilesPerTrigger etc.), not a repartition
        return df
    try:
        # the physical plan STRING: pure planning, no job execution
        # (sparkPlan() predates EnsureRequirements and never shows
        # exchanges; explainString renders the adaptive plan without
        # running it). If a shuffle already sits upstream, the frame's
        # parallelism is spark.sql.shuffle.partitions — and the toRdd
        # probe below would MATERIALIZE the upstream AQE stages at
        # plan-build time (measured ~18 s of serialized work probing a
        # lazy mid-pipeline frame in the refinery). Broadcast exchanges
        # don't split the scan, so they don't short-circuit.
        splan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        if (
            "Exchange hashpartitioning" in splan
            or "Exchange rangepartitioning" in splan
            or "Exchange RoundRobinPartitioning" in splan
        ):
            return df
    except Exception:  # pragma: no cover - private-API fallback
        pass
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        # JVM-side physical-plan partition count: avoids df.rdd, which
        # builds the whole Python-serialization RDD conversion per call
        n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # pragma: no cover - private-API fallback
        n_parts = df.rdd.getNumPartitions()
    # r6: the DEFAULT-width callers round up to full core width — a
    # 3-way union of small scans landed at 18 partitions on 32 cores and
    # the CPU-heavy md5/shingle stages straggled on the fat branch
    # (guide §2.5 input skew); the round-robin exchange of raw doc rows
    # is noise next to the per-row expression work it parallelizes, and
    # at real scan widths (thousands of splits) this stays a no-op.
    # Callers that PASS min_parts (the fused pipeline at 2×cores) keep
    # the historical half-threshold: they are tuning an Arrow stage whose
    # input may be nested rows, where an extra exchange costs more than
    # the tail it balances (measured: the r5 pipeline regressed ~15%
    # when its ~33-split scan was force-exchanged to 64).
    slack = target // 2 if min_parts else target
    if n_parts < max(2, slack):
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
    """k lexicographic-min hash lanes — k permutation min-hashes.

    NOTE: when deriving several values from the signature, select the k
    hashes as separate columns (``minhash_cols``) instead of indexing this
    array with element_at — Catalyst's projection collapse re-evaluates
    the whole array per element_at reference (measured 10× blowup)."""
    return F.array(*minhash_cols(shingle_col, k))


def minhash_cols(shingle_col: Column, k: int = 4) -> list[Column]:
    """k MinHash lanes as separate columns.

    Lane spec (shared verbatim by every generated DuckDB oracle): lane i
    is the min over shingles of
    ``substring(md5(concat(i//4, '|', s)), 8*(i%4)+1, 8)`` — ONE md5 per
    shingle feeds FOUR 32-bit hex lanes (the same one-hash/k-lanes
    derivation the HLL and Count-Min sketches use), so a k-lane signature
    needs ceil(k/4) hashes per shingle instead of k. Lexicographic min
    over fixed-width lowercase-hex strings equals numeric min over the
    32-bit lane value, in Spark and DuckDB alike; 32 bits per lane keeps
    accidental min-collisions negligible at any per-doc shingle count
    while band keys (2+ lanes concatenated) stay ≥64-bit.

    This column API still evaluates one interpreted array-transform per
    lane (needed by stateless/streaming projections); batch hot paths use
    :func:`minhash_sig_frame`, which hashes each shingle exactly once in
    whole-stage codegen."""
    # NB: the transform lambda must take exactly one arg (PySpark turns
    # every lambda parameter — defaults included — into a lambda
    # variable); bind seed/offset through a closure factory instead.
    def _lane(g: int, off: int):
        return lambda s: F.substring(
            F.md5(F.concat(F.lit(f"{g}|"), s)), off, 8
        )

    return [
        F.array_min(F.transform(shingle_col, _lane(i // 4, 8 * (i % 4) + 1)))
        for i in range(k)
    ]


def minhash_sig_frame(
    df: DataFrame, key_cols: list[str], shingle_expr: Column, k: int
) -> DataFrame:
    """→ ``(key_cols..., m0..m{k-1})``: the batch fast path for MinHash
    signatures, value-identical to :func:`minhash_cols`.

    Shape: explode shingles to rows, md5 ONCE per shingle inside
    whole-stage codegen (the column API pays one interpreted
    higher-order-function pass per lane — measured 1.4× at k=4 and 2.1×
    at k=8 on 100k×200-shingle docs), then groupBy the key with k
    min-of-substring-lane aggregates. The groupBy is one extra exchange,
    but map-side partial aggregation reduces it to the per-key lane
    minima — tiny fixed-width rows, never shingle volume.
    ``explode_outer`` keeps empty/null shingle lists as an all-NULL lane
    row (min skips nothing → NULL lanes), matching array_min's NULL on
    empty input."""
    ngroups = (k + 3) // 4
    hashed = df.select(*key_cols, F.explode_outer(shingle_expr).alias("_s")).select(
        *key_cols,
        *[
            F.md5(F.concat(F.lit(f"{g}|"), F.col("_s"))).alias(f"_h{g}")
            for g in range(ngroups)
        ],
    )
    return hashed.groupBy(*key_cols).agg(
        *[
            F.min(F.substring(F.col(f"_h{i // 4}"), 8 * (i % 4) + 1, 8)).alias(
                f"m{i}"
            )
            for i in range(k)
        ]
    )


#: default in-bucket pair-expansion cap. A bucket of b members expands to
#: b(b−1)/2 pairs *inside one task*; 1024 caps that at ~0.5M pairs per
#: bucket — bounded memory/CPU per task regardless of corpus skew. Real
#: near-duplicate clusters above this size are boilerplate, and any true
#: pair in an over-cap bucket almost surely also collides in another band.
DEFAULT_MAX_BUCKET = 1024


_OBSERVE_SEQ = iter(range(1, 1 << 30))


def _metric_name(base: str) -> str:
    """Unique observation name per operator call — Spark rejects duplicate
    observation names inside one query (e.g. the same capped operator used
    twice in a union, or minhash inside minhash_verified)."""
    return f"{base}_{next(_OBSERVE_SEQ)}"


def _cap_buckets(grouped: DataFrame, max_bucket: int, metric: str) -> DataFrame:
    """Filter bucket rows to 2 ≤ |ids| ≤ max_bucket, with the drops
    *observed* (named query metric, readable after any action via
    ``QueryExecution.observedMetrics`` / a ``QueryExecutionListener``) —
    capped skew is never silent."""
    sized = grouped.withColumn("_n", F.size("ids"))
    observed = sized.observe(
        _metric_name(metric),
        F.sum(F.when(F.col("_n") > max_bucket, 1).otherwise(0)).alias(
            "n_dropped_buckets"
        ),
        F.sum(F.when(F.col("_n") > max_bucket, F.col("_n")).otherwise(0)).alias(
            "n_dropped_rows"
        ),
    )
    return observed.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_bucket)
    ).drop("_n")


def _pairs_from_ids(capped: DataFrame) -> DataFrame:
    """In-array pair expansion of a sorted ``ids`` column → doc_a < doc_b.

    r6 shape: posexplode the (sorted) array, then pair each element with
    the strictly-greater tail via slice+filter — row-identical to the
    previous nested transform/struct formulation (the filter keeps the
    strict `<`, so duplicate ids never self-pair and keep their pair
    multiplicity) but O(n) array slices per element instead of O(n²)
    interpreted struct allocations per element; measured 20× on the
    sf1 inverted-index battery queries."""
    ex = capped.select(
        F.posexplode(F.col("ids")).alias("_i", "doc_a"), F.col("ids")
    )
    return ex.select(
        "doc_a",
        F.explode(
            F.filter(
                F.slice(F.col("ids"), F.col("_i") + 2, F.size(F.col("ids"))),
                lambda y: y > F.col("doc_a"),
            )
        ).alias("doc_b"),
    )


def hot_buckets(
    df: DataFrame, key_cols: list[str], max_bucket: int = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """Diagnostic: the over-cap buckets a capped operator dropped —
    (key..., n_ids) for every bucket above the cap. Run it on the same
    keyed projection the operator groups on."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_ids"))
        .filter(F.col("n_ids") > max_bucket)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    bands: int = 2,
    shingle_n: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ *candidate* near-duplicate pairs (doc_a < doc_b) that collide in
    ≥1 LSH band — band-collision candidates only, NOT verified (compose
    with ``minhash_verified_pairs`` for exact-Jaccard-confirmed pairs).
    rows-per-band = k/bands. One shuffle (groupBy band); buckets larger
    than ``max_bucket`` are dropped from pairing with an observed drop
    counter (see module header) — the 100 TB skew guard."""
    rows = max(1, k // bands)
    df = ensure_parallelism(df)
    sigd = minhash_sig_frame(
        df, ["doc_id"], word_shingles(F.col(text_col), shingle_n), k
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
    grouped = banded.groupBy("band").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    capped = _cap_buckets(grouped, max_bucket, "minhash_lsh_drops")
    return _pairs_from_ids(capped).distinct()


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    bands: int = 2,
    shingle_n: int = 3,
    threshold_e4: int = 5000,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard_e4): MinHash-LSH candidates confirmed by
    exact Jaccard over the shingle sets — the full candidate-then-verify
    dedup (false positives from band collisions are filtered out).

    Cost shape at 100 TB: the verify is two equi-joins keyed by doc id
    joining the (small) candidate set back to the shingle arrays — shuffle
    ∝ candidates, never |docs|²; the shingle arrays stay JVM-side and the
    intersection is one codegen'd expression."""
    cand = minhash_lsh_pairs(
        df, text_col=text_col, k=k, bands=bands, shingle_n=shingle_n,
        max_bucket=max_bucket,
    )
    # materialize the (small) candidate set once: it is consumed twice
    # below (id restriction + the pair join) and Spark would otherwise
    # re-run the whole MinHash pass per consumer. localCheckpoint keeps
    # the data on the executors (lazy: computed on first use).
    cand = cand.localCheckpoint(eager=False)
    # shingle sets ONLY for docs that appear in a candidate pair: the
    # semi-join runs before the shingle projection, so at corpus scale the
    # verify shingles |candidates| docs, not 2×|corpus|
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # r6 (two fixes, measured 34 s → 1.5 s on the sf1 planted-dup corpus):
    #  * AQE coalesces the semi-join's post-shuffle partitions by BYTES
    #    (a few MB of text → 1 partition) and the per-row shingle HOF
    #    then runs single-task — re-spread candidate docs to full width
    #    before the expensive projection (guide §2.5: partition for the
    #    WORK, not the bytes; candidates ≪ corpus, so this exchange is
    #    delta-sized at scale too);
    #  * the frame is consumed TWICE below (sh_a and sh_b sides) — cache
    #    the shingle projection or candidate-doc shingling runs twice.
    sets = (
        df.join(cand_ids, "doc_id")
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col("doc_id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
        )
        .localCheckpoint(eager=False)
    )
    jac = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard_e4",
            F.floor(
                F.col("n_common")
                * 10000
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common"))
            ).cast("long"),
        )
    )
    return jac.filter(F.col("jaccard_e4") >= threshold_e4).select(
        "doc_a", "doc_b", "jaccard_e4"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold_e4: int = 8000,
    max_df: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard_e4) for pairs with Jaccard ≥ threshold.
    Inverted-index join: explode shingles, equi-join on shingle, count
    common per pair, |A∪B| = |A|+|B|-common. Never materializes the
    full pair matrix — only pairs sharing ≥1 shingle.

    ``max_df`` is the document-frequency stop-shingle guard: a shingle
    shared by more than max_df documents (boilerplate at web scale) is
    dropped from pairing with an observed counter — exactly the standard
    df-threshold in large-scale near-dup pipelines. Dropping a stop-
    shingle *lowers* the computed intersection of pairs that share it, so
    with a df-cap the score is a lower bound; at the default cap nothing
    is dropped below ~10⁵ docs."""
    sh = ensure_parallelism(df).select(
        "doc_id", F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    # inverted index: group docs per shingle, expand co-occurrence pairs
    # in-array (avoids the self-join recomputing shingles for both sides),
    # then count common shingles per pair
    by_shingle = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    capped = _cap_buckets(by_shingle, max_df, "ngram_stop_shingle_drops")
    common = _pairs_from_ids(capped).groupBy("doc_a", "doc_b").agg(
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
    the first 4 hex chars of the md5 digest — engine-portable.

    Same single-pass shape as _simhash64_sections: ONE md5 + ONE conv per
    word and ONE ±1-array aggregate, every expensive subexpression bound
    once through a 1-element-array lambda — 16 separate per-bit
    aggregates would re-evaluate the whole tokenize+md5 chain 16× per
    row under projection collapse (the module's round-1 landmine)."""
    words = word_shingles(col, shingle_n) if shingle_n > 1 else F.array_distinct(tokens(col))

    def word_pm16(w: Column) -> Column:
        def from_int(hs: Column) -> Column:
            return F.array(
                *[
                    F.when(hs.bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
                    for m in _MASKS16
                ]
            )

        return F.element_at(
            F.transform(
                F.array(F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long")),
                from_int,
            ),
            1,
        )

    sums = F.aggregate(
        words,
        F.array_repeat(F.lit(0), 16),
        lambda acc, w: F.zip_with(acc, word_pm16(w), lambda a, b: a + b),
    )
    masks = F.array(*[F.lit(m) for m in _MASKS16])

    def pack(arr: Column) -> Column:
        signed = F.zip_with(
            arr, masks, lambda x, m: F.when(x > 0, m).otherwise(F.lit(0))
        )
        return F.aggregate(signed, F.lit(0), lambda a, v: a + v).cast("long")

    return F.element_at(F.transform(F.array(sums), pack), 1)


def simhash_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (simhash, n_docs, keep_id): docs sharing a 16-bit simhash.

    NOTE — 16 bits is the demonstration/oracle width only: 65,536 buckets
    saturate beyond ~10⁶ docs and everything "collides". The corpus-scale
    path is ``simhash_near_duplicates`` (64-bit + banded Hamming≤k)."""
    return (
        ensure_parallelism(df)
        .select(simhash16(F.col(text_col)).alias("simhash"), "doc_id")
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


_MASKS16 = [1 << j for j in range(16)]


def _simhash64_sections(col: Column, shingle_n: int = 1) -> Column:
    """→ array<long>[4]: the four 16-bit sections of a 64-bit SimHash.

    Cost shape (this is token-volume work — the dominant cost at corpus
    scale): ONE md5 per word (sections take 4 disjoint 4-hex-char slices
    of the digest — four independent 16-bit hash functions), ONE
    aggregate pass with an array<int>[64] ±1 accumulator, ONE sign-pack.
    Every expensive subexpression is referenced exactly once via the
    bind-through-lambda trick (transform over a 1-element array makes the
    value a lambda variable) — repeated column references are re-evaluated
    per reference by projection collapse (round-1 landmine, measured 10×).
    """
    words = (
        word_shingles(col, shingle_n) if shingle_n > 1 else F.array_distinct(tokens(col))
    )

    def word_pm64(w: Column) -> Column:
        # bind h := md5(w) once; 64 ±1 entries from its four 16-bit slices
        def from_hex(h: Column) -> Column:
            out = []
            for s in range(4):
                hs = F.conv(F.substring(h, 4 * s + 1, 4), 16, 10).cast("long")
                out.extend(
                    F.when(hs.bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
                    for m in _MASKS16
                )
            return F.array(*out)

        return F.element_at(F.transform(F.array(F.md5(w)), from_hex), 1)

    sums64 = F.aggregate(
        words,
        F.array_repeat(F.lit(0), 64),
        lambda acc, w: F.zip_with(acc, word_pm64(w), lambda a, b: a + b),
    )

    masks = F.array(*[F.lit(m) for m in _MASKS16])

    def pack_all(arr: Column) -> Column:  # arr: the bound 64-sum array
        def pack(s: int) -> Column:
            signed = F.zip_with(
                F.slice(arr, s * 16 + 1, 16),
                masks,
                lambda x, m: F.when(x > 0, m).otherwise(F.lit(0)),
            )
            return F.aggregate(signed, F.lit(0), lambda a, v: a + v).cast("long")

        return F.array(*[pack(s) for s in range(4)])

    return F.element_at(F.transform(F.array(sums64), pack_all), 1)


def simhash64_cols(col: Column, shingle_n: int = 1) -> list[Column]:
    """The four sections as separate columns — test/debug convenience;
    each column re-evaluates the shared aggregate (fine on small data —
    production consumers use the single-reference array form)."""
    return [
        F.element_at(_simhash64_sections(col, shingle_n), s + 1) for s in range(4)
    ]


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, hamming ≤ max_hamming) over a 64-bit SimHash —
    the corpus-scale near-dup path.

    Pigeonhole banding: 64 bits split into 4 sections of 16; two hashes
    within Hamming distance 3 must agree on ≥1 whole section, so
    candidates = docs equal in any (section_idx, section_value) bucket —
    an equi-key groupBy, shuffle ∝ docs, never all-pairs. Candidates are
    then verified with an exact ``bit_count(xor)`` popcount. Over-cap
    buckets (mass-produced near-identical boilerplate) are dropped with
    an observed counter, like every bucketed expansion here."""
    df = ensure_parallelism(df)  # r6: spread per-row hash/shingle work (guide §2.5)
    secs = _simhash64_sections(F.col(text_col))
    # one band row per section, all four built from a SINGLE reference to
    # the sections array (bound as a lambda variable) — separate s{i}
    # column references would re-evaluate the whole signature per
    # reference (projection collapse)
    rows = F.element_at(
        F.transform(
            F.array(secs),
            lambda sec: F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.struct(
                    F.concat_ws(
                        ":", i.cast("string"), F.element_at(sec, i + 1).cast("string")
                    ).alias("band"),
                    F.element_at(sec, 1).alias("s0"),
                    F.element_at(sec, 2).alias("s1"),
                    F.element_at(sec, 3).alias("s2"),
                    F.element_at(sec, 4).alias("s3"),
                ),
            ),
        ),
        1,
    )
    sigd = ensure_parallelism(df).select("doc_id", F.explode(rows).alias("r"))
    banded = sigd.select(
        "doc_id",
        F.col("r.band").alias("band"),
        F.col("r.s0").alias("s0"),
        F.col("r.s1").alias("s1"),
        F.col("r.s2").alias("s2"),
        F.col("r.s3").alias("s3"),
    )
    grouped = banded.groupBy("band").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "s0", "s1", "s2", "s3"))
        ).alias("ids")
    )
    capped = _cap_buckets(grouped, max_bucket, "simhash_band_drops")

    def _hamming(x, y):
        # per-section popcount — sections are 16-bit, no 64-bit packing
        # (packing 4×16 unsigned into one signed long overflows the sign)
        out = F.lit(0)
        for i in range(4):
            out = out + F.bit_count(x[f"s{i}"].bitwiseXOR(y[f"s{i}"]))
        return out.cast("int")

    # r6: posexplode + strictly-greater tail (the _pairs_from_ids shape)
    # instead of the nested transform/struct O(n²) interpreted
    # allocation, and re-spread the byte-coalesced groupBy output before
    # the in-bucket expansion (same AQE-coalesces-by-bytes trap as the
    # minhash verify). Row-identical: the trailing distinct already
    # collapsed multiplicity, strict doc_a < doc_b and the hamming cut
    # are the same predicate, and hamming is deterministic.
    capped = capped.repartition(
        capped.sparkSession.sparkContext.defaultParallelism
    )
    ex = capped.select(F.posexplode(F.col("ids")).alias("_i", "x"), F.col("ids"))
    pairs = ex.select(
        F.col("x"),
        F.explode(
            F.filter(
                F.slice(F.col("ids"), F.col("_i") + 2, F.size(F.col("ids"))),
                lambda y: (y["doc_id"] > F.col("x.doc_id"))
                & (_hamming(F.col("x"), y) <= max_hamming),
            )
        ).alias("y"),
    ).select(
        F.col("x.doc_id").alias("doc_a"),
        F.col("y.doc_id").alias("doc_b"),
        _hamming(F.col("x"), F.col("y")).alias("hamming"),
    )
    return pairs.distinct()


_INTEGRAL_ELEMS = ("array<tinyint>", "array<smallint>", "array<int>", "array<bigint>")


def _is_integral_vec(df: DataFrame, vec_col: str) -> bool:
    """True iff ``vec_col`` is an integer-element array — the condition
    under which the grouped-numpy cosine path below is bit-exact (all
    dots/norms are integers < 2⁵³, so Spark's sequential double fold and
    numpy's int64 matmul produce the same IEEE values regardless of
    accumulation order; float elements would need Spark's exact fold
    order and stay on the JVM expression path)."""
    return dict(df.dtypes).get(vec_col) in _INTEGRAL_ELEMS


def _grouped_cosine_pairs(threshold_e6: int, semantic: bool = False):
    """Build the applyInPandas function for bucket-local pair cosines via
    one numpy matmul per group — value-identical to the JVM self-join +
    per-pair ``cosine_e6`` HOF chain it replaces (guide §4.2: hand whole
    batches to vectorized native code), at O(n·d) Arrow bytes per bucket
    instead of O(n²·d) join-expanded rows.

    Input groups carry columns (id, vec) plus, for ``semantic``,
    (cluster, cent). Emits one row per unordered in-group pair with
    ``id_a < id_b`` and the pair's exact ``cosine_e6`` ≥ threshold,
    replicating every edge of the expression semantics:
      * either vector NULL, containing a NULL element, or zero-norm →
        cosine 0 (the ``when(denom > 0)`` otherwise-branch, incl. the
        NULL-denominator case);
      * clean nonzero vectors of UNEQUAL length → dot NULL → pair
        dropped (zip_with null padding nulls the fold);
      * NULL ids never pair (``a.id < b.id`` is null-rejecting);
      * duplicate ids: equal ids never pair, distinct rows keep join
        multiplicity.
    Exactness: integer vectors make every dot/norm-square an exact
    integer < 2⁵³, so numpy's int64 matmul followed by the same
    double-divide/floor reproduces Spark's sequential double fold
    bit-for-bit (callers gate on :func:`_is_integral_vec`)."""
    import numpy as np
    import pandas as pd

    out_cols = (
        ["cluster", "id_a", "id_b", "cosine_e6", "drop_id"]
        if semantic
        else ["id_a", "id_b", "cosine_e6"]
    )

    def emit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf[pdf["id"].notna()]
        n = len(pdf)
        rows: list[tuple] = []
        if n >= 2:
            ids = pdf["id"].to_numpy()
            vecs = pdf["vec"].tolist()
            if semantic:
                cluster = pdf["cluster"].iloc[0]
                cents = pdf["cent"].to_numpy(dtype=np.float64, na_value=np.nan)
            by_len: dict[int, list[int]] = {}
            zeroish: list[int] = []  # null vec, null element, or zero norm
            for i, x in enumerate(vecs):
                if x is None:
                    zeroish.append(i)
                    continue
                a = np.asarray(x, dtype=np.float64)
                if a.size == 0 or np.isnan(a).any() or not a.any():
                    zeroish.append(i)
                    continue
                by_len.setdefault(a.size, []).append(i)

            def put(i: int, j: int, cos: int) -> None:
                a, b = (i, j) if ids[i] < ids[j] else (j, i)
                if not semantic:
                    rows.append((ids[a], ids[b], cos))
                    return
                ca, cb = cents[a], cents[b]
                if ca > cb:
                    drop = ids[a]
                elif cb > ca:
                    drop = ids[b]
                else:  # ties AND null cents → greater id
                    drop = ids[b]
                rows.append((cluster, ids[a], ids[b], cos, drop))

            for idx in by_len.values():
                m = len(idx)
                if m < 2:
                    continue
                sub = np.asarray(idx)
                Q = np.stack([np.asarray(vecs[i], dtype=np.int64) for i in idx])
                G = Q @ Q.T  # exact int64: |dot| ≤ d·(max|q|)² < 2⁶³
                norms = np.sqrt(np.diag(G).astype(np.float64))
                denom = np.outer(norms, norms)
                cos = np.floor((G * 1_000_000).astype(np.float64) / denom)
                iu, ju = np.triu_indices(m, 1)
                keep = (cos[iu, ju] >= threshold_e6) & (
                    ids[sub[iu]] != ids[sub[ju]]
                )
                for i, j, c in zip(
                    sub[iu[keep]],
                    sub[ju[keep]],
                    cos[iu, ju][keep].astype(np.int64),
                ):
                    put(int(i), int(j), int(c))
            if threshold_e6 <= 0 and zeroish:
                # zero/null-ish rows pair with EVERYTHING at cosine 0 —
                # only reachable when the threshold admits 0
                zs = set(zeroish)
                for i in zeroish:
                    for j in range(n):
                        if (j in zs and j <= i) or ids[i] == ids[j]:
                            continue
                        put(i, j, 0)
        return pd.DataFrame(rows, columns=out_cols)

    return emit


def embedding_cosine_pairs(
    df: DataFrame,
    threshold_e6: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sign_bits: int = 16,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    probe_flips: int = 0,
) -> DataFrame:
    """→ (id_a, id_b, cosine_e6 ≥ τ): near-duplicate embeddings, blocked
    by a sign-LSH bucket (first ``n_sign_bits`` dimension signs) so the
    pair join is bucket-local; exact cosine verifies candidates.

    Scale knobs: 16 sign bits → 65,536 buckets (at 10⁹ vectors the mean
    bucket is ~15k; raise bits with corpus size — each bit halves the
    expected bucket). ``max_bucket`` drops degenerate hot buckets (e.g.
    the all-positive bucket of non-centered embeddings) from pairing,
    with an observed counter. Recall loss from sign blocking is the
    documented ANN trade-off; ``probe_flips`` > 0 turns on multi-probe
    (union over the Hamming-1 buckets of the closest hyperplanes, see
    similarity.probe_buckets) to recover boundary-vector pairs — probe
    rows scale the join input by 1 + probe_flips, caps still apply."""
    from .similarity import cosine_e6, probe_buckets, sign_bucket

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), n_sign_bits).alias("bucket"),
    )
    counts = v.groupBy("bucket").agg(F.count("*").alias("_n"))
    counts = counts.observe(
        _metric_name("embed_bucket_drops"),
        F.sum(F.when(F.col("_n") > max_bucket, 1).otherwise(0)).alias(
            "n_dropped_buckets"
        ),
        F.sum(F.when(F.col("_n") > max_bucket, F.col("_n")).otherwise(0)).alias(
            "n_dropped_rows"
        ),
    )
    min_n = 1 if probe_flips > 0 else 2  # probes can pair across buckets
    keep = counts.filter((F.col("_n") >= min_n) & (F.col("_n") <= max_bucket)).select(
        "bucket"
    )
    v = v.join(F.broadcast(keep), "bucket")
    if probe_flips == 0 and _is_integral_vec(df, vec_col):
        # integer-quantized vectors: bucket-local numpy matmul (exact —
        # see _grouped_cosine_pairs) instead of the O(n²) self-join +
        # per-pair interpreted-HOF cosine. One shuffle of the vectors,
        # no pair materialization in the JVM.
        id_dt = dict(df.dtypes)[id_col]
        return v.groupBy("bucket").applyInPandas(
            _grouped_cosine_pairs(threshold_e6),
            schema=f"id_a {id_dt}, id_b {id_dt}, cosine_e6 long",
        )
    if probe_flips > 0:
        # probe side: each vector appears under its base + flipped
        # buckets; base side keeps one bucket per vector, so a pair is
        # found iff either endpoint probes the other's bucket. Probes are
        # built from the keep-filtered base set (v, not df) AND capped by
        # the same keep-list: a vector whose base bucket was dropped is
        # fully excluded — otherwise its probe rows would sneak pairs into
        # neighboring buckets while the drop metric claimed it was out.
        probes = v.select(
            "id",
            "vec",
            F.explode(
                probe_buckets(F.col("vec"), n_sign_bits, probe_flips)
            ).alias("bucket"),
        ).join(F.broadcast(keep), "bucket")
        a, b = probes.alias("a"), v.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                F.col("a.vec").alias("vec_a"),
                F.col("b.vec").alias("vec_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = cand.select(
            "id_a",
            "id_b",
            cosine_e6(F.col("vec_a"), F.col("vec_b")).alias("cosine_e6"),
        )
        return pairs.filter(F.col("cosine_e6") >= threshold_e6)
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine_e6(F.col("a.vec"), F.col("b.vec")).alias("cosine_e6"),
    )
    return pairs.filter(F.col("cosine_e6") >= threshold_e6)


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Duplicate-pair CLUSTERING: → ``(doc_id, cluster_id)`` — connected
    components over the pair graph, cluster_id = the component's minimum
    doc_id.  This is the production OUTPUT of a dedup pipeline: every
    pair operator above emits edges; this turns them into keep/drop
    decisions (see ``cluster_representatives`` / ``dedup_keep``).

    Algorithm: min-label propagation with per-pass label flattening
    (label ← label-of-label, the pointer-jumping half of the classic
    large-star/small-star CC — Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): each pass is two hash-partitioned
    joins on doc_id/label, and flattening makes convergence
    O(log diameter) passes rather than O(diameter) — a 1000-long crawl
    chain converges in ~10 passes.  Each pass localCheckpoints (lineage
    would otherwise grow by two joins per pass), and convergence is
    checked with a single count() action per pass.  At 100 TB the label
    frame holds only docs that appear in SOME pair — near-dup graphs are
    sparse, so this is orders of magnitude smaller than the corpus.
    Raises after ``max_iters`` unconverged passes rather than returning
    partial components silently."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    # lazy checkpoints: same lineage cap and compute-once reuse, but the
    # materialization fuses into each pass's convergence-count job
    # instead of running as its own serialized driver-blocking job
    edges = edges.localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("src_label").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                "label", F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: label ← label's own current label
        flat = stepped.join(
            stepped.select(
                F.col("doc_id").alias("label"),
                F.col("label").alias("label_label"),
            ),
            "label",
            "left",
        ).select(
            "doc_id",
            F.least(
                "label", F.coalesce("label_label", F.col("label"))
            ).alias("label"),
        )
        new_labels = flat.localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("doc_id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iters} passes "
        "(component diameter > ~2^iters — inspect the pair graph)"
    )


def cluster_representatives(
    clusters: DataFrame,
    docs: DataFrame | None = None,
    policy: str = "min_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(cluster_id, doc_id)``: ONE representative per duplicate
    cluster.  ``min_id`` keeps the smallest doc_id (deterministic, needs
    no doc payload); ``longest_text`` keeps the longest document
    (ties → smallest doc_id), the usual crawl-dedup keep policy — one
    broadcast-free join against the docs frame, then a struct-max
    aggregation (no window, single shuffle on cluster_id)."""
    if policy == "min_id":
        return clusters.groupBy("cluster_id").agg(
            F.min("doc_id").alias("doc_id")
        )
    if policy != "longest_text":
        raise ValueError(f"unknown keep policy {policy!r}")
    if docs is None:
        raise ValueError("policy='longest_text' requires the docs frame")
    scored = clusters.join(docs.select("doc_id", text_col), "doc_id")
    # min_by over (-length, doc_id): longest text wins, length ties
    # break to the SMALLEST doc_id — one aggregation, no window
    return scored.groupBy("cluster_id").agg(
        F.min_by(
            "doc_id",
            F.struct(
                (-F.length(text_col)).alias("neg_len"),
                F.col("doc_id").alias("doc_id"),
            ),
        ).alias("doc_id")
    )


def dedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    policy: str = "min_id",
    text_col: str = "text",
) -> DataFrame:
    """→ the deduplicated corpus: drop every clustered document except
    its representative; documents in no pair pass through untouched.
    The anti-join's strategy is left to AQE: a small drop-list
    broadcasts (corpus never shuffles); a huge one (heavy-dup crawls)
    falls back to a shuffle anti-join rather than OOMing the driver."""
    clusters = duplicate_clusters(pairs, a_col=a_col, b_col=b_col)
    reps = cluster_representatives(
        clusters, docs=df if policy == "longest_text" else None,
        policy=policy, text_col=text_col,
    )
    drops = clusters.join(
        reps.select("cluster_id", F.col("doc_id").alias("keep_id")),
        "cluster_id",
    ).filter(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    return df.join(drops, "doc_id", "left_anti")


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    prefilter_m_bits: int | None = None,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile rule): flag corpus
    documents that share any word ``n``-gram with an evaluation set
    (13-grams in the GPT-3 appendix; callers pick ``n``).

    → ``(doc_id, n_grams, n_contaminated, contaminated)`` — one row per
    corpus document; ``n_grams`` counts the document's DISTINCT n-grams,
    ``n_contaminated`` how many of those appear anywhere in ``eval_df``.

    Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
    the distinct eval-gram set is **broadcast** (~10⁶ grams); corpus
    grams explode map-side into a broadcast-hash inner join that emits
    ONLY matches, the per-doc match count groups a near-empty stream,
    and the counts join back to the corpus spine as a second broadcast
    (contaminated docs are rare by construction). The corpus itself
    never shuffles — both joins are map-side.

    ``prefilter_m_bits`` composes the Bloom path EXACTNESS-PRESERVING:
    only docs with at least one Bloom-hit gram (true matches + the
    ~(1−e^{−k·|eval|/m})^k false-positive sliver) explode into the join
    at all — the rest short-circuit on a map-side ``exists`` over the
    gram array. Bloom misses are impossible, so the exact join then
    removes exactly the false positives: output is row-identical to the
    plain path (pinned by pytest at fixture scale AND 0 mismatches on a
    1M-doc run). Measured HONESTLY at 1M short docs / 32 cores it is
    cost-NEUTRAL (10.6 vs 10.8 s): the per-gram Bloom probe ≈ the
    per-gram join probe it replaces, so skipping the explode for the
    ~99% clean docs only pays off where the explode itself is the
    bottleneck — long documents (gram rows ≫ input rows, spill
    pressure) or an eval-gram set too large to broadcast as a join
    hashtable while its Bloom compression still fits a literal. Use
    ``decontaminate_bloom`` (3× faster, one-sided error) when exact
    counts aren't required."""
    from .textstats import token_ngrams, tokens

    def grams(col):
        return F.array_distinct(token_ngrams(tokens(F.col(col)), n))

    eval_grams = (
        ensure_parallelism(eval_df)
        .select(F.explode(grams(text_col)).alias("g"))
        .distinct()
    )
    base = ensure_parallelism(df).select(
        "doc_id", grams(text_col).alias("grams")
    )
    suspect = base
    if prefilter_m_bits is not None:
        # xxhash positions: the prefilter's correctness doesn't depend
        # on WHICH hash sets the bits (the exact join below removes
        # every false positive), so take the cheap JVM hash. BINARY
        # literal, not string — string substring walks codepoints,
        # O(position) per probe (see decontaminate_bloom's docstring)
        blit = F.lit(
            bloom_bits(
                eval_df,
                n=n,
                m_bits=prefilter_m_bits,
                text_col=text_col,
                hash_mode="xxhash",
            ).encode("ascii")
        )

        def bloom_hit(g: Column) -> Column:
            conds = [
                F.substring(blit, (p + 1).cast("int"), 1) == F.lit(b"1")
                for p in _bloom_positions(g, prefilter_m_bits, "xxhash")
            ]
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out

        suspect = base.where(F.exists("grams", bloom_hit))
    hits = (
        suspect.select("doc_id", F.explode("grams").alias("g"))
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return base.select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    ).join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
        (F.coalesce("n_contaminated", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


BLOOM_K = 4  # one md5 digest = four disjoint 32-bit lanes (minhash_cols' derivation)


def _bloom_positions(
    gram: Column, m_bits: int, hash_mode: str = "md5"
) -> list[Column]:
    """The gram's ``BLOOM_K`` Bloom bit positions.

    ``md5``: the four disjoint 32-bit hex lanes of ONE md5, each reduced
    mod ``m_bits`` — the same one-digest/four-lane trick as
    ``minhash_cols``, and the same Spark↔DuckDB portable
    ``conv(substring(md5 ...), 16, 10)`` arithmetic as ``hash_sample``.
    Use when the positions must reproduce in the SQL oracle.

    ``xxhash``: one ``xxhash64`` split into (h1, h2) halves, position j
    = (h1 + j·h2) mod m — the Kirsch–Mitzenmacher derivation the
    Count-Min sketch uses. Cheaper per gram than md5+conv (no crypto
    digest, no hex decode) but NOT cross-engine: use only where
    downstream exactness doesn't depend on the positions (the
    ``decontaminate`` prefilter, where the exact join removes every
    false positive regardless of hash)."""
    if hash_mode == "xxhash":
        h = F.xxhash64(gram)
        h1 = h.bitwiseAND(F.lit((1 << 32) - 1))
        h2 = F.shiftrightunsigned(h, 32)
        return [((h1 + F.lit(j) * h2) % m_bits) for j in range(BLOOM_K)]
    digest = F.md5(gram)
    return [
        (F.conv(F.substring(digest, 8 * j + 1, 8), 16, 10).cast("long") % m_bits)
        for j in range(BLOOM_K)
    ]


def bloom_bits(
    eval_df: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    text_col: str = "text",
    hash_mode: str = "md5",
) -> str:
    """Compress an eval suite's distinct word n-grams into a Bloom bit
    array, returned as a ``'0'``/``'1'`` string of length ``m_bits``.

    The only driver-side materialization is the set of SET bit
    positions — bounded by the CONSTANT ``m_bits`` regardless of eval
    size (this is filter *construction* over the tiny eval side, not a
    corpus collect; same inherent-and-bounded shape as BPE's per-round
    top-1)."""
    from .textstats import token_ngrams, tokens

    grams = (
        ensure_parallelism(eval_df)
        .select(
            F.explode(
                F.array_distinct(token_ngrams(tokens(F.col(text_col)), n))
            ).alias("g")
        )
        .distinct()
    )
    pos = (
        grams.select(
            F.explode(
                F.array(*_bloom_positions(F.col("g"), m_bits, hash_mode))
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    bits = ["0"] * m_bits
    for r in pos:
        bits[r["p"]] = "1"
    return "".join(bits)


def decontaminate_bloom(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    text_col: str = "text",
) -> DataFrame:
    """``decontaminate``'s 100 TB fast path: identical flag semantics,
    but the broadcast eval-gram SET is replaced by a constant-size Bloom
    bit array embedded as one literal — corpus scoring becomes pure
    map-side expression work with NO join and NO shuffle of any kind
    (plan-asserted). Measured at 1M docs / 32 cores: 2.1-3.9 s vs
    6.3-10.2 s for the broadcast-join formulation (the join pays the
    gram row-explode plus a hashtable probe per gram).

    The literal is BINARY, not string, and that is load-bearing:
    ``substring`` on a string column walks codepoints — O(position) per
    probe, which at m = 2²⁰ means ~0.5 MB scanned PER PROBE and turned
    this exact operator into 100+ s at 1M docs; the binary slice is an
    O(1) offset copy (measured 117 s → 2.3 s, BENCH.md §decontam-bloom).

    Error is one-sided and safe for decontamination: a clean document
    may be flagged (per-gram false-positive ≈ (1−e^{−k·|eval|/m})^k,
    k = ``BLOOM_K``), a contaminated one is NEVER missed — flagged is a
    superset of ``decontaminate``'s contaminated (recall 1.0, pinned by
    pytest). Size ``m_bits ≈ 20×`` the distinct eval-gram count for
    ~0.2% per-gram fp; the default 2²⁰ bits (1 MiB literal) covers a
    ~50k-gram suite at <1e-5. Deterministic: both engines derive the
    same positions from the same md5 lanes, so false positives
    themselves reproduce bit-identically (the DuckDB oracle re-derives
    membership from the position set relationally).

    → ``(doc_id, n_grams, n_bloom_hits, flagged)`` — the
    ``decontaminate`` spine with Bloom-filter hits."""
    from .textstats import token_ngrams, tokens

    blit = F.lit(
        bloom_bits(eval_df, n=n, m_bits=m_bits, text_col=text_col).encode("ascii")
    )

    def hit(g: Column) -> Column:
        conds = [
            F.substring(blit, (p + 1).cast("int"), 1) == F.lit(b"1")
            for p in _bloom_positions(g, m_bits)
        ]
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    grams = F.array_distinct(token_ngrams(tokens(F.col(text_col)), n))
    return (
        ensure_parallelism(df)
        .select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            F.size(F.filter("grams", hit)).cast("long").alias("n_bloom_hits"),
        )
        .withColumn("flagged", (F.col("n_bloom_hits") > 0).cast("int"))
    )


def decontaminate_fuzzy(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    tau_e6: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """FUZZY benchmark decontamination (the Llama-2 / PaLM appendix
    rule): flag corpus documents whose word-``n``-gram Jaccard
    similarity with ANY eval document reaches ``tau`` — catches
    paraphrased or partially-copied benchmark items that exact-overlap
    decontamination (``decontaminate``'s any-shared-13-gram rule) scores
    but cannot rank, and that ``decontaminate_bloom`` can only flag.

    → ``(doc_id, n_grams, best_eval_id, jaccard_e6, contaminated)`` —
    one row per corpus document; ``best_eval_id`` is the eval document
    with the highest Jaccard (ties → smallest eval doc_id,
    deterministic; NULL when no gram is shared), ``jaccard_e6`` =
    ``floor(|∩|·10⁶ / |∪|)`` in exact bigint arithmetic (never a
    double, so scores are bit-identical across engines), and
    ``contaminated`` = 1 iff ``jaccard_e6 ≥ tau_e6``.

    Scale shape — the same two-broadcast skeleton as ``decontaminate``:
    the exploded distinct eval grams (carrying ``(eval_id, |eval|)``)
    broadcast; corpus grams explode map-side into a broadcast-hash
    inner join that emits ONLY matching grams, so the per-(doc, eval)
    intersection count groups a stream bounded by the gram-overlap
    volume, never the corpus. The per-doc ``max`` then re-groups that
    same small stream, and the result joins back to the corpus spine as
    a second broadcast. The corpus itself never shuffles — both its
    joins are map-side (plan-asserted in tests/test_plans.py). The
    per-doc gram count rides the explode projection, so no
    corpus-vs-corpus join ever forms."""
    from .textstats import token_ngrams, tokens

    def grams(col):
        return F.array_distinct(token_ngrams(tokens(F.col(col)), n))

    ev = ensure_parallelism(eval_df).select(
        F.col("doc_id").alias("eval_id"), grams(text_col).alias("egrams")
    )
    ev_grams = ev.select(
        "eval_id",
        F.size("egrams").cast("long").alias("n_eval"),
        F.explode("egrams").alias("g"),
    )
    base = ensure_parallelism(df).select(
        "doc_id", grams(text_col).alias("grams")
    )
    pair = (
        base.select(
            "doc_id",
            F.size("grams").cast("long").alias("n_doc"),
            F.explode("grams").alias("g"),
        )
        .join(F.broadcast(ev_grams), "g")
        .groupBy("doc_id", "eval_id")
        .agg(
            # n_doc / n_eval are constant within the group; max() is the
            # cheapest deterministic way to carry them through
            F.max("n_doc").alias("n_doc"),
            F.max("n_eval").alias("n_eval"),
            F.count("*").cast("long").alias("inter"),
        )
        .select(
            "doc_id",
            "eval_id",
            F.expr(
                "(inter * 1000000) div (n_doc + n_eval - inter)"
            ).alias("j_e6"),
        )
    )
    best = pair.groupBy("doc_id").agg(
        F.min_by(
            "eval_id",
            F.struct(
                (-F.col("j_e6")).alias("neg_j"),
                F.col("eval_id").alias("eval_id"),
            ),
        ).alias("best_eval_id"),
        F.max("j_e6").alias("jaccard_e6"),
    )
    return (
        base.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
        .join(F.broadcast(best), "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.col("best_eval_id").cast("long").alias("best_eval_id"),
            F.coalesce("jaccard_e6", F.lit(0)).cast("long").alias("jaccard_e6"),
            (F.coalesce("jaccard_e6", F.lit(0)) >= F.lit(tau_e6))
            .cast("int")
            .alias("contaminated"),
        )
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    window: int = 16,
) -> DataFrame:
    """Cross-corpus SPAN-level dedup (the C4 "three-sentence span" rule
    at fixed token windows): chunk every document into non-overlapping
    ``window``-token spans, keep only the globally FIRST occurrence of
    each distinct span (first = smallest ``(doc_id, pos)``), and
    reassemble each document from its surviving chunks.

    → ``(doc_id, clean_text, n_chunks, n_dropped)``.

    Scale shape: explode to one row per chunk (map-side), ONE
    ``groupBy(chunk_hash)`` whose **map-side partial aggregation
    collapses hot boilerplate chunks per partition before the shuffle**
    (the skew case — a chunk shared by millions of docs arrives at the
    reducer once per partition, not once per occurrence; a window/rank
    formulation would ship every occurrence to one reducer), one join of
    chunks against the first-occurrence frame on the 128-bit hash (bytes
    kept small — the chunk text itself never shuffles twice), and one
    ``groupBy(doc_id)`` reassembly. Everything is keyed and linear."""
    df = ensure_parallelism(df)  # r6: spread per-row hash/shingle work (guide §2.5)
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    chunked = df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * window + 1, window)
                ),
            )
        ).alias("pos", "chunk"),
    ).filter(F.length("chunk") > 0)
    chunked = chunked.withColumn("h", F.md5("chunk"))
    firsts = chunked.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_at")
    )
    marked = chunked.join(firsts, "h").withColumn(
        "kept",
        (F.col("doc_id") == F.col("first_at.doc_id"))
        & (F.col("pos") == F.col("first_at.pos")),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("pos", "chunk"))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("clean_text"),
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def semantic_dup_pairs(
    df: DataFrame,
    centroids,
    threshold_e6: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) SEMANTIC dedup:
    cluster embeddings with a pre-trained k-means quantizer, compare
    pairs only WITHIN a cluster, and mark as droppable the member of
    every over-threshold pair that sits CLOSER to its centroid (the
    paper keeps the lowest-centroid-similarity member; ties drop the
    greater id).  → ``(cluster, id_a, id_b, cosine_e6, drop_id)``;
    compose with ``duplicate_clusters``/``dedup_keep`` for the corpus
    keep-set, or anti-join distinct ``drop_id`` directly for the
    paper's per-pair policy.

    Integer-exact: expects integer-quantized vectors (see the caller's
    ×10⁴ quantization) so dots are exact in doubles and the whole
    decision is bit-portable to the SQL oracle.

    Scale shape: assignment is ONE expression over a centroid literal
    (no join, codegen) — the quantizer is trained OFFLINE on a sample,
    exactly like ``ivf_topk``'s.  The cluster id is the partition key:
    the only shuffle is the groupBy/self-join on ``cluster``.  The
    intra-cluster pair expansion is the paper's O(n²/k) — the number of
    clusters is the scale knob (SemDeDup uses 50k for LAION; mean
    cluster = corpus/k) and ``max_cluster`` caps degenerate hot
    clusters with an observed drop counter, like every other pair
    operator here.  With tens of thousands of centroids, swap the
    literal for a broadcast join on cluster id; the rest is unchanged."""
    from .similarity import cosine_e6, ivf_assign

    # r6: the per-row assignment + centroid-cosine expressions are the
    # dominant cost and a small-file scan yields 1-2 splits — spread them
    # across cores like every other CPU-heavy operator here (guide §2.5
    # input skew; no-op at real scan widths)
    df = ensure_parallelism(df)
    if _is_integral_vec(df, vec_col):
        # exact numpy assignment (guide §4.2): dots are exact int64, the
        # argmax-first rule equals ivf_assign's strict-greater fold, and
        # the centroid cosine repeats cosine_e6's double-divide/floor on
        # exact integer operands. Null / wrong-dim vectors raise, like
        # the JVM expression path (element_at index-0 / null fold).
        import numpy as np

        Cmat = np.asarray(centroids, dtype=np.int64)
        id_dt = dict(df.dtypes)[id_col]
        vec_dt = dict(df.dtypes)[vec_col]

        def assign(it):
            import pandas as pd

            cn = np.sqrt(
                np.einsum("ij,ij->i", Cmat, Cmat).astype(np.float64)
            )
            for pdf in it:
                if not len(pdf):
                    continue
                Q = np.stack(
                    [np.asarray(x, np.int64) for x in pdf[vec_col].tolist()]
                )
                dots = Q @ Cmat.T
                cl = np.argmax(dots, axis=1)
                qn = np.sqrt(np.einsum("ij,ij->i", Q, Q).astype(np.float64))
                sel = dots[np.arange(len(cl)), cl].astype(np.float64)
                denom = qn * cn[cl]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cent = np.where(
                        denom > 0, np.floor(sel * 1_000_000 / denom), 0.0
                    ).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "id": pdf[id_col],
                        "vec": pdf[vec_col],
                        "cluster": cl.astype("int32"),
                        "cent_cos_e6": cent,
                    }
                )

        v = df.select(id_col, vec_col).mapInPandas(
            assign,
            schema=(
                f"id {id_dt}, vec {vec_dt}, cluster int, cent_cos_e6 long"
            ),
        )
    else:
        cvecs = F.array(
            *[F.array(*[F.lit(int(x)) for x in c]) for c in centroids]
        )
        v = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            ivf_assign(F.col(vec_col), centroids).alias("cluster"),
        ).withColumn(
            "cent_cos_e6",
            cosine_e6(
                F.col("vec"), F.element_at(cvecs, F.col("cluster") + F.lit(1))
            ),
        )
    counts = v.groupBy("cluster").agg(F.count("*").alias("_n"))
    counts = counts.observe(
        _metric_name("semantic_cluster_drops"),
        F.sum(F.when(F.col("_n") > max_cluster, 1).otherwise(0)).alias(
            "n_dropped_clusters"
        ),
        F.sum(
            F.when(F.col("_n") > max_cluster, F.col("_n")).otherwise(0)
        ).alias("n_dropped_rows"),
    )
    keep = counts.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_cluster)
    ).select("cluster")
    v = v.join(F.broadcast(keep), "cluster")
    if _is_integral_vec(df, vec_col):
        # same numpy fast path as embedding_cosine_pairs (exact — see
        # _grouped_cosine_pairs); the drop rule rides along on the
        # per-row centroid cosines computed above
        id_dt = dict(df.dtypes)[id_col]
        return v.select(
            "cluster", "id", "vec", F.col("cent_cos_e6").alias("cent")
        ).groupBy("cluster").applyInPandas(
            _grouped_cosine_pairs(threshold_e6, semantic=True),
            schema=(
                f"cluster int, id_a {id_dt}, id_b {id_dt}, "
                f"cosine_e6 long, drop_id {id_dt}"
            ),
        )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.cluster").alias("cluster"),
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine_e6(F.col("a.vec"), F.col("b.vec")).alias("cosine_e6"),
        F.when(
            F.col("a.cent_cos_e6") > F.col("b.cent_cos_e6"), F.col("a.id")
        )
        .when(F.col("b.cent_cos_e6") > F.col("a.cent_cos_e6"), F.col("b.id"))
        .otherwise(F.greatest(F.col("a.id"), F.col("b.id")))
        .alias("drop_id"),
    )
    return pairs.filter(F.col("cosine_e6") >= threshold_e6)


# --------------------------------------------------------------------------
# ExactSubstr — duplicated-SPAN detection (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"). Whole-doc dedup misses the
# dominant web-duplication mode: long verbatim passages (licenses, boiler-
# plate paragraphs, quoted articles) embedded in otherwise-distinct pages.
# The reference implementation builds a corpus-wide suffix array — a
# single-machine construction. The Spark-native equivalent: fixed-width
# token-window rolling hashes. A duplicated substring of >= k tokens
# contains at least one duplicated k-token window, so the union of
# duplicated windows covers every duplicated substring of length >= k
# (windows shorter than k are below the paper's match threshold by
# construction). Maximal duplicated spans = interval-union of the
# duplicated windows — k-gram islands, the standard distributed
# adaptation of ExactSubstr.
# --------------------------------------------------------------------------


def window_hashes(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """→ ``(doc_id, pos, h)``: md5 of every k-token window, one row per
    window START position (token index, 0-based). Tokenization is the
    T4 whitespace rule (``textstats.tokens``) so spans index into the
    same token stream every other operator sees. Docs with < k tokens
    emit nothing — they cannot contain a >= k-token duplicate.

    Pure codegen: the window hash array is built map-side
    (transform+slice+md5) and exploded; no Python, no shuffle here."""
    from .textstats import token_ngrams, tokens

    toks = tokens(F.col(text_col))
    wins = F.transform(token_ngrams(toks, k), lambda g: F.md5(g))
    return ensure_parallelism(df).select(
        "doc_id", F.posexplode(wins).alias("pos", "h")
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """→ ``(doc_id, span_start, span_end, n_dup_windows)``: maximal
    token-index spans ``[span_start, span_end)`` covered by k-token
    windows whose hash occurs >= ``min_count`` times corpus-wide
    (across documents OR repeated within one — the paper counts total
    occurrences, so self-repeats count).

    Scale shape (the 100 TB rule): the window frame is k× token volume —
    the documented, intrinsic cost of ExactSubstr (the suffix array it
    replaces is also O(tokens) but not distributable). The hash-count
    groupBy partial-aggregates map-side; the dup-hash join is a
    hash-partitioned equi-join emitting one row per duplicated WINDOW
    (never a pair expansion — a hash shared by a million docs costs a
    million rows, not a trillion pairs, which is why no bucket cap is
    needed here); the per-doc interval union is one groupBy on doc_id
    with the island merge done in a column expression over the sorted
    position array. Three shuffles total, all on high-cardinality keys.

    Islands: window starts p, q (p < q) merge iff q <= p + k (overlap or
    touch — the covered text [p, p+k) ∪ [q, q+k) is contiguous). Since
    positions are sorted, comparing each to its predecessor suffices."""
    df = ensure_parallelism(df)  # r6: spread per-row hash/shingle work (guide §2.5)
    # r6: wins feeds BOTH the hash-count groupBy and the dup-window join
    # — cache it or the whole tokenize+window-md5 pass runs twice
    wins = window_hashes(df, text_col=text_col, k=k).localCheckpoint(
        eager=False
    )
    dup_h = (
        wins.groupBy("h")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("h")
    )
    dup_pos = wins.join(dup_h, "h").select("doc_id", "pos")
    ps = F.sort_array(F.collect_list("pos"))
    per_doc = dup_pos.groupBy("doc_id").agg(ps.alias("ps"))
    # island boundaries over the sorted start array: a window opens a new
    # span iff it neither overlaps nor touches the previous window
    starts = F.filter(
        F.col("ps"),
        lambda p, i: (i == F.lit(0)) | (p > F.get(F.col("ps"), i - 1) + F.lit(k)),
    )
    ends = F.transform(
        F.filter(
            F.col("ps"),
            lambda p, i: (i == F.size(F.col("ps")) - 1)
            | (F.get(F.col("ps"), i + 1) > p + F.lit(k)),
        ),
        lambda p: p + F.lit(k),
    )
    spans = F.zip_with(
        starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
    )
    # n_dup_windows inside THIS span: count of ps within [s, e-k]
    n_in = F.size(
        F.filter(
            F.col("ps"),
            lambda p: (p >= F.col("sp.s")) & (p <= F.col("sp.e") - F.lit(k)),
        )
    )
    out = (
        per_doc.select("doc_id", "ps", F.explode(spans).alias("sp"))
        .select(
            "doc_id",
            F.col("sp.s").cast("long").alias("span_start"),
            F.col("sp.e").cast("long").alias("span_end"),
            n_in.cast("long").alias("n_dup_windows"),
        )
    )
    return out


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """→ the corpus with every duplicated span REMOVED from every copy
    (the paper's actual policy — ExactSubstr deletes all occurrences,
    not all-but-one) plus ``n_tokens_removed``. Documents with no
    duplicated span pass through with text untouched (byte-identical:
    the rebuild branch only runs for flagged docs).

    One extra join vs ``duplicated_spans``: the span list is aggregated
    per doc and joined back to the corpus spine; AQE broadcasts it when
    duplication is sparse (the common case), else it shuffles — never a
    driver collect."""
    from .textstats import tokens

    spans = duplicated_spans(df, text_col=text_col, k=k, min_count=min_count)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_dup_spans")
    )
    joined = df.join(per_doc, "doc_id", "left")
    toks = tokens(F.col(text_col))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_dup_spans"),
            lambda sp: (i >= sp["span_start"]) & (i < sp["span_end"]),
        ),
    )
    removed = (F.size(toks) - F.size(kept)).cast("long")
    rebuilt = F.concat_ws(" ", kept)
    return joined.select(
        *[
            F.when(F.col("_dup_spans").isNotNull(), rebuilt)
            .otherwise(F.col(c))
            .alias(c)
            if c == text_col
            else F.col(c)
            for c in df.columns
        ],
        F.when(F.col("_dup_spans").isNotNull(), removed)
        .otherwise(F.lit(0).cast("long"))
        .alias("n_tokens_removed"),
    )
