"""Incremental KG construction over a streaming webtext source.

``readStream`` on a webtext directory (or Kafka in production) →
``foreachBatch`` running the exact batch pipeline per micro-batch →
epoch-partitioned triples sink. Exactly-once comes from the streaming
checkpoint *plus* an idempotent sink: the output is partitioned by
``epoch_id`` and written with dynamic partition overwrite, so a micro-
batch replayed after a failure between sink write and checkpoint commit
overwrites its own epoch partition instead of appending duplicates
(plain parquet append cannot overwrite by key; on Iceberg/Delta this
becomes a MERGE on (doc_id, recguid, pred)).

Also provides a watermarked per-host event-time throughput monitor —
the streaming-native aggregation a crawl operator actually watches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import WEBTEXT
from ..stages.pipeline import run_pipeline


def stream_webtext(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    return (
        spark.readStream.schema(WEBTEXT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def write_epoch_idempotent(triples: DataFrame, out_dir: str, epoch_id: int) -> None:
    """Idempotent micro-batch sink: dynamic partition overwrite of the
    epoch's own partition — replaying epoch N rewrites exactly
    epoch_id=N and touches nothing else. This is the exactly-once half
    the streaming checkpoint cannot provide on a file sink."""
    spark = triples.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            triples.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("epoch_id")
            .parquet(out_dir)
        )
    finally:
        spark.conf.set(key, prev)


def incremental_triples(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    entity_dict: dict[str, str] | None = None,
    mode: str = "clique",
):
    """Start the incremental pipeline; returns the StreamingQuery."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = run_pipeline(
            batch_df,
            entity_dict=entity_dict or {},
            mode=mode,
            adjacency="sentence",
            use_html=True,
        )
        write_epoch_idempotent(result["triples"], out_dir, epoch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def host_crawl_state(
    stream: DataFrame,
    budget_docs: int = 10_000,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-host cumulative crawl accounting across micro-batches.

    State per host: (docs_total, chars_total, over_budget) — persisted in
    the streaming state store, updated once per host per micro-batch from
    Arrow-batched rows (never per-row Python), emitted as an update row
    whenever the host appears. ``over_budget`` flips when the cumulative
    doc count crosses ``budget_docs`` — the operator a crawl scheduler
    consumes to throttle hosts. This is the engine's stateful analog of
    the reference's epoch counters, expressed with watermark-free
    processing-time state (unbounded keys → pair with a state TTL in
    production)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1)
    keyed = stream.select(
        host.alias("host"), F.length("text").alias("n_chars")
    ).groupBy("host")

    def update(key, pdfs, state: GroupState):
        docs = chars = 0
        for pdf in pdfs:
            docs += len(pdf)
            chars += int(pdf["n_chars"].fillna(0).sum())
        if state.exists:
            prev_docs, prev_chars = state.get
        else:
            prev_docs = prev_chars = 0
        docs += prev_docs
        chars += prev_chars
        state.update((docs, chars))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "docs_total": [docs],
                "chars_total": [chars],
                "over_budget": [docs > budget_docs],
            }
        )

    return keyed.applyInPandasWithState(
        update,
        outputStructType=(
            "host string, docs_total long, chars_total long, over_budget boolean"
        ),
        stateStructType="docs long, chars long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_throughput_monitor(stream: DataFrame) -> DataFrame:
    """Watermarked event-time aggregation: docs and bytes per (host,
    5-minute window), late data beyond 10 minutes dropped."""
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1)
    return (
        stream.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "5 minutes"), host.alias("host"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
    )


def streaming_minhash_candidates(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    bands: int = 2,
    shingle_n: int = 3,
    state_ttl_ms: int = 600_000,
    max_bucket: int = 64,
) -> DataFrame:
    """NEAR-duplicate candidate detection ON the stream: the batch
    MinHash-LSH banding (identical signature arithmetic —
    ``operators.dedup.minhash_cols`` over ``word_shingles`` — so
    stream-time and compaction-time agree on what collides) exploded to
    one row per band, with ``applyInPandasWithState`` keyed per band
    bucket.  State per bucket: the anchor (first id seen) + member
    count; every later arrival emits a candidate pair
    ``(band, doc_a=anchor, doc_b=later)`` for the downstream batch
    verifier (candidates are NOT verified here — same contract as
    ``minhash_lsh_pairs`` → ``minhash_verified_pairs``).  Pairs form a
    star around the anchor rather than the batch op's full clique —
    ``duplicate_clusters`` closes them transitively downstream, and
    ``doc_a`` is the anchor (first-seen), not necessarily the smaller
    id.

    Scale guards, both mandatory at crawl scale: state expires on a
    processing-time TTL (the streaming horizon — cross-horizon dups
    belong to batch compaction, exactly like ``streaming_exact_dedup``'s
    watermark), and a bucket stops emitting after ``max_bucket`` members
    (the boilerplate-bucket skew guard; the batch pass sees everything
    and applies its own observable cap).

    Trigger caveat: with ``ProcessingTimeTimeout`` Spark's
    ``shouldRunAnotherBatch`` is true whenever processing time advanced,
    so a ``trigger(availableNow=True)`` run keeps scheduling timer-only
    batches and never self-terminates.  This operator is meant for a
    continuously running ingest query (the production shape); a bounded
    drain must stop the query explicitly once the source is exhausted
    (observable via ``numInputRows`` in the progress feed)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import minhash_cols, word_shingles

    rows = max(1, k // bands)
    mh = minhash_cols(word_shingles(F.col(text_col), shingle_n), k)
    sigd = stream.select(
        F.col(id_col).alias("doc_id"),
        *[m.alias(f"m{i}") for i, m in enumerate(mh)],
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
    keyed = sigd.select("doc_id", F.explode(band_arr).alias("band")).groupBy(
        "band"
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()  # deterministic within a micro-batch
        if state.exists:
            anchor, seen = state.get
        else:
            anchor, seen = ids[0], 0
        out_b = []
        for i in ids:
            if seen >= max_bucket:
                break
            seen += 1
            if i != anchor:
                out_b.append(i)
        state.update((anchor, seen))
        state.setTimeoutDuration(state_ttl_ms)
        if out_b:
            yield pd.DataFrame(
                {
                    "band": key[0],
                    "doc_a": anchor,
                    "doc_b": out_b,
                }
            )

    return keyed.applyInPandasWithState(
        update,
        outputStructType="band string, doc_a long, doc_b long",
        stateStructType="anchor long, seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen exact dedup ON the stream: fingerprint the content and
    drop later arrivals of the same fingerprint within the watermark
    horizon.

    Scale-correct by construction: ``dropDuplicatesWithinWatermark``
    EXPIRES its state once the watermark passes a fingerprint's event
    time — plain ``dropDuplicates`` on a stream accretes state forever
    and OOMs a 10^12-doc crawl.  The horizon is the dedup guarantee: two
    identical documents farther apart than the watermark both survive
    here and are caught by the batch ``dedup_keep`` compaction pass —
    the standard streaming-ingest + batch-compaction split."""
    from ..operators.textstats import fingerprint_md5

    # the SAME normalized fingerprint as the batch exact dedup, so
    # stream-time and compaction-time agree on content identity
    return (
        stream.withColumn(
            "fingerprint",
            fingerprint_md5(F.coalesce(F.col(text_col), F.lit(""))),
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_decontaminate(
    stream: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination ON the stream: the Bloom literal
    (``dedup.decontaminate_bloom``) turns the GPT-3/Pile gram-overlap
    check into a STATELESS map-side projection — no state store, no
    watermark, no stream-static join (the broadcast-set formulation
    would re-probe a stream-static join every micro-batch; the literal
    resolves once at plan time from the static eval side). Works under
    any output mode and composes before/after the stateful operators.

    Same one-sided error as the batch Bloom path: flagged is a superset
    of truly contaminated — route flagged docs to the exact batch check
    at compaction time if fp-free drops are required (the standard
    streaming-ingest + batch-compaction split, as in
    ``streaming_exact_dedup``).

    → ``(id_col, n_grams, n_bloom_hits, flagged)``."""
    from ..operators.dedup import decontaminate_bloom

    flagged = decontaminate_bloom(
        stream.withColumn("doc_id", F.col(id_col)),
        eval_df,
        n=n,
        m_bits=m_bits,
        text_col=text_col,
    )
    return flagged.withColumnRenamed("doc_id", id_col)
