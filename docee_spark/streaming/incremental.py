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
