"""Incremental KG construction over a streaming webtext source.

``readStream`` on a webtext directory (or Kafka in production) →
``foreachBatch`` running the exact batch pipeline per micro-batch →
append to the triples sink. Exactly-once comes from the streaming
checkpoint + idempotent append keyed by (doc_id, recguid, pred): a
replayed micro-batch overwrites the same keys.

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
        (
            result["triples"]
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
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
