"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures. The actual media decode is STUBBED behind
``set_decoder``/deterministic fakes because no image/audio libraries ship
in this container; a production deployment injects e.g. a PIL/ffmpeg-based
decoder with the same signature.

Shape rules for 100 TB:
  * media bytes live in their own column → column pruning keeps them out
    of every scan that doesn't decode;
  * decode/feature-extract runs in ``mapInPandas`` over size-bucketed
    partitions (same length-bucketing as text, keyed on byte length);
  * features come back as fixed-length array<float> → downstream joins
    aggs never touch the binary again.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

# decoder registry: kind -> bytes -> list[float] feature vector
_DECODERS: dict[str, Callable[[bytes], list[float]]] = {}


def set_decoder(kind: str, fn: Callable[[bytes], list[float]]) -> None:
    _DECODERS[kind] = fn


def real_decode(kind: str, data: bytes) -> list[float]:
    """Production decode hook — not available in this environment."""
    raise NotImplementedError(
        f"no media decoder registered for kind={kind!r}; this container has "
        "no image/audio libraries — inject one with set_decoder()"
    )


def deterministic_fake_features(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: md5-derived floats in
    [-1, 1). Lets the full Spark plumbing (batching, schema, downstream
    ANN) be exercised and asserted byte-stably in tests."""
    h = hashlib.md5(data or b"").digest()
    return [((h[i % 16] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(
    df: DataFrame,
    dim: int = 8,
    use_fake: bool = True,
    batch_media_bytes: int = 64 << 20,
) -> DataFrame:
    """→ (media_id, kind, features: array<float>).

    Arrow-batched mapInPandas; binary column read once, dropped on output.
    ``batch_media_bytes`` documents the sizing contract: upstream should
    set spark.sql.files.maxPartitionBytes / maxRecordsPerBatch so one
    Arrow batch of media stays under executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, data in zip(pdf["kind"], pdf["media"]):
                fn = _DECODERS.get(kind)
                if fn is not None:
                    feats.append(fn(bytes(data) if data is not None else b""))
                elif use_fake:
                    feats.append(
                        deterministic_fake_features(
                            bytes(data) if data is not None else b"", dim
                        )
                    )
                else:
                    real_decode(kind, data)  # raises NotImplementedError
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    # size-bucket so one partition never holds only-huge blobs
    bucketed = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism,
        F.floor(F.log2(F.length("media").cast("double") + 2.0)),
        F.pmod(F.xxhash64("media_id"), F.lit(8)),
    )
    return bucketed.mapInPandas(
        run, schema="media_id string, kind string, features array<double>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (media_id, frame_idx, ts_ms) from metadata only — the actual frame
    decode joins this plan against the binary in extract_features. Pure
    JVM sequence/explode; demonstrates metadata-driven fan-out."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)
                ),
                F.lit(every_ms),
            )
        ).alias("frame_idx", "ts_ms"),
    )
