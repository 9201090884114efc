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


# ---------------------------------------------------------------------------
# Built-in dependency-free image codecs (uncompressed BMP + binary PPM).
# These make the bytes→features path REAL end-to-end: the multimodal_features
# oracle query encodes synthetic images from a known pixel formula, decodes
# them here, and DuckDB recomputes the expected channel sums analytically —
# a wrong stride/padding/channel-order in this parser breaks the value hash.
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit uncompressed bottom-up BMP writer. ``rgb`` is
    row-major top-down RGB (3 bytes/px) — the natural logical layout; the
    writer handles the format's bottom-up row order, BGR channel order,
    and 4-byte row padding."""
    import struct

    row_pad = (-(width * 3)) % 4
    stride = width * 3 + row_pad
    pixel_bytes = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            pixel_bytes += bytes((b, g, r))  # BGR on disk
        pixel_bytes += b"\x00" * row_pad
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + height * stride, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, height * stride, 0, 0, 0, 0
    )
    return header + info + bytes(pixel_bytes)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6) writer; ``rgb`` row-major top-down RGB."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    import struct

    if data[:2] != b"BM":
        raise NotImplementedError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = data[offset + src_y * stride : offset + src_y * stride + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated BMP pixel data")
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            i = (y * width + x) * 3
            out[i : i + 3] = bytes((r, g, b))
    return width, height, bytes(out)


def _decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"P6":
        raise NotImplementedError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated,
    # '#' comments allowed anywhere between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    width, height, maxval = tokens
    if maxval != 255:
        raise NotImplementedError(f"only maxval=255 PPM supported, got {maxval}")
    pos += 1  # single whitespace after maxval
    rgb = data[pos : pos + width * height * 3]
    if len(rgb) < width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


def image_stat_features(data: bytes) -> list[float]:
    """bytes → [width, height, n_px, sum_r, sum_g, sum_b]. All values are
    exact integers (≤ 2^53) so the vector survives the double round-trip
    and integerizes losslessly in oracle comparisons."""
    if data[:2] == b"BM":
        w, h, rgb = _decode_bmp(data)
    elif data[:2] == b"P6":
        w, h, rgb = _decode_ppm(data)
    else:
        raise NotImplementedError(
            f"unknown image magic {data[:2]!r}; built-in codecs: BMP, P6 PPM"
        )
    return [
        float(w),
        float(h),
        float(w * h),
        float(sum(rgb[0::3])),
        float(sum(rgb[1::3])),
        float(sum(rgb[2::3])),
    ]


def real_decode(kind: str, data: bytes) -> list[float]:
    """Decode hook: built-in BMP/P6-PPM codecs for images; anything else
    (JPEG/PNG/audio/video) needs an injected decoder (set_decoder) since
    no media libraries ship in this container."""
    if kind == "image" and data:
        return image_stat_features(bytes(data))
    raise NotImplementedError(
        f"no media decoder for kind={kind!r} (built-in: uncompressed "
        "BMP / P6 PPM images) — inject one with set_decoder()"
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
                    feats.append(
                        real_decode(kind, bytes(data) if data is not None else b"")
                    )
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
    JVM sequence/explode; demonstrates metadata-driven fan-out. Videos
    with NULL or zero duration plan NO frames (a ts-0 frame for a
    duration-less video would send the decode join after content that
    cannot exist)."""
    return (
        df.filter(
            (F.col("kind") == "video")
            & (F.coalesce(F.col("duration_ms"), F.lit(0)) > 0)
        )
        .select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_idx", "ts_ms"),
        )
    )
