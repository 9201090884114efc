"""WARC front door: Common-Crawl archive files → the webtext table shape
(url, warc_ts, html, text, lang) that stage 1 (ingest) consumes.

Parser for the public ISO-28500 WARC format (the container Common Crawl
ships): a WARC file is a sequence of records — a header block terminated
by CRLFCRLF, a Content-Length-delimited payload, a CRLFCRLF record
separator — optionally gzip-compressed ONE MEMBER PER RECORD (the CC
convention, so byte-range fetches can decompress single records). Only
``WARC-Type: response`` records carry pages; their payload is a full
HTTP response whose headers are stripped to get the html bytes.

Scale shape: the FILE is the unit of parallelism (a CC crawl is ~64k
x ~1 GB warc.gz files — natural task granularity; a .gz member stream
cannot be split anyway). ``read_warc`` scans with the binaryFile source
and parses inside ``mapInPandas`` — per-RECORD python is unavoidable for
a byte-level container format (this is parsing, not row-at-a-time
compute; everything downstream stays in Arrow/JVM). Malformed records
degrade per-record (skipped, never a task failure): a crawler-truncated
tail record is normal, not exceptional.

No DuckDB oracle is possible for binary container parsing — this source
is pytest-verified (spec-built fixtures, round-trip, truncation/garbage
robustness) and feeds the oracle-checked ingest stage downstream.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(data: bytes) -> bytes:
    """Decompress ALL gzip members (CC writes one per record; plain
    ``zlib``/``gzip.decompress`` stops after the first)."""
    out = []
    while data[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        if not d.eof:  # truncated final member — keep what decompressed
            break
        data = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version line
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a response-record payload.
    A payload that does not look like HTTP passes through whole (some
    writers store raw content)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    idx = payload.find(b"\r\n\r\n")
    return payload[idx + 4 :] if idx >= 0 else b""


def parse_warc(data: bytes) -> Iterator[dict]:
    """All well-formed ``response`` records in a (possibly gzipped) WARC
    byte string → dicts (url, warc_ts: datetime|None, html: bytes).
    Records of other types, records without a target URI, and malformed
    tails are skipped."""
    if data[:2] == _GZIP_MAGIC:
        data = gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            # resync: malformed bytes — find the next record marker
            nxt = data.find(b"\r\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return  # unrecoverable: cannot delimit the payload
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        pos = body_start + length + 4  # trailing CRLFCRLF
        if len(payload) < length:
            return  # truncated tail record
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = headers.get("warc-date", "")
        try:
            ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            pass
        yield {"url": url, "warc_ts": ts, "html": _http_body(payload)}


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Spec-conformant WARC writer (test fixtures + round-trip oracle):
    each record dict needs (url, warc_ts: datetime, html: bytes); pass
    ``warc_type`` to emit non-response records."""
    out = []
    for r in records:
        body = r["html"]
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        header = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + r.get("warc_type", "response").encode() + b"\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: "
            + r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode()
            + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        )
        rec = header + b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


WARC_ROWS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at ``path`` (glob ok, .warc or .warc.gz) → DataFrame
    (url, warc_ts, html). One file = one parse task (binaryFile source);
    at CC scale parallelism = file count, which is the natural and
    maximal split for per-record gzip members."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in parse_warc(bytes(blob)):
                    rows.append(rec)
            import pandas as pd

            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )

    return files.mapInPandas(parse, WARC_ROWS)


def webtext_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → the full webtext input shape (url, warc_ts, html,
    text, lang) with text/lang null — exactly what stage 1's extractor
    fills in (ingest runs the boilerplate strip only when text is
    null)."""
    return read_warc(spark, path).select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
