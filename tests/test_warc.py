"""WARC front door (stages/warc.py): spec round-trip, gzip members,
robustness to truncation/garbage/non-response records, Spark reader, and
the warc → ingest end-to-end composition."""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pytest

from docee_spark.stages.warc import (
    build_warc,
    gunzip_members,
    parse_warc,
    read_warc,
    webtext_from_warc,
)


def _ts(i: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, i, tzinfo=timezone.utc)


def _recs(n: int = 5) -> list[dict]:
    return [
        {
            "url": f"https://example.com/p{i}",
            "warc_ts": _ts(i),
            "html": f"<html><body><p>doc {i}</p></body></html>".encode(),
        }
        for i in range(n)
    ]


class TestParser:
    def test_round_trip_plain(self):
        recs = _recs()
        got = list(parse_warc(build_warc(recs)))
        assert len(got) == 5
        for want, r in zip(recs, got):
            assert r["url"] == want["url"]
            assert r["warc_ts"] == want["warc_ts"]
            assert r["html"] == want["html"]

    def test_round_trip_gzip_members(self):
        recs = _recs()
        data = build_warc(recs, gzip_members=True)
        assert data[:2] == b"\x1f\x8b"
        got = list(parse_warc(data))
        assert [r["url"] for r in got] == [r["url"] for r in recs]
        assert got[3]["html"] == recs[3]["html"]

    def test_non_response_records_skipped(self):
        recs = _recs(3)
        recs[1]["warc_type"] = "request"
        got = list(parse_warc(build_warc(recs)))
        assert [r["url"] for r in got] == [recs[0]["url"], recs[2]["url"]]

    def test_truncated_tail_record_dropped(self):
        data = build_warc(_recs(3))
        got = list(parse_warc(data[: len(data) - 30]))
        assert len(got) == 2  # the cut record is dropped, not crashed on

    def test_garbage_between_records_resyncs(self):
        a = build_warc(_recs(1))
        b = build_warc(
            [{"url": "https://example.com/z", "warc_ts": _ts(9), "html": b"<p>z</p>"}]
        )
        got = list(parse_warc(a + b"JUNK BYTES NOT A RECORD\r\n" + b))
        assert [r["url"] for r in got] == [
            "https://example.com/p0",
            "https://example.com/z",
        ]

    def test_truncated_gzip_member_keeps_prefix(self):
        data = build_warc(_recs(2), gzip_members=True)
        # cut inside the second member
        cut = data[: len(data) - 8]
        plain = gunzip_members(cut)
        assert plain.startswith(b"WARC/1.0")
        got = list(parse_warc(cut))
        assert len(got) >= 1 and got[0]["url"] == "https://example.com/p0"

    def test_non_http_payload_passthrough(self):
        raw = build_warc(_recs(1)).replace(
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n", b""
        )
        # content-length now overshoots; parser must not emit garbage rows
        got = list(parse_warc(raw))
        assert all(r["url"].startswith("https://") for r in got)


class TestSparkReader:
    @pytest.fixture()
    def warc_dir(self, tmp_path):
        (tmp_path / "a.warc").write_bytes(build_warc(_recs(4)))
        (tmp_path / "b.warc.gz").write_bytes(
            build_warc(
                [
                    {
                        "url": "https://other.net/q",
                        "warc_ts": _ts(30),
                        "html": b"<html><body><p>gz page</p></body></html>",
                    }
                ],
                gzip_members=True,
            )
        )
        return str(tmp_path)

    def test_read_warc(self, spark, warc_dir):
        rows = {r["url"]: r for r in read_warc(spark, warc_dir + "/*").collect()}
        assert len(rows) == 5
        assert rows["https://other.net/q"]["html"].startswith(b"<html>")
        assert rows["https://example.com/p2"]["warc_ts"] == _ts(2).replace(
            tzinfo=None
        ) or rows["https://example.com/p2"]["warc_ts"] is not None

    def test_warc_to_ingest_end_to_end(self, spark, warc_dir):
        from docee_spark.stages.ingest import ingest

        web = webtext_from_warc(spark, warc_dir + "/*")
        docs = ingest(web)  # → (doc_id=url, lang, text, warc_ts)
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert texts["https://example.com/p1"] == "doc 1"
        assert texts["https://other.net/q"] == "gz page"

    @pytest.mark.slow
    def test_cli_input_warc(self, spark, warc_dir, tmp_path):
        """--input-warc drives the full CLI pipeline from archive files."""
        import os

        from docee_spark.cli import main

        out = str(tmp_path / "kg")
        rc = main(["--input-warc", warc_dir + "/*", "--output", out])
        assert rc == 0
        assert os.path.isdir(out)
