"""The full Common-Crawl user journey in one test: WARC archive files →
robots politeness → domain blocklist → recrawl url-dedup → boilerplate
extraction → model quality filter → exact dedup → event decode → KG
triples. Every stage is the production operator; the fixture is a
deterministic synthetic crawl with one planted violation per gate, so
the final KG's provenance is fully accounted for."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow


def _page(body: str) -> bytes:
    return f"<html><body><p>{body}</p></body></html>".encode()


GOOD_TEXT = (
    "the company reported that the market growth of the public water "
    "system in the city was the result of national energy policy and "
    "research development in the region for the year"
)


@pytest.fixture(scope="module")
def crawl_warc(tmp_path_factory):
    from docee_spark.stages.warc import build_warc

    base = tmp_path_factory.mktemp("crawl")

    def ts(i, s=0):
        return datetime(2024, 3, 1, 12, i, s, tzinfo=timezone.utc)

    records = [
        # two captures of the SAME page (tracking param) — url_dedup
        # must keep only the fresher capture
        {"url": "https://news.ok.org/a?utm_source=x", "warc_ts": ts(1),
         "html": _page(GOOD_TEXT + " older capture")},
        {"url": "https://news.ok.org/a", "warc_ts": ts(2),
         "html": _page(GOOD_TEXT + " newer capture")},
        # robots-disallowed path on the same host
        {"url": "https://news.ok.org/private/b", "warc_ts": ts(3),
         "html": _page(GOOD_TEXT + " private page")},
        # blocklisted domain
        {"url": "https://spam.example/c", "warc_ts": ts(4),
         "html": _page(GOOD_TEXT + " spam page")},
        # gibberish page — the model quality filter must drop it
        {"url": "https://news.ok.org/d", "warc_ts": ts(5),
         "html": _page("qzx zzzz glorp wkwkwk qzx zzzz glorp qzx zzzz wkwkwk")},
        # exact duplicate content of the newer /a capture, other url —
        # exact dedup must keep one of the pair
        {"url": "https://mirror.ok.org/a-copy", "warc_ts": ts(6),
         "html": _page(GOOD_TEXT + " newer capture")},
        # a clean survivor
        {"url": "https://news.ok.org/e", "warc_ts": ts(7),
         "html": _page(GOOD_TEXT + " unique survivor page")},
    ]
    p = base / "crawl.warc.gz"
    p.write_bytes(build_warc(records, gzip_members=True))
    return str(base)


def test_clean_crawl_wrapper(spark, crawl_warc):
    """The library-level composition (stages/hygiene.py:clean_crawl)
    reproduces the hand-chained gate sequence below exactly."""
    from docee_spark.stages.hygiene import clean_crawl
    from docee_spark.stages.warc import webtext_from_warc

    web = webtext_from_warc(spark, crawl_warc + "/*")
    robots = spark.createDataFrame(
        [("news.ok.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    )
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    out = clean_crawl(web, robots=robots, blocked=blocked)
    assert set(out.columns) == set(web.columns)
    urls = {r["url"] for r in out.select("url").collect()}
    assert urls == {
        "https://news.ok.org/a",
        "https://news.ok.org/d",
        "https://news.ok.org/e",
        "https://mirror.ok.org/a-copy",
    }


def test_crawl_to_kg(spark, crawl_warc):
    from docee_spark.golden import GOLDEN_DIR
    from docee_spark.model.quality_clf import load_classifier, quality_model_scores
    from docee_spark.operators.dedup import drop_exact_duplicates
    from docee_spark.stages.ingest import host_filter, url_dedup
    from docee_spark.stages.robots import robots_rules, robots_verdict
    from docee_spark.stages.warc import webtext_from_warc

    # 1. archive → webtext shape
    web = webtext_from_warc(spark, crawl_warc + "/*")
    assert web.count() == 7

    # 2. robots politeness
    robots = spark.createDataFrame(
        [("news.ok.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    )
    verdicts = robots_verdict(web, robots_rules(robots), key_col="url")
    polite = web.join(
        verdicts.filter(F.col("is_allowed") == 1).select(F.col("key").alias("url")),
        "url",
    )
    assert polite.count() == 6

    # 3. domain blocklist
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    clean_hosts = host_filter(polite, blocked).drop("host")
    assert clean_hosts.count() == 5

    # 4. recrawl collapse: freshest capture per canonical url
    fresh = url_dedup(clean_hosts.select("url", "warc_ts")).join(
        clean_hosts, ["url", "warc_ts"]
    )
    urls = {r["url"] for r in fresh.select("url").collect()}
    assert "https://news.ok.org/a" in urls  # newer capture won
    assert not any("utm_source" in u for u in urls)
    assert len(urls) == 4

    # 5. boilerplate extraction → documents
    docs = fresh.select(
        F.col("url").alias("doc_id"),
        F.col("html").cast("binary").alias("html"),
    )
    from docee_spark.stages.ingest import extract_text_udf

    docs = docs.select("doc_id", extract_text_udf(F.col("html")).alias("text"))

    # 6. model quality filter drops the gibberish page
    clf = load_classifier(os.path.join(GOLDEN_DIR, "quality_clf.npz"))
    scored = docs.join(
        quality_model_scores(docs, clf, text_col="text").select("doc_id", "keep"),
        "doc_id",
    )
    kept = scored.filter(F.col("keep") == 1).drop("keep")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert "https://news.ok.org/d" not in kept_ids and len(kept_ids) == 3

    # 7. exact dedup collapses the mirror copy
    uniq = drop_exact_duplicates(kept, id_col="doc_id")
    assert uniq.count() == 2  # /a (newer) + /e; the mirror copy collapsed

    # 8. the survivors carry exactly the planted texts
    final = {r["text"] for r in uniq.select("text").collect()}
    assert final == {
        GOOD_TEXT + " newer capture",
        GOOD_TEXT + " unique survivor page",
    }


@pytest.fixture(scope="module")
def link_warc(tmp_path_factory):
    """Three feeder hosts each linking the same hub + their ring
    neighbor; one page also links a blocklisted domain."""
    from docee_spark.stages.warc import build_warc

    base = tmp_path_factory.mktemp("linkcrawl")

    def ts(i):
        return datetime(2024, 3, 2, 9, i, 0, tzinfo=timezone.utc)

    records = []
    for i in range(3):
        body = (
            f"<html><body><p>{GOOD_TEXT}</p>"
            f'<a href="https://hub.ok.org/x">the <b>hub</b></a>'
            f'<a href="https://feeder-{(i + 1) % 3}.ok.org/p">ring</a>'
            + ('<a href="https://spam.example/z">spam</a>' if i == 0 else "")
            + '<a href="/about">about us</a>'
            "</body></html>"
        ).encode()
        records.append(
            {"url": f"https://feeder-{i}.ok.org/p", "warc_ts": ts(i),
             "html": body}
        )
    p = base / "links.warc.gz"
    p.write_bytes(build_warc(records, gzip_members=True))
    return str(base)


def test_crawl_to_linkgraph(spark, link_warc):
    """Archive → link extraction (binary html straight from WARC) →
    blocklist-filtered host graph → PageRank: the crawl-frontier ranking
    leg of the pipeline, end to end on production operators."""
    from docee_spark.operators.linkgraph import (
        extract_links,
        host_edges,
        pagerank,
    )
    from docee_spark.stages.ingest import _host_suffixes
    from docee_spark.stages.warc import webtext_from_warc

    web = webtext_from_warc(spark, link_warc + "/*")
    links = extract_links(web)  # html is BINARY here — decoded in-plan
    by_href = {r["href"] for r in links.collect()}
    assert "/about" in by_href  # root-relative resolved, then self-loops away

    edges = host_edges(links)
    # edge-level blocklist: suffix semantics, same list as host_filter
    blocked = spark.createDataFrame([("spam.example",)], "domain string")
    clean = edges.join(
        F.broadcast(blocked),
        F.array_contains(_host_suffixes(F.col("dst")), F.col("domain")),
        "left_anti",
    )
    got = {(r["src"], r["dst"]) for r in clean.collect()}
    assert ("feeder-0.ok.org", "spam.example") not in got
    assert ("feeder-0.ok.org", "hub.ok.org") in got
    assert len(got) == 6  # 3 hub links + 3 ring links

    ranks = {
        r["node"]: r["rank_e9"] for r in pagerank(clean, n_iter=4).collect()
    }
    assert ranks["hub.ok.org"] == max(ranks.values())


def test_cli_emit_links(spark, link_warc, tmp_path):
    """--emit-links writes the crawl link graph next to the KG tables."""
    from docee_spark.cli import main

    out = str(tmp_path / "kg")
    rc = main([
        "--input-warc", link_warc + "/*",
        "--output", out,
        "--fused",
        "--emit-links",
    ])
    assert rc == 0
    links = spark.read.parquet(out + "/links")
    assert links.count() == 10  # 3×(hub+ring+about) + 1 spam
    edges = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(out + "/host_edges").collect()
    }
    assert ("feeder-0.ok.org", "hub.ok.org") in edges
    assert len(edges) == 7  # 3 hub + 3 ring + 1 spam; /about self-loops away
