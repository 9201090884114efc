"""Capture-level crawl hygiene — the composed front gate between raw
WARC captures and the ingest/extraction stage.

``clean_crawl`` chains the three url-level gates in the order a real
crawl pipeline applies them (each optional):

1. robots politeness (``stages/robots``) — urls a polite crawler must
   not keep;
2. domain blocklist (``stages/ingest.host_filter``) — UT1-style
   hygiene with allowlist carve-outs;
3. recrawl collapse (``stages/ingest.url_dedup``) — freshest capture
   per canonical url.

Content-level gates (boilerplate extraction, model quality filter,
exact/near dedup) need the TEXT, so they compose downstream of
``ingest`` — see tests/test_crawl_e2e.py for the full journey.

Scale shape inherits from the parts: robots and blocklist verdicts are
broadcast-probe joins (the corpus never shuffles), the recrawl collapse
is one map-side-combined groupBy, and the final join-back keys on the
(url, warc_ts) winner pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ingest import host_filter, url_dedup
from .robots import robots_rules, robots_verdict


def clean_crawl(
    webtext: DataFrame,
    robots: DataFrame | None = None,
    blocked: DataFrame | None = None,
    allowed: DataFrame | None = None,
    agent: str = "*",
) -> DataFrame:
    """webtext (url, warc_ts, …) → the surviving freshest captures,
    same columns. Pass ``robots(host, body)`` and/or
    ``blocked/allowed(domain)`` to enable those gates.

    Edge case, intentionally passed through: two captures with an
    IDENTICAL (url, warc_ts) pair but different payloads both survive
    the join-back (the recrawl collapse keys on exactly that pair, and
    picking one of two same-key payloads would be arbitrary) — exact
    content dedup downstream resolves them deterministically."""
    df = webtext
    if robots is not None:
        verdicts = robots_verdict(df, robots_rules(robots, agent), key_col="url")
        df = df.join(
            verdicts.filter(F.col("is_allowed") == 1).select(
                F.col("key").alias("url")
            ),
            "url",
        )
    if blocked is not None:
        df = host_filter(df, blocked, allowed).drop("host")
    return url_dedup(df.select("url", "warc_ts")).select("url", "warc_ts").join(
        df, ["url", "warc_ts"]
    )
