"""Property-based invariants for url canonicalization (hypothesis over a
structured url grammar, batched: one hypothesis example = one url list =
one Spark job).

The load-bearing property is IDEMPOTENCE: ``canonical_url`` is the
recrawl-dedup blocking key, so a canonical url must be its own canonical
form — if normalizing twice moved the value, two crawls of the same page
could land in different dedup groups."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_hostbits = st.lists(
    st.sampled_from(["example", "WWW", "a", "Sub", "x9", "co"]),
    min_size=1,
    max_size=3,
)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.sampled_from(["", "/", "/A/b", "/p%20q", "/a//b/"])
_params = st.lists(
    st.sampled_from(
        ["a=1", "B=2", "utm_source=x", "gclid=z", "ref=top", "pref=1", "z="]
    ),
    max_size=4,
)
_frag = st.sampled_from(["", "#f", "#a?b=1"])


@st.composite
def _urls(draw):
    kind = draw(st.integers(0, 4))
    if kind == 0:  # garbage / scheme-less
        return draw(st.sampled_from(["", "not a url", "example.com/a", "::weird"]))
    scheme = draw(_scheme)
    host = ".".join(draw(_hostbits))
    port = draw(_port)
    path = draw(_path)
    q = "&".join(draw(_params))
    frag = draw(_frag)
    url = f"{scheme}://{host}{port}{path}"
    if q:
        url += "?" + q
    return url + frag


class TestCanonicalUrlProperties:
    @settings(max_examples=8, deadline=None)
    @given(st.lists(_urls(), min_size=20, max_size=60))
    def test_idempotent(self, spark, urls):
        from docee_spark.stages.ingest import canonical_url

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = canonical_url(F.col("url"))
        rows = df.select(
            "url",
            once.alias("c1"),
            canonical_url(once).alias("c2"),
        ).collect()
        for r in rows:
            assert r["c2"] == r["c1"], (r["url"], r["c1"], r["c2"])

    @settings(max_examples=8, deadline=None)
    @given(st.lists(_urls(), min_size=20, max_size=60))
    def test_host_agrees_with_canonical_form(self, spark, urls):
        # url_host of the canonical form must equal url_host of the raw
        # url minus www./default-port normalization — i.e. host keying
        # before or after canonicalization can't disagree on grouping
        from docee_spark.stages.ingest import canonical_url, url_host

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            "url",
            url_host(canonical_url(F.col("url"))).alias("ch"),
            url_host(F.col("url")).alias("rh"),
        ).collect()
        for r in rows:
            raw = r["rh"]
            # strip what canonicalization strips
            want = raw
            while want.startswith("www."):
                want = want[4:]
            if r["url"].lower().startswith("http://") and want.endswith(":80"):
                want = want[:-3]
            if r["url"].lower().startswith("https://") and want.endswith(":443"):
                want = want[:-4]
            assert r["ch"] == want, (r["url"], r["ch"], want)
