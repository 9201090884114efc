"""Property-based differential tests for extract_links (hypothesis over
random page html, batched: one example = one page list = one Spark job).

Two layers:
  * extraction parity — the (href, anchor) pairs must equal a pure-Python
    ``re.findall`` witness using the SAME patterns (this checks the
    subtle part: two regexp_extract_all passes staying positionally
    aligned through arrays_zip + explode, and the quote-style union);
  * resolution invariants — dst_url is NULL exactly for fragments /
    empties / non-http schemes, every non-null dst_url is an absolute
    http(s) url, and dst_url is a ``canonical_url`` fixed point (the
    operator applies canonicalization LAST, so its output must be its
    own canonical form — the same idempotence contract the recrawl-dedup
    blocking key relies on).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docee_spark.operators.linkgraph import _A_DQ, _A_SQ

_hrefs = st.sampled_from(
    [
        "https://other.example.org/abs",
        "HTTP://Upper.Example.COM/X?b=2&utm_source=f&a=1",
        "//cdn.example.net/lib.js",
        "/root/page2",
        "sib.html",
        "a/b/c.html",
        "#frag",
        "",
        "  ",
        "mailto:x@y.z",
        "javascript:void(0)",
        "ftp://files.example.com/f",
    ]
)
_anchors = st.sampled_from(
    [
        "plain text",
        "nested <b>markup</b> inside",
        "  spaced\n\nout  ",
        "",
        "with <span class='x'>attrs</span>",
    ]
)
_noise = st.sampled_from(
    ["", "<p>para</p>", "stray < bracket ", "<!-- <a href=\"no\">c</a> -->"]
)


@st.composite
def _page(draw):
    url = draw(
        st.sampled_from(
            [
                "https://www.Site.example.com/dir/page.html?q=1",
                "http://h.example.org/",
                "https://x.example.net/a/b/index.html",
            ]
        )
    )
    parts = []
    for _ in range(draw(st.integers(0, 4))):
        href = draw(_hrefs)
        anchor = draw(_anchors)
        quote = draw(st.sampled_from(['"', "'"]))
        q = quote
        href_q = href.replace(q, "")  # quotes inside the value end it anyway
        parts.append(draw(_noise))
        parts.append(f"<a class={q}l{q} href={q}{href_q}{q}>{anchor}</a>")
    parts.append(draw(_noise))
    return (url, "<html><body>" + "".join(parts) + "</body></html>")


def _py_links(html: str) -> list[tuple[str, str]]:
    """Witness: same two patterns via re.findall, same anchor cleanup."""
    out = []
    for pat in (_A_DQ, _A_SQ):
        for href, raw in re.findall(pat, html):
            anchor = re.sub(r"\s+", " ", re.sub(r"<[^>]*>", "", raw)).strip()
            out.append((href, anchor))
    return out


class TestExtractLinksProperties:
    @settings(max_examples=8, deadline=None)
    @given(pages=st.lists(_page(), min_size=1, max_size=6))
    def test_extraction_matches_re_witness(self, spark, pages):
        from docee_spark.operators.linkgraph import extract_links

        df = spark.createDataFrame(pages, "url string, html string")
        got = sorted(
            (r["url"], r["href"], r["anchor"])
            for r in extract_links(df).collect()
        )
        want = sorted(
            (url, href, anchor)
            for url, html in pages
            for href, anchor in _py_links(html)
        )
        assert got == want

    @settings(max_examples=8, deadline=None)
    @given(pages=st.lists(_page(), min_size=1, max_size=6))
    def test_resolution_invariants(self, spark, pages):
        from docee_spark.operators.linkgraph import extract_links
        from docee_spark.stages.ingest import canonical_url

        df = spark.createDataFrame(pages, "url string, html string")
        rows = extract_links(df).select(
            "href",
            "dst_url",
            canonical_url(F.col("dst_url")).alias("dst_again"),
        ).collect()
        for r in rows:
            h = r["href"].strip()
            expect_null = (
                h == ""
                or h.startswith("#")
                or (
                    re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", h)
                    and not re.match(r"(?i)^https?://", h)
                )
            )
            if expect_null:
                assert r["dst_url"] is None, r
            else:
                assert r["dst_url"] is not None, r
                assert re.match(r"^https?://", r["dst_url"]), r
                # canonical fixed point
                assert r["dst_again"] == r["dst_url"], r
