"""PageRank (operators/linkgraph.py): exact integer recurrence vs an
independent python reference, conservation/dangling semantics, and the
two-node analytic fixpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docee_spark.operators.linkgraph import E9, pagerank

# 8-12 checkpointed power iterations per case (~50 s) — slow loop; the
# operator's oracle also runs in test_entry_queries[pagerank]
pytestmark = pytest.mark.slow


def _pagerank_py(edges: list[tuple[int, int]], n_iter: int = 8) -> dict[int, int]:
    """Independent single-process reference of the SAME e9 integer
    recurrence (dict-based, no dataframes)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: E9 // n for v in nodes}
    for _ in range(n_iter):
        in_sum = {v: 0 for v in nodes}
        for u, v in edges:
            in_sum[v] += rank[u] // outdeg[u]
        dangling = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {
            v: (15 * E9) // (100 * n)
            + (85 * (in_sum[v] + dangling // n)) // 100
            for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def small_graph():
    # 9 nodes: a skewed core, a self-loop, a dangling sink (8 has no
    # out-edges), and a multi-edge (0→1 twice — multigraph semantics)
    return [
        (0, 1), (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4),
        (4, 5), (5, 3), (6, 6), (6, 2), (7, 8), (2, 8), (5, 8),
    ]


class TestPageRank:
    def test_matches_python_reference(self, spark, small_graph):
        df = spark.createDataFrame(small_graph, "src long, dst long")
        got = {r["node"]: r["rank_e9"] for r in pagerank(df, n_iter=8).collect()}
        want = _pagerank_py(small_graph, n_iter=8)
        assert got == want

    def test_two_node_cycle_fixpoint(self, spark):
        # A⇄B: the symmetric fixpoint is rank = 0.5 each; integer floors
        # keep both ranks equal and the sum within floor-loss of 1e9
        df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        got = {r["node"]: r["rank_e9"] for r in pagerank(df, n_iter=12).collect()}
        assert got[0] == got[1]
        assert abs(got[0] - E9 // 2) <= 100

    def test_mass_conservation_with_dangling(self, spark, small_graph):
        # dangling redistribution keeps total mass ≈ 1e9 (floors only
        # ever LOSE mass — bounded by ~(edges+nodes) units per pass)
        df = spark.createDataFrame(small_graph, "src long, dst long")
        rows = pagerank(df, n_iter=8).collect()
        total = sum(r["rank_e9"] for r in rows)
        assert 0 < E9 - total < 8 * (len(small_graph) + 9 + 2)

    def test_sink_accumulates_more_than_isolated_feeder(self, spark, small_graph):
        df = spark.createDataFrame(small_graph, "src long, dst long")
        got = {r["node"]: r["rank_e9"] for r in pagerank(df, n_iter=8).collect()}
        # node 2 has 4 in-edges; node 7 has none — ordering must reflect it
        assert got[2] > got[7]

    def test_oracle_sql_matches_spark(self, spark, small_graph):
        import duckdb

        from docee_spark.operators.linkgraph import pagerank_sql

        vals = ", ".join(f"({u}, {v})" for u, v in small_graph)
        sql = pagerank_sql(f"edges(src, dst) as (values {vals})", n_iter=8)
        want = {
            int(r[0]): int(r[1])
            for r in duckdb.connect().execute(sql).fetchall()
        }
        df = spark.createDataFrame(small_graph, "src long, dst long")
        got = {r["node"]: r["rank_e9"] for r in pagerank(df, n_iter=8).collect()}
        assert got == want


HTML = '''<html><body>
<a href="https://other.example.org/abs">Absolute <b>link</b>  here</a>
<a href='//cdn.example.net/lib.js'>proto-rel</a>
<a href="/root/page2">root rel</a>
<a href="sibling.html">path rel</a>
<a href="#frag">frag</a>
<a href="mailto:x@y.z">mail</a>
<A HREF="HTTP://Upper.Example.COM/X?b=2&utm_source=f&a=1">upper</A>
</body></html>'''

PAGE = "https://www.Site-A.example.com:443/dir/page.html?q=1"


class TestExtractLinks:
    def _links(self, spark, html=HTML, url=PAGE):
        from docee_spark.operators.linkgraph import extract_links

        df = spark.createDataFrame([(url, html)], "url string, html string")
        return {
            r["href"]: (r["anchor"], r["dst_url"])
            for r in extract_links(df).collect()
        }

    def test_resolution_branches(self, spark):
        got = self._links(spark)
        assert got["https://other.example.org/abs"] == (
            "Absolute link here",  # nested markup stripped, spaces collapsed
            "https://other.example.org/abs",
        )
        assert got["//cdn.example.net/lib.js"][1] == "https://cdn.example.net/lib.js"
        # root-relative: page authority, lowercased; :443 is https default
        # and www. strips under canonical_url
        assert got["/root/page2"][1] == "https://site-a.example.com/root/page2"
        # path-relative resolves against the page DIRECTORY
        assert got["sibling.html"][1] == "https://site-a.example.com/dir/sibling.html"
        assert got["#frag"][1] is None
        assert got["mailto:x@y.z"][1] is None
        # uppercase <A HREF>, scheme+host lowered, tracking param dropped,
        # params sorted
        assert got["HTTP://Upper.Example.COM/X?b=2&utm_source=f&a=1"][1] == (
            "http://upper.example.com/X?a=1&b=2"
        )

    def test_binary_html_column_decodes_in_plan(self, spark):
        from docee_spark.operators.linkgraph import extract_links

        df = spark.createDataFrame(
            [(PAGE, bytearray(HTML, "utf-8"))], "url string, html binary"
        )
        assert len(extract_links(df).collect()) == 7

    def test_host_edges_collapse_and_dedup(self, spark):
        from docee_spark.operators.linkgraph import extract_links, host_edges

        df = spark.createDataFrame([(PAGE, HTML)], "url string, html string")
        got = {
            (r["src"], r["dst"]) for r in host_edges(extract_links(df)).collect()
        }
        # src host canonicalized (www./port gone) so the root-relative and
        # path-relative links become SELF-loops and drop; one edge per
        # external host, fragments/mailto gone
        assert got == {
            ("site-a.example.com", "other.example.org"),
            ("site-a.example.com", "cdn.example.net"),
            ("site-a.example.com", "upper.example.com"),
        }

    def test_feeds_pagerank_end_to_end(self, spark):
        """The full crawl loop: pages -> extract_links -> host_edges ->
        pagerank. Three hosts all linking to one hub -> the hub outranks
        every feeder."""
        from docee_spark.operators.linkgraph import (
            extract_links,
            host_edges,
            pagerank,
        )

        pages = [
            (f"https://feeder-{i}.example.com/p",
             '<a href="https://hub.example.org/x">hub</a>'
             f'<a href="https://feeder-{(i + 1) % 3}.example.com/p">next</a>')
            for i in range(3)
        ]
        df = spark.createDataFrame(pages, "url string, html string")
        ranks = {
            r["node"]: r["rank_e9"]
            for r in pagerank(
                host_edges(extract_links(df)), n_iter=4
            ).collect()
        }
        assert ranks["hub.example.org"] == max(ranks.values())


class TestAnchorSurfaces:
    def test_majority_vote_and_tiebreak(self, spark):
        from docee_spark.operators.linkgraph import anchor_surfaces

        rows = [
            # "acme corp" points twice to /acme, once to /other -> majority
            ("u1", "x", "Acme Corp", "https://kb.example.org/acme"),
            ("u2", "x", "acme  corp", "https://kb.example.org/acme"),
            ("u3", "x", "ACME CORP", "https://kb.example.org/other"),
            # "beta" ties 1-1 -> lexicographically smaller url wins
            ("u4", "x", "beta", "https://kb.example.org/b2"),
            ("u5", "x", "beta", "https://kb.example.org/b1"),
            # singleton surface drops at min_anchors=2
            ("u6", "x", "rare", "https://kb.example.org/rare"),
            # empty anchor / null dst never become surfaces
            ("u7", "x", "", "https://kb.example.org/e"),
            ("u8", "x", "frag", None),
        ]
        links = spark.createDataFrame(
            rows, "url string, href string, anchor string, dst_url string"
        )
        got = {
            r["surface"]: (r["entity_id"], r["n_anchors"])
            for r in anchor_surfaces(links).collect()
        }
        assert got == {
            "acme corp": ("https://kb.example.org/acme", 3),
            "beta": ("https://kb.example.org/b1", 2),
        }

    def test_feeds_canonicalize_entity_dict(self, spark):
        """Anchor-mined surfaces override LSH clustering: two triples
        whose subj surfaces share an anchor-dictionary entry resolve to
        the SAME entity_id (the web's identifier), not an LSH rep."""
        from docee_spark.operators.linkgraph import anchor_surfaces
        from docee_spark.stages.canonicalize import canonicalize

        links = spark.createDataFrame(
            [("u1", "x", "Acme Corp", "https://kb.example.org/acme"),
             ("u2", "x", "acme corp", "https://kb.example.org/acme")],
            "url string, href string, anchor string, dst_url string",
        )
        ed = anchor_surfaces(links).select("surface", "entity_id")
        trips = spark.createDataFrame(
            [("d1", "T", 0, "acme corp", "T#r", "beta llc"),
             ("d2", "T", 0, "acme corp", "T#r", "gamma inc")],
            "doc_id string, event_type string, recguid int, "
            "subj string, pred string, obj string",
        )
        vertices, edges = canonicalize(trips, entity_dict=ed)
        srcs = {r["src"] for r in edges.collect()}
        assert srcs == {"https://kb.example.org/acme"}
        vs = {r["entity_id"] for r in vertices.collect()}
        assert "https://kb.example.org/acme" in vs


class TestWeightedInput:
    """weight_col: a pre-collapsed weighted edge table must produce the
    SAME integers as the expanded multi-edge list — for all three
    iterative ops (the _collapsed contract: a weight-w row ≡ w parallel
    edges). Also pins the drop rule for NULL / non-positive weights."""

    # (src, dst, w) with skew, a dangling sink (4), and a self-loop
    WEIGHTED = [(0, 1, 3), (0, 2, 1), (1, 2, 5), (2, 0, 2),
                (3, 2, 1), (2, 4, 2), (5, 5, 4), (5, 2, 1)]

    def _frames(self, spark):
        wdf = spark.createDataFrame(
            self.WEIGHTED, "src long, dst long, w long"
        )
        expanded = [(u, v) for u, v, w in self.WEIGHTED for _ in range(w)]
        edf = spark.createDataFrame(expanded, "src long, dst long")
        return wdf, edf

    def test_pagerank_weighted_equals_expanded(self, spark):
        wdf, edf = self._frames(spark)
        got = {r["node"]: r["rank_e9"]
               for r in pagerank(wdf, n_iter=6, weight_col="w").collect()}
        want = {r["node"]: r["rank_e9"]
                for r in pagerank(edf, n_iter=6).collect()}
        assert got == want

    def test_hits_weighted_equals_expanded(self, spark):
        from docee_spark.operators.linkgraph import hits

        wdf, edf = self._frames(spark)
        got = {r["node"]: (r["hub_e9"], r["auth_e9"])
               for r in hits(wdf, n_iter=3, weight_col="w").collect()}
        want = {r["node"]: (r["hub_e9"], r["auth_e9"])
                for r in hits(edf, n_iter=3).collect()}
        assert got == want

    def test_ppr_weighted_equals_expanded(self, spark):
        from docee_spark.operators.linkgraph import personalized_pagerank

        wdf, edf = self._frames(spark)
        got = {r["node"]: r["rank_e9"]
               for r in personalized_pagerank(
                   wdf, [0, 3], n_iter=6, weight_col="w").collect()}
        want = {r["node"]: r["rank_e9"]
                for r in personalized_pagerank(edf, [0, 3], n_iter=6).collect()}
        assert got == want

    def test_nonpositive_and_null_weights_drop(self, spark):
        rows = [(0, 1, 2), (1, 0, 1), (0, 2, 0), (2, 0, -3), (3, 0, None)]
        wdf = spark.createDataFrame(rows, "src long, dst long, w long")
        kept = spark.createDataFrame(
            [(0, 1), (0, 1), (1, 0)], "src long, dst long"
        )
        got = {r["node"]: r["rank_e9"]
               for r in pagerank(wdf, n_iter=4, weight_col="w").collect()}
        want = {r["node"]: r["rank_e9"]
                for r in pagerank(kept, n_iter=4).collect()}
        # zero/negative/NULL-weight rows contribute no edge — but nodes
        # 2 and 3 vanish entirely with their only (dropped) edges
        assert set(got) == {0, 1}
        assert got == want
