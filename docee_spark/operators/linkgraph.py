"""Web-link-graph analytics: PageRank for crawl-frontier / entity-
importance ranking.

Common-Crawl-style pipelines rank the URL frontier (and KG entities) by
link centrality; this module provides the distributed power-iteration
PageRank over an ``(src, dst)`` edge table. All arithmetic is e9
fixed-point integer (floor division via the pmod identity), so the same
unrolled recurrence is re-derivable exactly in DuckDB SQL for the
correctness oracle — floats never cross the engine boundary.

Semantics (classic damped PageRank, dangling mass redistributed):

    rank⁰(v)   = fdiv(10⁹, N)
    rankᵗ⁺¹(v) = fdiv(15·10⁹, 100·N)
               + fdiv(85 · ( Σ_{u→v} fdiv(rankᵗ(u), outdeg(u))
                             + fdiv(Σ_{dangling u} rankᵗ(u), N) ), 100)

Scale shape per iteration: one join ranks⋈edges on src (both sides
hash-partitioned on the same key — AQE reuses the exchange across
iterations where sizes allow), one groupBy dst with map-side partial
sums, one broadcast of the two scalar aggregates (dangling mass, N).
Ranks are localCheckpointed each pass so lineage stays flat over many
iterations; edges are checkpointed once up front. The edge table is the
big side and is shuffled ONCE (to its join partitioning), never
re-materialized.

Multigraphs are collapsed ONCE up front to ``(src, dst, w)`` weighted
pairs, and every pass works on the collapsed table. This is bit-exact,
not approximate: the per-edge contribution ``fdiv(rank(u), outdeg(u))``
is constant across the w parallel copies of an edge u→v, so their sum
is exactly ``w · fdiv(rank(u), outdeg(u))`` with ``outdeg = Σ w`` —
the floor happens per SOURCE, before the multiplicity factor. On a
KG edge table (one row per extracted mention pair) the collapse shrinks
the per-pass join input by the mention multiplicity (~12× at the 1M-doc
scale record in BENCH.md §kg-analytics) while the python reference,
pytest goldens and DuckDB oracles — all defined over the RAW multi-edge
list — stay bit-identical.

The fixed-point floors make ranks drift from float PageRank by < 10⁻⁶
per iteration — irrelevant for ordering, and exactness is what makes
the result verifiable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E9 = 1_000_000_000


def _fdiv(a, b):
    """Exact floor division on non-negative longs: (a - pmod(a,b)) / b is
    exactly divisible, so the double round-trip of Spark's ``/`` is exact
    (all values here are < 2^53)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def _collapsed(
    edges: DataFrame, src_col: str, dst_col: str, weight_col: str | None
) -> DataFrame:
    """``(src, dst, w)`` weighted simple digraph, localCheckpointed.

    ``weight_col=None`` counts parallel ``(src, dst)`` rows — the
    multigraph collapse (bit-exact for the three iterative ops: the
    per-edge contribution is constant per source, so w parallel copies
    sum to exactly w times one copy). A caller whose edge table already
    carries integer multiplicities (e.g. a host graph pre-collapsed
    upstream, or ``extract_links``→``host_edges`` output aggregated per
    crawl batch) passes ``weight_col`` and the weights are summed
    instead — semantically identical to expanding each row into w
    parallel edges, without materializing them. NULL / non-positive
    weights are dropped (a zero-weight edge is no edge)."""
    s, d = F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    if weight_col is None:
        g = edges.select(s, d).groupBy("src", "dst").agg(
            F.count("*").alias("w")
        )
    else:
        g = (
            edges.select(s, d, F.col(weight_col).cast("long").alias("w"))
            .filter(F.col("w") > 0)
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    return g.localCheckpoint()


def pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """→ ``(node, rank_e9)`` for every node appearing in ``edges``
    (either side). Damping is fixed at 0.85 (as 85/100 integer) to keep
    the cross-engine contract closed over integers. ``weight_col``
    treats each row as that many parallel edges (see ``_collapsed``)."""
    e = _collapsed(edges, src_col, dst_col, weight_col)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.agg(F.count("*").alias("n_nodes"))
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))

    ranks = (
        nodes.crossJoin(F.broadcast(n_total))
        .select("node", _fdiv(F.lit(E9), F.col("n_nodes")).alias("rank_e9"))
        .localCheckpoint()
    )
    for it in range(n_iter):
        r = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left").select(
            "node", "rank_e9", "outdeg"
        )
        # outdeg ≥ w, so w·fdiv(rank, outdeg) ≤ rank ≤ ~1e9: no overflow
        contrib = (
            r.filter(F.col("outdeg").isNotNull())
            .join(e, F.col("node") == e["src"])
            .select(
                "dst",
                (F.col("w") * _fdiv(F.col("rank_e9"), F.col("outdeg"))).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        dangling = r.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank_e9"))),
                F.lit(0),
            ).alias("dangling_sum")
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    _fdiv(F.lit(15 * E9), 100 * F.col("n_nodes"))
                    + _fdiv(
                        85
                        * (
                            F.coalesce(F.col("in_sum"), F.lit(0))
                            + _fdiv(F.col("dangling_sum"), F.col("n_nodes"))
                        ),
                        F.lit(100),
                    )
                ).alias("rank_e9"),
            )
        )
        # r6: lineage cap every SECOND layer — one un-checkpointed layer
        # only doubles the plan (ranks is referenced twice per layer),
        # and halving the eager checkpoint jobs halves the per-iteration
        # scheduling floor (values are checkpoint-transparent)
        if it % 2 == 1 or it == n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_sql(edge_cte: str, n_iter: int = 8) -> str:
    """The SAME recurrence unrolled as DuckDB CTE layers — generated SQL
    for the independent oracle. ``edge_cte`` must define a relation
    ``edges(src, dst)``. Floor division on non-negative ints is
    ``(a - a % b) / b`` — identical to the engine's pmod identity."""

    def fdiv(a: str, b: str) -> str:
        return f"cast((({a}) - (({a}) % ({b}))) / ({b}) as bigint)"

    lines = [
        edge_cte,
        "nodes as (select src as node from edges union "
        "select dst as node from edges)",
        "nn as (select count(*) as n from nodes)",
        "outdeg as (select src, count(*) as outdeg from edges group by src)",
        "r0 as materialized (select node, "
        + fdiv("1000000000", "(select n from nn)")
        + " as rank_e9 from nodes)",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"r{i}"
        contrib = fdiv("p.rank_e9", "o.outdeg")
        total = "(coalesce(c.in_sum, 0) + " + fdiv("d.ds", "nn.n") + ")"
        # each layer references the previous TWICE (dangling + contrib);
        # without `materialized`, CTE inlining re-computes the whole
        # chain per reference — 2^n_iter blowup
        lines.append(
            f"""{cur} as materialized (
  select n.node,
    {fdiv("15000000000", "100 * nn.n")}
      + {fdiv(f"85 * {total}", "100")} as rank_e9
  from nodes n
  cross join nn
  cross join (
    select coalesce(sum(p.rank_e9), 0) as ds
    from {prev} p left join outdeg o on p.node = o.src
    where o.src is null) d
  left join (
    select e.dst, sum({contrib}) as in_sum
    from {prev} p
    join outdeg o on p.node = o.src
    join edges e on e.src = p.node
    group by e.dst) c on c.dst = n.node
)"""
        )
        prev = cur
    return (
        "with "
        + ",\n".join(lines)
        + f"\nselect node, rank_e9 from {prev}"
    )


# --------------------------------------------------------------------------
# Link extraction — the crawl step that PRODUCES the edge table above.
# --------------------------------------------------------------------------

#: one pattern per quote style; identical in Java regex (Spark) and RE2
#: (DuckDB): case-insensitive + dotall flags, no backrefs/lookaround.
#: group 1 = href value, group 2 = raw inner anchor markup.
_A_DQ = r'(?is)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'
_A_SQ = r"(?is)<a\s[^>]*href\s*=\s*'([^']*)'[^>]*>(.*?)</a>"

_SCHEME_ANY = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def _resolve_href(url: Column, href: Column) -> Column:
    """RFC-3986 reference resolution, the crawl-pragmatic subset (the
    cases that occur in anchor hrefs): absolute http(s) pass through,
    protocol-relative take the page scheme, root-relative take
    scheme://authority, path-relative append to the page's directory.
    Fragments, empty hrefs, and non-http(s) schemes (mailto:,
    javascript:, tel:) resolve to NULL — they are not crawl edges.
    Dot-segment normalization (../) is intentionally NOT applied; the
    canonical form is ``canonical_url``'s job and dot segments are rare
    in anchors (documented subset, like the tracking-param list)."""
    from ..stages.ingest import _SCHEME_PREFIX, _SCHEME_RE

    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _SCHEME_PREFIX + r"([^/?#]*)", 1))
    path = F.regexp_extract(url, _SCHEME_PREFIX + r"[^/?#]*([^?#]*)", 1)
    basedir = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"/[^/]*$", "/")
    )
    h = F.trim(href)
    return (
        F.when((h == "") | h.startswith("#"), F.lit(None).cast("string"))
        .when(
            h.rlike(_SCHEME_ANY),
            F.when(h.rlike(r"(?i)^https?://"), h).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(scheme, F.lit("://"), auth, h))
        .otherwise(F.concat(scheme, F.lit("://"), auth, basedir, h))
    )


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """→ ``(url, href, anchor, dst_url)``: one row per ``<a href>`` in
    each page — the crawl operator that feeds ``pagerank`` (via
    ``host_edges``) and anchor-text entity linking (anchor surfaces are
    the classic mention dictionary for web KGs).

    ``href`` is the raw attribute value; ``anchor`` the inner text with
    nested markup stripped and whitespace collapsed; ``dst_url`` the
    resolved + ``canonical_url``-normalized target (NULL for fragments /
    non-http schemes — kept so callers can count dropped links).

    Pure codegen: two regexp_extract_all passes per quote style (same
    pattern ⇒ positional alignment of href/anchor groups is guaranteed),
    arrays_zip + explode, then the resolution expression. Map-side only —
    no shuffle, no Python; binary ``html`` columns are decoded in-plan."""
    from ..stages.ingest import canonical_url

    html = F.col(html_col)
    if dict(df.dtypes).get(html_col) == "binary":
        html = F.decode(html, "UTF-8")

    def links_of(pat: str) -> Column:
        return F.arrays_zip(
            F.regexp_extract_all(html, F.lit(pat), 1).alias("href"),
            F.regexp_extract_all(html, F.lit(pat), 2).alias("anchor"),
        )

    out = []
    for pat in (_A_DQ, _A_SQ):
        exploded = df.select(
            F.col(url_col).alias("url"), F.explode(links_of(pat)).alias("l")
        )
        clean_anchor = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("l.anchor"), r"<[^>]*>", ""),
                r"\s+",
                " ",
            )
        )
        out.append(
            exploded.select(
                "url",
                F.col("l.href").alias("href"),
                clean_anchor.alias("anchor"),
                canonical_url(
                    _resolve_href(F.col("url"), F.col("l.href"))
                ).alias("dst_url"),
            )
        )
    return out[0].unionAll(out[1])


def host_edges(links: DataFrame) -> DataFrame:
    """→ distinct ``(src, dst)`` host pairs from ``extract_links`` output —
    the host-level web graph ``pagerank`` runs on (page-level graphs work
    too; host-level is the standard frontier-ranking granularity).
    Self-loops (intra-host navigation, the bulk of anchors) are dropped.
    One map-side projection + the distinct's single shuffle. Both sides
    go through ``canonical_url`` first so ``www.`` / port / case variants
    of the same host collapse into the same node (and intra-site links
    correctly self-loop away)."""
    from ..stages.ingest import canonical_url, url_host

    src = url_host(canonical_url(F.col("url")))
    dst = url_host(F.col("dst_url"))
    return (
        links.filter(F.col("dst_url").isNotNull())
        .select(src.alias("src"), dst.alias("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )


def anchor_surfaces(links: DataFrame, min_anchors: int = 2) -> DataFrame:
    """→ ``(surface, entity_id, n_anchors)``: anchor texts aggregated
    into an entity dictionary — the classic web-KG signal (anchor text
    is how the web NAMES an entity; the link target identifies it).
    ``surface`` = lowercased anchor text, ``entity_id`` = the surface's
    most-linked canonical destination (ties → lexicographically smallest
    url, deterministic), ``n_anchors`` = total links carrying the
    surface; surfaces below ``min_anchors`` are noise and drop.

    The output is schema-compatible with
    ``stages.canonicalize.canonicalize(entity_dict=...)`` — anchor-mined
    surfaces override LSH clustering for entities the web itself
    disambiguates. Two hash-partitioned groupBys ((surface, dst) counts,
    then per-surface struct-min vote); no joins, no Python."""
    a = links.filter(
        F.col("dst_url").isNotNull() & (F.trim(F.col("anchor")) != "")
    ).select(
        # extract_links already collapses whitespace; re-normalize here so
        # directly-supplied link tables get the same surface keys
        F.lower(
            F.regexp_replace(F.trim(F.col("anchor")), r"\s+", " ")
        ).alias("surface"),
        "dst_url",
    )
    per = a.groupBy("surface", "dst_url").agg(F.count("*").alias("cnt"))
    return (
        per.groupBy("surface")
        .agg(
            F.min_by(
                "dst_url",
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("dst_url").alias("dst_url"),
                ),
            ).alias("entity_id"),
            F.sum("cnt").alias("n_anchors"),
        )
        .filter(F.col("n_anchors") >= min_anchors)
    )


def hits(
    edges: DataFrame,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Kleinberg HITS → ``(node, hub_e9, auth_e9)`` for every node on
    either side of ``edges``. The companion signal to ``pagerank`` on
    the same link graph: PageRank rewards being LINKED-TO by important
    pages; HITS separates directories/portals (hubs: link to many good
    authorities) from content pages (authorities: linked from many good
    hubs) — the standard pair a crawl frontier ranks with.

    Determinism contract: e9 fixed-point integers throughout with L1
    normalization each half-step (``x·10⁹ div Σx`` — exact integer
    floor division; the textbook uses L2, whose sqrt has no closed
    integer form: a documented deviation that rescales scores but keeps
    the same eigenvector direction, i.e. the same ranking structure).
    Overflow-safe: the vector sums to ≤ 10⁹ after each normalization,
    but raw sums scale with edge MULTIPLICITY (multi-edge inputs — one
    row per mention pair in the KG edge table — weight each neighbor by
    its row count), so ``raw·10⁹`` can pass 2⁶³; the normalization
    multiply therefore runs in decimal(38,0) / hugeint on the two
    engines (caught by a real overflow at 20k docs; regression-pinned).

    Scale shape: per half-step ONE equi-join of the score vector onto
    the edge table plus a groupBy sum, a 1-row broadcast total, and a
    localCheckpoint to cap lineage — identical movement to ``pagerank``.
    Nodes without out-links have hub 0; without in-links auth 0.
    """
    # multigraph collapse (exact: Σ over w parallel edges of s(u) is
    # w·s(u); weights enter the raw sums BEFORE any normalization floor)
    e = _collapsed(edges, src_col, dst_col, weight_col)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.agg(F.count("*").alias("n_nodes"))
    hub = (
        nodes.crossJoin(F.broadcast(n_total))
        .select("node", _fdiv(F.lit(E9), F.col("n_nodes")).alias("s"))
        .localCheckpoint()
    )
    auth = None
    for _ in range(n_iter):
        # the numerator raw·10⁹ can exceed 2⁵³ (double floor emulation
        # loses ulps) AND 2⁶³: with multi-edges — the KG edge table
        # carries one row per mention pair — raw sums scale with edge
        # multiplicity, so a 20k-doc graph already overflows bigint.
        # decimal(38,0) keeps the multiply exact; `div` on decimals is
        # Spark's integral divide and returns the floored bigint, which
        # is what the DuckDB oracle computes in hugeint.
        norm = F.expr(
            "(cast(coalesce(raw, 0) as decimal(38,0)) * 1000000000) div t"
        )
        raw_a = (
            hub.join(e, hub["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("s")).alias("raw"))
        )
        ta = raw_a.agg(F.sum("raw").alias("t"))
        auth = (
            nodes.join(raw_a, nodes["node"] == raw_a["dst"], "left")
            .crossJoin(F.broadcast(ta))
            .select(
                "node",
                F.when(F.col("t").isNotNull() & (F.col("t") > 0), norm)
                .otherwise(F.lit(0))
                .alias("s"),
            )
        )
        raw_h = (
            auth.join(e, auth["node"] == e["dst"])
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("s")).alias("raw"))
        )
        th = raw_h.agg(F.sum("raw").alias("t"))
        hub = (
            nodes.join(raw_h, nodes["node"] == raw_h["src"], "left")
            .crossJoin(F.broadcast(th))
            .select(
                "node",
                F.when(F.col("t").isNotNull() & (F.col("t") > 0), norm)
                .otherwise(F.lit(0))
                .alias("s"),
            )
            .localCheckpoint()
        )
    return (
        hub.withColumnRenamed("s", "hub_e9")
        .join(auth.withColumnRenamed("s", "auth_e9"), "node")
        .select("node", "hub_e9", "auth_e9")
    )


def hits_sql(edge_cte: str, n_iter: int = 4) -> str:
    """The same L1-normalized half-step recurrence unrolled as DuckDB
    CTE layers (generated, ``materialized`` to stop exponential CTE
    re-inlining). ``edge_cte`` must define ``edges(src, dst)``."""

    def fdiv(a: str, b: str) -> str:
        return f"cast((({a}) - (({a}) % ({b}))) / ({b}) as bigint)"

    lines = [
        edge_cte,
        "nodes as (select src as node from edges union "
        "select dst as node from edges)",
        "nn as (select count(*) as n from nodes)",
        "h0 as materialized (select node, "
        + fdiv("1000000000", "(select n from nn)")
        + " as s from nodes)",
    ]
    prev_h = "h0"
    prev_a = None
    for i in range(1, n_iter + 1):
        # exact 128-bit floor division — the numerator can exceed 2^53
        # (double emulation loses ulps) and, with multi-edge inputs,
        # 2^63 (see hits() — the engine side widens to decimal(38,0))
        norm = (
            "cast(((coalesce(r.raw, 0)::hugeint * 1000000000) // t.t) "
            "as bigint)"
        )
        lines.append(
            f"""a{i} as materialized (
  select n.node,
    case when t.t > 0 then {norm} else 0 end as s
  from nodes n
  cross join (
    select coalesce(sum(p.s), 0) as t
    from {prev_h} p join edges e on e.src = p.node) t
  left join (
    select e.dst, sum(p.s) as raw
    from {prev_h} p join edges e on e.src = p.node
    group by e.dst) r on r.dst = n.node
)"""
        )
        prev_a = f"a{i}"
        lines.append(
            f"""h{i} as materialized (
  select n.node,
    case when t.t > 0 then {norm} else 0 end as s
  from nodes n
  cross join (
    select coalesce(sum(p.s), 0) as t
    from {prev_a} p join edges e on e.dst = p.node) t
  left join (
    select e.src, sum(p.s) as raw
    from {prev_a} p join edges e on e.dst = p.node
    group by e.src) r on r.src = n.node
)"""
        )
        prev_h = f"h{i}"
    return (
        "with "
        + ",\n".join(lines)
        + f"\nselect h.node, h.s as hub_e9, a.s as auth_e9"
        + f"\nfrom {prev_h} h join {prev_a} a using (node)"
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Random-walk-with-restart → ``(node, rank_e9)``: PageRank whose
    teleport mass returns to the SEED set instead of the whole graph —
    the KG "entities related to X" read path (seed the walk at a query
    entity; high-rank nodes are its multi-hop neighborhood weighted by
    connectivity), and the crawl counterpart of seed-focused frontier
    expansion.

    Same exact-integer e9 recurrence as ``pagerank`` (85/100 damping,
    floor divisions) with two changes: the (1−d) restart term and the
    dangling-mass redistribution both go ONLY to seeds (uniformly,
    ``div |S|``). Non-seed nodes unreachable from the seeds stay at
    exactly 0. Seeds are a tiny literal ``isin`` — no join; per pass the
    movement is the one contribution join + groupBy, as in pagerank."""
    if not seeds:
        raise ValueError("personalized_pagerank needs >= 1 seed")
    s_list = sorted(set(seeds))
    n_seeds = len(s_list)
    # multigraph collapse — same exactness argument as ``pagerank``
    e = _collapsed(edges, src_col, dst_col, weight_col)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    is_seed = F.col("node").isin(s_list)

    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(E9 // n_seeds).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rank_e9"),
    ).localCheckpoint()
    for it in range(n_iter):
        r = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left").select(
            "node", "rank_e9", "outdeg"
        )
        contrib = (
            r.filter(F.col("outdeg").isNotNull())
            .join(e, F.col("node") == e["src"])
            .select(
                "dst",
                (F.col("w") * _fdiv(F.col("rank_e9"), F.col("outdeg"))).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        dangling = r.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank_e9"))),
                F.lit(0),
            ).alias("dangling_sum")
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.when(
                        is_seed, F.lit((15 * E9) // (100 * n_seeds)).cast("long")
                    ).otherwise(F.lit(0).cast("long"))
                    + _fdiv(
                        85
                        * (
                            F.coalesce(F.col("in_sum"), F.lit(0))
                            + F.when(
                                is_seed,
                                _fdiv(F.col("dangling_sum"), F.lit(n_seeds)),
                            ).otherwise(F.lit(0).cast("long"))
                        ),
                        F.lit(100),
                    )
                ).alias("rank_e9"),
            )
        )
        # r6: cap lineage every second layer (see pagerank)
        if it % 2 == 1 or it == n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def personalized_pagerank_sql(edge_cte: str, seeds: list, n_iter: int = 8) -> str:
    """The seeded recurrence unrolled as DuckDB CTE layers (generated;
    ``materialized`` against exponential CTE re-inlining). ``edge_cte``
    must define ``edges(src, dst)``; seeds inline as a VALUES spine."""

    def fdiv(a: str, b: str) -> str:
        return f"cast((({a}) - (({a}) % ({b}))) / ({b}) as bigint)"

    s_list = sorted(set(seeds))
    n_seeds = len(s_list)
    seed_values = ", ".join(f"({s})" for s in s_list)
    lines = [
        edge_cte,
        f"seeds(node) as (values {seed_values})",
        "nodes as (select src as node from edges union "
        "select dst as node from edges)",
        "outdeg as (select src, count(*) as outdeg from edges group by src)",
        "r0 as materialized (select n.node, "
        f"case when s.node is not null then {E9 // n_seeds} else 0 end"
        " as rank_e9 from nodes n left join seeds s on s.node = n.node)",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"r{i}"
        contrib = fdiv("p.rank_e9", "o.outdeg")
        lines.append(
            f"""{cur} as materialized (
  select n.node,
    case when s.node is not null then {(15 * E9) // (100 * n_seeds)} else 0 end
      + {fdiv(
          "85 * (coalesce(c.in_sum, 0)"
          + f" + case when s.node is not null then {fdiv('d.ds', str(n_seeds))}"
          + " else 0 end)",
          "100",
      )} as rank_e9
  from nodes n
  left join seeds s on s.node = n.node
  cross join (
    select coalesce(sum(p.rank_e9), 0) as ds
    from {prev} p left join outdeg o on p.node = o.src
    where o.src is null) d
  left join (
    select e.dst, sum({contrib}) as in_sum
    from {prev} p
    join outdeg o on p.node = o.src
    join edges e on e.src = p.node
    group by e.dst) c on c.dst = n.node
)"""
        )
        prev = cur
    return (
        "with "
        + ",\n".join(lines)
        + f"\nselect node, rank_e9 from {prev}"
    )
