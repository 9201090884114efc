"""Link-graph structure statistics: exact triangle counting and local
clustering coefficients over the crawl host graph (or any edge table).

Why this operator exists in a KG/crawl pipeline: triangle density
separates organic link neighborhoods from link farms and mirror rings
(spam hosts interlink densely → near-clique clustering), and the local
clustering coefficient is a standard per-entity feature for KG link
prediction. Reference analog: the graph-analysis territory of
dee/helper/arg_rel.py's adjacency handling — but host-graph-scale, so
the algorithm, not the loop, has to carry the cost.

Algorithm: degree-ordered edge orientation (Chiba–Nishizeki / the
standard MapReduce "count triangles in O(m^1.5)" formulation). Each
undirected edge {a, b} is oriented from its lower-(degree, id) endpoint
to its higher one; wedges are generated ONLY from each node's oriented
out-neighborhood, whose size is bounded by O(sqrt(m)) regardless of raw
degree. A 10^8-in-degree hub (every crawl graph has one) therefore
produces wedges proportional to the SQUARE ROOT of the edge count, not
the square of its degree — orientation is what makes the self-join
survive web scale. Every triangle has exactly one lowest-(deg,id)
vertex, so it is enumerated exactly once, no post-hoc dedup.

Shuffle shape: one distinct (canonical edges), one groupBy (degrees),
one self-join on the wedge pivot, one join on the closing edge's
(lo, hi) pair key, one explode+groupBy for per-node counts. All
equi-joins on bounded keys; no cross joins, no driver collection.

The clustering coefficient is emitted as e6 fixed point
(floor(10^6 * 2 * triangles / (deg * (deg - 1)))) so the whole output
is integers and the DuckDB oracle can reproduce it bit-for-bit; the
oracle deliberately uses the OTHER classic formulation (plain id-ordered
u < v < w three-way self-join) so no shape is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 1_000_000


def _canonical_undirected(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops and
    NULL endpoints dropped (a self-loop is in no triangle)."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.filter(s.isNotNull() & d.isNotNull() & (s != d))
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def triangles(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """→ ``(node, degree, n_triangles, clustering_e6)`` for every node
    incident to at least one (canonical, non-loop) edge.

    ``degree`` is the undirected simple-graph degree; ``n_triangles``
    the number of triangles containing the node; ``clustering_e6`` the
    local clustering coefficient floor(1e6·2T/(d·(d−1))), 0 when d < 2.
    Directionality and multi-edges in the input are collapsed first —
    triangle counting is a simple-graph notion.
    """
    und = _canonical_undirected(edges, src_col, dst_col)

    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )

    # Orient each edge lo→hi by (degree, id); rank carried as a struct so
    # the wedge filter below compares once, JVM-side.
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    ranked = und.join(da, "a").join(db, "b")
    a_first = F.struct(F.col("dega"), F.col("a")) < F.struct(
        F.col("degb"), F.col("b")
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias(
            "deghi"
        ),
    )

    # Wedges from each pivot's oriented out-neighborhood (≤ O(sqrt m)
    # per node by construction); (x, y) kept in rank order so the closing
    # edge, if present, is oriented exactly x→y — one equi-join closes.
    e1 = oriented.select(
        F.col("lo").alias("pivot"),
        F.col("hi").alias("x"),
        F.col("deghi").alias("degx"),
    )
    e2 = oriented.select(
        F.col("lo").alias("pivot"),
        F.col("hi").alias("y"),
        F.col("deghi").alias("degy"),
    )
    wedges = e1.join(e2, "pivot").filter(
        F.struct(F.col("degx"), F.col("x"))
        < F.struct(F.col("degy"), F.col("y"))
    )
    closing = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("pivot", "x", "y")

    per_node = (
        tri.select(
            F.explode(F.array(F.col("pivot"), F.col("x"), F.col("y"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )

    d = F.col("degree")
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    denom = d * (d - F.lit(1))
    # exact integer floor((2e6*t)/denom): subtract pmod then divide —
    # same trick as linkgraph._fdiv; values < 2^53 so the double
    # round-trip of `/` is exact.
    num = t * F.lit(2 * E6)
    coeff = F.when(
        d >= 2, ((num - F.pmod(num, denom)) / denom).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            t.cast("long").alias("n_triangles"),
            coeff.alias("clustering_e6"),
        )
    )


def triangles_sql(edge_cte: str) -> str:
    """DuckDB oracle for :func:`triangles` — deliberately the OTHER
    formulation: plain id-ordered u < v < w three-way self-join (no
    degree orientation), so the SQL shares no algorithmic shape with the
    engine plan. ``edge_cte`` must yield columns (src, dst)."""
    return f"""
with raw as ({edge_cte}),
und as (
  select distinct least(src, dst) as a, greatest(src, dst) as b
  from raw
  where src is not null and dst is not null and src <> dst
),
deg as (
  select node, count(*) as degree from (
    select a as node from und union all select b as node from und
  ) group by node
),
tri as (
  select e1.a as u, e1.b as v, e2.b as w
  from und e1
  join und e2 on e2.a = e1.b
  join und e3 on e3.a = e1.a and e3.b = e2.b
),
per_node as (
  select node, count(*) as n_triangles from (
    select u as node from tri
    union all select v from tri
    union all select w from tri
  ) group by node
)
select deg.node, deg.degree,
       coalesce(per_node.n_triangles, 0) as n_triangles,
       case when deg.degree >= 2
            then (2000000 * coalesce(per_node.n_triangles, 0))
                 // (deg.degree * (deg.degree - 1))
            else 0 end as clustering_e6
from deg left join per_node on per_node.node = deg.node
"""
