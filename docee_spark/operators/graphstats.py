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


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 4,
) -> DataFrame:
    """Community detection by DETERMINISTIC synchronous label
    propagation (Raghavan et al. 2007, made reproducible): every node
    starts as its own label; each round it adopts the label most
    frequent among its neighbors, ties broken by smallest label; a
    FIXED ``n_iter`` rounds (no convergence test) pins the output — the
    asynchronous/random variants of the paper are irreproducible across
    partitionings, and synchronous LP can two-cycle on bipartite
    structure, so a fixed round count is the only bit-stable contract.
    → ``(node, community)``, community = the final label.

    Distinct from connected components (``dedup.duplicate_clusters``):
    CC merges everything reachable; LP stops where neighborhood majority
    stops, splitting weakly-bridged dense regions — host-farm/community
    structure, not mere connectivity.

    Scale shape per round: one join (labels onto the directed-both-ways
    edge list, hash on node), one groupBy((node, label)) vote count, one
    struct-min argmax groupBy(node) — all key-partitioned, vote rows
    bounded by the edge count, label frame bounded by the node count. A
    10^8-degree hub costs its degree in vote rows, same bound as its
    adjacency; no pair blowup. localCheckpoint per round caps lineage
    (the duplicate_clusters discipline).
    """
    # canonicalize BEFORE mirroring: a graph carrying both (a,b) and
    # (b,a) must not double a neighbor's vote
    und = _canonical_undirected(edges, src_col, dst_col).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    both = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = (
        both.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        votes = (
            both.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label").alias("nl")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), F.col("nl"))
            .agg(F.count("*").alias("cnt"))
        )
        # argmax by (count desc, label asc) as one struct-min: the most
        # negative -cnt is the largest count, then smallest label wins
        winner = votes.groupBy("node").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("nl"))).alias(
                "w"
            )
        )
        labels = (
            labels.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("w.nl"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
    return labels.select("node", F.col("label").alias("community"))


def label_propagation_sql(edge_cte: str, n_iter: int = 4) -> str:
    """DuckDB oracle for :func:`label_propagation`: the same fixed
    round count unrolled into per-round CTE layers, with the argmax
    expressed as a row_number window (count desc, label asc) instead of
    the engine's struct-min aggregate. ``edge_cte`` must yield (src,
    dst)."""
    layers = []
    prev = "lab0"
    for t in range(1, n_iter + 1):
        layers.append(f"""
votes{t} as (
  select e.u as node, l.label as nl, count(*) as cnt
  from mirr e join {prev} l on l.node = e.v
  group by 1, 2
),
rank{t} as (
  select node, nl, row_number() over (
    partition by node order by cnt desc, nl asc) as rn
  from votes{t}
),
lab{t} as (
  select l.node, coalesce(r.nl, l.label) as label
  from {prev} l left join rank{t} r on r.node = l.node and r.rn = 1
)""")
        prev = f"lab{t}"
    return f"""
with raw as ({edge_cte}),
und as (
  select distinct least(src, dst) as u, greatest(src, dst) as v
  from raw
  where src is not null and dst is not null and src <> dst
),
mirr as (select u, v from und union select v, u from und),
lab0 as (select distinct u as node, u as label from mirr),
{",".join(layers)}
select node, label as community from {prev}
"""


def k_core(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 8,
) -> DataFrame:
    """The k-core subgraph: iteratively peel nodes of degree < ``k``
    (Seidman 1983; the standard crawl-graph spam/authority feature —
    link farms survive deep cores, organic long-tail pages do not).
    → ``(node, core_degree)`` for nodes alive after ``rounds`` peels,
    with their degree inside the surviving subgraph.

    Contract: a FIXED round count (the label_propagation discipline) —
    peeling is monotone, so the result after R rounds is well-defined
    and bit-stable whether or not the fixpoint has been reached; R =
    log-ish in practice (each round removes every node whose degree
    fell below k in the previous round, cascades shrink geometrically).
    Callers needing the true fixpoint raise ``rounds`` and assert
    stability (tests pin fixpoint-at-8 for the driver graph).

    Scale shape per round: degrees of the alive subgraph = two
    semi-joins of the mirrored edge list against the alive set + one
    groupBy — all key-partitioned, edge-count bounded; the alive frame
    only shrinks. localCheckpoint per round caps lineage.
    """
    und = _canonical_undirected(edges, src_col, dst_col).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    mirr = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    alive = mirr.select(F.col("u").alias("node")).distinct().localCheckpoint()
    deg = None
    for _ in range(rounds):
        deg = (
            mirr.join(alive.select(F.col("node").alias("u")), "u")
            .join(alive.select(F.col("node").alias("v")), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.count("*").alias("core_degree"))
            .where(F.col("core_degree") >= k)
            .localCheckpoint()
        )
        alive = deg.select("node")
    return deg.select("node", "core_degree")


def k_core_sql(edge_cte: str, k: int = 3, rounds: int = 8) -> str:
    """DuckDB oracle for :func:`k_core`: the same fixed peel count
    unrolled into per-round CTE layers, degree recomputed per layer with
    a correlated-free join formulation. ``edge_cte`` must yield (src,
    dst)."""
    layers = []
    prev = "alive0"
    for t in range(1, rounds + 1):
        layers.append(f"""
deg{t} as (
  select e.u as node, count(*) as core_degree
  from mirr e
  join {prev} a on a.node = e.u
  join {prev} b on b.node = e.v
  group by e.u
),
alive{t} as (select node from deg{t} where core_degree >= {k})""")
        prev = f"alive{t}"
    return f"""
with raw as ({edge_cte}),
und as (
  select distinct least(src, dst) as u, greatest(src, dst) as v
  from raw
  where src is not null and dst is not null and src <> dst
),
mirr as (select u, v from und union select v, u from und),
alive0 as (select distinct u as node from mirr),
{",".join(layers)}
select d.node, d.core_degree from deg{rounds} d
join alive{rounds} a on a.node = d.node
"""
