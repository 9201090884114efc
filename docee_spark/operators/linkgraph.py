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


def pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """→ ``(node, rank_e9)`` for every node appearing in ``edges``
    (either side). Damping is fixed at 0.85 (as 85/100 integer) to keep
    the cross-engine contract closed over integers."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.agg(F.count("*").alias("n_nodes"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    ranks = (
        nodes.crossJoin(F.broadcast(n_total))
        .select("node", _fdiv(F.lit(E9), F.col("n_nodes")).alias("rank_e9"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        r = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left").select(
            "node", "rank_e9", "outdeg"
        )
        contrib = (
            r.filter(F.col("outdeg").isNotNull())
            .join(e, F.col("node") == e["src"])
            .select("dst", _fdiv(F.col("rank_e9"), F.col("outdeg")).alias("c"))
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
            .localCheckpoint()
        )
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
