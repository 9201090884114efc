"""KG query surface: triple-pattern path matching and k-hop neighborhood
extraction over the materialized edge table.

A KG is only useful if it can be queried; these are the two workhorse
read patterns over the ``(src, pred, dst, …)`` edge shape the
canonicalizer emits:

* ``path_query`` — the SPARQL-style 2-hop pattern
  ``(a)-[p1]->(x)-[p2]->(b)``, with optional terminal bindings.
* ``k_hop`` — the seed-expansion subgraph (entity neighborhood pages,
  local-context extraction for RAG).
* ``bgp_match`` — the general basic-graph-pattern bind (any connected
  conjunction of ``(s, p, o)`` patterns with shared variables).

Scale shape: predicate selections are plain filters (pushed into the
edge-table scan at the source); the hop join hash-partitions both sides
on the join entity; terminal bindings and seed frontiers are broadcast
(bindings and frontiers are small by construction — a frontier that
stops being broadcastable is answered by the degree cap, not a bigger
join). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def path_query(
    edges: DataFrame,
    pred1: str,
    pred2: str,
    src_bind: str | None = None,
    dst_bind: str | None = None,
) -> DataFrame:
    """``(a)-[pred1]->(x)-[pred2]->(b)`` → (a, x, b), distinct.

    ``src_bind``/``dst_bind`` optionally pin the terminals (equality).
    Predicate filters evaluate before the join, so each side scans only
    its predicate's edges."""
    e1 = edges.filter(F.col("pred") == pred1).select(
        F.col("src").alias("a"), F.col("dst").alias("x")
    )
    e2 = edges.filter(F.col("pred") == pred2).select(
        F.col("src").alias("x"), F.col("dst").alias("b")
    )
    if src_bind is not None:
        e1 = e1.filter(F.col("a") == src_bind)
    if dst_bind is not None:
        e2 = e2.filter(F.col("b") == dst_bind)
    return e1.join(e2, "x").select("a", "x", "b").distinct()


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 2,
    directed: bool = False,
    max_frontier: int | None = 1_000_000,
) -> DataFrame:
    """Entities within ``hops`` edges of any seed → (node, hop) with the
    MINIMUM hop distance (seeds are hop 0).

    Per hop: one join of the (broadcast) frontier against the edge table
    + one distinct — the standard BFS-by-joins. ``directed=False``
    follows edges both ways (neighborhood semantics). ``max_frontier``
    guards runaway expansion through a hub node: the operator RAISES
    rather than silently exploding (at web scale a 2-hop ball around a
    hub IS the whole graph — the caller must cap or re-seed).

    The frontier is localCheckpointed per hop (flat lineage, and each
    hop's join reuses a materialized frontier instead of re-running the
    previous hops)."""
    adj = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        adj = adj.unionAll(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    visited = (
        seeds.select(F.col("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    for h in range(1, hops + 1):
        nxt = (
            adj.join(F.broadcast(frontier.withColumnRenamed("node", "u")), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if max_frontier is not None:
            n = nxt.count()
            if n > max_frontier:
                raise RuntimeError(
                    f"k_hop frontier exploded at hop {h}: {n} nodes > "
                    f"max_frontier={max_frontier} (hub in the seed ball — "
                    "cap the expansion or prune high-degree nodes first)"
                )
        visited = visited.unionByName(
            nxt.withColumn("hop", F.lit(h))
        ).localCheckpoint()
        frontier = nxt
    return visited


def bgp_match(
    edges: DataFrame,
    patterns: list[tuple[str, str, str]],
    distinct: bool = True,
) -> DataFrame:
    """Basic-graph-pattern match (the SPARQL ``WHERE`` core): bind each
    ``(s, p, o)`` pattern against the edge table and join the legs on
    their shared variables.

    A term starting with ``?`` is a variable; anything else is a
    constant (equality filter). Returns one column per variable, sorted
    by name. Generalizes ``path_query`` to any connected pattern shape
    (stars, chains, triangles).

    Scale shape: every constant becomes a plain filter on that leg's
    scan — predicate constants prune BEFORE any join (with the edge
    table laid out partition-by-pred, stages/layout.py, each leg scans
    only its predicate's files). Legs then left-deep hash-join on shared
    variable names; Catalyst/AQE pick build sides and handle skewed
    join variables. Guards (raise, never silently explode):

    * a pattern with no variables is an ASK, not a bind — rejected;
    * a leg sharing NO variable with the preceding legs would be a
      cartesian product — rejected (reorder the pattern list so every
      leg connects; at web scale a cross join of two legs IS the whole
      graph squared).
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")
    legs: list[tuple[set, DataFrame]] = []
    for i, (s, p, o) in enumerate(patterns):
        leg = edges
        var_col: dict[str, str] = {}
        for col, term in (("src", s), ("pred", p), ("dst", o)):
            if term.startswith("?"):
                v = term[1:]
                if not v:
                    raise ValueError(f"pattern {i}: bare '?' variable")
                if v in var_col:
                    # repeated variable inside one pattern = equality
                    leg = leg.filter(F.col(col) == F.col(var_col[v]))
                else:
                    var_col[v] = col
            else:
                leg = leg.filter(F.col(col) == F.lit(term))
        if not var_col:
            raise ValueError(
                f"pattern {i} binds no variable (pure existence check); "
                "use a filter, not a pattern"
            )
        legs.append(
            (
                set(var_col),
                leg.select(
                    *[F.col(c).alias(v) for v, c in sorted(var_col.items())]
                ),
            )
        )
    bound, out = legs[0]
    for i, (vs, leg) in enumerate(legs[1:], start=1):
        shared = bound & vs
        if not shared:
            raise ValueError(
                f"disconnected basic graph pattern: pattern {i} shares no "
                f"variable with the preceding legs (bound: {sorted(bound)}); "
                "reorder the patterns so every leg connects"
            )
        out = out.join(leg, on=sorted(shared), how="inner")
        bound |= vs
    out = out.select(*sorted(bound))
    return out.distinct() if distinct else out
