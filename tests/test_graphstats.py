"""Triangle counting / clustering coefficient (operators/graphstats.py).

Differential strategy: the Spark degree-oriented counter is checked
against a brute-force pure-python counter (all (u,v,w) combinations over
the adjacency sets) on structured and random graphs, and against known
closed-form answers on canonical shapes (K4, cycle, star, hub+ring).
"""

from __future__ import annotations

import itertools
import random

import pytest

from docee_spark.operators.graphstats import triangles


def brute(edges):
    """edges: iterable of (a, b) possibly directed/dup/self-loop →
    {node: (degree, n_triangles, clustering_e6)}."""
    adj = {}
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = dict.fromkeys(adj, 0)
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    out = {}
    for n, nbrs in adj.items():
        d, t = len(nbrs), tri[n]
        c = (2_000_000 * t) // (d * (d - 1)) if d >= 2 else 0
        out[n] = (d, t, c)
    return out


def run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_e6"])
        for r in triangles(df).collect()
    }


class TestTriangles:
    def test_k4(self, spark):
        edges = list(itertools.combinations(range(4), 2))
        got = run(spark, edges)
        # every node of K4: degree 3, 3 triangles, coefficient 1.0
        assert got == {n: (3, 3, 1_000_000) for n in range(4)}

    def test_cycle_no_triangles(self, spark):
        n = 8
        edges = [(i, (i + 1) % n) for i in range(n)]
        got = run(spark, edges)
        assert got == {i: (2, 0, 0) for i in range(n)}

    def test_star_plus_rim(self, spark):
        # hub 0 to all of 1..6, rim edges (1,2) and (3,4): two triangles
        # through the hub — exercises the skewed-degree orientation path.
        edges = [(0, i) for i in range(1, 7)] + [(1, 2), (3, 4)]
        got = run(spark, edges)
        assert got == brute(edges)
        assert got[0][1] == 2  # hub in both triangles

    def test_direction_dup_selfloop_collapse(self, spark):
        # (1,2) twice + reversed, self-loop, NULL-free: simple-graph
        # semantics must collapse all of it.
        edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (3, 1)]
        got = run(spark, edges)
        assert got == {1: (2, 1, 1_000_000), 2: (2, 1, 1_000_000),
                       3: (2, 1, 1_000_000)}

    def test_random_differential(self, spark):
        rng = random.Random(41)
        edges = [
            (rng.randrange(30), rng.randrange(30)) for _ in range(180)
        ]
        assert run(spark, edges) == brute(edges)

    def test_skewed_differential(self, spark):
        # hub-heavy: node 0 touches everyone, plus a random sparse rest —
        # the degree-ordered orientation must still count exactly.
        rng = random.Random(42)
        edges = [(0, i) for i in range(1, 40)] + [
            (1 + rng.randrange(39), 1 + rng.randrange(39))
            for _ in range(120)
        ]
        assert run(spark, edges) == brute(edges)

    def test_oracle_sql_parity(self, spark):
        """triangles_sql over the same edges in DuckDB equals Spark."""
        import duckdb

        from docee_spark.operators.graphstats import triangles_sql

        rng = random.Random(43)
        edges = [
            (rng.randrange(25), rng.randrange(25)) for _ in range(140)
        ]
        got = run(spark, edges)
        con = duckdb.connect()
        cte = " union all ".join(
            f"select {a} as src, {b} as dst" for a, b in edges
        )
        oracle = {
            int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
            for r in con.execute(triangles_sql(cte)).fetchall()
        }
        assert got == oracle


class TestTrianglesPlan:
    def test_no_cartesian_no_python(self, spark):
        df = spark.createDataFrame(
            [(i, (i * 3 + 1) % 50) for i in range(50)], "src long, dst long"
        )
        plan = triangles(df)._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
