"""Label-propagation communities (operators/graphstats.py):
differential vs a pure-python synchronous reference AND vs the unrolled
SQL oracle generator in DuckDB, on shapes where LP differs from
connected components (two cliques joined by one bridge edge)."""

from __future__ import annotations

import random

import duckdb
import pytest

from docee_spark.operators.graphstats import (
    label_propagation,
    label_propagation_sql,
)


def brute_lp(edges, n_iter=4):
    """Deterministic synchronous LP: neighbor-majority, ties -> smallest
    label, isolated labels persist."""
    adj = {}
    for u, v in edges:
        if u is None or v is None or u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(n_iter):
        nxt = {}
        for n in adj:
            cnt = {}
            for m in adj[n]:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = nxt
    return lab


def run_spark(spark, edges, n_iter=4):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["community"]
        for r in label_propagation(df, n_iter=n_iter).collect()
    }


def run_sql(edges, n_iter=4):
    con = duckdb.connect()
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    cte = f"select * from (values {vals}) as t(src, dst)"
    return {
        int(n): int(c)
        for n, c in con.execute(
            label_propagation_sql(cte, n_iter=n_iter)
        ).fetchall()
    }


class TestLabelPropagation:
    def test_two_cliques_one_bridge(self, spark):
        # CC would merge everything; LP must keep two communities
        k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        edges = k1 + k2 + [(3, 10)]
        got = run_spark(spark, edges)
        assert got == brute_lp(edges)
        assert len(set(got.values())) == 2
        assert {got[0], got[10]} == {0, 10}

    def test_matches_bruteforce_and_sql_random(self, spark):
        rng = random.Random(23)
        edges = list(
            {
                (rng.randrange(30), rng.randrange(30))
                for _ in range(80)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        ref = brute_lp(edges)
        assert run_spark(spark, edges) == ref
        assert run_sql(edges) == ref

    def test_isolated_direction_and_dups(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (5, 5), (7, 8)]
        got = run_spark(spark, edges)
        # self-loop node 5 is not incident to any simple edge -> absent
        assert 5 not in got
        assert got == brute_lp(edges)
