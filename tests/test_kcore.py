"""k-core peeling (operators/graphstats.py): differential vs a python
peeler and the unrolled SQL oracle; cascade behavior (chain hanging off
a clique peels away over multiple rounds); fixed-round contract."""

from __future__ import annotations

import random

import duckdb

from docee_spark.operators.graphstats import k_core, k_core_sql


def brute_kcore(edges, k=3, rounds=8):
    adj = {}
    for u, v in edges:
        if u is None or v is None or u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    deg = {}
    for _ in range(rounds):
        deg = {
            n: sum(m in alive for m in adj[n]) for n in alive
        }
        deg = {n: d for n, d in deg.items() if d >= k}
        alive = set(deg)
    return deg


def run_spark(spark, edges, k=3, rounds=8):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["core_degree"]
        for r in k_core(df, k=k, rounds=rounds).collect()
    }


def run_sql(edges, k=3, rounds=8):
    con = duckdb.connect()
    vals = ", ".join(f"({u}, {v})" for u, v in edges)
    cte = f"select * from (values {vals}) as t(src, dst)"
    return {
        int(n): int(d)
        for n, d in con.execute(k_core_sql(cte, k=k, rounds=rounds)).fetchall()
    }


class TestKCore:
    def test_clique_with_tail_cascade(self, spark):
        # K5 plus a 4-chain: the chain peels over successive rounds (a
        # single-round degree filter would leave part of it), K5 stays
        k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        chain = [(4, 10), (10, 11), (11, 12), (12, 13)]
        edges = k5 + chain
        got = run_spark(spark, edges, k=3)
        assert set(got) == set(range(5))
        assert got == brute_kcore(edges, k=3)
        assert got == run_sql(edges, k=3)
        # fixpoint reached well before 8 rounds: more rounds, same answer
        assert got == brute_kcore(edges, k=3, rounds=20)

    def test_matches_bruteforce_and_sql_random(self, spark):
        rng = random.Random(31)
        edges = list(
            {(rng.randrange(25), rng.randrange(25)) for _ in range(70)}
        )
        for k in (2, 3):
            ref = brute_kcore(edges, k=k)
            assert run_spark(spark, edges, k=k) == ref
            assert run_sql(edges, k=k) == ref
