"""personalized_pagerank tests (operators/linkgraph.py): float-RWR
ranking differential, seed/teleport semantics, unreachable-zero pin,
empty-seed guard, and DuckDB unrolled-oracle parity.
"""
from __future__ import annotations

import pytest
import duckdb

from docee_spark.operators.linkgraph import (
    E9,
    personalized_pagerank,
    personalized_pagerank_sql,
)

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 4), (5, 6), (6, 5)]


def float_rwr(edges, seeds, n_iter, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    r = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    for _ in range(n_iter):
        nxt = {n: 0.0 for n in nodes}
        dang = sum(r[n] for n in nodes if n not in out)
        for u, vs in out.items():
            for v in vs:
                nxt[v] += r[u] / len(vs)
        r = {
            n: ((1 - d) / len(seeds) if n in seeds else 0.0)
            + d * (nxt[n] + (dang / len(seeds) if n in seeds else 0.0))
            for n in nodes
        }
    return r


@pytest.fixture(scope="module")
def ranks(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return {
        r.node: r.rank_e9
        for r in personalized_pagerank(df, [0], n_iter=8).collect()
    }


class TestPpr:
    def test_ranking_matches_float_rwr(self, ranks):
        ref = float_rwr(EDGES, {0}, 8)
        got = sorted((n for n in ranks if ranks[n] > 0),
                     key=lambda n: (-ranks[n], n))
        want = sorted((n for n in ref if ref[n] > 1e-12),
                      key=lambda n: (-ref[n], n))
        assert got == want
        # e9 floors drift < n_iter ulps-of-1e-9 per node from the float
        for n in ref:
            assert abs(ranks[n] - ref[n] * E9) <= 100

    def test_unreachable_component_exactly_zero(self, ranks):
        assert ranks[5] == 0 and ranks[6] == 0

    def test_seed_gets_restart_mass(self, ranks):
        # the seed always keeps at least the restart term
        assert ranks[0] >= (15 * E9) // 100

    def test_multi_seed_splits_restart(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        two = {
            r.node: r.rank_e9
            for r in personalized_pagerank(df, [0, 5], n_iter=4).collect()
        }
        # the 5<->6 cycle is now seeded and holds mass
        assert two[5] > 0 and two[6] > 0

    def test_empty_seeds_raise(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        with pytest.raises(ValueError):
            personalized_pagerank(df, [])

    def test_duckdb_unrolled_oracle_bit_exact(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        got = sorted(
            tuple(r)
            for r in personalized_pagerank(df, [0, 3], n_iter=6).collect()
        )
        con = duckdb.connect()
        con.execute("create table e (src bigint, dst bigint)")
        con.executemany("insert into e values (?, ?)", EDGES)
        want = sorted(
            con.execute(
                personalized_pagerank_sql(
                    "edges as (select src, dst from e)", [0, 3], 6
                )
            ).fetchall()
        )
        assert got == want
