"""HITS tests (operators/linkgraph.py:hits): a textbook float-L2 HITS
differential (ranking identity — the L1 deviation rescales, never
reorders), the L1-mass invariant, structural sanity on star graphs,
no-edge-direction degenerate cases, and DuckDB unrolled-oracle parity.
"""
from __future__ import annotations

import math

import duckdb
import pytest

from docee_spark.operators.linkgraph import E9, hits, hits_sql

EDGES = [
    (0, 1), (0, 2), (0, 3),
    (4, 1), (4, 2),
    (5, 2),
    (1, 6), (2, 6),
    (7, 8),
]


def textbook_hits(edges, n_iter=50):
    """Float HITS with the textbook L2 normalization, run to (near)
    convergence — an independent reference for the RANKING."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 0.0 for n in nodes}
    for _ in range(n_iter):
        for n in nodes:
            auth[n] = sum(hub[u] for u, v in edges if v == n)
        na = math.sqrt(sum(a * a for a in auth.values())) or 1.0
        auth = {n: a / na for n, a in auth.items()}
        for n in nodes:
            hub[n] = sum(auth[v] for u, v in edges if u == n)
        nh = math.sqrt(sum(h * h for h in hub.values())) or 1.0
        hub = {n: h / nh for n, h in hub.items()}
    return hub, auth


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return {r.node: (r.hub_e9, r.auth_e9) for r in hits(df, n_iter=4).collect()}


class TestHits:
    def test_ranking_matches_textbook_l2(self, scored):
        # same iteration count as the engine: per-step L1-vs-L2
        # normalization rescales uniformly, so within-step rankings
        # must agree; run-to-convergence would differ (small components
        # decay to zero only in the limit)
        hub, auth = textbook_hits(EDGES, n_iter=4)
        # compare rankings over nodes with nonzero scores (the zero
        # tail's order is degenerate in both)
        got_h = sorted((n for n in scored if scored[n][0] > 0),
                       key=lambda n: (-scored[n][0], n))
        want_h = sorted((n for n in hub if hub[n] > 1e-9),
                        key=lambda n: (-hub[n], n))
        got_a = sorted((n for n in scored if scored[n][1] > 0),
                       key=lambda n: (-scored[n][1], n))
        want_a = sorted((n for n in auth if auth[n] > 1e-9),
                        key=lambda n: (-auth[n], n))
        assert got_h == want_h
        assert got_a == want_a

    def test_l1_mass_invariant(self, scored):
        # each half-step renormalizes to <= 1e9 (floor losses only)
        s_h = sum(h for h, _ in scored.values())
        s_a = sum(a for _, a in scored.values())
        assert E9 - len(scored) <= s_h <= E9
        assert E9 - len(scored) <= s_a <= E9

    def test_structural_zeroes(self, scored):
        # no out-links => hub 0; no in-links => auth 0
        assert scored[3][0] == 0 and scored[6][0] == 0 and scored[8][0] == 0
        assert scored[0][1] == 0 and scored[4][1] == 0
        assert scored[5][1] == 0 and scored[7][1] == 0

    def test_in_star_center_is_sole_authority(self, spark):
        df = spark.createDataFrame(
            [(i, 99) for i in range(1, 6)], "src long, dst long"
        )
        out = {r.node: (r.hub_e9, r.auth_e9) for r in hits(df, 2).collect()}
        assert out[99][1] == E9  # all authority mass
        assert out[99][0] == 0
        hubs = {out[i][0] for i in range(1, 6)}
        assert hubs == {E9 // 5}  # symmetric hubs

    def test_duckdb_unrolled_oracle_bit_exact(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        got = sorted(tuple(r) for r in hits(df, n_iter=4).collect())
        con = duckdb.connect()
        con.execute("create table e (src bigint, dst bigint)")
        con.executemany("insert into e values (?, ?)", EDGES)
        want = sorted(
            con.execute(
                hits_sql("edges as (select src, dst from e)", 4)
            ).fetchall()
        )
        assert got == want


class TestMultiEdgeOverflow:
    """The KG edge table carries one row per MENTION pair, so hits()
    sees multi-edges and raw sums scale with multiplicity — raw·10⁹
    passed 2⁶³ on a real 20k-doc graph (ArithmeticException before the
    decimal(38,0) widening). 20 duplicate rows of one edge reproduce
    it: raw_a(b) = 20·5·10⁸ = 10¹⁰, ×10⁹ ≫ 2⁶³."""

    def test_duplicate_edges_do_not_overflow_and_match_oracle(self, spark):
        rows = [(0, 1)] * 20 + [(1, 2)] * 15
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {
            r.node: (r.hub_e9, r.auth_e9) for r in hits(df, n_iter=4).collect()
        }
        assert got  # pre-fix: ARITHMETIC_OVERFLOW here
        values = ",".join(f"({u},{v})" for u, v in rows)
        cte = f"edges(src, dst) as (select * from (values {values}))"
        want = {
            n: (h, a)
            for n, h, a in duckdb.connect().execute(hits_sql(cte, 4)).fetchall()
        }
        assert got == want
