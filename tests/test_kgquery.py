"""KG query surface (operators/kgquery.py): path pattern semantics,
bindings, k-hop min-distance/undirected semantics, frontier guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docee_spark.operators.kgquery import k_hop, path_query

E_COLS = "src string, pred string, dst string"


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(
        [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "acme"),
            ("carol", "works_at", "zenith"),
            ("acme", "located_in", "berlin"),
            ("zenith", "located_in", "paris"),
            ("alice", "knows", "carol"),
            ("dave", "works_at", "orphan corp"),
        ],
        E_COLS,
    )


class TestPathQuery:
    def test_two_hop_pattern(self, kg):
        got = {
            (r["a"], r["x"], r["b"])
            for r in path_query(kg, "works_at", "located_in").collect()
        }
        assert got == {
            ("alice", "acme", "berlin"),
            ("bob", "acme", "berlin"),
            ("carol", "zenith", "paris"),
        }

    def test_terminal_bindings(self, kg):
        got = path_query(kg, "works_at", "located_in", src_bind="bob").collect()
        assert [(r["a"], r["b"]) for r in got] == [("bob", "berlin")]
        got = path_query(
            kg, "works_at", "located_in", dst_bind="paris"
        ).collect()
        assert [(r["a"], r["b"]) for r in got] == [("carol", "paris")]

    def test_wrong_predicate_order_empty(self, kg):
        assert path_query(kg, "located_in", "works_at").count() == 0


class TestKHop:
    def _seeds(self, spark, *nodes):
        return spark.createDataFrame([(n,) for n in nodes], "node string")

    def test_min_hop_undirected(self, spark, kg):
        got = {
            r["node"]: r["hop"]
            for r in k_hop(kg, self._seeds(spark, "alice"), hops=2).collect()
        }
        # alice->acme/carol at 1 (knows is followed; undirected);
        # bob/berlin/zenith at 2; paris is 3 hops — absent
        assert got == {
            "alice": 0,
            "acme": 1,
            "carol": 1,
            "bob": 2,
            "berlin": 2,
            "zenith": 2,
        }

    def test_directed_follows_arrows_only(self, spark, kg):
        got = {
            r["node"]: r["hop"]
            for r in k_hop(
                kg, self._seeds(spark, "alice"), hops=2, directed=True
            ).collect()
        }
        assert got == {"alice": 0, "acme": 1, "carol": 1, "berlin": 2, "zenith": 2}

    def test_disconnected_component_unreached(self, spark, kg):
        got = {r["node"] for r in k_hop(kg, self._seeds(spark, "alice"), hops=4).collect()}
        assert "dave" not in got and "orphan corp" not in got

    def test_frontier_guard_raises(self, spark, kg):
        with pytest.raises(RuntimeError, match="frontier exploded"):
            k_hop(kg, self._seeds(spark, "alice"), hops=1, max_frontier=1)


def brute_bgp(edges, patterns):
    """Reference: backtracking bind of each pattern over the edge list."""
    results = []

    def bind(i, env):
        if i == len(patterns):
            results.append(dict(env))
            return
        for e in edges:
            cand = dict(env)
            ok = True
            for term, val in zip(patterns[i], e):
                if term.startswith("?"):
                    v = term[1:]
                    if cand.get(v, val) != val:
                        ok = False
                        break
                    cand[v] = val
                elif term != val:
                    ok = False
                    break
            if ok:
                bind(i + 1, cand)

    bind(0, {})
    cols = sorted({t[1:] for p in patterns for t in p if t.startswith("?")})
    return {tuple(r[c] for c in cols) for r in results}


class TestBgpMatch:
    def test_chain_equals_path_query(self, kg):
        from docee_spark.operators.kgquery import bgp_match

        got = bgp_match(
            kg, [("?a", "works_at", "?x"), ("?x", "located_in", "?b")]
        )
        assert got.columns == ["a", "b", "x"]
        assert {tuple(r) for r in got.collect()} == {
            ("alice", "berlin", "acme"),
            ("bob", "berlin", "acme"),
            ("carol", "paris", "zenith"),
        }

    def test_star_and_constant_object(self, kg):
        from docee_spark.operators.kgquery import bgp_match

        # who works at a berlin-located org AND knows carol?
        got = bgp_match(
            kg,
            [
                ("?p", "works_at", "?org"),
                ("?org", "located_in", "berlin"),
                ("?p", "knows", "carol"),
            ],
        )
        assert {tuple(r) for r in got.collect()} == {("acme", "alice")}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import random

        from docee_spark.operators.kgquery import bgp_match

        rng = random.Random(13)
        nodes = [f"n{i}" for i in range(12)]
        preds = ["p", "q", "r"]
        edges = sorted(
            {
                (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
                for _ in range(120)
            }
        )
        df = spark.createDataFrame(edges, E_COLS)
        for pats in [
            [("?a", "p", "?b"), ("?b", "q", "?c")],
            [("?a", "p", "?b"), ("?b", "q", "?c"), ("?c", "r", "?a")],
            [("?a", "p", "?a")],
            [("?a", "?p", "n3"), ("?a", "p", "?b")],
        ]:
            got = {tuple(r) for r in bgp_match(df, pats).collect()}
            assert got == brute_bgp(edges, pats), pats

    def test_guards(self, kg):
        from docee_spark.operators.kgquery import bgp_match

        with pytest.raises(ValueError, match="disconnected"):
            bgp_match(
                kg, [("?a", "works_at", "?x"), ("?b", "knows", "?c")]
            )
        with pytest.raises(ValueError, match="no variable"):
            bgp_match(kg, [("alice", "works_at", "acme")])
        with pytest.raises(ValueError, match="empty"):
            bgp_match(kg, [])

    def test_constant_filters_prejoin(self, kg):
        from docee_spark.operators.kgquery import bgp_match

        plan = (
            bgp_match(
                kg, [("?a", "works_at", "?x"), ("?x", "located_in", "?b")]
            )._jdf.queryExecution().optimizedPlan().toString()
        )
        # each leg's predicate constant is a Filter under the join, not
        # a post-join condition
        assert plan.count("works_at") >= 1 and plan.count("located_in") >= 1
        join_line = [ln for ln in plan.splitlines() if "Join" in ln]
        assert join_line and "works_at" not in join_line[0]
