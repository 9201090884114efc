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
