"""Duplicate clustering (pairs → connected components → keep-one):
property-checked against a pure-python union-find, oracle-checked
against a DuckDB recursive transitive closure, and convergence-checked
on a long chain (pointer jumping must finish in O(log diameter))."""

from __future__ import annotations

import random

import duckdb
import pytest

from docee_spark.operators.dedup import (
    cluster_representatives,
    dedup_keep,
    duplicate_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent):
        out[x] = find(x)
    return out


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a string, doc_b string"
    )


class TestDuplicateClusters:
    @pytest.mark.slow  # many-pass iterative joins; full suite covers it
    def test_matches_union_find_on_random_graphs(self, spark):
        rng = random.Random(11)
        for trial in range(3):
            n = 40
            edges = sorted(
                {
                    tuple(sorted((f"d{rng.randrange(n):03d}",
                                  f"d{rng.randrange(n):03d}")))
                    for _ in range(30)
                }
            )
            edges = [(a, b) for a, b in edges if a != b]
            got = {
                r["doc_id"]: r["cluster_id"]
                for r in duplicate_clusters(_pairs_df(spark, edges)).collect()
            }
            assert got == _union_find(edges), trial

    def test_matches_duckdb_transitive_closure(self, spark):
        """Independent SQL oracle: recursive closure → per-doc minimum
        reachable id == the component's cluster_id."""
        edges = [
            ("a", "b"), ("b", "c"), ("x", "y"), ("c", "d"), ("p", "q"),
            ("q", "r"), ("r", "s"), ("y", "z"),
        ]
        got = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in duplicate_clusters(_pairs_df(spark, edges)).collect()
        )
        con = duckdb.connect()
        con.execute(
            "create table e(a varchar, b varchar)"
        )
        con.executemany("insert into e values (?, ?)", edges)
        want = sorted(
            tuple(r)
            for r in con.execute(
                """
with both_dirs as (
  select a, b from e union select b, a from e
),
recursive_reach as (
  with recursive reach(doc, peer) as (
    select a, a from both_dirs
    union
    select r.doc, d.b from reach r join both_dirs d on d.a = r.peer
  )
  select doc, min(peer) as cluster_id from reach group by doc
)
select doc, cluster_id from recursive_reach
"""
            ).fetchall()
        )
        assert got == want

    @pytest.mark.slow  # many-pass iterative joins; full suite covers it
    def test_long_chain_converges(self, spark):
        """A 200-node path has diameter 199; plain min-propagation would
        need ~200 passes — pointer jumping must finish within the
        20-pass default (2^20 ≫ 199)."""
        edges = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(199)]
        rows = duplicate_clusters(_pairs_df(spark, edges)).collect()
        assert len(rows) == 200
        assert {r["cluster_id"] for r in rows} == {"n0000"}

    def test_unconverged_raises(self, spark):
        edges = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(40)]
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_clusters(_pairs_df(spark, edges), max_iters=2)


class TestRepresentativesAndKeep:
    def test_min_id_policy(self, spark):
        clusters = duplicate_clusters(
            _pairs_df(spark, [("b", "c"), ("a", "b"), ("x", "y")])
        )
        reps = {
            r["cluster_id"]: r["doc_id"]
            for r in cluster_representatives(clusters).collect()
        }
        assert reps == {"a": "a", "x": "x"}

    def test_longest_text_policy_with_tie_break(self, spark):
        docs = spark.createDataFrame(
            [
                ("a", "short"),
                ("b", "the longest text here"),
                ("c", "mid-length text"),
                ("x", "same size"),
                ("y", "same size"),
            ],
            "doc_id string, text string",
        )
        clusters = duplicate_clusters(
            _pairs_df(spark, [("a", "b"), ("b", "c"), ("x", "y")])
        )
        reps = {
            r["cluster_id"]: r["doc_id"]
            for r in cluster_representatives(
                clusters, docs=docs, policy="longest_text"
            ).collect()
        }
        # longest wins; equal lengths break to the smaller doc_id
        assert reps == {"a": "b", "x": "x"}

    def test_dedup_keep_end_to_end(self, spark):
        docs = spark.createDataFrame(
            [("a", "t1"), ("b", "t2"), ("c", "t3"), ("z", "untouched")],
            "doc_id string, text string",
        )
        kept = dedup_keep(docs, _pairs_df(spark, [("a", "b"), ("b", "c")]))
        assert sorted(r["doc_id"] for r in kept.collect()) == ["a", "z"]

    def test_composes_with_real_pair_operator(self, spark):
        """Pairs from minhash_verified_pairs feed the clusterer
        unchanged — the end-to-end 'dedup the corpus' path a pipeline
        actually runs."""
        from docee_spark.operators.dedup import minhash_verified_pairs

        docs = spark.createDataFrame(
            [
                ("d1", "the same long body of text repeated here"),
                ("d2", "the same long body of text repeated here"),
                ("d3", "the same long body of text repeated here"),
                ("d4", "a completely different other document body"),
                ("d5", "a completely different other document body"),
                ("d6", "unique content nothing else resembles it at"),
            ],
            "doc_id string, text string",
        )
        pairs = minhash_verified_pairs(docs, threshold_e4=9000)
        kept = dedup_keep(docs, pairs)
        assert sorted(r["doc_id"] for r in kept.collect()) == ["d1", "d4", "d6"]
