"""Clustering-quality metrics (operators/ereval.py): hand-computed
contingency example, perfect/degenerate partitions, and a differential
check vs an itertools brute force on seeded random partitions."""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from docee_spark.operators.ereval import clustering_quality


def run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, cluster_id int, gold_id int")
    [r] = clustering_quality(df).collect()
    return r.asDict()


def brute(rows):
    items = [(i, p, g) for i, p, g in rows]
    tp = pp = pg = 0
    for (_, p1, g1), (_, p2, g2) in combinations(items, 2):
        pp += p1 == p2
        pg += g1 == g2
        tp += p1 == p2 and g1 == g2
    n = len(items)
    psz = {}
    gsz = {}
    cell = {}
    for _, p, g in items:
        psz[p] = psz.get(p, 0) + 1
        gsz[g] = gsz.get(g, 0) + 1
        cell[(p, g)] = cell.get((p, g), 0) + 1
    b3p = sum((10**8 * c * c) // psz[p] for (p, g), c in cell.items()) // (
        10**4 * n
    )
    b3r = sum((10**8 * c * c) // gsz[g] for (p, g), c in cell.items()) // (
        10**4 * n
    )
    return {
        "n_items": n,
        "n_pred_clusters": len(psz),
        "n_gold_clusters": len(gsz),
        "pairs_tp": tp,
        "pairs_pred": pp,
        "pairs_gold": pg,
        "pair_p_e4": 10**4 * tp // pp if pp else 0,
        "pair_r_e4": 10**4 * tp // pg if pg else 0,
        "pair_f1_e4": 2 * 10**4 * tp // (pp + pg) if pp + pg else 0,
        "b3_p_e4": b3p,
        "b3_r_e4": b3r,
        "b3_f1_e4": 2 * b3p * b3r // (b3p + b3r) if b3p + b3r else 0,
    }


class TestClusteringQuality:
    def test_textbook_example(self, spark):
        # gold {1,2,3},{4,5}; pred {1,2},{3,4},{5}
        rows = [(1, 10, 0), (2, 10, 0), (3, 11, 0), (4, 11, 1), (5, 12, 1)]
        r = run(spark, rows)
        # pairs: tp = {1,2} only -> 1; pred pairs = 1+1+0 = 2;
        # gold pairs = 3+1 = 4
        assert (r["pairs_tp"], r["pairs_pred"], r["pairs_gold"]) == (1, 2, 4)
        assert r["pair_p_e4"] == 5000 and r["pair_r_e4"] == 2500
        assert r["pair_f1_e4"] == 2 * 10**4 * 1 // 6
        # B3: items 1,2 -> 2/2 P, 2/3 R; 3 -> 1/2 P, 1/3 R; 4 -> 1/2, 1/2;
        # 5 -> 1/1, 1/2  => P = (1+1+.5+.5+1)/5 = .8
        assert r["b3_p_e4"] == 8000
        assert r == brute(rows)

    def test_perfect_and_degenerate(self, spark):
        rows = [(i, i % 3, i % 3) for i in range(12)]
        r = run(spark, rows)
        assert r["pair_f1_e4"] == 10000 and r["b3_f1_e4"] == 10000
        # all-singletons pred vs one gold cluster: zero precision pairs
        rows = [(i, i, 0) for i in range(6)]
        r = run(spark, rows)
        assert r["pairs_pred"] == 0 and r["pair_p_e4"] == 0
        assert r["b3_p_e4"] == 10000 and r["b3_r_e4"] == 10**8 // 6 // 10**4

    @pytest.mark.parametrize("seed", [11, 12])
    def test_matches_bruteforce(self, spark, seed):
        rng = random.Random(seed)
        rows = [
            (i, rng.randrange(7), rng.randrange(5)) for i in range(150)
        ]
        assert run(spark, rows) == brute(rows)
