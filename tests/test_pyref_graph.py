"""Graph decoder semantics (reference dee/modules/adj_decoding.py) —
golden cases plus brute-force↔Bron-Kerbosch cross-validation."""

import random

from docee_spark.pyref.graph import (
    adjacency_from_records,
    connected_components,
    max_cliques_bk,
    max_cliques_bruteforce,
    neighbours,
    trigger_graph_decode,
)


def _adj(n, edges):
    m = [[0] * n for _ in range(n)]
    for i in range(n):
        m[i][i] = 1
    for i, j in edges:
        m[i][j] = m[j][i] = 1
    return m


def test_neighbours_excludes_self_by_default():
    adj = _adj(3, [(0, 1)])
    nb = neighbours(adj)
    assert nb[0] == {1} and nb[1] == {0} and nb[2] == set()
    assert neighbours(adj, self_loop=True)[2] == {2}


def test_triangle_plus_pendant():
    # 0-1-2 triangle, 3 pendant on 2
    adj = _adj(4, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert max_cliques_bk(adj, 1) == [(0, 1, 2), (2, 3)]
    # brute force lists ALL complete subgraphs ≥ min size
    bf = max_cliques_bruteforce(adj, 2)
    assert set(bf) == {(0, 1, 2), (0, 1), (0, 2), (1, 2), (2, 3)}


def test_min_num_arg_filters():
    adj = _adj(4, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert max_cliques_bk(adj, 3) == [(0, 1, 2)]


def test_two_components():
    adj = _adj(5, [(0, 1), (2, 3)])
    assert connected_components(adj) == [(0, 1), (2, 3), (4,)]


def test_trigger_graph_decode_directed():
    # directed: trigger 0 → {1,2}; trigger 3 → {1}
    adj = [[0] * 4 for _ in range(4)]
    adj[0][1] = adj[0][2] = 1
    adj[3][1] = 1
    combs = trigger_graph_decode(adj, [0, 3])
    assert combs == [(0, 1, 2), (1, 3)]


def test_trigger_subset_dedup():
    adj = [[0] * 3 for _ in range(3)]
    adj[0][1] = adj[0][2] = 1
    adj[1][2] = 1
    # trigger 1's comb {1,2} ⊆ trigger 0's {0,1,2}? No: {1,2} ⊄ {0,1,2}... it is ⊆
    combs = trigger_graph_decode(adj, [0, 1])
    assert combs == [(0, 1, 2)]


def test_adjacency_from_records_or_semantics():
    adj = adjacency_from_records(4, [[0, 1], [1, 2]])
    assert adj[0][1] == adj[1][0] == 1
    assert adj[1][2] == 1
    assert adj[0][2] == 0  # no record links 0-2
    assert adj[3][3] == 0  # untouched node: no self loop added


def test_bk_vs_bruteforce_property():
    rng = random.Random(42)
    for _ in range(80):
        n = rng.randint(1, 10)
        adj = [[0] * n for _ in range(n)]
        for i in range(n):
            adj[i][i] = 1
            for j in range(i + 1, n):
                if rng.random() < 0.35:
                    adj[i][j] = adj[j][i] = 1
        bk = set(max_cliques_bk(adj, 1))
        bf = set(max_cliques_bruteforce(adj, 1))
        # every maximal clique is a complete subgraph
        assert bk <= bf
        # every complete subgraph is contained in some maximal clique
        for c in bf:
            assert any(set(c) <= set(k) for k in bk)
        # maximality: no bk clique strictly inside another bf subgraph
        for k in bk:
            assert not any(set(k) < set(c) for c in bf)


def test_worst_case_bounded():
    # complete graph K12: one clique, decoded quickly
    adj = _adj(12, [(i, j) for i in range(12) for j in range(i + 1, 12)])
    assert max_cliques_bk(adj, 1) == [tuple(range(12))]
