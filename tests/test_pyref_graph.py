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


class TestDirectedTriggerDecodeFull:
    """G6 goldens ported from the reference's own test suite
    (tests/modules/test_adj_decoding.py:240-313)."""

    # the revealed directed adjacency of the reference's two-event doc
    # (AdjMat(..., trigger_aware_graph=True, num_triggers=2).tolist(-1))
    REF_ADJ = [
        [-1, 0, 0, 0, 0, 0, 0],
        [1, -1, 1, 1, 0, 0, 0],
        [0, 0, -1, 0, 0, 0, 0],
        [1, 1, 1, -1, 0, 0, 0],
        [0, 0, 0, 0, -1, 0, 0],
        [0, 0, 1, 1, 1, -1, 1],
        [0, 0, 1, 1, 1, 1, -1],
    ]

    def test_reference_two_trigger_golden(self):
        from docee_spark.pyref.graph import directed_trigger_decode

        assert directed_trigger_decode(self.REF_ADJ, 2) == [
            (2, 3, 4, 5, 6),
            (0, 1, 2, 3),
        ]

    COMPLEX_ADJ = [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1, 1, 1, 0],
        [0, 0, 0, 1, 1, 1, 1, 0],
        [0, 0, 1, 0, 0, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ]

    def test_reference_complex_option_matrix(self):
        from docee_spark.pyref.graph import directed_trigger_decode

        got = directed_trigger_decode(
            self.COMPLEX_ADJ, 2, max_clique=True,
            with_left_trigger=True, with_all_one_trigger_comb=True,
        )
        assert set(got) == {(2, 3, 5, 6), (1, 4, 5, 6), (2, 4, 5, 6), (3, 5, 6, 7)}

        got = directed_trigger_decode(
            self.COMPLEX_ADJ, 2, max_clique=True,
            with_left_trigger=True, with_all_one_trigger_comb=False,
        )
        assert set(got) == {(2, 3, 5, 6), (1, 4, 5, 6)}

        got = directed_trigger_decode(
            self.COMPLEX_ADJ, 2, max_clique=True,
            with_left_trigger=False, with_all_one_trigger_comb=False,
        )
        assert set(got) == {(2, 3, 5, 6)}

    def test_guessing_mode_counts_triggers(self):
        from docee_spark.pyref.graph import directed_trigger_decode

        # num_triggers < 1 → |R| = #nodes-with-out-edges (here 3: 1,2,3)
        got = directed_trigger_decode(
            self.COMPLEX_ADJ, -1, max_clique=True, with_left_trigger=True
        )
        assert set(got) == {(2, 3, 5, 6), (1, 4, 5, 6)}

    def test_bf_vs_bk_trigger_cliques_agree_on_maximal(self):
        from docee_spark.pyref.graph import directed_trigger_decode

        bf = directed_trigger_decode(self.COMPLEX_ADJ, 2, max_clique=False)
        bk = directed_trigger_decode(self.COMPLEX_ADJ, 2, max_clique=True)
        # BF enumerates all complete subgraphs (may add more combs);
        # every BK comb must also be found by BF
        assert set(bk) <= set(bf)

    def test_self_loop_counts_diagonal(self):
        from docee_spark.pyref.graph import directed_trigger_decode

        adj = [[1, 1], [0, 0]]
        no_loop = directed_trigger_decode(adj, 1, self_loop=False)
        with_loop = directed_trigger_decode(adj, 1, self_loop=True)
        assert no_loop == [(0, 1)] and with_loop == [(0, 1)]
        adj_only_diag = [[1, 0], [0, 0]]
        assert directed_trigger_decode(adj_only_diag, 1, self_loop=False) == []
        assert directed_trigger_decode(adj_only_diag, 1, self_loop=True) == [(0,)]


class TestIncrementalTriggerDecode:
    def test_absorbs_trigger_sharing_min_conn_neighbours(self):
        from docee_spark.pyref.graph import directed_trigger_incremental_decode

        # trigger 0 → {1, 2, 3}; trigger 1 → {2, 3, 4}.
        # from 0: leaves {2,3}; successor-trigger 1 shares both leaves
        # (≥ min_conn=2) → absorbed.
        adj = [
            [0, 1, 1, 1, 0],
            [0, 0, 1, 1, 1],
            [0] * 5,
            [0] * 5,
            [0] * 5,
        ]
        got = directed_trigger_incremental_decode(adj, 2, min_conn=2)
        assert (0, 1, 2, 3) in got
        assert (1, 2, 3, 4) in got

    def test_min_conn_blocks_absorption(self):
        from docee_spark.pyref.graph import directed_trigger_incremental_decode

        # successor-trigger 1 shares only one leaf (2) with 0's comb
        adj = [
            [0, 1, 1, 0, 0],
            [0, 0, 1, 0, 1],
            [0] * 5,
            [0] * 5,
            [0] * 5,
        ]
        got = directed_trigger_incremental_decode(adj, 2, min_conn=2)
        assert (0, 2) in got          # trigger 1 NOT absorbed
        got_loose = directed_trigger_incremental_decode(adj, 2, min_conn=1)
        assert (0, 1, 2) in got_loose  # with min_conn=1 it is

    def test_r1_reduces_to_plain_successors(self):
        from docee_spark.pyref.graph import directed_trigger_incremental_decode

        adj = [[0, 1, 1], [0] * 3, [0] * 3]
        assert directed_trigger_incremental_decode(adj, 1) == [(0, 1, 2)]


class TestFoldAnd:
    def test_mutual_edges_only(self):
        from docee_spark.pyref.graph import fold_and

        adj = [[0, 1, 1], [1, 0, 0], [0, 0, 0]]
        assert fold_and(adj) == [[0, 1, 0], [1, 0, 0], [0, 0, 0]]


def test_tril_fold_or_reference_golden():
    """Ported VERBATIM from reference tests/test_utils.py:344-364:
    tril_fold_or symmetrizes from the lower triangle only (the upper
    triangle is discarded — e.g. adj[0][2]=1 yields NO 0-2 edge because
    adj[2][0]=0), diagonal zeroed."""
    from docee_spark.pyref.graph import tril_fold_or

    mat = [
        [-1, 1, 1, 1, 0, 0, 0],
        [1, -1, 1, 1, 0, 0, 0],
        [0, 0, -1, 0, 0, 0, 0],
        [0, 0, 0, -1, 0, 0, 0],
        [0, 0, 0, 0, -1, 0, 0],
        [0, 0, 1, 1, 1, -1, 1],
        [0, 0, 1, 1, 1, 1, -1],
    ]
    assert tril_fold_or(mat) == [
        [0, 1, 0, 0, 0, 0, 0],
        [1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 1, 1],
        [0, 0, 0, 0, 0, 1, 1],
        [0, 0, 1, 1, 1, 0, 1],
        [0, 0, 1, 1, 1, 1, 0],
    ]


def test_whole_graph_adjacency_reference_golden():
    """Ported from reference tests/helper/test_arg_rel.py:72-98
    (SpanRelAdjMat whole-graph reveal of three overlapping records):
    adjacency_from_records must reproduce the published matrix
    off-diagonal (the reference marks self as -1; G1 keeps diag 1 for
    touched spans)."""
    from docee_spark.pyref.graph import adjacency_from_records

    got = adjacency_from_records(8, [[0, 1, 2, 3], [0, 4, 5, 6], [2, 5, 6, 7]])
    ref = [
        [-1, 1, 1, 1, 1, 1, 1, 0],
        [1, -1, 1, 1, 0, 0, 0, 0],
        [1, 1, -1, 1, 0, 1, 1, 1],
        [1, 1, 1, -1, 0, 0, 0, 0],
        [1, 0, 0, 0, -1, 1, 1, 0],
        [1, 0, 1, 0, 1, -1, 1, 1],
        [1, 0, 1, 0, 1, 1, -1, 1],
        [0, 0, 1, 0, 0, 1, 1, -1],
    ]
    for i in range(8):
        for j in range(8):
            if i != j:
                assert got[i][j] == ref[i][j], (i, j)
