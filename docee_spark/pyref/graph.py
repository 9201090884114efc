"""Per-document span-graph decoders.

Re-implements the combinatorial decoding family of the reference
(dee/modules/adj_decoding.py) from its documented semantics: all operate
on one document's small (n ≲ 50 node) 0/1 adjacency matrix and return
combinations = tuples of node indices, sorted by size descending
(O3, adj_decoding.py:67,98,125).

  - neighbours            → build_single_element_connections (:9-25)
  - max_cliques_bruteforce → brute_force_adj_decode (:28-68)
  - max_cliques_bk         → bron_kerbosch_decode (:81-103)
  - connected_components   → linked_decode (:129-155)
  - trigger_graph_decode   → directed trigger decode (:174-262), the |R|=1
    path: each trigger node + its successors forms one combination.

The Bron–Kerbosch variant here is the deterministic non-pivoting one (the
reference's pivoting variant draws the pivot with random.choice, which we
deliberately avoid — determinism is a north-rule invariant).
"""

from __future__ import annotations

from itertools import combinations as _combos

AdjMat = list[list[int]]


def neighbours(adj: AdjMat, self_loop: bool = False) -> dict[int, set[int]]:
    n = len(adj)
    out: dict[int, set[int]] = {i: set() for i in range(n)}
    for i in range(n):
        for j in range(n):
            if adj[i][j] == 1 and (self_loop or i != j):
                out[i].add(j)
    return out


def _sorted_desc(cliques: set[tuple[int, ...]]) -> list[tuple[int, ...]]:
    # size-desc, then lexicographic for a total deterministic order
    return sorted(cliques, key=lambda c: (-len(c), c))


def max_cliques_bk(adj: AdjMat, min_num_arg: int = 1) -> list[tuple[int, ...]]:
    """Maximal cliques of the undirected graph, size >= min_num_arg."""
    nbrs = neighbours(adj)
    found: set[tuple[int, ...]] = set()

    def expand(clique: set[int], cand: set[int], excl: set[int]) -> None:
        if not cand and not excl:
            if len(clique) >= min_num_arg:
                found.add(tuple(sorted(clique)))
            return
        for v in sorted(cand):
            expand(clique | {v}, cand & nbrs[v], excl & nbrs[v])
            cand = cand - {v}
            excl = excl | {v}

    expand(set(), set(range(len(adj))), set())
    return _sorted_desc(found)


def max_cliques_bruteforce(adj: AdjMat, min_num_arg: int = 1) -> list[tuple[int, ...]]:
    """Level-wise complete-subgraph enumeration. Unlike Bron–Kerbosch it
    yields ALL complete subgraphs of size >= min_num_arg (not only maximal
    ones) — matching the reference's brute-force decoder, whose M keeps
    every level (adj_decoding.py:63-67)."""
    nbrs = neighbours(adj)
    levels: dict[int, set[tuple[int, ...]]] = {1: {(i,) for i in range(len(adj))}}
    k = 1
    while levels.get(k):
        nxt: set[tuple[int, ...]] = set()
        for cl in levels[k]:
            common = set.intersection(*(nbrs[v] for v in cl)) if cl else set()
            for v in common:
                if v not in cl:
                    nxt.add(tuple(sorted(cl + (v,))))
        k += 1
        if nxt:
            levels[k] = nxt
        else:
            break
    all_graphs: set[tuple[int, ...]] = set()
    for size, cls in levels.items():
        if size >= min_num_arg:
            all_graphs |= cls
    return _sorted_desc(all_graphs)


def connected_components(adj: AdjMat) -> list[tuple[int, ...]]:
    """BFS connected components (linked_decode, adj_decoding.py:129-155)."""
    nbrs = neighbours(adj)
    seen: set[int] = set()
    comps: list[tuple[int, ...]] = []
    for start in range(len(adj)):
        if start in seen:
            continue
        comp: set[int] = set()
        frontier = {start}
        while frontier:
            comp |= frontier
            frontier = set().union(*(nbrs[v] for v in frontier)) - comp
        seen |= comp
        comps.append(tuple(sorted(comp)))
    return comps


def trigger_graph_decode(
    adj: AdjMat, trigger_nodes: list[int], min_conn: int = 1
) -> list[tuple[int, ...]]:
    """Directed trigger-graph decoding, |R|=1 semantics
    (adj_decoding.py:174-220): each trigger node together with its
    out-neighbours forms one candidate combination; combinations that are
    subsets of another are dropped (instance-dedup, dee_task.py:1340-1356)."""
    nbrs = neighbours(adj)
    combos = []
    for t in sorted(trigger_nodes):
        comb = tuple(sorted({t} | nbrs[t]))
        if len(comb) >= min_conn:
            combos.append(comb)
    # subset-dedup
    kept: list[tuple[int, ...]] = []
    for c in _sorted_desc(set(combos)):
        if not any(set(c) <= set(k) for k in kept):
            kept.append(c)
    return kept


def adjacency_from_records(n: int, records: list[list[int]]) -> AdjMat:
    """Whole-graph adjacency = OR over per-record complete graphs
    (undirected, G1 — dee/helper/arg_rel.py:21-66,270-277)."""
    adj = [[0] * n for _ in range(n)]
    for rec in records:
        for i, j in _combos(sorted(set(rec)), 2):
            adj[i][j] = adj[j][i] = 1
        for i in set(rec):
            adj[i][i] = 1
    return adj
