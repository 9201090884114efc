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
    """Maximal cliques of the undirected graph, size >= min_num_arg.

    r6: Bron–Kerbosch with a DETERMINISTIC pivot (the vertex of
    cand ∪ excl with the most candidate neighbours, ties → smallest
    index — no random.choice, preserving the north-rule determinism the
    module header demands). Pivoting only prunes branches that cannot
    yield new maximal cliques, so the returned SET is identical to the
    r5 non-pivoting walk (pinned by the brute-force cross-validation
    test); on the bench's dense span graphs it cuts the recursion ~6×,
    which is ~40% of the whole heuristic pipeline's per-doc Python."""
    nbrs = neighbours(adj)
    found: set[tuple[int, ...]] = set()

    def expand(clique: set[int], cand: set[int], excl: set[int]) -> None:
        if not cand and not excl:
            if len(clique) >= min_num_arg:
                found.add(tuple(sorted(clique)))
            return
        pivot = min(cand | excl, key=lambda u: (-len(cand & nbrs[u]), u))
        for v in sorted(cand - nbrs[pivot]):
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


def tril_fold_or(adj: AdjMat) -> AdjMat:
    """Symmetrize from the LOWER triangle only, diagonal zeroed:
    ``out[i][j] = 1 iff adj[max(i,j)][min(i,j)] == 1`` (reference
    ``tril_fold_or``, dee/utils.py — the upper triangle is discarded,
    not OR-ed; golden pinned in tests/test_pyref_graph.py from
    tests/test_utils.py:344-364)."""
    n = len(adj)
    out = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i != j and adj[max(i, j)][min(i, j)] == 1:
                out[i][j] = 1
    return out


def fold_and(adj: AdjMat) -> AdjMat:
    """Directed → undirected by mutual agreement: out[i][j] = 1 iff
    adj[i][j] == adj[j][i] == 1 (reference dee/utils.py:361-370). The
    |R|>1 trigger decode runs its clique search on this folded graph."""
    n = len(adj)
    out = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            if adj[i][j] == 1 and adj[j][i] == 1:
                out[i][j] = out[j][i] = 1
    return out


def directed_trigger_decode(
    adj: AdjMat,
    num_triggers: int,
    self_loop: bool = False,
    max_clique: bool = False,
    with_left_trigger: bool = False,
    with_all_one_trigger_comb: bool = False,
) -> list[tuple[int, ...]]:
    """G6 — full directed trigger-graph decode (PTPCG,
    adj_decoding.py:174-262), all |R| paths and options:

      * triggers = nodes with ≥1 out-edge; guessing mode when
        num_triggers < 1 (|R| := #triggers);
      * |R| = 1: each trigger + its successors is one combination;
      * |R| > 1: ``fold_and`` the graph, enumerate trigger cliques of
        size 2..|R| (Bron–Kerbosch maximal cliques when ``max_clique``,
        else ALL complete subgraphs), and emit
        clique ∪ ⋂ successors(clique members);
      * ``with_left_trigger``: triggers unused by any clique fall back
        to their |R|=1 combination;
      * ``with_all_one_trigger_comb``: additionally every trigger with
        its NON-trigger successors;
      * ``self_loop``: count diagonal 1-entries as successors.

    Deterministic re-implementation from the documented behavior (the
    reference's BK uses a random pivot; same clique set, fixed order
    here). Output: size-desc sorted tuples, first-seen dedup."""
    nbrs = neighbours(adj, self_loop=self_loop)
    triggers = {u for u, vs in nbrs.items() if vs}
    if num_triggers < 1:
        num_triggers = len(triggers)

    combs: list[set[int]] = []

    def add(comb: set[int]) -> None:
        if comb and comb not in combs:
            combs.append(comb)

    if num_triggers == 1:
        for v in sorted(triggers):
            add({v} | nbrs[v])
    else:
        folded = fold_and(adj)
        finder = max_cliques_bk if max_clique else max_cliques_bruteforce
        trigger_combs = [
            tc for tc in finder(folded, 2) if len(tc) <= num_triggers
        ]
        used: set[int] = set()
        for tc in trigger_combs:
            used |= set(tc)
            succ = set.intersection(*(nbrs[v] for v in tc))
            add(set(tc) | succ)
        if with_left_trigger:
            for v in sorted(triggers - used):
                add({v} | nbrs[v])
        if with_all_one_trigger_comb:
            for v in sorted(triggers):
                add({v} | {u for u in nbrs[v] if u not in triggers})

    out = [tuple(sorted(c)) for c in combs]
    out.sort(key=len, reverse=True)
    return out


def directed_trigger_incremental_decode(
    adj: AdjMat, num_triggers: int, min_conn: int = 1
) -> list[tuple[int, ...]]:
    """G7 — incremental trigger decode (adj_decoding.py:265-319): start
    from each trigger, absorb its NON-trigger successors (leaves), then
    absorb each trigger successor that shares ≥ min_conn of those
    non-trigger neighbours with the current combination. |R|=1 reduces to
    the plain trigger+successors form; guessing mode when
    num_triggers < 1 (|R| := #triggers)."""
    nbrs = neighbours(adj)
    triggers = {u for u, vs in nbrs.items() if vs}
    if num_triggers < 1:
        num_triggers = len(triggers)

    combs: list[set[int]] = []

    def add(comb: set[int]) -> None:
        if comb and comb not in combs:
            combs.append(comb)

    if num_triggers == 1:
        for v in sorted(triggers):
            add({v} | nbrs[v])
    else:
        for v in sorted(triggers):
            comb = {v}
            non_trigger = {u for u in nbrs[v] if not nbrs[u]}
            comb |= non_trigger
            for u in sorted(u for u in nbrs[v] if nbrs[u]):
                if len(nbrs[u] & non_trigger) >= min_conn:
                    comb.add(u)
            add(comb)

    out = [tuple(sorted(c)) for c in combs]
    out.sort(key=len, reverse=True)
    return out


def trigger_graph_decode(
    adj: AdjMat, trigger_nodes: list[int], min_conn: int = 1
) -> list[tuple[int, ...]]:
    """Directed trigger-graph decoding, |R|=1 semantics with an explicit
    trigger set (adj_decoding.py:174-220): each trigger node together
    with its out-neighbours forms one candidate combination; combinations
    that are subsets of another are dropped (instance-dedup,
    dee_task.py:1340-1356). For the full option surface (|R|>1 cliques,
    left triggers, …) use ``directed_trigger_decode``; for the absorb
    variant use ``directed_trigger_incremental_decode``."""
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


def trigger_aware_adjacency(
    n: int,
    typed_records: list[tuple[str, tuple[int | None, ...]]],
    event_fields: dict[str, list[str]],
    num_triggers: int,
    directed: bool = False,
    trigger_tiers: dict[str, dict[int, tuple[str, ...]]] | None = None,
) -> AdjMat:
    """Gold-revealed trigger-aware adjacency (the reference's
    ``AdjMat(..., trigger_aware_graph=True[, directed_graph=True])``,
    dee/helper/arg_rel.py:281-323): per event record, spans filling a
    trigger role of the |R|=num_triggers tier point at every other
    member (plus the trigger self-loop); non-trigger members get no
    out-edges.  ``directed=False`` symmetrizes, reproducing the
    reference's undirected trigger-aware reveal.  ``typed_records``:
    (event_type, record-tuple of span idx|None aligned with
    event_fields[type])."""
    from .edag import _trigger_roles_for

    roles_of = _trigger_roles_for(num_triggers, trigger_tiers)
    adj = [[0] * n for _ in range(n)]
    for et, rec in typed_records:
        fields = event_fields[et]
        members = [i for i in rec if i is not None]
        trig_roles = roles_of.get(et, set())
        trigs = [
            i
            for f, i in zip(fields, rec)
            if i is not None and f in trig_roles
        ]
        for t in trigs:
            for m in members:
                adj[t][m] = 1  # includes the reference's self-loop
    if not directed:
        for i in range(n):
            for j in range(n):
                if adj[i][j]:
                    adj[j][i] = 1
    return adj
