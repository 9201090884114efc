"""EDAG (entity-based directed acyclic graph) event-table decoding.

The reference's Doc2EDAG decoder expands, per (document, event type), a
frontier of partial role-assignment paths: fields are visited in schema
order; every path scores all candidate spans and branches on each accepted
span, or extends with None when no span is accepted
(dee/models/doc2edag.py:532-604; the train-side trie over role-assignment
prefixes is built at dee/helper/dee.py:583-611).

This module gives the deterministic engine variant: the per-(path, field)
"scorer" accepts a span iff (a) the tagger guessed this field for it and
(b) it is adjacency-compatible with every span already on the path — so
with an adjacency revealed from gold records (G1) the expansion exactly
re-enumerates the gold record set. A path cap guards adversarial documents
(SURVEY §7 risk 2).

Also provides the clique-based decode (PTPCG-style: adjacency → maximal
cliques → role assignment, reference trigger_aware.py:535-683) so the two
families are switchable, mirroring the reference's model_type dispatch
(dee/tasks/dee_task.py:381-402).
"""

from __future__ import annotations

from ..config import ROLE_COARSE_TYPE
from .graph import AdjMat, max_cliques_bk


def field_matches(span_field: str | None, role: str) -> bool:
    """A span fills a role when its guessed field IS the role (gold/model
    tagger) or its coarse type is the role's coarse type (dictionary+regex
    tagger, which can only guess types — dee/helper/dee.py:120)."""
    if span_field is None:
        return False
    return span_field == role or ROLE_COARSE_TYPE.get(role) == span_field


def build_edag_trie(
    records: list[list[int | None]],
) -> dict[int, dict[tuple[int | None, ...], set[int | None]]]:
    """Train-side EDAG index (dee/helper/dee.py:583-611): group records by
    the prefix of role assignments — field_idx → {prefix_path: next-span
    set}. Used for tests and for gold-path supervision parity."""
    out: dict[int, dict[tuple[int | None, ...], set[int | None]]] = {}
    if not records:
        return out
    nfields = len(records[0])
    for fi in range(nfields):
        level: dict[tuple[int | None, ...], set[int | None]] = {}
        for rec in records:
            prefix = tuple(rec[:fi])
            level.setdefault(prefix, set()).add(rec[fi])
        out[fi] = level
    return out


def edag_expand(
    span_fields: list[str | None],
    adj: AdjMat,
    fields: list[str],
    max_paths: int = 256,
    always_branch_none: bool = True,
    stats: dict[str, int] | None = None,
) -> list[tuple[int | None, ...]]:
    """Frontier expansion → complete role paths (span indices or None).

    span_fields[i] = guessed field of span i (tagger output);
    adj = doc span adjacency (model-scored or record-revealed);
    fields = the event type's ordered role list.
    """
    paths: list[tuple[int | None, ...]] = [()]
    for field in fields:
        nxt: list[tuple[int | None, ...]] = []
        for path in paths:
            chosen = [s for s in path if s is not None]
            cands = [
                i
                for i, f in enumerate(span_fields)
                if field_matches(f, field)
                and i not in chosen
                and all(adj[i][c] == 1 for c in chosen)
            ]
            # branch on every accepted span AND (with exact field info) on
            # None: the reference's field classifier may reject all
            # candidates for one record even though another record fills
            # the field (doc2edag.py:563-585); spurious sub-record paths
            # are removed by subset-dedup. With only coarse-typed fields
            # (dictionary+regex tagger) the None branch floods the frontier
            # with unsupported combinations, so it is taken only when no
            # candidate exists.
            for c in cands:
                nxt.append(path + (c,))
            if always_branch_none or not cands:
                nxt.append(path + (None,))
        if len(nxt) > max_paths:
            # prune to the most complete paths (deterministic: non-null
            # count desc, then path order) — the cap exists only to bound
            # adversarial documents (SURVEY §7 risk 2); COUNTED, never
            # silent (A9): callers surface stats["n_paths_pruned"]
            if stats is not None:
                stats["n_paths_pruned"] = (
                    stats.get("n_paths_pruned", 0) + len(nxt) - max_paths
                )
            nxt.sort(
                key=lambda p: (
                    -sum(1 for s in p if s is not None),
                    tuple(-1 if s is None else s for s in p),
                )
            )
            nxt = nxt[:max_paths]
        paths = nxt
    # drop the all-None path and exact duplicates, keep first-seen order
    seen: set[tuple[int | None, ...]] = set()
    out = []
    for p in paths:
        if all(s is None for s in p) or p in seen:
            continue
        seen.add(p)
        out.append(p)
    return out


def _fill_record(
    clique: tuple[int, ...], span_fields: list[str | None], fields: list[str]
) -> tuple[int | None, ...]:
    """Deterministic role assignment inside a combination: the first
    (doc-order) unused member whose guessed field matches the role fills
    it (analog of predict_span_role, event_table.py:211-246). Exact-field
    matches win over coarse-type matches."""
    used: set[int] = set()
    rec: list[int | None] = []
    for f in fields:
        m = next((i for i in clique if i not in used and span_fields[i] == f), None)
        if m is None:
            m = next(
                (i for i in clique if i not in used and field_matches(span_fields[i], f)),
                None,
            )
        if m is not None:
            used.add(m)
        rec.append(m)
    return tuple(rec)


def _subset_dedup(records: list[tuple[int | None, ...]]) -> list[tuple[int | None, ...]]:
    """Drop records whose non-null arg set ⊆ another record of the same
    type (U3, dee/tasks/dee_task.py:1340-1356)."""
    kept: list[tuple[int | None, ...]] = []
    for rec in sorted(
        set(records),
        key=lambda r: (
            -sum(1 for a in r if a is not None),
            tuple(-1 if x is None else x for x in r),
        ),
    ):
        rset = {(i, a) for i, a in enumerate(rec) if a is not None}
        if not any(
            rset <= {(i, a) for i, a in enumerate(k) if a is not None} for k in kept
        ):
            kept.append(rec)
    return kept


def clique_decode(
    span_fields: list[str | None],
    adj: AdjMat,
    fields: list[str],
    min_field_num: int = 1,
) -> list[tuple[int | None, ...]]:
    """PTPCG-style decode for ONE event type: maximal cliques of the span
    graph, role assignment per clique, subset-dedup (reference
    adj_decoding + event_table predict_span_role, trigger_aware.py:652-683).
    ``decode_doc`` is the typed multi-event wrapper."""
    if not span_fields:
        return []
    records = []
    for clique in max_cliques_bk(adj, min_num_arg=1):
        rec = _fill_record(clique, span_fields, fields)
        n = sum(1 for a in rec if a is not None)
        if n >= max(1, min_field_num):
            records.append(rec)
    return _subset_dedup(records)


# Deterministic event-type detection: keyword cues per type, the engine's
# analog of the reference's trained event-type classifier
# (dee/modules/event_table.py:47-57; M5). Keys are substring cues looked up
# in each sentence. Extensible via config.
DEFAULT_TYPE_KEYWORDS: dict[str, tuple[str, ...]] = {
    "EquityFreeze": ("EquityFreeze", "冻结"),
    "EquityRepurchase": ("EquityRepurchase", "回购"),
    "EquityUnderweight": ("EquityUnderweight", "减持"),
    "EquityOverweight": ("EquityOverweight", "增持"),
    "EquityPledge": ("EquityPledge", "质押"),
}


def detect_types_per_sentence(
    sentences: list[str],
    type_keywords: dict[str, tuple[str, ...]] | None = None,
) -> list[set[str]]:
    kw = type_keywords or DEFAULT_TYPE_KEYWORDS
    return [
        {et for et, cues in kw.items() if any(c in sent for c in cues)}
        for sent in sentences
    ]


def _trigger_roles_for(
    num_triggers: int,
    trigger_tiers: dict[str, dict[int, tuple[str, ...]]] | None = None,
) -> dict[str, set[str]]:
    """Per event type, the trigger-role set for |R| = num_triggers
    (EventType.triggers, config.py): pick the largest configured tier
    ≤ |R| (reference clamps num_triggers to the available tiers,
    arg_rel.py:283-289); tier 1 when guessing (< 1).  ``trigger_tiers``
    overrides the catalog (default ChFinAnn) — {type: {|R|: roles}}."""
    if trigger_tiers is None:
        from ..config import CHFINANN_EVENT_TYPES

        trigger_tiers = {
            et.name: et.triggers
            for et in CHFINANN_EVENT_TYPES
            if getattr(et, "triggers", None)
        }
    n = num_triggers if num_triggers >= 1 else 1
    out: dict[str, set[str]] = {}
    for name, tiers in trigger_tiers.items():
        if not tiers:
            continue
        usable = [k for k in tiers if k <= n]
        k = max(usable) if usable else min(tiers)
        out[name] = set(tiers[k])
    return out


def _directed_trigger_adjacency(
    span_fields: list[str | None],
    span_sent_idxs: list[list[int]],
    sent_types: list[set[str]],
    num_triggers: int,
    trigger_tiers: dict[str, dict[int, tuple[str, ...]]] | None = None,
) -> AdjMat:
    """Deterministic directed trigger graph (build_directed_graph analog,
    arg_rel.py:281-323): span i → span j iff i fills a trigger role of a
    type cued in a shared sentence and j co-occurs there (diagonal set
    for triggers, like the reference's self[trigger, trigger] = 1)."""
    n = len(span_fields)
    adj = [[0] * n for _ in range(n)]
    roles_of = _trigger_roles_for(num_triggers, trigger_tiers)
    by_sent: dict[int, list[int]] = {}
    for i, sents in enumerate(span_sent_idxs):
        for si in sents:
            by_sent.setdefault(si, []).append(i)
    for si, members in by_sent.items():
        for et in sent_types[si] if si < len(sent_types) else set():
            trig_roles = roles_of.get(et, set())
            for i in members:
                if any(field_matches(span_fields[i], r) for r in trig_roles):
                    for j in members:
                        adj[i][j] = 1
    return adj


def decode_doc(
    sentences: list[str],
    span_fields: list[str | None],
    span_sent_idxs: list[list[int]],
    adj: AdjMat,
    event_fields: dict[str, list[str]],
    min_field_num: dict[str, int] | None = None,
    mode: str = "clique",
    type_keywords: dict[str, tuple[str, ...]] | None = None,
    max_paths: int = 256,
    exact_fields: bool = True,
    num_triggers: int = -1,
    min_conn: int = 1,
    stats: dict[str, int] | None = None,
    directed_adjacency: bool = False,
    trigger_tiers: dict[str, dict[int, tuple[str, ...]]] | None = None,
) -> dict[str, list[tuple[int | None, ...]]]:
    """Full per-document decode: event-type detection → combination
    enumeration (cliques, trigger-graph combinations, or EDAG expansion)
    → role assignment → subset-dedup. Returns
    {event_type: [record tuples of span idx|None]}.

    ``span_sent_idxs[i]`` = sentence indices where span i is mentioned.
    A combination is typed by the sentence-keyword cues covering its
    members (deterministic analog of M5 + key-sentence detection A8).
    Modes: "clique" (PTPCG BK), "trigger" (G6 full directed decode,
    max_clique + left-trigger options, ``num_triggers`` |R| — guessing
    mode when < 1), "trigger_incremental" (G7 absorb with ``min_conn``),
    "edag", "greedy", "dcfee", "product".
    """
    mins = min_field_num or {}
    sent_types = detect_types_per_sentence(sentences, type_keywords)
    out: dict[str, list[tuple[int | None, ...]]] = {}

    if mode == "edag" and not exact_fields:
        # An unscored EDAG expansion over coarse-typed spans enumerates
        # every type-consistent assignment (the reference's EDAG is only
        # defined WITH its learned field classifier, doc2edag.py:563-585).
        # The principled deterministic decode for coarse fields is the
        # clique path — fall back.
        mode = "clique"

    if mode == "greedy":
        # M10 GreedyDec analog (doc2edag.py:812-969): one record per
        # detected event type, roles filled greedily from ALL doc spans
        # in doc order — the cheapest fallback extractor.
        doc_types = set().union(*sent_types) if sent_types else set()
        for et in event_fields:
            if et not in doc_types:
                continue
            rec = _fill_record(
                tuple(range(len(span_fields))), span_fields, event_fields[et]
            )
            if sum(1 for a in rec if a is not None) >= mins.get(et, 1):
                out[et] = [rec]
        return {et: _subset_dedup(recs) for et, recs in out.items()}

    if mode == "product":
        # M10 ProductDec / DCFEE-M analog (modules/__init__.py:63-101,
        # dcfee.py DCFEE-M): per key sentence, the cross-product of role
        # candidates within that sentence, capped at max_paths.
        for si, types_here in enumerate(sent_types):
            for et in types_here:
                fields = event_fields[et]
                in_sent = [
                    i for i in range(len(span_fields)) if si in span_sent_idxs[i]
                ]
                partial: list[tuple[int | None, ...]] = [()]
                for f in fields:
                    cands = [i for i in in_sent if field_matches(span_fields[i], f)]
                    # EVERY path extends (the reference's "ensure every
                    # last path will be extended", append_all_spans in
                    # dee/modules/__init__.py:96-99): a path whose
                    # candidates are all used falls back to None for this
                    # role instead of being dropped while siblings extend.
                    # Documented deviation: the reference reuses spans
                    # across roles freely (its field classifier gates
                    # candidates); this deterministic analog keeps the
                    # no-reuse constraint per path.
                    nxt = []
                    for p in partial:
                        ext = [p + (c,) for c in cands if c not in p]
                        nxt.extend(ext or [p + (None,)])
                    partial = nxt[:max_paths]
                    if len(nxt) > max_paths and stats is not None:
                        stats["n_paths_pruned"] = (
                            stats.get("n_paths_pruned", 0)
                            + len(nxt) - max_paths
                        )
                for rec in partial:
                    if sum(1 for a in rec if a is not None) >= mins.get(et, 1):
                        out.setdefault(et, []).append(rec)
        return {et: _subset_dedup(recs) for et, recs in out.items()}

    if mode == "dcfee":
        # M9 DCFEE-O analog (dcfee.py:10-99,334-457): every cue sentence
        # is a key sentence producing one record; roles fill first from
        # spans mentioned in the key sentence, then from the nearest
        # mention by sentence distance (nearest-argument completion).
        for si, types_here in enumerate(sent_types):
            for et in types_here:
                fields = event_fields[et]
                in_sent = [
                    i for i in range(len(span_fields)) if si in span_sent_idxs[i]
                ]
                used: set[int] = set()
                rec: list[int | None] = []
                for f in fields:
                    m = next(
                        (i for i in in_sent
                         if i not in used and field_matches(span_fields[i], f)),
                        None,
                    )
                    if m is None:
                        # nearest-argument fill across the document
                        cands = [
                            (min(abs(s - si) for s in span_sent_idxs[i]), i)
                            for i in range(len(span_fields))
                            if i not in used and field_matches(span_fields[i], f)
                        ]
                        m = min(cands)[1] if cands else None
                    if m is not None:
                        used.add(m)
                    rec.append(m)
                if sum(1 for a in rec if a is not None) >= mins.get(et, 1):
                    out.setdefault(et, []).append(tuple(rec))
        return {et: _subset_dedup(recs) for et, recs in out.items()}

    if mode in ("clique", "trigger", "trigger_incremental"):
        if not span_fields:
            cliques = []
        elif mode in ("trigger", "trigger_incremental"):
            # G6/G7 need a DIRECTED trigger→argument graph (the reference
            # gets it from the trained scorer or the trigger-aware gold
            # AdjMat, arg_rel.py:281-323). When the caller handed a
            # symmetric adjacency (sentence/gold co-occurrence), derive
            # the deterministic analog from the catalog's trigger roles:
            # a span filling a trigger role of a type cued in its
            # sentence points at every co-occurring span (incl. itself —
            # the reference's trigger self-loop). A matrix the CALLER
            # declares directed (directed_adjacency=True — the
            # adjacency="matrix" model slot) always passes through;
            # symmetry sniffing alone would misfire on all-zero or 1×1
            # model outputs and silently override the model's decision.
            d_adj = adj
            if not directed_adjacency and all(
                adj[i][j] == adj[j][i]
                for i in range(len(adj))
                for j in range(i + 1, len(adj))
            ):
                d_adj = _directed_trigger_adjacency(
                    span_fields,
                    span_sent_idxs,
                    sent_types,
                    num_triggers,
                    trigger_tiers,
                )
            if mode == "trigger":
                from .graph import directed_trigger_decode

                cliques = directed_trigger_decode(
                    d_adj, num_triggers, max_clique=True, with_left_trigger=True
                )
            else:
                from .graph import directed_trigger_incremental_decode

                cliques = directed_trigger_incremental_decode(
                    d_adj, num_triggers, min_conn=min_conn
                )
        else:
            cliques = max_cliques_bk(adj, min_num_arg=1)
        for clique in cliques:
            # candidate types = union of cues over the members' sentences
            cand: set[str] = set()
            for i in clique:
                for si in span_sent_idxs[i]:
                    if si < len(sent_types):  # clipped docs: idx may overflow
                        cand |= sent_types[si]
            best_type, best_rec, best_n = None, None, 0
            for et in event_fields:  # catalog order = tie-break order
                if et not in cand:
                    continue
                rec = _fill_record(clique, span_fields, event_fields[et])
                n = sum(1 for a in rec if a is not None)
                if n > best_n and n >= mins.get(et, 1):
                    best_type, best_rec, best_n = et, rec, n
            if best_type is not None:
                out.setdefault(best_type, []).append(best_rec)
    elif mode == "edag":
        doc_types = set().union(*sent_types) if sent_types else set()
        for et in event_fields:
            if et not in doc_types:
                continue
            # restrict to spans mentioned in a sentence cueing this type.
            # Deliberate gating semantics (differs from clique mode, which
            # types combinations AFTER formation): a span never co-located
            # with a cue sentence cannot enter this type's expansion, even
            # when adjacency-linked to a cue span — the reference needs no
            # gate because its learned field classifier does the typing
            # (doc2edag.py:563-585); the deterministic analog trades that
            # recall for cue precision, and the SQL oracle re-derives the
            # same gate (span_cue)
            in_cue = [
                any(
                    si < len(sent_types) and et in sent_types[si]
                    for si in span_sent_idxs[i]
                )
                for i in range(len(span_fields))
            ]
            gated = [
                f if in_cue[i] else None for i, f in enumerate(span_fields)
            ]
            recs = edag_expand(
                gated,
                adj,
                event_fields[et],
                max_paths=max_paths,
                always_branch_none=exact_fields,
                stats=stats,
            )
            recs = [r for r in recs
                    if sum(1 for a in r if a is not None) >= mins.get(et, 1)]
            if recs:
                out[et] = recs
    else:
        raise ValueError(f"unknown decode mode: {mode}")

    return {et: _subset_dedup(recs) for et, recs in out.items()}
