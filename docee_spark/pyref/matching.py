"""Evaluation semantics: greedy pred↔gold record matching and the
role-level TP/FP/FN rollup — the acceptance gate of the whole system.

Re-implements (from documented behavior, not copied):
  - greedy matching       → dee/metrics.py:42-95 (agg_event_role_tpfpfn_stats)
  - P/R/F1 scalarization  → dee/metrics.py:156-165
  - doc/event/role rollup → dee/metrics.py:443-545

Order-sensitivity is deliberate and correctness-bearing (SURVEY §7 risk 1):
predicted records are sorted by non-null count descending before matching,
and ties in gold-record similarity resolve to the FIRST gold record in list
order — both re-created exactly here.

Records are tuples of length role_num; an empty argument is None; arguments
compare with ``==`` (the reference compares token-id tuples; we compare
canonical argument strings, which is the same equivalence for our tagger).
"""

from __future__ import annotations

from typing import Optional, Sequence

Record = Sequence[Optional[str]]


def event_role_tpfpfn(
    pred_records: list[Record] | None,
    gold_records: list[Record] | None,
    role_num: int,
) -> list[list[int]]:
    """Per-role [TP, FP, FN] for one (document, event_type) cell."""
    stats = [[0, 0, 0] for _ in range(role_num)]

    def count_all(records: list[Record], slot: int) -> None:
        for rec in records:
            assert len(rec) == role_num
            for role_idx, arg in enumerate(rec):
                if arg is not None:
                    stats[role_idx][slot] += 1

    if gold_records is None:
        if pred_records is not None:
            count_all(pred_records, 1)  # all FP
        return stats
    if pred_records is None:
        count_all(gold_records, 2)  # all FN
        return stats

    # greedy matching: preds sorted by non-null count desc (stable)
    preds = sorted(
        list(pred_records),
        key=lambda r: sum(1 for a in r if a is not None),
        reverse=True,
    )
    golds = list(gold_records)
    while preds and golds:
        pred = preds.pop(0)
        assert len(pred) == role_num
        # first gold with max #equal-role agreement (ties → earliest)
        best_idx, best_sim = 0, -1
        for gi, gold in enumerate(golds):
            sim = sum(1 for pa, ga in zip(pred, gold) if pa == ga)
            if sim > best_sim:
                best_idx, best_sim = gi, sim
        gold = golds.pop(best_idx)
        for role_idx, (pa, ga) in enumerate(zip(pred, gold)):
            if ga is None:
                if pa is not None:
                    stats[role_idx][1] += 1
            else:
                if pa is None:
                    stats[role_idx][2] += 1
                elif pa == ga:
                    stats[role_idx][0] += 1
                else:
                    stats[role_idx][1] += 1
                    stats[role_idx][2] += 1
    count_all(preds, 1)
    count_all(golds, 2)
    return stats


def prf1(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    """P/R/F1 with 0-denominator → 0 (dee/metrics.py:156-165)."""
    p = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    r = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f


def micro_prf1(
    per_doc_stats: list[list[list[list[int]]]],
) -> tuple[float, float, float, int, int, int]:
    """Micro P/R/F1 over [doc][event][role][tp,fp,fn] nests
    (rollup shape of dee/metrics.py:443-545)."""
    tp = fp = fn = 0
    for doc in per_doc_stats:
        for ev in doc:
            for role in ev:
                tp += role[0]
                fp += role[1]
                fn += role[2]
    p, r, f = prf1(tp, fp, fn)
    return p, r, f, tp, fp, fn


def records_from_events(
    events: list[dict], event_fields: dict[str, list[str]]
) -> dict[str, list[tuple[Optional[str], ...]]]:
    """[{type, args:{role: text|None}}] → {event_type: [role-tuple, ...]}
    using each type's canonical role order (the record layout the reference
    evaluates, dee/metrics.py:417-431)."""
    out: dict[str, list[tuple[Optional[str], ...]]] = {}
    for ev in events:
        et = ev["type"] if "type" in ev else ev["event_type"]
        fields = event_fields[et]
        args = ev.get("args") or {}
        out.setdefault(et, []).append(tuple(args.get(f) for f in fields))
    return out
