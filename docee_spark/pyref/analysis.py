"""Pure-Python ports of the reference's analysis utilities (test oracles).

  * doc_type             → dee/event_types/__init__.py:21-34
  * trigger importance   → Data/trigger.py:15-112 (|R|=1 here; role groups
                           generalize with itertools.combinations)
  * non-conflicting record merge → dee/utils.py:480-517
  * closest-match combination    → dee/utils.py:416-433
  * negative-combination sampling → dee/utils.py:315-323
"""

from __future__ import annotations

from itertools import combinations


def doc_type(events: list[dict]) -> str:
    if len(events) == 0:
        return "unk"
    if len(events) == 1:
        return "o2o"
    types = {e["type"] for e in events}
    return "o2m" if len(types) == 1 else "m2m"


def trigger_importance_k1(docs: list[dict]) -> dict[str, dict[str, dict[str, float]]]:
    """{event_type: {role: {existence, distinguishability, overall}}}.
    Membership uses raw values (None included), matching
    ent_in_other_instances (trigger.py:15-23)."""
    type2num: dict[str, int] = {}
    not_exist: dict[tuple[str, str], int] = {}
    not_disting: dict[tuple[str, str], int] = {}
    for d in docs:
        instances = d["events"]
        all_ents = [set(e["args"].values()) for e in instances]
        for idx, ev in enumerate(instances):
            et = ev["type"]
            type2num[et] = type2num.get(et, 0) + 1
            for role, ent in ev["args"].items():
                key = (et, role)
                not_exist.setdefault(key, 0)
                not_disting.setdefault(key, 0)
                if ent is None:
                    not_exist[key] += 1
                if any(
                    ent in ents for j, ents in enumerate(all_ents) if j != idx
                ):
                    not_disting[key] += 1
    out: dict[str, dict[str, dict[str, float]]] = {}
    for (et, role), ne in not_exist.items():
        n = type2num[et]
        ex = (n - ne) / n
        di = (n - not_disting[(et, role)]) / n
        out.setdefault(et, {})[role] = {
            "existence": ex,
            "distinguishability": di,
            "overall": ex * di,
        }
    return out


def merge_non_conflicting(
    instances: list[list], min_coo: int = 1
) -> list[list]:
    """Merge two records when no role conflicts and they agree on ≥
    min_coo roles (U4, dee/utils.py:480-517): merged pair replaces both;
    untouched records pass through; order = survivors then merged."""
    final, final_merged = [], []
    merged: set[tuple] = set()
    for ins1, ins2 in combinations(instances, 2):
        ok, coo = True, 0
        for f1, f2 in zip(ins1, ins2):
            if f1 is None or f2 is None:
                continue
            if f1 == f2:
                coo += 1
            else:
                ok = False
                break
        if ok and coo >= min_coo:
            final_merged.append(
                [f1 if f1 is not None else f2 for f1, f2 in zip(ins1, ins2)]
            )
            merged.add(tuple(ins1))
            merged.add(tuple(ins2))
    for ins in instances:
        if tuple(ins) not in merged:
            final.append(ins)
    return final + final_merged


def closest_match(
    comb: tuple[int, ...], gold_combs: list[tuple[int, ...]]
) -> tuple[tuple[int, ...], int]:
    """argmax-intersection gold combination (J8, dee/utils.py:416-433);
    ties → earliest (stable sort on -matches)."""
    scored = [
        (i, len(set(comb) & set(g))) for i, g in enumerate(gold_combs)
    ]
    scored.sort(key=lambda x: x[1], reverse=True)
    return gold_combs[scored[0][0]], scored[0][1]


def negative_combinations(
    n_spans: int, gold_combs: list[tuple[int, ...]]
) -> tuple[int, ...]:
    """U6 (dee/utils.py:315-323): span universe minus the union of gold
    combination members."""
    used = set()
    for g in gold_combs:
        used |= set(g)
    return tuple(i for i in range(n_spans) if i not in used)
