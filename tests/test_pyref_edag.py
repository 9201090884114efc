"""EDAG trie/expansion and full-document decode (reference
dee/helper/dee.py:583-611; dee/models/doc2edag.py:532-604)."""

from docee_spark.config import CHFINANN_EVENT_TYPES
from docee_spark.fixtures import generate_corpus
from docee_spark.pyref.edag import (
    build_edag_trie,
    clique_decode,
    decode_doc,
    edag_expand,
)
from docee_spark.pyref.graph import adjacency_from_records
from docee_spark.pyref.matching import event_role_tpfpfn, micro_prf1

FIELDS_OF = {et.name: list(et.fields) for et in CHFINANN_EVENT_TYPES}
MINS = {et.name: et.min_field_num for et in CHFINANN_EVENT_TYPES}


def test_trie_groups_by_prefix():
    recs = [[0, 1, None], [0, 2, 3]]
    trie = build_edag_trie(recs)
    assert trie[0][()] == {0}
    assert trie[1][(0,)] == {1, 2}
    assert trie[2][(0, 1)] == {None}
    assert trie[2][(0, 2)] == {3}


def test_expand_recovers_two_records():
    # spans: 0=holderA 1=sharesA 2=holderB 3=sharesB; two disjoint records
    span_fields = ["EquityHolder", "TradedShares", "EquityHolder", "TradedShares"]
    adj = adjacency_from_records(4, [[0, 1], [2, 3]])
    paths = edag_expand(span_fields, adj, ["EquityHolder", "TradedShares"])
    assert set(paths) >= {(0, 1), (2, 3)}
    # adjacency blocks cross-record mixing
    assert (0, 3) not in paths and (2, 1) not in paths


def test_expand_null_field_record_survives():
    # record B has no holder: (None, 3) must be reachable
    span_fields = ["EquityHolder", "TradedShares", None, "TradedShares"]
    adj = adjacency_from_records(4, [[0, 1], [3]])
    paths = edag_expand(span_fields, adj, ["EquityHolder", "TradedShares"])
    assert (None, 3) in paths


def test_path_cap_keeps_most_complete():
    # adversarial: 12 interchangeable spans of the same field, complete graph
    n = 12
    span_fields = ["TradedShares"] * n
    adj = [[1] * n for _ in range(n)]
    paths = edag_expand(span_fields, adj, ["TradedShares"] * 4, max_paths=16)
    assert len(paths) <= 16
    assert all(len(p) == 4 for p in paths)
    # the kept paths are the most complete ones (no all-None survivors)
    assert all(sum(1 for s in p if s is not None) == 4 for p in paths)


def test_clique_decode_fills_roles_doc_order():
    span_fields = ["EquityHolder", "TradedShares", "StartDate"]
    adj = [[1] * 3 for _ in range(3)]
    recs = clique_decode(
        span_fields, adj, ["EquityHolder", "TradedShares", "StartDate", "EndDate"]
    )
    assert recs == [(0, 1, 2, None)]


def test_decode_doc_both_modes_perfect_on_gold_adjacency():
    _, gold = generate_corpus(120, seed=11)
    for mode in ("clique", "edag"):
        all_stats = []
        for g in gold:
            span_texts = [s["text"] for s in g["spans"]]
            span_fields = [s["field"] for s in g["spans"]]
            span_sents = [
                sorted({d["sent_idx"] for d in s["dranges"]}) for s in g["spans"]
            ]
            idx = {t: i for i, t in enumerate(span_texts)}
            rec_idx = [
                [idx[v] for v in ev["args"].values() if v is not None]
                for ev in g["events"]
            ]
            adj = adjacency_from_records(len(span_texts), rec_idx)
            decoded = decode_doc(
                g["sentences"], span_fields, span_sents, adj, FIELDS_OF, MINS,
                mode=mode,
            )
            by_type: dict = {}
            for ev in g["events"]:
                by_type.setdefault(ev["type"], []).append(
                    tuple(ev["args"].get(f) for f in FIELDS_OF[ev["type"]])
                )
            doc_stats = []
            for et, fields in FIELDS_OF.items():
                gr, pr = by_type.get(et), decoded.get(et)
                pred = (
                    [
                        tuple(span_texts[i] if i is not None else None for i in r)
                        for r in pr
                    ]
                    if pr
                    else None
                )
                if gr is None and pred is None:
                    continue
                doc_stats.append(event_role_tpfpfn(pred, gr, len(fields)))
            all_stats.append(doc_stats)
        p, r, f1, *_ = micro_prf1(all_stats)
        assert p == 1.0 and r == 1.0, (mode, p, r)


def test_decode_doc_coarse_fields_falls_back_to_clique():
    # edag mode + exact_fields=False must not flood with permutations
    sents = ["公告EquityUnderweight事件：减持。"]
    span_fields = ["person", "share", "share"]
    span_sents = [[0], [0], [0]]
    adj = [[1] * 3 for _ in range(3)]
    out = decode_doc(
        sents, span_fields, span_sents, adj, FIELDS_OF, {}, mode="edag",
        exact_fields=False,
    )
    assert len(out.get("EquityUnderweight", [])) == 1
