"""Adversarial counterexamples proving the corpus-pinned oracle
identities GUARD rather than decorate.

Several independent DuckDB oracles are exact only under identities that
hold on the fixture corpus (seed 7) and are pinned by
tests/test_golden_oracles.py: the folded trigger graph has no triangle,
Bron–Kerbosch cliques equal maximal per-sentence span sets, and the EDAG
max_paths cap never fires.  Each test here constructs a document that
VIOLATES one identity, asserts the pinned predicate actually fails on it
(so a fixture drift that introduces such a document would trip the pin,
not silently corrupt the driver gate), and asserts the engine itself —
Spark decode stage vs the pyref decoder — still agrees on the
counterexample (the identity is an ORACLE simplification; the engine has
no such assumption)."""

from __future__ import annotations

import docee_spark.golden as G
from docee_spark.pyref.edag import decode_doc, detect_types_per_sentence
from docee_spark.pyref.edag import _directed_trigger_adjacency
from docee_spark.pyref.graph import fold_and, max_cliques_bk
from docee_spark.schema import SPANS, T
from docee_spark.stages.decode import _sentence_adjacency, decode
from docee_spark.stages.tag import _find_dict_spans


def _span_rows(spans):
    return [
        {
            "text": s["text"],
            "field": s["field"],
            "dranges": [
                {"sent_idx": d["sent_idx"], "char_s": d["char_s"],
                 "char_e": d["char_e"]}
                for d in s["dranges"]
            ],
        }
        for s in spans
    ]


def _spark_events(spark, sentences, spans, mode, exact_fields):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("sentences", T.ArrayType(T.StringType()), False),
            T.StructField("spans", SPANS, False),
        ]
    )
    df = spark.createDataFrame(
        [{"doc_id": "adv", "sentences": sentences, "spans": _span_rows(spans)}],
        schema,
    )
    out = decode(df, mode=mode, exact_fields=exact_fields).collect()[0]
    return [
        (e["type"], tuple(sorted((k, v) for k, v in e["args"].items())))
        for e in out["events"]
    ], out["n_paths_pruned"]


def _pyref_events(sentences, spans, mode, exact_fields, stats=None):
    fields = [s["field"] for s in spans]
    ss = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
    adj = _sentence_adjacency(len(spans), ss)
    decoded = decode_doc(
        sentences, fields, ss, adj, G._EVENT_FIELDS, G._MIN_FIELDS,
        mode=mode, exact_fields=exact_fields, stats=stats,
    )
    texts = [s["text"] for s in spans]
    out = []
    for et in G._EVENT_FIELDS:
        for rec in decoded.get(et, []):
            args = {
                f: (texts[i] if i is not None else None)
                for f, i in zip(G._EVENT_FIELDS[et], rec)
            }
            out.append((et, tuple(sorted(args.items()))))
    return out


def _dict_spans(sentences):
    from docee_spark.fixtures import heuristic_entity_dict

    spans, _ = _find_dict_spans(sentences, heuristic_entity_dict())
    return spans


class TestFoldedTriangleViolation:
    """One sentence cueing EquityFreeze (trigger role LegalInstitution)
    with THREE institution surfaces → mutual directed edges among all
    three → a folded clique of size 3.  This was the designed
    counterexample for the (since-RETIRED) no-triangle oracle pin: the
    full reference tier table made ≥3-cliques real on the fixture corpus
    itself, the pin tripped, and the trigger oracle was generalized to
    recursive-CTE maximal cliques (see
    test_golden_oracles.test_folded_trigger_cliques_general_and_exercised
    _on_fixture_corpus).  Kept as a minimal triangle regression: the
    engine must decode it identically in Spark and pyref."""

    SENTS = ["冻结上海市高级人民法院与北京市第一中级人民法院及深圳市中级人民法院。"]

    def test_identity_fails_here(self):
        spans = self._spans()
        fields = [s["field"] for s in spans]
        ss = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
        st = detect_types_per_sentence(self.SENTS)
        adj = _directed_trigger_adjacency(fields, ss, st, -1)
        cliques = max_cliques_bk(fold_and(adj), 2)
        assert any(len(c) >= 3 for c in cliques), cliques

    def test_engine_parity_still_holds(self, spark):
        spans = self._spans()
        got, _ = _spark_events(spark, self.SENTS, spans, "trigger", False)
        want = _pyref_events(self.SENTS, spans, "trigger", False)
        assert sorted(got) == sorted(want)

    def _spans(self):
        spans = _dict_spans(self.SENTS)
        assert len(spans) == 3 and all(s["field"] == "institution" for s in spans)
        return spans


class TestDiamondCliqueViolation:
    """Three spans pairwise co-mentioned in three DIFFERENT sentences:
    BK finds the triangle clique {A,B,C}, but no single sentence holds
    all three — the cliques == maximal-sentence-sets identity fails."""

    SENTS = [
        "张伟明与华夏科技股份有限公司。",
        "华夏科技股份有限公司与上海市高级人民法院。",
        "张伟明与上海市高级人民法院。",
    ]

    def test_identity_fails_here(self):
        spans = self._spans()
        ss = [sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans]
        adj = _sentence_adjacency(len(spans), ss)
        cliques = {tuple(sorted(c)) for c in max_cliques_bk(adj, min_num_arg=1)}
        by_sent: dict[int, set[int]] = {}
        for i, sl in enumerate(ss):
            for si in sl:
                by_sent.setdefault(si, set()).add(i)
        sets = list({frozenset(v) for v in by_sent.values()})
        maximal = {tuple(sorted(a)) for a in sets if not any(a < b for b in sets)}
        assert cliques != maximal
        assert (0, 1, 2) in cliques and (0, 1, 2) not in maximal

    def test_engine_parity_still_holds(self, spark):
        spans = self._spans()
        got, _ = _spark_events(spark, self.SENTS, spans, "clique", False)
        want = _pyref_events(self.SENTS, spans, "clique", False)
        assert sorted(got) == sorted(want)

    def _spans(self):
        spans = _dict_spans(self.SENTS)
        assert len(spans) == 3
        assert all(len({d["sent_idx"] for d in s["dranges"]}) == 2 for s in spans)
        return spans


class TestEdagCapFiresViolation:
    """24 exact-field spans across four EquityFreeze roles in one cued
    sentence: the per-role frontier reaches (6+1)^4 = 2401 > 1024, so
    the cap FIRES — violating the cap-never-fires pin — while the Spark
    decode stage and the pyref decoder agree on the capped result."""

    def _doc(self):
        roles = ["EquityHolder", "FrozeShares", "TotalHoldingShares",
                 "LegalInstitution"]
        words = [f"实体{r}{i}号" for r in "甲乙丙丁" for i in range(6)]
        sent = "冻结" + "、".join(words) + "。"
        spans = []
        pos = 0
        for ri, w in enumerate(words):
            cs = sent.index(w, pos)
            pos = cs + len(w)
            spans.append(
                {
                    "text": w,
                    "field": roles[ri // 6],
                    "dranges": [
                        {"sent_idx": 0, "char_s": cs, "char_e": cs + len(w)}
                    ],
                }
            )
        return [sent], spans

    def test_identity_fails_here(self):
        sents, spans = self._doc()
        stats: dict[str, int] = {}
        _pyref_events(sents, spans, "edag", True, stats=stats)
        assert stats.get("n_paths_pruned", 0) > 0

    def test_engine_parity_still_holds(self, spark):
        sents, spans = self._doc()
        got, n_pruned = _spark_events(spark, sents, spans, "edag", True)
        want = _pyref_events(sents, spans, "edag", True)
        assert sorted(got) == sorted(want)
        assert n_pruned > 0  # the counter surfaces in the DataFrame too
