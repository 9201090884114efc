"""|R| (num_triggers) tier semantics, end-to-end and against reference
goldens.

The reference publishes |R|=1 vs |R|=all speed/quality deltas
(figs/speed-test.png, BASELINE.md) and tests its trigger-aware gold
graph construction at |R|=3 (tests/helper/test_arg_rel.py::
test_directed_graph).  This module ports that golden byte-for-byte onto
pyref.graph.trigger_aware_adjacency and exercises non-default |R|
configurations (|R|=2 and all-args) through the Spark decode stage with
pyref parity."""

from __future__ import annotations

import pytest

from docee_spark.config import CHFINANN_EVENT_TYPES
from docee_spark.pyref.edag import _trigger_roles_for
from docee_spark.pyref.graph import trigger_aware_adjacency

EVENT_FIELDS = {et.name: list(et.fields) for et in CHFINANN_EVENT_TYPES}


class TestReferenceDirectedGraphGolden:
    """Ported from reference tests/helper/test_arg_rel.py:630-672: two
    events (EquityFreeze record [None,5,6,2,3,None,4,None] and
    EquityUnderweight record [1,0,None,3,2,None]) over 7 spans at
    num_triggers=3."""

    TYPED_RECORDS = [
        ("EquityFreeze", (None, 5, 6, 2, 3, None, 4, None)),
        ("EquityUnderweight", (1, 0, None, 3, 2, None)),
    ]

    # reference AdjMat.tolist(-1) with trigger_aware_graph=True,
    # num_triggers=3 (diagonal -1 = self, masked in the comparison)
    UNDIRECTED_GOLD = [
        [-1, 1, 1, 1, 0, 0, 0],
        [1, -1, 1, 1, 0, 0, 0],
        [1, 1, -1, 0, 0, 1, 1],
        [1, 1, 0, -1, 0, 1, 1],
        [0, 0, 0, 0, -1, 1, 1],
        [0, 0, 1, 1, 1, -1, 1],
        [0, 0, 1, 1, 1, 1, -1],
    ]
    # ... and with directed_graph=True
    DIRECTED_GOLD = [
        [-1, 1, 1, 1, 0, 0, 0],
        [1, -1, 1, 1, 0, 0, 0],
        [0, 0, -1, 0, 0, 0, 0],
        [0, 0, 0, -1, 0, 0, 0],
        [0, 0, 0, 0, -1, 0, 0],
        [0, 0, 1, 1, 1, -1, 1],
        [0, 0, 1, 1, 1, 1, -1],
    ]

    @staticmethod
    def _mask_diag(mat):
        return [
            [None if i == j else v for j, v in enumerate(row)]
            for i, row in enumerate(mat)
        ]

    def test_directed_matches_reference(self):
        adj = trigger_aware_adjacency(
            7, self.TYPED_RECORDS, EVENT_FIELDS, num_triggers=3, directed=True
        )
        assert self._mask_diag(adj) == self._mask_diag(self.DIRECTED_GOLD)

    def test_undirected_matches_reference(self):
        adj = trigger_aware_adjacency(
            7, self.TYPED_RECORDS, EVENT_FIELDS, num_triggers=3, directed=False
        )
        assert self._mask_diag(adj) == self._mask_diag(self.UNDIRECTED_GOLD)

    def test_tier_selection_changes_triggers(self):
        """|R|=1 vs |R|=3 picks different trigger sets (tier table is
        live, not a constant): at |R|=1 EquityFreeze's only trigger role
        is LegalInstitution (span 6), so span 5 (FrozeShares) loses its
        out-edges."""
        a1 = trigger_aware_adjacency(
            7, self.TYPED_RECORDS, EVENT_FIELDS, num_triggers=1, directed=True
        )
        assert all(v == 0 for j, v in enumerate(a1[5]) if j != 5)
        a3 = trigger_aware_adjacency(
            7, self.TYPED_RECORDS, EVENT_FIELDS, num_triggers=3, directed=True
        )
        assert any(v == 1 for j, v in enumerate(a3[5]) if j != 5)


class TestTriggerRolesForTiers:
    def test_clamps_to_largest_available_tier(self):
        """|R| beyond the largest tier clamps down (arg_rel.py:283-289);
        the largest tier equals the full field set (TRIGGERS['all'])."""
        roles = _trigger_roles_for(99)
        for et in CHFINANN_EVENT_TYPES:
            assert roles[et.name] == set(et.fields), et.name

    def test_tier_two_matches_reference_template(self):
        roles = _trigger_roles_for(2)
        for et in CHFINANN_EVENT_TYPES:
            assert roles[et.name] == set(et.triggers[2]), et.name

    def test_guessing_mode_uses_tier_one(self):
        assert _trigger_roles_for(-1) == _trigger_roles_for(1)


class TestSparkTriggerTierParity:
    """mode='trigger' at non-default |R| through the Spark decode stage
    equals the pyref decoder doc-for-doc on the fixture corpus, and the
    |R| knob measurably changes the output."""

    @pytest.fixture(scope="class")
    def tagged_docs(self):
        from docee_spark.fixtures import generate_corpus, heuristic_entity_dict
        from docee_spark.golden import _segment
        from docee_spark.stages.tag import _find_dict_spans, _merge_regex_spans

        ed = heuristic_entity_dict()
        web, _ = generate_corpus(60, seed=7)
        docs = []
        for w in web:
            sents = _segment(w["text"], lang=w["lang"])
            spans, taken = _find_dict_spans(sents, ed)
            spans = _merge_regex_spans(sents, spans, taken)
            if spans:
                docs.append((w["url"], sents, spans))
        assert docs
        return docs

    @pytest.mark.parametrize("num_triggers", [2, 99])
    def test_parity(self, spark, tagged_docs, num_triggers):
        import docee_spark.golden as G
        from docee_spark.pyref.edag import decode_doc
        from docee_spark.schema import SPANS, T
        from docee_spark.stages.decode import _sentence_adjacency, decode

        schema = T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("sentences", T.ArrayType(T.StringType()), False),
                T.StructField("spans", SPANS, False),
            ]
        )
        df = spark.createDataFrame(
            [
                {"doc_id": u, "sentences": sents, "spans": spans}
                for u, sents, spans in tagged_docs
            ],
            schema,
        )
        out = decode(
            df, mode="trigger", exact_fields=False, num_triggers=num_triggers
        ).collect()
        def norm_args(args):
            return tuple(sorted((k, v or "") for k, v in args.items()))

        got = {
            r["doc_id"]: sorted(
                (e["type"], norm_args(e["args"])) for e in r["events"]
            )
            for r in out
        }
        for u, sents, spans in tagged_docs:
            fields = [s["field"] for s in spans]
            ss = [
                sorted({d["sent_idx"] for d in s["dranges"]}) for s in spans
            ]
            adj = _sentence_adjacency(len(spans), ss)
            decoded = decode_doc(
                sents, fields, ss, adj, G._EVENT_FIELDS, G._MIN_FIELDS,
                mode="trigger", exact_fields=False,
                num_triggers=num_triggers,
            )
            texts = [s["text"] for s in spans]
            want = sorted(
                (
                    et,
                    norm_args(
                        {
                            f: (texts[i] if i is not None else None)
                            for f, i in zip(G._EVENT_FIELDS[et], rec)
                        }
                    ),
                )
                for et in G._EVENT_FIELDS
                for rec in decoded.get(et, [])
            )
            assert got[u] == want, u

    def test_r_knob_changes_output(self, tagged_docs):
        """|R|=1 vs |R|=all must differ somewhere on the corpus — the
        reference's published speed/quality tradeoff presumes it."""
        import docee_spark.golden as G
        from docee_spark.pyref.edag import decode_doc
        from docee_spark.stages.decode import _sentence_adjacency

        def run(nt):
            all_out = {}
            for u, sents, spans in tagged_docs:
                fields = [s["field"] for s in spans]
                ss = [
                    sorted({d["sent_idx"] for d in s["dranges"]})
                    for s in spans
                ]
                adj = _sentence_adjacency(len(spans), ss)
                all_out[u] = decode_doc(
                    sents, fields, ss, adj, G._EVENT_FIELDS, G._MIN_FIELDS,
                    mode="trigger", exact_fields=False, num_triggers=nt,
                )
            return all_out

        assert run(1) != run(99)


class TestTriggerTierSqlOracle:
    """Independent DuckDB oracle for EXPLICIT |R| trigger decode: the
    generated trigger SQL parameterized by num_triggers (tier-|R| roles
    in the edge derivation; clique-size clamp for |R|≥2; clique path
    suppressed entirely for |R|=1) must hash-match the engine's fused
    trigger pipeline doc-for-doc.  This extends the driver-gate
    guessing-mode oracle (`docee_triples_trigger`) to the non-default
    configurations the reference publishes speed/quality deltas for."""

    @pytest.mark.slow  # full-corpus pipeline + oracle; full suite covers it
    @pytest.mark.parametrize("r", [1, 2])
    def test_spark_matches_sql_at_explicit_r(self, spark, r):
        import duckdb
        import pandas as pd

        from __spark_entry__ import (
            _docee_triples_trigger_sql,
            _fixture_webtext_and_gold,
            _golden_dir,
        )
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.stages.pipeline import run_pipeline

        web, _ = _fixture_webtext_and_gold(spark)
        sdf = run_pipeline(
            web,
            entity_dict=heuristic_entity_dict(),
            mode="trigger",
            fused=True,
            num_triggers=r,
        )["triples"].toPandas()
        sql = _docee_triples_trigger_sql(
            incremental=False, num_triggers=r
        ).replace("{g}", _golden_dir())
        ddf = duckdb.connect().execute(sql).df()

        def norm(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                df[c] = df[c].astype(str)
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        assert len(sdf) == len(ddf) and len(sdf) > 0
        pd.testing.assert_frame_equal(norm(sdf), norm(ddf))

    def test_incremental_with_explicit_r_unsupported(self):
        import pytest as _pytest

        from __spark_entry__ import _docee_triples_trigger_sql

        with _pytest.raises(ValueError, match="non-.?incremental"):
            _docee_triples_trigger_sql(incremental=True, num_triggers=2)
