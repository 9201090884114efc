"""GreedyDec (M10) and DCFEE-O (M9) decode modes + canonicalize
transitive closure."""

from pyspark.sql import functions as F

from docee_spark.config import CHFINANN_EVENT_TYPES
from docee_spark.pyref.edag import decode_doc
from docee_spark.pyref.graph import adjacency_from_records

FIELDS_OF = {et.name: list(et.fields) for et in CHFINANN_EVENT_TYPES}


def _doc():
    sents = [
        "公告EquityUnderweight事件：张三减持，TradedShares为1000股，好。",
        "StartDate为2020年1月1日。",
    ]
    span_fields = ["person", "share", "date"]
    span_sents = [[0], [0], [1]]
    adj = adjacency_from_records(3, [[0, 1, 2]])
    return sents, span_fields, span_sents, adj


class TestGreedyMode:
    def test_one_record_per_type(self):
        sents, sf, ss, adj = _doc()
        out = decode_doc(sents, sf, ss, adj, FIELDS_OF, {}, mode="greedy",
                         exact_fields=False)
        assert list(out) == ["EquityUnderweight"]
        [rec] = out["EquityUnderweight"]
        # EquityHolder←person(0), TradedShares←share(1), StartDate←date(2)
        assert rec[0] == 0 and rec[1] == 1 and rec[2] == 2

    def test_type_gating(self):
        sents = ["无事件句子。"]
        out = decode_doc(sents, ["person"], [[0]],
                         [[1]], FIELDS_OF, {}, mode="greedy", exact_fields=False)
        assert out == {}


class TestDcfeeMode:
    def test_key_sentence_plus_nearest_fill(self):
        sents, sf, ss, adj = _doc()
        out = decode_doc(sents, sf, ss, adj, FIELDS_OF, {}, mode="dcfee",
                         exact_fields=False)
        [rec] = out["EquityUnderweight"]
        # person+share from the key sentence; date filled from nearest
        # sentence (distance 1)
        assert rec[0] == 0 and rec[1] == 1 and rec[2] == 2

    def test_two_key_sentences_two_records(self):
        sents = [
            "公告EquityUnderweight事件：减持一。",
            "公告EquityUnderweight事件：减持二。",
        ]
        span_fields = ["person", "share", "person", "share"]
        span_sents = [[0], [0], [1], [1]]
        adj = adjacency_from_records(4, [[0, 1], [2, 3]])
        out = decode_doc(sents, span_fields, span_sents, adj, FIELDS_OF, {},
                         mode="dcfee", exact_fields=False)
        assert len(out["EquityUnderweight"]) == 2


class TestDecodeStageModes:
    def test_all_modes_run_on_spark(self, spark, web_df):
        from docee_spark.fixtures import heuristic_entity_dict
        from docee_spark.stages.pipeline import run_pipeline

        for mode in ("greedy", "dcfee"):
            res = run_pipeline(
                web_df.limit(30),
                entity_dict=heuristic_entity_dict(),
                mode=mode,
                fused=True,
            )
            assert res["triples"].count() > 0, mode


class TestMatrixAdjacency:
    def test_model_scored_adjacency_column(self, spark):
        """decode(adjacency='matrix') consumes a per-doc adj matrix — the
        integration point for a trained PTPCG scorer (M6)."""
        from docee_spark.stages.decode import decode

        def span(text, field):
            return {"text": text, "field": field,
                    "dranges": [{"sent_idx": 0, "char_s": 0, "char_e": len(text)}]}

        row = {
            "doc_id": "d1",
            "sentences": ["公告EquityUnderweight事件：减持。"],
            "spans": [
                span("张三", "EquityHolder"),
                span("100股", "TradedShares"),
                span("2020年1月1日", "StartDate"),
                span("2020年2月1日", "EndDate"),
            ],
            "adj": [[1] * 4 for _ in range(4)],  # min_field_num=4 satisfied
        }
        from docee_spark.schema import SPANS

        import pyspark.sql.types as T

        schema = T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("sentences", T.ArrayType(T.StringType())),
            T.StructField("spans", SPANS),
            T.StructField("adj", T.ArrayType(T.ArrayType(T.IntegerType()))),
        ])
        df = spark.createDataFrame([row], schema)
        out = decode(df, mode="clique", adjacency="matrix").collect()[0]
        assert "adj" not in out.asDict()
        [ev] = out["events"]
        assert ev["type"] == "EquityUnderweight"
        assert ev["args"]["EquityHolder"] == "张三"
        assert ev["args"]["TradedShares"] == "100股"

    def test_matrix_mode_requires_column(self, spark, gold_df):
        import pytest

        from docee_spark.stages.decode import decode
        from pyspark.sql import functions as F

        df = gold_df.select(F.col("guid").alias("doc_id"), "sentences", "spans")
        with pytest.raises(ValueError):
            decode(df, adjacency="matrix")


class TestClosureChaining:
    def test_closure_monotone_and_separating(self, spark):
        from docee_spark.stages.canonicalize import canonicalize

        base = "acme corporation limited shanghai branch"
        near = [base, base + "x", base + " inc", base.replace("shanghai", "beijing")]
        far = "zenith quantum holdings group"
        trip = spark.createDataFrame(
            [
                (f"d{i}", "T", 0, s, "T#r", s)
                for i, s in enumerate(near + [far])
            ],
            "doc_id string, event_type string, recguid int, subj string, pred string, obj string",
        )
        v1, _ = canonicalize(trip, closure_passes=1)
        v3, _ = canonicalize(trip, closure_passes=3)
        n1, n3 = v1.count(), v3.count()
        # label propagation only merges: clusters non-increasing in passes
        assert n3 <= n1
        # the four near-dup variants collapse; the distinct surface stays
        assert n3 == 2
        ids = {r["surface"]: r["entity_id"] for r in v3.collect()}
        assert far in ids.values() or any(far == s for s in ids)


class TestProductMode:
    def test_cross_product_fill(self):
        sents = ["公告EquityUnderweight事件：两个减持价。"]
        # two share candidates in the key sentence → two records
        span_fields = ["person", "share", "share"]
        span_sents = [[0], [0], [0]]
        adj = [[1] * 3 for _ in range(3)]
        out = decode_doc(sents, span_fields, span_sents, adj, FIELDS_OF, {},
                         mode="product", exact_fields=False)
        recs = out["EquityUnderweight"]
        shares_used = {r[1] for r in recs}
        assert shares_used == {1, 2}  # TradedShares filled by each candidate

    def test_capped(self):
        sents = ["公告EquityUnderweight事件：减持。"]
        n = 10
        span_fields = ["share"] * n
        span_sents = [[0]] * n
        adj = [[1] * n for _ in range(n)]
        out = decode_doc(sents, span_fields, span_sents, adj, FIELDS_OF, {},
                         mode="product", exact_fields=False, max_paths=16)
        assert len(out.get("EquityUnderweight", [])) <= 16


class TestEventTypeStats:
    def test_type_level_prf(self, spark, gold_df):
        from docee_spark.stages.evaluate import event_type_stats
        from pyspark.sql import functions as F

        pred = gold_df.select(F.col("guid").alias("doc_id"), "events")
        gold = gold_df.select(F.col("guid").alias("doc_id"), "events")
        rows = event_type_stats(pred, gold).collect()
        assert rows
        for r in rows:
            assert r["fp"] == 0 and r["fn"] == 0 and r["f1"] == 1.0

    def test_type_level_counts_disagreement(self, spark):
        from docee_spark.stages.evaluate import event_type_stats

        def mk(doc_types):
            return spark.createDataFrame(
                [
                    (d, [{"recguid": 0, "type": t, "args": {}} for t in ts])
                    for d, ts in doc_types
                ],
                "doc_id string, events array<struct<recguid:int,type:string,args:map<string,string>>>",
            )

        pred = mk([("d1", ["EquityPledge"]), ("d2", ["EquityFreeze"])])
        gold = mk([("d1", ["EquityPledge", "EquityFreeze"]), ("d2", [])])
        rows = {r["event_type"]: r for r in event_type_stats(pred, gold).collect()}
        assert rows["EquityPledge"]["tp"] == 1
        assert rows["EquityFreeze"]["fp"] == 1 and rows["EquityFreeze"]["fn"] == 1


class TestInstanceStats:
    def test_identical_records_all_tp(self, spark, gold_df):
        from docee_spark.stages.evaluate import instance_stats

        pred = gold_df.select(F.col("guid").alias("doc_id"), "events")
        rows = instance_stats(pred, pred).collect()
        assert rows and all(r["fp"] == 0 and r["fn"] == 0 for r in rows)

    def test_one_wrong_arg_breaks_instance_match(self, spark):
        from docee_spark.stages.evaluate import instance_stats

        def mk(arg):
            return spark.createDataFrame(
                [("d1", [{"recguid": 0, "type": "EquityPledge",
                          "args": {"Pledger": arg, "Pledgee": "乙"}}])],
                "doc_id string, events array<struct<recguid:int,type:string,args:map<string,string>>>",
            )

        rows = instance_stats(mk("甲"), mk("丙")).collect()
        [r] = rows
        assert (r["tp"], r["fp"], r["fn"]) == (0, 1, 1)

    def test_null_args_excluded_from_key(self, spark):
        from docee_spark.stages.evaluate import instance_stats

        a = spark.createDataFrame(
            [("d1", [{"recguid": 0, "type": "EquityPledge",
                      "args": {"Pledger": "甲", "Pledgee": None}}])],
            "doc_id string, events array<struct<recguid:int,type:string,args:map<string,string>>>",
        )
        b = spark.createDataFrame(
            [("d1", [{"recguid": 0, "type": "EquityPledge",
                      "args": {"Pledger": "甲"}}])],
            "doc_id string, events array<struct<recguid:int,type:string,args:map<string,string>>>",
        )
        [r] = instance_stats(a, b).collect()
        assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)


class TestMatrixTriggerModeSemantics:
    """Pin the adjacency='matrix' × mode='trigger'/'trigger_incremental'
    combination (r4 verdict #1 'what's wrong'): a scorer-produced matrix
    is directed BY DECLARATION (stages/decode.py passes
    directed_adjacency=True), so even a symmetric matrix passes through
    verbatim and is never overridden by the catalog-derived trigger
    adjacency the symmetric-sniff fallback would build. The sparse
    symmetric fixture below distinguishes the two behaviors: passthrough
    keeps the {0,1} / {2,3} components separate; the catalog fallback
    would merge all four spans into one record."""

    SENTS = ["公告EquityUnderweight事件：减持。"]
    FIELDS = ["EquityHolder", "TradedShares", "StartDate", "EndDate"]
    SSI = [[0], [0], [0], [0]]
    # symmetric, block-diagonal: {0,1} and {2,3} mutually connected
    SPARSE_SYM = [[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1], [0, 0, 1, 1]]

    def _ef(self):
        from docee_spark.config import CHFINANN_EVENT_TYPES

        return {et.name: list(et.fields) for et in CHFINANN_EVENT_TYPES}

    def test_pyref_trigger_directed_declaration_pins_passthrough(self):
        from docee_spark.pyref.edag import decode_doc

        ef = self._ef()
        passthrough = decode_doc(
            self.SENTS, self.FIELDS, self.SSI, self.SPARSE_SYM, ef,
            mode="trigger", directed_adjacency=True,
        )["EquityUnderweight"]
        derived = decode_doc(
            self.SENTS, self.FIELDS, self.SSI, self.SPARSE_SYM, ef,
            mode="trigger", directed_adjacency=False,
        )["EquityUnderweight"]
        # declared-directed: the two components stay separate records
        assert sorted(passthrough, key=str) == [
            (0, 1, None, None, None, None),
            (None, None, 2, 3, None, None),
        ]
        # sniffed-symmetric: catalog trigger adjacency merges all four —
        # proving the fixture genuinely distinguishes the semantics
        assert derived == [(0, 1, 2, 3, None, None)]

    def test_pyref_trigger_incremental_directed_declaration(self):
        from docee_spark.pyref.edag import decode_doc

        ef = self._ef()
        passthrough = decode_doc(
            self.SENTS, self.FIELDS, self.SSI, self.SPARSE_SYM, ef,
            mode="trigger_incremental", directed_adjacency=True,
        )["EquityUnderweight"]
        derived = decode_doc(
            self.SENTS, self.FIELDS, self.SSI, self.SPARSE_SYM, ef,
            mode="trigger_incremental", directed_adjacency=False,
        )["EquityUnderweight"]
        # G7 absorb over the declared digraph: self-loop singletons only
        assert sorted(passthrough, key=str) == sorted(
            [
                (0, None, None, None, None, None),
                (None, 1, None, None, None, None),
                (None, None, 2, None, None, None),
                (None, None, None, 3, None, None),
            ],
            key=str,
        )
        assert derived == [(0, 1, 2, 3, None, None)]

    def test_spark_matrix_slot_declares_directed_under_trigger(self, spark):
        """The Spark stage itself: decode(adjacency='matrix',
        mode='trigger') must hand directed_adjacency=True through — the
        split-record output below fails if the stage ever lets the
        symmetric-sniff fallback rebuild the adjacency (the fallback
        merges both components into ONE record, pinned in the pyref
        tests above). Two 4-span components so each record clears
        EquityUnderweight's catalog min_field_num=4."""
        import pyspark.sql.types as T

        from docee_spark.schema import SPANS
        from docee_spark.stages.decode import decode

        def span(text, field):
            return {
                "text": text,
                "field": field,
                "dranges": [{"sent_idx": 0, "char_s": 0, "char_e": len(text)}],
            }

        spans = [
            span("张三", "EquityHolder"),
            span("100股", "TradedShares"),
            span("2020年1月1日", "StartDate"),
            span("2020年2月1日", "EndDate"),
            span("李四", "EquityHolder"),
            span("200股", "TradedShares"),
            span("300股", "LaterHoldingShares"),
            span("5元", "AveragePrice"),
        ]
        adj = [[0] * 8 for _ in range(8)]
        for grp in ((0, 1, 2, 3), (4, 5, 6, 7)):
            for i in grp:
                for j in grp:
                    adj[i][j] = 1  # symmetric, block-diagonal
        row = {
            "doc_id": "d1",
            "sentences": self.SENTS,
            "spans": spans,
            "adj": adj,
        }
        schema = T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("sentences", T.ArrayType(T.StringType())),
                T.StructField("spans", SPANS),
                T.StructField("adj", T.ArrayType(T.ArrayType(T.IntegerType()))),
            ]
        )
        df = spark.createDataFrame([row], schema)
        out = decode(
            df, mode="trigger", adjacency="matrix", exact_fields=True
        ).collect()[0]
        got = sorted(
            (ev["type"], tuple(sorted((k, v) for k, v in ev["args"].items() if v)))
            for ev in out["events"]
        )
        assert got == [
            (
                "EquityUnderweight",
                (
                    ("AveragePrice", "5元"),
                    ("EquityHolder", "李四"),
                    ("LaterHoldingShares", "300股"),
                    ("TradedShares", "200股"),
                ),
            ),
            (
                "EquityUnderweight",
                (
                    ("EndDate", "2020年2月1日"),
                    ("EquityHolder", "张三"),
                    ("StartDate", "2020年1月1日"),
                    ("TradedShares", "100股"),
                ),
            ),
        ]
