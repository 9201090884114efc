"""Collocation/PMI mining (operators/textstats.py:collocations) and
recrawl churn detection (stages/ingest.py:recrawl_churn).

Differential strategy: pure-python witnesses recompute both from first
principles (collections.Counter for PMI; hashlib for churn) on small
corpora, including the freeze arithmetic, so the Spark expressions are
checked value-for-value.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from docee_spark.operators.textstats import collocations
from docee_spark.stages.ingest import recrawl_churn


def ln_e6(c: int) -> int:
    return math.floor(1_000_000 * math.log(c))


def py_collocations(texts, min_pair_count):
    uni, pair, n_tok, n_bg = Counter(), Counter(), 0, 0
    for t in texts:
        toks = t.split()
        uni.update(toks)
        n_tok += len(toks)
        if len(toks) >= 2:
            pair.update(zip(toks, toks[1:]))
            n_bg += len(toks) - 1
    out = {}
    for (w1, w2), c in pair.items():
        if c < min_pair_count:
            continue
        pmi = (
            ln_e6(c)
            + 2 * ln_e6(n_tok)
            - ln_e6(n_bg)
            - ln_e6(uni[w1])
            - ln_e6(uni[w2])
        )
        out[(w1, w2)] = (c, uni[w1], uni[w2], pmi)
    return out


class TestCollocations:
    def test_differential(self, spark):
        texts = [
            "new york is big and new york is old",
            "york new never occurs as new york does",
            "big apple big apple big apple",
            "  padded   whitespace new york  ",
            "single",
            "",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = {
            (r["w1"], r["w2"]): (
                r["pair_n"], r["w1_n"], r["w2_n"], r["pmi_e6"]
            )
            for r in collocations(df, min_pair_count=2).collect()
        }
        assert got == py_collocations(texts, 2)
        # the collocation ("new","york") must outrank the chance pair
        # ("is","big")-style combinations of frequent tokens
        assert ("new", "york") in got

    def test_min_count_prunes(self, spark):
        df = spark.createDataFrame(
            [("a b",), ("a b",), ("c d",)], "text string"
        )
        got = collocations(df, min_pair_count=2).collect()
        assert [(r["w1"], r["w2"]) for r in got] == [("a", "b")]

    def test_no_python_udf_in_plan(self, spark):
        df = spark.createDataFrame([("x y x y",)], "text string")
        plan = (
            collocations(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def py_churn(rows, canonicalize=False):
    # rows: (url, ts_int, text); returns url -> tuple
    by = {}
    for url, ts, text in rows:
        fp = hashlib.md5(text.encode()).hexdigest()
        by.setdefault(url, []).append((ts, fp))
    out = {}
    for url, caps in by.items():
        caps.sort()
        changes = sum(
            1 for i in range(1, len(caps)) if caps[i][1] != caps[i - 1][1]
        )
        n = len(caps)
        churn = (10_000 * changes) // (n - 1) if n >= 2 else 0
        out[url] = (n, changes, churn, caps[0][0], caps[-1][0])
    return out


class TestRecrawlChurn:
    def rows(self):
        return [
            ("u1", 1, "alpha"), ("u1", 2, "alpha"), ("u1", 3, "beta"),
            ("u1", 4, "beta"), ("u1", 5, "gamma"),   # 2 changes / 4 gaps
            ("u2", 1, "same"), ("u2", 9, "same"),    # 0 changes
            ("u3", 7, "only"),                       # single capture
            ("u4", 1, "a"), ("u4", 2, "b"), ("u4", 3, "a"),  # flip-flop
        ]

    def test_differential(self, spark):
        df = spark.createDataFrame(
            [(u, t, x) for u, t, x in self.rows()],
            "url string, warc_ts long, text string",
        )
        got = {
            r["canonical_url"]: (
                r["n_captures"], r["n_changes"], r["churn_e4"],
                r["first_ts"], r["last_ts"],
            )
            for r in recrawl_churn(df, canonicalize=False).collect()
        }
        assert got == py_churn(self.rows())
        assert got["u1"] == (5, 2, 5000, 1, 5)
        assert got["u4"] == (3, 2, 10000, 1, 3)

    def test_equal_ts_equal_text_deterministic(self, spark):
        # two captures at the same timestamp with the same text: the fp
        # tiebreak orders them; no change either way.
        df = spark.createDataFrame(
            [("u", 1, "x"), ("u", 1, "x"), ("u", 2, "y")],
            "url string, warc_ts long, text string",
        )
        r = recrawl_churn(df, canonicalize=False).collect()[0]
        assert (r["n_captures"], r["n_changes"]) == (3, 1)

    def test_canonicalize_merges_variants(self, spark):
        df = spark.createDataFrame(
            [
                ("https://WWW.Ex.com/a?utm_source=x", 1, "v1"),
                ("https://ex.com/a", 2, "v2"),
            ],
            "url string, warc_ts long, text string",
        )
        rows = recrawl_churn(df).collect()
        assert len(rows) == 1 and rows[0]["n_changes"] == 1

    def test_single_exchange_plan(self, spark):
        df = spark.createDataFrame(
            [("u", 1, "x")], "url string, warc_ts long, text string"
        )
        plan = (
            recrawl_churn(df, canonicalize=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # window + groupBy share the canonical_url hash partitioning:
        # exactly one shuffle, and no Python in the plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
