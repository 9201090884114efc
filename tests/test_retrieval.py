"""BM25 retrieval tests (operators/retrieval.py): a textbook float
BM25 differential (ranking identity + e6-score proximity), the frozen
integer contract vs DuckDB, tie determinism, and the overflow bound the
docstring promises.
"""
from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from docee_spark.operators.retrieval import bm25_sql, bm25_topk

DOCS = [
    (0, "spark joins tables fast and spark scans stay fast"),
    (1, "the query planner reorders a join"),
    (2, "slow full scans hurt every query"),
    (3, "join join join"),  # tf saturation case
    (4, "completely unrelated words about weather and rain"),
    (5, "spark"),
    (6, ""),  # empty doc: dl = 0, never matches
    (7, "fast fast fast fast fast fast fast fast fast fast"),
]


def textbook_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent float implementation straight from the formula."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = total / n
    scores = {}
    for term in set(terms):
        dfreq = sum(1 for v in toks.values() if term in v)
        if dfreq == 0:
            continue
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1)
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestBm25:
    def test_matches_textbook_float_reference(self, docs_df):
        terms = ["spark", "join", "fast"]
        got = {
            r.doc_id: r.score_e6
            for r in bm25_topk(docs_df, terms, k=8).collect()
        }
        want = textbook_bm25([(i, t) for i, t in DOCS], terms)
        assert set(got) == set(want)
        for i, s in want.items():
            # integer contract floors per term: within len(terms) ulps of e6
            assert abs(got[i] - s * 1e6) <= len(terms) + 2
        # ranking identity (floats well separated here)
        want_rank = sorted(want, key=lambda i: (-want[i], i))
        got_rank = sorted(got, key=lambda i: (-got[i], i))
        assert got_rank == want_rank

    def test_duckdb_oracle_bit_exact(self, docs_df):
        terms = ["spark", "join", "fast"]
        got = [tuple(r) for r in bm25_topk(docs_df, terms, k=8).collect()]
        con = duckdb.connect()
        con.execute("create table documents (doc_id bigint, text varchar)")
        con.executemany("insert into documents values (?, ?)", DOCS)
        want = con.execute(bm25_sql(terms, k=8)).fetchall()
        assert got == want

    def test_unmatched_terms_and_docs_absent(self, docs_df):
        out = bm25_topk(docs_df, ["nonexistent", "weather"], k=8).collect()
        assert [r.doc_id for r in out] == [4]
        assert out[0].n_terms_matched == 1

    def test_tie_break_is_doc_id_ascending(self, spark):
        df = spark.createDataFrame(
            [(i, "same text here") for i in range(6)], "doc_id long, text string"
        )
        out = bm25_topk(df, ["same"], k=3).collect()
        assert [r.doc_id for r in out] == [0, 1, 2]
        assert len({r.score_e6 for r in out}) == 1

    def test_tf_saturation_monotone_but_bounded(self, docs_df):
        # doc 3 repeats 'join' 3x; saturation must keep it from dwarfing
        # a one-hit doc by 3x (k1 = 1.2 caps the tf gain below 2.2x)
        got = {
            r.doc_id: r.score_e6
            for r in bm25_topk(docs_df, ["join"], k=8).collect()
        }
        assert got[3] > got[1]
        assert got[3] < got[1] * 3

    def test_overflow_bound_documented(self):
        # docstring bound: numerator idf_e6·22·tf·T must fit int64 while
        # tf·T < 1.6e10, worst-case idf_e6 = ln(2N+2)·1e6 with N ≤ T
        idf = math.floor(math.log(2 * 1.6e10 + 2) * 1e6)
        assert idf * 22 * 1.6e10 < 2**63
