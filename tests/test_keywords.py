"""keywords_tfidf tests (operators/textstats.py): brute-force python
differential over the frozen integer contract, idf-direction sanity
(rare beats ubiquitous), window-pin determinism, and DuckDB parity.
"""
from __future__ import annotations

import math

import duckdb
import pytest

from docee_spark.operators.textstats import keywords_tfidf, keywords_tfidf_sql

DOCS = [
    (0, "alpha alpha alpha common common"),
    (1, "beta common gamma gamma"),
    (2, "common alpha beta beta beta beta"),
    (3, "delta"),
    (4, "common common common common"),
]


def brute(docs, k=3):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    dfreq = {}
    for v in toks.values():
        for t in set(v):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for i, v in toks.items():
        scores = {}
        for t in set(v):
            idf = math.floor(math.log(n + 1) * 1e6) - math.floor(
                math.log(dfreq[t]) * 1e6
            )
            scores[t] = v.count(t) * idf
        top = sorted(scores, key=lambda t: (-scores[t], t))[:k]
        out[i] = [(t, r + 1, scores[t]) for r, t in enumerate(top)]
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestKeywords:
    def test_matches_brute_force(self, docs_df):
        got = {}
        for r in keywords_tfidf(docs_df, k=3).collect():
            got.setdefault(r.doc_id, []).append((r.keyword, r.rank, r.score_e6))
        for i in got:
            got[i].sort(key=lambda x: x[1])
        assert got == brute(DOCS)

    def test_rare_term_outranks_ubiquitous(self, docs_df):
        # 'common' appears in every doc — its idf (= ln6 - ln5 at e6) is
        # tiny; doc 1's top keyword must be the doc-local repeat 'gamma'
        top = {
            r.doc_id: r.keyword
            for r in keywords_tfidf(docs_df, k=1).collect()
        }
        assert top[1] == "gamma"
        assert top[0] == "alpha"
        assert top[4] == "common"  # only token left still wins its own doc

    def test_duckdb_oracle_bit_exact(self, docs_df):
        got = sorted(tuple(r) for r in keywords_tfidf(docs_df, k=3).collect())
        con = duckdb.connect()
        con.execute("create table documents (doc_id bigint, text varchar)")
        con.executemany("insert into documents values (?, ?)", DOCS)
        want = sorted(con.execute(keywords_tfidf_sql(k=3)).fetchall())
        assert got == want
