"""Unigram-LM surprisal (operators/lm.py): exact fixed-point parity with
a python reference, OOV accounting, vocabulary boundary, empty docs, and
the quality-signal ordering (rare-token text scores higher)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from docee_spark.operators.lm import E6, lm_surprisal, train_unigram_lm

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat and the dog"),
    (3, ""),
    (4, "zzyzx qwfp zzyzx"),  # rare tokens (in-vocab but low count)
]


def _ref_scores(rows, vocab_size):
    toks = {i: t.lower().split() for i, t in rows}
    counts = Counter(w for ws in toks.values() for w in ws)
    total = sum(counts.values())
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    lnt = math.floor(math.log(total) * E6)
    logp = {w: math.floor(math.log(n) * E6) - lnt for w, n in vocab}
    out = {}
    for i, ws in toks.items():
        if not ws:
            out[i] = (0, 0, 0)
            continue
        lps = [logp.get(w, -lnt) for w in ws]
        oov = sum(1 for w in ws if w not in logp)
        neg = -sum(lps)
        n = len(ws)
        out[i] = (n, oov, (neg - (neg % n + n) % n) // n)
    return out


class TestUnigramLM:
    def _spark_scores(self, spark, rows, vocab_size):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        lm = train_unigram_lm(df, vocab_size=vocab_size)
        return {
            r["doc_id"]: (r["n_tokens"], r["n_oov"], r["surprisal_e6"])
            for r in lm_surprisal(df, lm).collect()
        }

    def test_matches_python_reference(self, spark):
        got = self._spark_scores(spark, CORPUS, vocab_size=64)
        assert got == _ref_scores(CORPUS, 64)

    def test_vocab_boundary_and_oov(self, spark):
        # vocab_size=3 keeps only {the, cat, dog} (count desc, token asc);
        # everything else is OOV and must be counted
        got = self._spark_scores(spark, CORPUS, vocab_size=3)
        want = _ref_scores(CORPUS, 3)
        assert got == want
        assert got[4][1] == 3  # all three rare tokens OOV

    def test_empty_doc_scores_zero(self, spark):
        got = self._spark_scores(spark, CORPUS, vocab_size=64)
        assert got[3] == (0, 0, 0)

    def test_rare_text_scores_higher(self, spark):
        got = self._spark_scores(spark, CORPUS, vocab_size=64)
        # the rare-token doc must carry higher mean surprisal than the
        # stopword-heavy docs — the quality-band signal
        assert got[4][2] > got[0][2]

    def test_scoring_out_of_corpus_docs(self, spark):
        train = spark.createDataFrame(CORPUS, "doc_id long, text string")
        lm = train_unigram_lm(train, vocab_size=64)
        new = spark.createDataFrame(
            [(100, "the cat sat"), (101, "unseen wordsoup entirely")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r for r in lm_surprisal(new, lm).collect()
        }
        assert got[100]["n_oov"] == 0
        assert got[101]["n_oov"] == 3
        assert got[101]["surprisal_e6"] > got[100]["surprisal_e6"]
