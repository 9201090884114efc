"""Distributed BPE training (operators/bpe.py): classic golden, parity
with an independent python reference, application semantics."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from docee_spark.operators.bpe import (
    END_WORD,
    apply_bpe,
    bpe_merge_table,
    train_bpe,
    word_counts,
)

pytestmark = pytest.mark.slow  # driver-loop rounds, ~1 min of tiny jobs


def _bpe_py(wc: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Independent reference: classic dict-of-symbol-tuples BPE with the
    same pinned tie-break (count desc, left asc, right asc)."""
    vocab = {tuple(list(w) + [END_WORD]): n for w, n in wc.items()}
    out = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((a, b, cnt))
        merged = a + b
        new_vocab = {}
        for syms, n in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + n
        vocab = new_vocab
    return out


CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


class TestBPE:
    def test_classic_golden(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges = train_bpe(word_counts(df), n_merges=4)
        # the Sennrich running example: 'es' (9), 'est' (9), 'est</w>' (9),
        # then 'lo' (7)
        got = [(m["left"], m["right"], m["cnt"]) for m in merges]
        assert got == [
            ("e", "s", 9),
            ("es", "t", 9),
            ("est", END_WORD, 9),
            ("l", "o", 7),
        ]

    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        wc = {
            r["word"]: r["n"] for r in word_counts(df).collect()
        }
        want = _bpe_py(wc, 8)
        got = [
            (m["left"], m["right"], m["cnt"])
            for m in train_bpe(word_counts(df), n_merges=8)
        ]
        assert got == want

    def test_apply_bpe_roundtrip(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges = train_bpe(word_counts(df), n_merges=4)
        assert apply_bpe("lowest", merges) == ["lo", "w", "est</w>"]
        assert apply_bpe("low", merges) == ["lo", "w", END_WORD]
        # unseen chars stay atomic
        assert apply_bpe("xyz", merges) == ["x", "y", "z", END_WORD]

    def test_merge_table_shape(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        out = bpe_merge_table(df, n_merges=3)
        rows = out.orderBy("rank").collect()
        assert [r["rank"] for r in rows] == [0, 1, 2]
        assert all(r["merged"] == r["left"] + r["right"] for r in rows)

    def test_tokens_expr_matches_python_application(self, spark):
        from docee_spark.operators.bpe import bpe_tokens_expr

        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges = train_bpe(word_counts(df), n_merges=6)
        words = ["lowest", "low", "newest", "wide", "xyz", "a"]
        wdf = spark.createDataFrame([(w,) for w in words], "word string")
        got = {
            r["word"]: list(r["toks"])
            for r in wdf.select(
                "word", bpe_tokens_expr(F.col("word"), merges).alias("toks")
            ).collect()
        }
        for w in words:
            assert got[w] == apply_bpe(w, merges), w

    def test_early_stop_when_fully_merged(self, spark):
        df = spark.createDataFrame([("aa aa",)], "text string")
        merges = train_bpe(word_counts(df), n_merges=50)
        # 'aa</w>' fuses completely in 2 merges; training stops
        assert len(merges) == 2
