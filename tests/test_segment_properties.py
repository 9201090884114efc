"""Differential fuzz: Spark codegen segmentation vs pyref ``sent_seg``.

Segmentation feeds every downstream stage (tagging, decode, eval), and
the corpus parity test only covers the fixture corpus' character
distribution. The fuzz alphabet deliberately includes CRLF line
endings, tabs and quote runs — ubiquitous in web text — where a
space-only trim would diverge from the reference's ``str.strip()``
(phantom ``"\\r"`` sentences, trailing tabs on sentence boundaries).

ASCII whitespace only: Python ``str.strip()`` and Java regex ``\\s``
agree there; unicode whitespace (NBSP etc.) is a documented boundary —
Python strips it, JVM-side expressions do not."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_FRAGS = [
    "hello world",
    "ok.",
    "what?!",
    "嗯。",
    "什么？！",
    "再见…",
    'he said."',
    "end.'",
    "a.b",
    "x!?'\"",
    "。",
    ".",
    "\r\n",
    "\n",
    "\t",
    " ",
    "\r",
    "",
    "mixed。bag.",
]

_text = st.lists(st.sampled_from(_FRAGS), min_size=0, max_size=10).map("".join)
_lang = st.sampled_from(["en", "zh"])


class TestSegmentMatchesPyref:
    @settings(max_examples=10, deadline=None)
    @given(rows=st.lists(st.tuples(_text, _lang), min_size=10, max_size=40))
    def test_sentences_match_sent_seg(self, spark, rows):
        from docee_spark.pyref.textproc import sent_seg
        from docee_spark.stages.segment import segment

        df = spark.createDataFrame(
            [(i, t, l) for i, (t, l) in enumerate(rows)],
            "doc_id long, text string, lang string",
        )
        got = {
            r["doc_id"]: list(r["sentences"])
            for r in segment(
                df, max_sent_num=10_000, max_sent_len=100_000
            ).collect()
        }
        for i, (t, l) in enumerate(rows):
            want = sent_seg(t, lang=l)
            assert got[i] == want, (repr(t), l, got[i], want)
