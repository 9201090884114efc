"""Differential property tests for ``pii_scrub``.

Two independent witnesses over adversarial PII-laden text (ASCII, so
Java and Python regex ``\\d``/``\\b`` semantics coincide):

1. **Differential**: per-rule counts AND the md5 of the fully-scrubbed
   text must equal a pure-Python ``re`` evaluation of the same rule
   chain (sequential, leftmost, greedy — both engines' default).
2. **Idempotence**: scrubbing already-scrubbed text finds nothing and
   leaves the fingerprint unchanged — replacement tokens must never
   combine with surrounding text into a fresh match, or a two-pass
   hygiene pipeline would report phantom PII.

Batched like tests/test_url_properties.py: one hypothesis example =
one document list = one Spark job."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_FRAGS = [
    "plain words here",
    "a@b.com",
    "x.y+z@mail.example.org",
    "foo@@bar.com",
    "@nolocal.com",
    "trailing@dot.",
    "1.2.3.4",
    "10.0.0.255 end",
    "1.2.3.4567",
    "1.2.3.4.5.6.7.8",
    "+12345678901",
    "+1-234-567-8901",
    "+1234567",
    "++12345678901",
    "+123456789a@b.co",
    "call +49-170-1234567 now",
    "v1.2.30",
    "a1.2.3.4b",
    "<EMAIL>",
    "<IP>",
    "<PHONE>",
    "@",
    "+",
    ".",
    "-",
    " ",
]

_doc = st.lists(st.sampled_from(_FRAGS), min_size=0, max_size=8).map("".join)


def _py_scrub(text: str, rules) -> tuple[list[int], str]:
    counts = []
    for _, pat, repl in rules:
        counts.append(len(re.findall(pat, text)))
        text = re.sub(pat, repl, text)
    return counts, text


class TestPiiScrubProperties:
    @settings(max_examples=10, deadline=None)
    @given(docs=st.lists(_doc, min_size=10, max_size=40))
    def test_counts_and_fingerprint_match_python_re(self, spark, docs):
        from docee_spark.operators.textstats import PII_RULES, pii_scrub

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        for i, text in enumerate(docs):
            counts, scrubbed = _py_scrub(text, PII_RULES)
            fp = hashlib.md5(scrubbed.encode("utf-8")).hexdigest()
            row = got[i]
            assert [row["n_emails"], row["n_ips"], row["n_phones"]] == counts, (
                text,
                counts,
                row,
            )
            assert row["redacted_fp"] == fp, (text, scrubbed)

    @settings(max_examples=10, deadline=None)
    @given(docs=st.lists(_doc, min_size=10, max_size=40))
    def test_scrub_is_idempotent(self, spark, docs):
        from docee_spark.operators.textstats import PII_RULES, pii_scrub

        scrubbed = [_py_scrub(t, PII_RULES)[1] for t in docs]
        df = spark.createDataFrame(
            list(enumerate(scrubbed)), "doc_id long, text string"
        )
        for row in pii_scrub(df).collect():
            i = row["doc_id"]
            assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (0, 0, 0), (
                docs[i],
                scrubbed[i],
                row,
            )
            fp = hashlib.md5(scrubbed[i].encode("utf-8")).hexdigest()
            assert row["redacted_fp"] == fp
