"""ExactSubstr duplicated-span dedup (operators/dedup.py::duplicated_spans).

Unit cases pin the island semantics (cross-doc spans, within-doc repeats,
the touch-merge rule, passthrough) and the strip policy (ALL copies
removed — Lee et al. 2022's actual behavior — with untouched docs
byte-identical). The hypothesis test runs the whole operator
differentially against a from-scratch pure-Python witness (dict-count
rolling windows + interval union), small vocab so duplicate k-grams are
common.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

K = 4

_WORDS = ["a", "b", "c"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(
    " ".join
)


def _py_spans(rows: list[tuple[int, str]], k: int) -> set[tuple[int, int, int, int]]:
    """Independent witness: → {(doc_id, start, end, n_dup_windows)}."""
    wins: dict[tuple[int, int], tuple[str, ...]] = {}
    counts: dict[tuple[str, ...], int] = {}
    for doc_id, text in rows:
        toks = text.split()
        for p in range(len(toks) - k + 1):
            g = tuple(toks[p : p + k])
            wins[(doc_id, p)] = g
            counts[g] = counts.get(g, 0) + 1
    dup_pos: dict[int, list[int]] = {}
    for (doc_id, p), g in wins.items():
        if counts[g] >= 2:
            dup_pos.setdefault(doc_id, []).append(p)
    out = set()
    for doc_id, ps in dup_pos.items():
        ps.sort()
        islands: list[list[int]] = [[ps[0]]]
        for p in ps[1:]:
            if p <= islands[-1][-1] + k:
                islands[-1].append(p)
            else:
                islands.append([p])
        for isl in islands:
            out.add((doc_id, isl[0], isl[-1] + k, len(isl)))
    return out


def _spark_spans(spark, rows, k=K):
    from docee_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_windows"])
        for r in duplicated_spans(df, k=k).collect()
    }


DUP8 = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


class TestDuplicatedSpans:
    def test_cross_doc_span_and_passthrough(self, spark):
        rows = [
            (1, f"one two three {DUP8} four five"),
            (2, f"{DUP8} completely different tail follows here"),
            (3, "no duplicate content in this document at all whatsoever"),
        ]
        assert _spark_spans(spark, rows, k=8) == {
            (1, 3, 11, 1),
            (2, 0, 8, 1),
        }

    def test_within_doc_repeat_counts(self, spark):
        # "self" x10: windows at 0,1,2 all hash equal -> one island [0,10)
        rows = [(4, " ".join(["self"] * 10))]
        assert _spark_spans(spark, rows, k=8) == {(4, 0, 10, 3)}

    def test_touching_islands_merge(self, spark):
        # doc A = X Y where X and Y are each duplicated elsewhere but the
        # bridging windows (straddling the X|Y boundary) are unique:
        # dup windows at pos 0 and pos 8 touch (8 <= 0 + 8) -> ONE span.
        x = "x1 x2 x3 x4 x5 x6 x7 x8"
        y = "y1 y2 y3 y4 y5 y6 y7 y8"
        rows = [
            (1, f"{x} {y}"),
            (2, f"{x} unrelated trailing words here now"),
            (3, f"{y} other unrelated trailing words now"),
        ]
        spans = _spark_spans(spark, rows, k=8)
        assert (1, 0, 16, 2) in spans

    def test_gapped_islands_stay_separate(self, spark):
        x = "x1 x2 x3 x4 x5 x6 x7 x8"
        y = "y1 y2 y3 y4 y5 y6 y7 y8"
        # 9 unique tokens between -> gap > k, two spans in doc 1
        mid = "m1 m2 m3 m4 m5 m6 m7 m8 m9"
        rows = [
            (1, f"{x} {mid} {y}"),
            (2, f"{x} unrelated trailing words here now"),
            (3, f"{y} other unrelated trailing words now"),
        ]
        spans = _spark_spans(spark, rows, k=8)
        assert {(s, e) for d, s, e, n in spans if d == 1} == {(0, 8), (17, 25)}

    def test_short_docs_emit_nothing(self, spark):
        rows = [(1, "too short"), (2, "too short"), (3, "")]
        assert _spark_spans(spark, rows, k=8) == set()

    def test_strip_removes_all_copies_and_passes_through(self, spark):
        from docee_spark.operators.dedup import strip_duplicated_spans

        untouched = "no duplicate content in this document at all whatsoever"
        rows = [
            (1, f"one two three {DUP8} four five"),
            (2, f"{DUP8} completely different tail follows here"),
            (3, untouched),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_tokens_removed"])
            for r in strip_duplicated_spans(df, k=8).collect()
        }
        assert got[1] == ("one two three four five", 8)
        assert got[2] == ("completely different tail follows here", 8)
        assert got[3] == (untouched, 0)  # byte-identical passthrough

    @settings(max_examples=8, deadline=None)
    @given(rows=st.lists(_doc, min_size=1, max_size=6).map(
        lambda ds: list(enumerate(ds))
    ))
    def test_matches_pure_python_witness(self, spark, rows):
        assert _spark_spans(spark, rows, k=K) == _py_spans(rows, k=K)
