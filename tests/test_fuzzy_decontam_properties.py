"""Differential property suite for decontaminate_fuzzy.

The engine's fuzzy decontamination (operators/dedup.py) is compared
row-for-row against a from-scratch pure-Python evaluator on random
corpora with planted overlap structure: same 3-gram grammar, exact
integer floor(|∩|·10⁶/|∪|) scores, the (−j, eval_id) argmax tie-break,
and the tau flag. One hypothesis example = one corpus = one Spark job,
so any grammar / arithmetic / tie-break divergence surfaces as a
concrete failing example rather than an oracle hash mismatch."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

# small vocab + short docs → dense gram collisions, including exact and
# near-exact overlaps; lengths 0-2 exercise the sub-n empty-gram branch
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10).map(
    " ".join
)


def _grams(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.strip().split() if t]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _expected(corpus, evals, n=3, tau_e6=100_000):
    out = {}
    ev = [(i, _grams(t, n)) for i, t in evals]
    for doc_id, text in corpus:
        dg = _grams(text, n)
        best = None
        for eval_id, eg in ev:
            inter = len(dg & eg)
            if inter == 0:
                continue
            j = (inter * 1_000_000) // (len(dg) + len(eg) - inter)
            key = (-j, eval_id)
            if best is None or key < best[0]:
                best = (key, eval_id, j)
        if best is None:
            out[doc_id] = (len(dg), None, 0, 0)
        else:
            _, eval_id, j = best
            out[doc_id] = (len(dg), eval_id, j, int(j >= tau_e6))
    return out


@st.composite
def _split_corpus(draw):
    """→ (corpus rows, eval rows) with copied/overlapping texts planted
    across the split so high-Jaccard pairs actually occur."""
    corpus = draw(st.lists(_doc, min_size=2, max_size=8))
    evals = draw(st.lists(_doc, min_size=1, max_size=4))
    # plant: copy an eval doc (exact J=1 when non-empty) and a prefix
    # extension of one (high-but-sub-1 J) into the corpus
    corpus = corpus + [evals[0], (evals[0] + " alpha beta gamma").strip()]
    return (
        [(i, t) for i, t in enumerate(corpus)],
        [(100 + i, t) for i, t in enumerate(evals)],
    )


class TestFuzzyDecontamDifferential:
    @settings(max_examples=8, deadline=None)
    @given(data=_split_corpus())
    def test_matches_pure_python_reference(self, spark, data):
        from docee_spark.operators.dedup import decontaminate_fuzzy

        corpus_rows, eval_rows = data
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        evald = spark.createDataFrame(eval_rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_grams"],
                r["best_eval_id"],
                r["jaccard_e6"],
                r["contaminated"],
            )
            for r in decontaminate_fuzzy(corpus, evald, n=3).collect()
        }
        assert got == _expected(corpus_rows, eval_rows)
