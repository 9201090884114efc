"""Exact-duplicate recall guarantee across the near-dup family.

Every candidate generator in operators/dedup.py is allowed to MISS
near-duplicates (that's what LSH trades away) but must NEVER miss an
EXACT duplicate below the bucket caps: identical text hashes to
identical shingles, signatures, bands and bits, so both copies land in
the same bucket by construction. A violation means the banding or
signature math is broken in a way recall curves on random corpora may
not surface.

Property: plant exact-copy groups in a random corpus; every planted
same-text pair must appear in the emitted pairs of minhash-LSH,
verified-minhash, n-gram Jaccard, and simhash64 (hamming 0). One
hypothesis example = one corpus = one Spark job per operator."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=4, max_size=12).map(
    " ".join
)


@st.composite
def _corpus(draw):
    """→ list[(doc_id, text)] with ≥1 planted exact-copy group."""
    base = draw(st.lists(_doc, min_size=3, max_size=8, unique=True))
    # plant 1-3 duplicate groups: copy an existing doc 1-2 more times
    n_groups = draw(st.integers(1, min(3, len(base))))
    docs = list(base)
    for g in range(n_groups):
        docs.extend([base[g]] * draw(st.integers(1, 2)))
    return list(enumerate(docs))


def _expected_pairs(rows):
    by_text: dict[str, list[int]] = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    want = set()
    for ids in by_text.values():
        for a in ids:
            for b in ids:
                if a < b:
                    want.add((a, b))
    return want


class TestExactDupRecall:
    @settings(max_examples=6, deadline=None)
    @given(rows=_corpus())
    def test_every_candidate_generator_finds_exact_copies(self, spark, rows):
        from docee_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_verified_pairs,
            ngram_jaccard_pairs,
            simhash_near_duplicates,
        )

        want = _expected_pairs(rows)
        if not want:
            return
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for op, kw in [
            (minhash_lsh_pairs, {}),
            (minhash_verified_pairs, {"threshold_e4": 10000}),
            (ngram_jaccard_pairs, {"threshold_e4": 10000}),
            (simhash_near_duplicates, {"max_hamming": 0}),
        ]:
            got = {
                (r["doc_a"], r["doc_b"])
                for r in op(df, **kw).select("doc_a", "doc_b").collect()
            }
            missed = want - got
            assert not missed, (op.__name__, sorted(missed), sorted(got))
