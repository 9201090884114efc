"""Verified canonicalization (stages/canonicalize.py:
canonicalize_verified): blocking-vs-matching discipline — near-dup
surfaces merge, band-colliding-but-dissimilar surfaces do NOT, threshold
monotonicity, dictionary override."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docee_spark.stages.canonicalize import canonicalize, canonicalize_verified

# label-propagation e2e per case (~1 min total) — slow loop; the verified
# oracle also runs in test_entry_queries[docee_vertices_verified]
pytestmark = pytest.mark.slow

COLS = "doc_id long, event_type string, recguid long, subj string, pred string, obj string"


_OBJS = ("krakow", "umbrella", "fjord")  # pairwise shingle-disjoint


def _trips(spark, surfaces):
    rows = [(i, "e", 0, s, "rel", _OBJS[i % 3]) for i, s in enumerate(surfaces)]
    return spark.createDataFrame(rows, COLS)


def _vmap(vertices):
    out = {}
    for r in vertices.collect():
        out.setdefault(r["entity_id"], set()).add(r["surface"])
    return out


class TestCanonicalizeVerified:
    def test_near_dups_merge_dissimilar_stay(self, spark):
        trips = _trips(
            spark,
            [
                "acme corporation",
                "acme corporation.",   # jaccard ≈ 16/17 — merges
                "acme corporation ltd",  # still high overlap — merges
                "zenith holdings",       # unrelated — stays
            ],
        )
        v, e = canonicalize_verified(trips, jaccard_e4=6000)
        surfaces_by_entity = {}
        for r in v.collect():
            # every surface maps somewhere; group membership via edges
            surfaces_by_entity[r["entity_id"]] = r
        # resolve each subj surface to its entity via the edge table
        subj_ids = {
            r["doc_id"]: r["src"] for r in e.filter(F.col("pred") == "rel").collect()
        }
        assert subj_ids[0] == subj_ids[1] == subj_ids[2]
        assert subj_ids[3] != subj_ids[0]

    def test_precision_vs_lsh_only(self, spark):
        # two surfaces similar enough to share an LSH band occasionally
        # but with low true jaccard must NOT merge under verification.
        # Construct a guaranteed band collision: identical first shingles
        # dominate the minhash for these two (verified by low jaccard).
        a = "alpha beta gamma delta"
        b = "alpha beta completely different tail of text"
        trips = _trips(spark, [a, b])
        v, _ = canonicalize_verified(trips, jaccard_e4=6000)
        assert v.count() == 2 + 2  # 2 subj entities + 2 obj entities

    def test_threshold_monotone(self, spark):
        surfaces = [
            "acme corporation",
            "acme corporation.",
            "acme corp",
            "acme inc",
            "zenith holdings",
        ]
        trips = _trips(spark, surfaces)
        lo = canonicalize_verified(trips, jaccard_e4=3000)[0].count()
        hi = canonicalize_verified(trips, jaccard_e4=9500)[0].count()
        assert lo <= hi  # stricter threshold → fewer merges → more vertices

    def test_case_variants_always_merge(self, spark):
        trips = _trips(spark, ["Acme Corp", "acme corp", "ACME CORP"])
        v, _ = canonicalize_verified(trips)
        subj_entities = {
            r["entity_id"]
            for r in v.collect()
            if r["surface"].lower().startswith("acme")
        }
        assert len(subj_entities) == 1
        assert v.filter(F.col("surface") == "ACME CORP").collect()[0][
            "n_mentions"
        ] == 3

    def test_dictionary_override_wins(self, spark):
        trips = _trips(spark, ["acme corporation", "acme corporation."])
        d = spark.createDataFrame(
            [("acme corporation", "KB:ACME")], "surface string, entity_id string"
        )
        v, _ = canonicalize_verified(trips, entity_dict=d)
        ids = {r["surface"]: r["entity_id"] for r in v.collect()}
        assert ids.get("acme corporation") == "KB:ACME"

    def test_no_pairs_all_singletons(self, spark):
        trips = _trips(spark, ["aaa bbb", "ccc ddd", "eee fff"])
        v, _ = canonicalize_verified(trips)
        # 3 subj + 3 obj entities, nothing merged
        assert v.count() == 6

    def test_more_conservative_than_lsh_only(self, spark):
        surfaces = [f"entity number {i} of the corpus" for i in range(12)]
        trips = _trips(spark, surfaces)
        v_lsh = canonicalize(trips)[0].count()
        v_ver = canonicalize_verified(trips, jaccard_e4=9000)[0].count()
        assert v_ver >= v_lsh
