"""Delta-proportional incremental canonicalization
(stages/canonicalize.py: CanonState / canonicalize_state /
merge_triples_incremental): PROVEN equivalence to the full-recompute
``merge_triples`` across every way a recrawl batch can perturb the
cluster structure — MERGE (a new surface bridges two old clusters),
SPLIT (the bridge doc is deleted), RE-LABEL (a new lexicographic
minimum joins a cluster), count-only changes, pure insertions and
deletions, chained batches, dictionary overrides, and the fallback
guard. Each scenario checks the public tables (vertices, edges,
triples) AND the internal state (resolved, membership) against a cold
rebuild, so a chained state can never drift.

Fixture surfaces were chosen empirically so the scenarios genuinely
exercise the claimed topology (k=8, bands=4, rows=2 band collisions):
X ~ B and B ~ Y collide but X !~ Y (B is a true bridge); AEN collides
with the ZEN cluster and sorts before its current representative.
Collisions are hash-derivation-specific: these surfaces were re-searched
for the one-md5-four-lanes derivation (lane i = substring(md5((i//4)|s),
8*(i%4)+1, 8)) when it replaced one-md5-per-lane; any future lane-spec
change must re-search them with tools/band_fixture_search.py (verify /
replica / xby / chain modes — the replica is asserted lane-identical to
minhash_sig_frame before searching).
"""

from __future__ import annotations

import pytest

from docee_spark.stages.canonicalize import (
    canonicalize_state,
    merge_triples,
    merge_triples_incremental,
)

# several cold-rebuild differentials per scenario (~2 min total) — slow
# loop; the operator also backs the in-window kg_incremental oracle
pytestmark = pytest.mark.slow

COLS = "doc_id long, event_type string, recguid long, subj string, pred string, obj string"

X = "psi vector xi neutron iota tau"
B = "xi neutron iota tau matrix eta"  # bridges X and Y
Y = "neutron iota tau matrix eta rho"
ZEN = "zenith quantum holdings group"
ZEN2 = "zenith quantum holdings groupx"
AEN = "aenith quantum holdings group"  # collides with ZEN*, sorts first
FAR = "completely unrelated surface"


def _t(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_equiv(state, old, delta, deleted=None, entity_dict=None):
    """state == merge_triples full recompute == cold state rebuild."""
    merged, v, e = merge_triples(old, delta, deleted, entity_dict=entity_dict)
    assert _rows(state.triples) == _rows(merged)
    assert _rows(state.vertices) == _rows(v)
    assert _rows(state.edges) == _rows(e)
    cold = canonicalize_state(merged, entity_dict=entity_dict)
    assert _rows(state.resolved) == _rows(cold.resolved)
    assert _rows(state.membership) == _rows(cold.membership)
    assert _rows(state.edges_full) == _rows(cold.edges_full)


def _eids(state):
    return {r["surface"]: r["entity_id"] for r in state.resolved.collect()}


class TestClusterMerge:
    def test_new_bridge_merges_two_old_clusters(self, spark):
        old = _t(
            spark,
            [
                (1, "e", 0, X, "p", "v1"),
                (2, "e", 0, Y, "p", "v2"),
                (3, "e", 0, FAR, "p", "v3"),
            ],
        )
        s0 = canonicalize_state(old)
        ids0 = _eids(s0)
        assert ids0[X] != ids0[Y]  # genuinely separate before

        delta = _t(spark, [(9, "e", 0, B, "p", "v9")])
        s1 = merge_triples_incremental(s0, delta)
        ids1 = _eids(s1)
        assert ids1[X] == ids1[B] == ids1[Y]  # bridge merged them
        assert ids1[FAR] == ids0[FAR]  # disjoint component untouched
        assert s1.stats["fallback"] is False
        # Y's doc was NOT re-extracted, but its edge rows re-resolved
        d2 = [r for r in s1.edges.collect() if r["doc_id"] == 2]
        assert d2[0]["src"] == ids1[X]
        _assert_equiv(s1, old, delta)

    def test_affected_region_is_delta_local(self, spark):
        # 60 mutually-far surfaces + the bridge scenario: the BFS must
        # touch only the X/B/Y component, not the corpus
        filler = [
            (100 + i, "e", 0, f"filler surface number {i:04d}", "p", f"o{i}")
            for i in range(60)
        ]
        old = _t(
            spark,
            [(1, "e", 0, X, "p", "v1"), (2, "e", 0, Y, "p", "v2")] + filler,
        )
        s0 = canonicalize_state(old)
        delta = _t(spark, [(9, "e", 0, B, "p", "v9")])
        s1 = merge_triples_incremental(s0, delta)
        assert s1.stats["new_surfaces"] <= 2  # B and "v9"
        assert s1.stats["affected_surfaces"] <= 5
        assert s1.stats["rep_changed_surfaces"] <= 5
        _assert_equiv(s1, old, delta)


class TestClusterSplit:
    def test_deleting_bridge_doc_splits_cluster(self, spark):
        old = _t(
            spark,
            [
                (1, "e", 0, X, "p", "v1"),
                (2, "e", 0, B, "p", "v2"),
                (3, "e", 0, Y, "p", "v3"),
            ],
        )
        s0 = canonicalize_state(old)
        ids0 = _eids(s0)
        assert ids0[X] == ids0[B] == ids0[Y]

        deleted = spark.createDataFrame([(2,)], "doc_id long")
        s1 = merge_triples_incremental(s0, _t(spark, []), deleted)
        ids1 = _eids(s1)
        assert B not in ids1  # surface removed with its only doc
        assert ids1[X] != ids1[Y]  # split
        assert s1.stats["removed_surfaces"] >= 1
        _assert_equiv(s1, old, _t(spark, []), deleted)


class TestRelabel:
    def test_new_minimum_relabels_survivor_edges(self, spark):
        old = _t(
            spark,
            [
                (1, "e", 0, ZEN, "p", "v1"),
                (2, "e", 0, ZEN2, "p", "v2"),
            ],
        )
        s0 = canonicalize_state(old)
        ids0 = _eids(s0)
        assert ids0[ZEN] == ids0[ZEN2] == ZEN

        delta = _t(spark, [(9, "e", 0, AEN, "p", "v9")])
        s1 = merge_triples_incremental(s0, delta)
        ids1 = _eids(s1)
        assert ids1[ZEN] == ids1[ZEN2] == ids1[AEN] == AEN
        # docs 1 and 2 were not re-extracted, yet their edges re-point
        srcs = {r["doc_id"]: r["src"] for r in s1.edges.collect()}
        assert srcs[1] == srcs[2] == AEN
        _assert_equiv(s1, old, delta)

    def test_removing_minimum_restores_old_label(self, spark):
        old = _t(
            spark,
            [
                (1, "e", 0, ZEN, "p", "v1"),
                (2, "e", 0, ZEN2, "p", "v2"),
                (9, "e", 0, AEN, "p", "v9"),
            ],
        )
        s0 = canonicalize_state(old)
        assert _eids(s0)[ZEN] == AEN
        deleted = spark.createDataFrame([(9,)], "doc_id long")
        s1 = merge_triples_incremental(s0, _t(spark, []), deleted)
        assert _eids(s1)[ZEN] == ZEN
        _assert_equiv(s1, old, _t(spark, []), deleted)


class TestCountsAndSemantics:
    def test_count_only_change_touches_no_clusters(self, spark):
        old = _t(
            spark,
            [
                (1, "e", 0, X, "p", "v1"),
                (2, "e", 0, X, "p", "v1"),
            ],
        )
        s0 = canonicalize_state(old)
        # doc 1 re-extracted: same surfaces, one extra mention of X
        delta = _t(
            spark,
            [
                (1, "e", 0, X, "p", "v1"),
                (1, "e", 1, X, "p2", "v1"),
            ],
        )
        s1 = merge_triples_incremental(s0, delta)
        assert s1.stats["new_surfaces"] == 0
        assert s1.stats["removed_surfaces"] == 0
        assert s1.stats["affected_surfaces"] == 0
        assert s1.stats["rep_changed_surfaces"] == 0
        vx = {r["surface"]: r["n_mentions"] for r in s1.vertices.collect()}
        assert vx[X] == 3
        _assert_equiv(s1, old, delta)

    def test_idempotent_reapply(self, spark):
        old = _t(spark, [(1, "e", 0, X, "p", "v1"), (2, "e", 0, Y, "p", "v2")])
        delta = _t(spark, [(1, "e", 0, B, "p", "v9")])
        s0 = canonicalize_state(old)
        s1 = merge_triples_incremental(s0, delta)
        s2 = merge_triples_incremental(s1, delta)
        assert _rows(s1.triples) == _rows(s2.triples)
        assert _rows(s1.vertices) == _rows(s2.vertices)
        assert _rows(s1.edges) == _rows(s2.edges)
        assert s2.stats["new_surfaces"] == 0
        assert s2.stats["affected_surfaces"] == 0

    def test_deletion_wins_over_reextraction(self, spark):
        old = _t(spark, [(1, "e", 0, X, "p", "v1"), (2, "e", 0, Y, "p", "v2")])
        s0 = canonicalize_state(old)
        delta = _t(spark, [(1, "e", 0, B, "p", "v9")])
        deleted = spark.createDataFrame([(1,)], "doc_id long")
        s1 = merge_triples_incremental(s0, delta, deleted)
        assert {r["doc_id"] for r in s1.triples.collect()} == {2}
        _assert_equiv(s1, old, delta, deleted)


class TestChainedBatches:
    def test_three_batches_equal_cold_rebuild(self, spark):
        old = _t(
            spark,
            [
                (1, "e", 0, X, "p", "v1"),
                (2, "e", 0, Y, "p", "v2"),
                (3, "e", 0, ZEN, "p", "v3"),
                (4, "e", 0, ZEN2, "p", "v4"),
            ],
        )
        st = canonicalize_state(old)
        b1 = _t(spark, [(9, "e", 0, B, "p", "v9")])  # merge X/Y
        b2_del = spark.createDataFrame([(9,)], "doc_id long")  # split again
        b3 = _t(spark, [(10, "e", 0, AEN, "p", "v10")])  # relabel ZEN
        st = merge_triples_incremental(st, b1)
        st = merge_triples_incremental(st, _t(spark, []), b2_del)
        st = merge_triples_incremental(st, b3)
        final = old.unionByName(b3)
        cold = canonicalize_state(final)
        assert _rows(st.triples) == _rows(cold.triples)
        assert _rows(st.vertices) == _rows(cold.vertices)
        assert _rows(st.edges) == _rows(cold.edges)
        assert _rows(st.resolved) == _rows(cold.resolved)
        assert _rows(st.membership) == _rows(cold.membership)


class TestDictionaryOverride:
    def test_dict_pins_entity_through_relabel(self, spark):
        ed = spark.createDataFrame(
            [(ZEN, "KB:42")], "surface string, entity_id string"
        )
        old = _t(
            spark,
            [(1, "e", 0, ZEN, "p", "v1"), (2, "e", 0, ZEN2, "p", "v2")],
        )
        s0 = canonicalize_state(old, entity_dict=ed)
        assert _eids(s0)[ZEN] == "KB:42"
        delta = _t(spark, [(9, "e", 0, AEN, "p", "v9")])
        s1 = merge_triples_incremental(s0, delta)
        ids1 = _eids(s1)
        assert ids1[ZEN] == "KB:42"  # dict wins over the new minimum
        assert ids1[ZEN2] == ids1[AEN] == AEN
        _assert_equiv(s1, old, delta, entity_dict=ed)


class TestFallbackGuard:
    def test_max_affected_triggers_full_rebuild_same_answer(self, spark):
        old = _t(spark, [(1, "e", 0, X, "p", "v1"), (2, "e", 0, Y, "p", "v2")])
        s0 = canonicalize_state(old)
        delta = _t(spark, [(9, "e", 0, B, "p", "v9")])
        s1 = merge_triples_incremental(s0, delta, max_affected=1)
        assert s1.stats["fallback"] is True
        _assert_equiv(s1, old, delta)

    def test_cold_state_matches_canonicalize(self, spark):
        from docee_spark.stages.canonicalize import canonicalize

        old = _t(
            spark,
            [
                (1, "e", 0, X, "p", Y),
                (2, "e", 0, B, "p", ZEN),
                (3, "e", 0, ZEN2, "p", None),  # NULL endpoint drops
            ],
        )
        st = canonicalize_state(old)
        v, e = canonicalize(old)
        assert _rows(st.vertices) == _rows(v)
        assert _rows(st.edges) == _rows(e)


class TestBucketCaps:
    """max_bucket: over-cap hub buckets are dropped deterministically in
    cold and incremental alike; cap ACTIVATION (bucket shrinks to ≤ cap)
    and DEACTIVATION (bucket grows past it) splice exactly. The suffix
    family F+str(i) shares all 4 band keys for i ≤ 4 and "zz" (verified
    under the one-md5-four-lanes derivation), so for the ≤6-member cap
    scenarios the family size IS the bucket size — crossing the cap
    flips the whole cluster. Larger-i members may additionally land a
    private band off a suffix shingle; the 30-member hub test's asserts
    (zz singleton, seeds inactive, small affected region) hold because
    every shared bucket is far over cap and private buckets are
    singleton or near-singleton."""

    FAM = "acme corporation limited shanghai branch"

    def _fam_docs(self, spark, n, start=0):
        return _t(
            spark,
            [(100 + start + i, "e", 0, self.FAM + str(start + i), "p", f"v{i}")
             for i in range(n)],
        )

    def test_cold_cap_matches_canonicalize_cap(self, spark):
        from docee_spark.stages.canonicalize import canonicalize

        old = self._fam_docs(spark, 6)
        st = canonicalize_state(old, max_bucket=4)
        v, e = canonicalize(old, max_bucket=4)
        assert _rows(st.vertices) == _rows(v)
        assert _rows(st.edges) == _rows(e)
        # 6 > cap ⇒ the bucket is dropped ⇒ all singletons
        ids = _eids(st)
        assert len(set(ids.values())) == len(ids)

    def _fam_clusters(self, state):
        return {v for k, v in _eids(state).items() if k.startswith(self.FAM)}

    def test_deactivation_growing_past_cap_splits(self, spark):
        # 4 members share at least one ≤cap bucket → one cluster; the
        # 5th member pushes the shared buckets over the cap → the
        # cluster SPLITS (exact shape is band-topology-dependent; the
        # contract is equivalence with the capped full recompute)
        old = self._fam_docs(spark, 4)
        s0 = canonicalize_state(old, max_bucket=4)
        assert len(self._fam_clusters(s0)) == 1
        delta = self._fam_docs(spark, 1, start=4)
        s1 = merge_triples_incremental(s0, delta)
        assert s1.stats["fallback"] is False
        merged, v, e = merge_triples(old, delta, max_bucket=4)
        assert _rows(s1.vertices) == _rows(v)
        assert _rows(s1.edges) == _rows(e)
        cold = canonicalize_state(merged, max_bucket=4)
        assert len(self._fam_clusters(s1)) == len(self._fam_clusters(cold)) > 1
        assert _rows(s1.resolved) == _rows(cold.resolved)
        assert _rows(s1.band_sizes) == _rows(cold.band_sizes)

    def test_activation_shrinking_to_cap_merges(self, spark):
        old = self._fam_docs(spark, 5)  # over cap → split clustering
        s0 = canonicalize_state(old, max_bucket=4)
        n0 = len(self._fam_clusters(s0))
        assert n0 > 1
        deleted = spark.createDataFrame([(104,)], "doc_id long")
        s1 = merge_triples_incremental(s0, _t(spark, []), deleted)
        assert s1.stats["fallback"] is False
        merged, v, e = merge_triples(old, _t(spark, []), deleted, max_bucket=4)
        assert _rows(s1.vertices) == _rows(v)
        assert _rows(s1.edges) == _rows(e)
        cold = canonicalize_state(merged, max_bucket=4)
        # buckets re-activated → strictly fewer clusters than before
        assert len(self._fam_clusters(s1)) == len(self._fam_clusters(cold)) < n0
        assert _rows(s1.resolved) == _rows(cold.resolved)
        assert _rows(s1.band_sizes) == _rows(cold.band_sizes)

    def test_hub_bucket_does_not_expand_bfs(self, spark):
        # a 30-member hub family (over cap, inactive both sides) + the
        # X/Y bridge scenario: a delta touching the hub must NOT pull
        # the hub's members into the affected region
        hub = self._fam_docs(spark, 30)
        old = hub.unionByName(
            _t(spark, [(1, "e", 0, X, "p", "v1"), (2, "e", 0, Y, "p", "v2")])
        )
        s0 = canonicalize_state(old, max_bucket=4)
        # delta adds ANOTHER hub member (seed bands = hub bands, inactive
        # both sides → skipped) plus the X/Y bridge
        delta = _t(
            spark,
            [
                (200, "e", 0, self.FAM + "zz", "p", "vz"),
                (9, "e", 0, B, "p", "v9"),
            ],
        )
        s1 = merge_triples_incremental(s0, delta)
        assert s1.stats["fallback"] is False
        # affected = the 2 new subj surfaces + 2 new obj surfaces + X + Y
        assert s1.stats["affected_surfaces"] <= 8
        assert s1.stats["seed_bands_active"] < s1.stats["seed_bands_total"]
        ids = _eids(s1)
        assert ids[X] == ids[B] == ids[Y]
        assert ids[self.FAM + "zz"] == self.FAM + "zz"  # hub stays singleton
        merged, v, e = merge_triples(old, delta, max_bucket=4)
        assert _rows(s1.vertices) == _rows(v)
        assert _rows(s1.edges) == _rows(e)

    def test_chained_cap_batches_equal_cold(self, spark):
        old = self._fam_docs(spark, 4)
        st = canonicalize_state(old, max_bucket=4)
        b1 = self._fam_docs(spark, 1, start=4)  # deactivate
        b2_del = spark.createDataFrame([(100,)], "doc_id long")  # re-activate
        st = merge_triples_incremental(st, b1)
        st = merge_triples_incremental(st, _t(spark, []), b2_del)
        final = old.unionByName(b1).filter("doc_id != 100")
        cold = canonicalize_state(final, max_bucket=4)
        assert _rows(st.vertices) == _rows(cold.vertices)
        assert _rows(st.edges) == _rows(cold.edges)
        assert _rows(st.resolved) == _rows(cold.resolved)
        assert _rows(st.band_sizes) == _rows(cold.band_sizes)


_CHAIN_WORDS = (
    "alder nutmeg cherry mulberry acacia basswood ginkgo locust "
    "magnolia sassafras elm willow yew oak buckeye hemlock"
).split()
_CHAIN_SURFACES = [" ".join(_CHAIN_WORDS[2 * i : 2 * i + 6]) for i in range(6)]


class TestBoundedInfluence:
    """influence_bounded (r5 default): _propagate runs closure_passes=p
    synchronous min-label passes, so a label travels ≤ p band-hops — the
    BFS stops at depth 2p, ADOPTING labels for the p-ball and carrying
    the (p..2p]-ring as context only. The CHAIN fixture (sliding 6-word
    windows, adjacency verified empirically like X/B/Y) is a band path
    C0—c0—c1—c2—c3—c4 with c5 disconnected, where c2 holds the globally
    minimal norm: adopted surfaces' correct labels live in the CONTEXT
    RING (c2 is 3 hops from the edit), so an implementation that
    truncated the ring would recompute them wrongly — the cold-rebuild
    differential is the gate. c4 sits at distance 5, beyond the 2p=4
    horizon, proving splice-through of untouched labels."""

    CHAIN = _CHAIN_SURFACES
    C0 = "alder nutmeg cherry zulu acacia basswood"  # collides with CHAIN[0] only, sorts high
    CMIN = "aader nutmeg cherry zulu acacia basswood"  # ditto, sorts below everything

    def _old(self, spark):
        return _t(
            spark,
            [(i, "e", 0, s, "p", f"v{i}") for i, s in enumerate(self.CHAIN)],
        )

    def test_ring_min_preserved_through_splice(self, spark):
        # edit at one chain end; no label changes (C0 sorts high) — but
        # the adopted surfaces' labels DEPEND on ring member c2's norm,
        # so a ring-truncating recompute would corrupt them
        old = self._old(spark)
        s0 = canonicalize_state(old)
        ids0 = _eids(s0)
        assert ids0[self.CHAIN[0]] == self.CHAIN[2]  # min norm, 2 hops away
        delta = _t(spark, [(90, "e", 0, self.C0, "p", "v90")])
        s1 = merge_triples_incremental(s0, delta)
        assert s1.stats["fallback"] is False
        assert s1.stats["influence_bounded"] is True
        assert s1.stats["expand_iters"] <= 4  # 2p, never band closure
        # adopt = {C0, v90, c0, c1}; context adds {c2, c3}; c4 beyond
        assert s1.stats["affected_surfaces"] <= 4
        assert s1.stats["context_surfaces"] <= 6
        ids1 = _eids(s1)
        assert ids1[self.C0] == self.CHAIN[0]  # min of its own 2-ball
        for c in self.CHAIN:
            assert ids1[c] == ids0[c]  # ring + beyond: labels preserved
        _assert_equiv(s1, old, delta)

    def test_min_entering_at_horizon_edge(self, spark):
        # CMIN becomes the global minimum: labels change for the p-ball
        # {CMIN, c0, c1} exactly; c2 (3 hops) keeps its own label
        old = self._old(spark)
        s0 = canonicalize_state(old)
        delta = _t(spark, [(91, "e", 0, self.CMIN, "p", "v91")])
        s1 = merge_triples_incremental(s0, delta)
        assert s1.stats["fallback"] is False
        ids1 = _eids(s1)
        assert ids1[self.CMIN] == ids1[self.CHAIN[0]] == ids1[self.CHAIN[1]]
        assert ids1[self.CHAIN[2]] == self.CHAIN[2]
        assert ids1[self.CHAIN[3]] == self.CHAIN[2]
        _assert_equiv(s1, old, delta)

    def test_deep_deletion_splices_far_labels(self, spark):
        # deleting the c0-end doc edits buckets at one end; c3/c4 labels
        # splice through untouched
        old = self._old(spark)
        s0 = canonicalize_state(old)
        deleted = spark.createDataFrame([(0,)], "doc_id long")
        s1 = merge_triples_incremental(s0, _t(spark, []), deleted)
        assert s1.stats["fallback"] is False
        assert s1.stats["expand_iters"] <= 4
        _assert_equiv(s1, old, _t(spark, []), deleted)

    def test_closure_mode_same_answer(self, spark):
        # influence_bounded=False restores the band-closure walk; both
        # modes must emit identical state
        old = self._old(spark)
        s0 = canonicalize_state(old)
        delta = _t(spark, [(92, "e", 0, self.CMIN, "p", "v92")])
        sb = merge_triples_incremental(s0, delta)
        sc = merge_triples_incremental(s0, delta, influence_bounded=False)
        assert sc.stats["influence_bounded"] is False
        # closure walks the whole component; bounded stops at the ball
        assert sc.stats["affected_surfaces"] >= sb.stats["affected_surfaces"]
        assert _rows(sb.resolved) == _rows(sc.resolved)
        assert _rows(sb.vertices) == _rows(sc.vertices)
        assert _rows(sb.edges_full) == _rows(sc.edges_full)
        _assert_equiv(sb, old, delta)

    def test_bounded_avoids_closure_fallback(self, spark):
        # a component larger than max_affected: the closure walk MUST
        # fall back; the bounded walk stays inside the 2p ball and
        # completes incrementally with the same answer
        old = self._old(spark)
        s0 = canonicalize_state(old)
        delta = _t(spark, [(93, "e", 0, self.C0, "p", "v93")])
        sb = merge_triples_incremental(s0, delta, max_affected=6)
        assert sb.stats["fallback"] is False
        sc = merge_triples_incremental(
            s0, delta, max_affected=6, influence_bounded=False
        )
        assert sc.stats["fallback"] is True
        assert _rows(sb.resolved) == _rows(sc.resolved)
        assert _rows(sb.vertices) == _rows(sc.vertices)
        _assert_equiv(sb, old, delta)

    def test_chained_bounded_batches_equal_cold(self, spark):
        old = self._old(spark)
        st = canonicalize_state(old)
        b1 = _t(spark, [(94, "e", 0, self.C0, "p", "v94")])
        b2 = _t(spark, [(95, "e", 0, self.CMIN, "p", "v95")])
        b3_del = spark.createDataFrame([(94,)], "doc_id long")
        st = merge_triples_incremental(st, b1)
        st = merge_triples_incremental(st, b2)
        st = merge_triples_incremental(st, _t(spark, []), b3_del)
        final = old.unionByName(b2).filter("doc_id != 94").unionByName(
            b1.filter("doc_id != 94")
        )
        cold = canonicalize_state(final)
        assert _rows(st.resolved) == _rows(cold.resolved)
        assert _rows(st.vertices) == _rows(cold.vertices)
        assert _rows(st.edges_full) == _rows(cold.edges_full)
        assert _rows(st.membership) == _rows(cold.membership)
