"""Entity-link scoring: trained-model quality, numpy↔Spark integer
parity, blocking caps, threshold semantics, and the canonicalize
composition (fuzzy mention → curated entity id)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from docee_spark.model.link_scorer import (
    LinkScorer,
    features_e6_py,
    load_scorer,
    synth_link_pairs,
    train_link_scorer,
)

NPZ = os.path.join(
    os.path.dirname(__file__), "..", "golden_fixtures", "link_scorer.npz"
)


@pytest.fixture(scope="module")
def scorer() -> LinkScorer:
    return load_scorer(NPZ)


class TestModel:
    def test_frozen_scorer_holdout_accuracy(self, scorer):
        pairs, labels = synth_link_pairs(seed=11)
        n_hold = max(200, len(pairs) // 5)
        pred = [1 if scorer.links(m, a) else 0 for m, a in pairs[-n_hold:]]
        acc = sum(p == y for p, y in zip(pred, labels[-n_hold:])) / n_hold
        assert acc >= 0.95

    def test_training_descends(self):
        pairs, labels = synth_link_pairs(seed=11)
        sc = train_link_scorer(pairs, labels, epochs=400)
        # exact alias re-mention must always link; a wholly-unrelated
        # pair must not
        assert sc.links("华夏科技股份有限公司", "华夏科技股份有限公司")
        assert not sc.links("张伟明", "oceanic airlines")

    def test_feature_contract_values(self):
        # identical → jac/exact/contain = 1e6, lend = 0
        assert features_e6_py("acme", "ACME ") == [10**6, 10**6, 10**6, 0]
        # truncation: contained, shingle overlap positive, lend positive
        jac, exact, contain, lend = features_e6_py("华夏科技", "华夏科技股份有限公司")
        assert exact == 0 and contain == 10**6 and 0 < jac < 10**6
        assert lend == (6 * 10**6) // 10


class TestSparkParity:
    def test_score_expr_matches_python_bitwise(self, spark, scorer):
        from docee_spark.model.link_scorer import norm_py, score_expr
        from docee_spark.stages.canonicalize import normalize_surface

        pairs, _ = synth_link_pairs(seed=11)
        sample = pairs[:120:3] + pairs[-120::3]
        df = spark.createDataFrame(sample, "mention string, alias string").select(
            "mention",
            "alias",
            normalize_surface(F.col("mention")).alias("mn"),
            normalize_surface(F.col("alias")).alias("an"),
        )
        got = {
            (r["mention"], r["alias"]): r["s"]
            for r in df.withColumn(
                "s", score_expr(scorer, F.col("mn"), F.col("an"))
            ).collect()
        }
        for m, a in sample:
            assert got[(m, a)] == scorer.score_e12(norm_py(m), norm_py(a)), (m, a)


class TestLinking:
    @pytest.fixture(scope="class")
    def dict_df(self, spark):
        from docee_spark.fixtures import heuristic_entity_dict

        return spark.createDataFrame(
            [(f"E{i:03d}", s) for i, s in enumerate(sorted(heuristic_entity_dict()))],
            "entity_id string, alias string",
        )

    def test_exact_and_fuzzy_mentions_link(self, spark, scorer, dict_df):
        from docee_spark.stages.linker import link_entities

        mentions = spark.createDataFrame(
            [
                ("华夏科技股份有限公司",),  # exact
                ("华夏科技股份",),          # suffix truncation
                ("张伟明",),                # exact person
            ],
            "mention string",
        )
        out = {
            r["mention"]: r
            for r in link_entities(mentions, dict_df, scorer).collect()
        }
        aliases = {r["entity_id"]: r["alias"] for r in dict_df.collect()}
        assert out["华夏科技股份有限公司"]["linked"] == 1
        assert aliases[out["华夏科技股份有限公司"]["entity_id"]] == "华夏科技股份有限公司"
        assert out["华夏科技股份"]["linked"] == 1
        assert aliases[out["华夏科技股份"]["entity_id"]] == "华夏科技股份有限公司"
        assert out["张伟明"]["linked"] == 1

    def test_unrelated_mention_does_not_link(self, spark, scorer, dict_df):
        from docee_spark.stages.linker import link_entities

        mentions = spark.createDataFrame(
            [("quarterly revenue grew",)], "mention string"
        )
        rows = link_entities(mentions, dict_df, scorer).collect()
        # either no candidate survives blocking, or the winner is below
        # the decision boundary
        assert all(r["linked"] == 0 for r in rows)

    def test_threshold_raises_the_bar(self, spark, scorer, dict_df):
        from docee_spark.stages.linker import link_entities

        mentions = spark.createDataFrame([("华夏科技股份",)], "mention string")
        hi = link_entities(
            mentions, dict_df, scorer, threshold_e12=10**14
        ).collect()
        assert all(r["linked"] == 0 for r in hi)

    def test_band_cap_preserves_exact_hits(self, spark, scorer):
        """With max_band=1 every multi-alias band drops, but the exact
        union still resolves identical surfaces."""
        from docee_spark.stages.linker import link_entities

        aliases = spark.createDataFrame(
            [(f"E{i}", f"同质前缀实体{i}号") for i in range(12)],
            "entity_id string, alias string",
        )
        mentions = spark.createDataFrame([("同质前缀实体7号",)], "mention string")
        out = link_entities(mentions, aliases, scorer, max_band=1).collect()
        assert len(out) == 1 and out[0]["entity_id"] == "E7" and out[0]["linked"] == 1

    def test_canonicalize_composition(self, spark, scorer, dict_df):
        """linked_entity_dict feeds canonicalize: a fuzzy mention's
        triples resolve to the curated entity id, not an LSH rep."""
        from docee_spark.stages.canonicalize import canonicalize
        from docee_spark.stages.linker import linked_entity_dict

        triples = spark.createDataFrame(
            [
                ("d1", "EquityFreeze", 0, "华夏科技股份", "EquityFreeze#sub", "张伟明"),
            ],
            "doc_id string, event_type string, recguid long, "
            "subj string, pred string, obj string",
        )
        mentions = triples.select(F.col("subj").alias("mention")).unionByName(
            triples.select(F.col("obj").alias("mention"))
        )
        linked = linked_entity_dict(mentions, dict_df, scorer)
        dict_linked = {
            r["surface"]: r["entity_id"] for r in linked.collect()
        }
        assert "华夏科技股份" in dict_linked
        vertices, _ = canonicalize(triples, entity_dict=linked)
        ids = {r["entity_id"] for r in vertices.collect()}
        assert dict_linked["华夏科技股份"] in ids


@pytest.mark.slow
def test_pipeline_link_aliases_e2e(spark, web_df, gold_df, scorer):
    """run_pipeline(link_aliases=...) resolves exact gold surfaces to
    curated alias ids in the emitted KG (frozen scorer loaded by
    default), and the LSH fallback still covers unlinked surfaces."""
    from docee_spark.fixtures import heuristic_entity_dict
    from docee_spark.stages.pipeline import run_pipeline

    aliases = spark.createDataFrame(
        [
            (f"K{i:03d}", s)
            for i, s in enumerate(sorted(heuristic_entity_dict()))
        ],
        "entity_id string, alias string",
    )
    out = run_pipeline(
        web_df, gold=gold_df, adjacency="gold",
        link_aliases=aliases, use_html=False,
    )
    ids = {r["entity_id"] for r in out["vertices"].collect()}
    k_ids = {i for i in ids if i.startswith("K")}
    # the fixture corpus mentions dictionary entities verbatim → many
    # surfaces must resolve to curated K-ids; non-dictionary surfaces
    # (dates, amounts) stay on LSH reps
    assert len(k_ids) >= 5
    assert ids - k_ids
