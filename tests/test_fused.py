"""Fused tag+decode must be semantically identical to the staged path."""

from docee_spark.fixtures import heuristic_entity_dict
from docee_spark.stages.pipeline import run_pipeline


def test_fused_matches_staged(spark, web_df):
    staged = run_pipeline(
        web_df,
        entity_dict=heuristic_entity_dict(),
        mode="clique",
        adjacency="sentence",
    )["triples"]
    fused = run_pipeline(
        web_df,
        entity_dict=heuristic_entity_dict(),
        mode="clique",
        fused=True,
    )["triples"]
    key = ["doc_id", "event_type", "subj", "pred", "obj"]
    assert {tuple(r) for r in staged.select(*key).collect()} == {
        tuple(r) for r in fused.select(*key).collect()
    }


def test_fused_rejects_gold_mode(spark, web_df, gold_df):
    import pytest

    with pytest.raises(ValueError):
        run_pipeline(web_df, gold=gold_df, adjacency="gold", fused=True)
