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


def test_deep_fusion_matches_staged(spark, web_df):
    """segment_tag_decode_fused (in-UDF segmentation) must produce the
    same events as the JVM-segment + fused path."""
    from pyspark.sql import functions as F

    from docee_spark.stages.fused import segment_tag_decode_fused, tag_decode_fused
    from docee_spark.stages.ingest import ingest
    from docee_spark.stages.segment import segment

    docs = segment(ingest(web_df, use_html=False))
    a = tag_decode_fused(docs, heuristic_entity_dict())
    b = segment_tag_decode_fused(
        ingest(web_df, use_html=False), heuristic_entity_dict()
    )

    def flat(df):
        return {
            (r["doc_id"], r["ev"]["type"], tuple(sorted(
                (k, v) for k, v in r["ev"]["args"].items() if v is not None
            )))
            for r in df.select("doc_id", F.explode("events").alias("ev")).collect()
        }

    assert flat(a) == flat(b)


def test_fused_rejects_gold_mode(spark, web_df, gold_df):
    import pytest

    with pytest.raises(ValueError):
        run_pipeline(web_df, gold=gold_df, adjacency="gold", fused=True)
