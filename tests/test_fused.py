"""Fused tag+decode must be semantically identical to the staged path."""

import pytest

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


def test_fused_counts_path_pruning(spark, web_df):
    """Both fused paths carry the same A9-style n_paths_pruned counter as
    the staged decode: zero on the normal corpus, and a tiny max_paths in
    product mode must engage with a COUNTED drop, never silently."""
    from pyspark.sql import functions as F

    from docee_spark.stages.fused import segment_tag_decode_fused, tag_decode_fused
    from docee_spark.stages.ingest import ingest
    from docee_spark.stages.segment import segment

    docs = segment(ingest(web_df, use_html=False))
    shallow = tag_decode_fused(docs, heuristic_entity_dict())
    deep = segment_tag_decode_fused(
        ingest(web_df, use_html=False), heuristic_entity_dict()
    )
    for df in (shallow, deep):
        assert "n_paths_pruned" in df.columns
        assert df.agg(F.sum("n_paths_pruned")).first()[0] == 0

    capped = tag_decode_fused(
        docs, heuristic_entity_dict(), mode="product", max_paths=1
    )
    assert capped.agg(F.sum("n_paths_pruned")).first()[0] > 0


@pytest.mark.slow  # e2e sweep; full suite covers it
def test_cli_loads_every_scorer_variant(spark, tmp_path, capsys):
    """--adj-scorer must accept EVERY scorer artifact (logistic /
    biaffine / doc-context / RGCN): the CLI passes the raw arrays through
    and score_adjacency dispatches the class on artifact keys — loading a
    biaffine artifact through AdjScorer.from_arrays used to crash."""
    from docee_spark.cli import main
    from docee_spark.golden import BIAFFINE_PATH, ensure_biaffine

    ensure_biaffine()
    out = str(tmp_path / "kg")
    rc = main(
        ["--synth", "60", "--output", out, "--adj-scorer", BIAFFINE_PATH]
    )
    assert rc == 0
    import json

    line = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ][-1]
    assert json.loads(line)["triples"] > 0


def test_fused_rejects_gold_mode(spark, web_df, gold_df):
    import pytest

    with pytest.raises(ValueError):
        run_pipeline(web_df, gold=gold_df, adjacency="gold", fused=True)


def test_deep_fusion_clips_like_segment(spark):
    """Docs exceeding MAX_SENT_LEN / MAX_SENT_NUM must decode identically
    through the JVM-segment and in-UDF-segment paths — the deep path
    applies the same per-sentence clip + doc truncation (a span past the
    clip point must vanish on BOTH paths)."""
    from pyspark.sql import functions as F

    from docee_spark.schema import WEBTEXT
    from docee_spark.stages.fused import segment_tag_decode_fused, tag_decode_fused
    from docee_spark.stages.ingest import ingest
    from docee_spark.stages.segment import segment

    ent = heuristic_entity_dict()
    visible, hidden = "张伟明", "李秀娟"
    # one >512-char EquityUnderweight sentence: a full record before the
    # clip point, `hidden` after it; plus >256 sentences so doc
    # truncation also engages
    long_sent = (
        f"公告EquityUnderweight减持事件：EquityHolder为{visible}，"
        "TradedShares为200000股，StartDate为2020年1月2日，"
        "EndDate为2020年3月4日，AveragePrice为12.00元，"
        + "内容详见公告正文，" * 60
        + f"联系人为{hidden}。"
    )
    text = long_sent + "".join(f"第{i + 1}项其他事项说明。" for i in range(300))
    assert len(long_sent) > 512
    web = spark.createDataFrame(
        [("https://h/x", None, None, text, "zh")], WEBTEXT
    )

    def flat(df):
        return {
            (
                r["doc_id"],
                r["ev"]["type"],
                tuple(
                    sorted(
                        (k, v)
                        for k, v in r["ev"]["args"].items()
                        if v is not None
                    )
                ),
            )
            for r in df.select("doc_id", F.explode("events").alias("ev")).collect()
        }

    a = flat(tag_decode_fused(segment(ingest(web, use_html=False)), ent))
    b = flat(segment_tag_decode_fused(ingest(web, use_html=False), ent))
    assert a == b
    args = {v for _, _, kv in a for _, v in kv}
    assert visible in args and hidden not in args


def test_fused_threads_catalog_and_tiers(spark):
    """The fused (100 TB) path must honor a non-default catalog and
    num_triggers exactly like the staged decode: run both paths on the
    same docs with the WikiEvents catalog + corpus-derived trigger cues
    and compare events doc-for-doc."""
    from docee_spark.catalogs import WIKIEVENTS_EVENT_TYPES
    from docee_spark.refdata import (
        load_reference_docs,
        parse_post_json,
        trigger_type_keywords,
    )
    from docee_spark.stages.decode import decode
    from docee_spark.stages.fused import tag_decode_fused
    from docee_spark.stages.tag import tag_heuristic

    sample = "/root/reference/Data/WikiEvents/sample.train.post.wTgg.json"
    rows = parse_post_json(sample)
    docs, _ = load_reference_docs(spark, sample)
    entity_dict = {s["text"]: s["field"] for r in rows for s in r["spans"]}
    kw = trigger_type_keywords(rows)

    fused = tag_decode_fused(
        docs, entity_dict, mode="clique",
        event_types=WIKIEVENTS_EVENT_TYPES, type_keywords=kw,
    ).select("doc_id", "events").collect()
    staged = decode(
        tag_heuristic(docs, entity_dict), mode="clique",
        event_types=WIKIEVENTS_EVENT_TYPES, type_keywords=kw,
    ).select("doc_id", "events").collect()

    def norm(rows_):
        return {
            r["doc_id"]: sorted(
                (e["type"], tuple(sorted((k, v or "") for k, v in e["args"].items())))
                for e in r["events"]
            )
            for r in rows_
        }

    got, want = norm(fused), norm(staged)
    assert got == want and any(v for v in got.values())


def test_get_event_template_registry():
    from docee_spark.catalogs import WIKIEVENTS_EVENT_TYPES
    from docee_spark.config import CHFINANN_EVENT_TYPES, get_event_template

    assert get_event_template("chfinann") is CHFINANN_EVENT_TYPES
    assert get_event_template("zheng2019_trigger_graph") is CHFINANN_EVENT_TYPES
    assert get_event_template("wikievents") is WIKIEVENTS_EVENT_TYPES
    assert get_event_template("WikiEvents_w_tgg") is WIKIEVENTS_EVENT_TYPES
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown event template"):
        get_event_template("nope")


def test_fused_model_matches_staged(spark, web_df):
    """segment_tag_decode_fused_model must produce the SAME triples as
    the staged model pipeline (segment → tag_model → decode): same
    trained tagger, sentence adjacency, exact_fields=True on both."""
    from docee_spark.golden import ensure_tagger

    tagger = ensure_tagger()
    staged = run_pipeline(
        web_df, model=tagger, mode="clique", adjacency="sentence",
        use_html=False,
    )["triples"]
    fused = run_pipeline(
        web_df, model=tagger, mode="clique", adjacency="sentence",
        use_html=False, fused="deep",
    )["triples"]
    key = ["doc_id", "event_type", "recguid", "subj", "pred", "obj"]
    a = sorted(tuple(r) for r in staged.select(*key).collect())
    b = sorted(tuple(r) for r in fused.select(*key).collect())
    assert a == b
    assert a  # non-degenerate: the model found events on this corpus


def test_fused_model_edag_and_fix_mode_match_staged(spark, web_df):
    """The fused model path must thread mode= and ent_fix_mode= exactly
    like the staged path — EDAG decode with J4 snapping ('f') included."""
    from docee_spark.golden import ensure_tagger

    tagger = ensure_tagger()
    kw = dict(model=tagger, adjacency="sentence", use_html=False,
              mode="edag", ent_fix_mode="f")
    staged = run_pipeline(web_df, **kw)["triples"]
    fused = run_pipeline(web_df, fused="deep", **kw)["triples"]
    key = ["doc_id", "event_type", "recguid", "subj", "pred", "obj"]
    assert sorted(map(tuple, staged.select(*key).collect())) == sorted(
        map(tuple, fused.select(*key).collect())
    )


def test_fused_model_rejects_partial_fusion_and_scorer(spark, web_df):
    from docee_spark.golden import ensure_tagger

    tagger = ensure_tagger()
    with pytest.raises(ValueError, match="fused model path"):
        run_pipeline(web_df, model=tagger, use_html=False, fused=True)
    with pytest.raises(ValueError, match="fused model path"):
        run_pipeline(
            web_df, model=tagger, use_html=False, fused="deep",
            adjacency="matrix",
        )
