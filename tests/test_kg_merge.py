"""Incremental KG maintenance (stages/canonicalize.py:merge_triples):
full-recompute equivalence, replacement/insertion/deletion semantics,
idempotence, deletion-wins precedence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docee_spark.stages.canonicalize import canonicalize, merge_triples

# iterative-canonicalize e2e (~1 min) — slow loop; the merge operator's
# oracle also runs in test_entry_queries[kg_incremental]
pytestmark = pytest.mark.slow

COLS = "doc_id long, event_type string, recguid long, subj string, pred string, obj string"


def _t(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    old = _t(
        spark,
        [
            (1, "e", 0, "acme corp", "acquired", "beta llc"),
            (1, "e", 1, "acme corp", "ceo", "jane roe"),
            (2, "e", 0, "beta llc", "hq", "berlin"),
            (3, "e", 0, "gamma inc", "hq", "paris"),
            (4, "e", 0, "delta gmbh", "hq", "bonn"),
        ],
    )
    delta = _t(
        spark,
        [
            # doc 1 re-extracted: one triple replaced, one dropped
            (1, "e", 0, "acme corp", "acquired", "beta llc (2024)"),
            # doc 9 is brand new
            (9, "e", 0, "epsilon sa", "hq", "lyon"),
        ],
    )
    return old, delta


class TestMergeTriples:
    def test_equals_full_recompute(self, spark, corpus):
        old, delta = corpus
        deleted = spark.createDataFrame([(3,)], "doc_id long")
        merged, vertices, edges = merge_triples(old, delta, deleted)
        # the identity the docstring guarantees: merge ≡ canonicalize of
        # the survivor∪delta set built independently here
        expect_trips = old.filter(~F.col("doc_id").isin(1, 3)).unionByName(delta)
        ev, ee = canonicalize(expect_trips)
        assert _sorted_rows(merged) == _sorted_rows(expect_trips)
        assert _sorted_rows(vertices) == _sorted_rows(ev)
        assert _sorted_rows(edges) == _sorted_rows(ee)

    def test_replacement_drops_stale_triples(self, spark, corpus):
        old, delta = corpus
        merged, _, _ = merge_triples(old, delta)
        doc1 = [r for r in merged.collect() if r["doc_id"] == 1]
        # the re-extraction emitted ONE triple; the old ceo triple is gone
        assert len(doc1) == 1 and doc1[0]["obj"] == "beta llc (2024)"

    def test_insertion_and_survivors(self, spark, corpus):
        old, delta = corpus
        merged, _, _ = merge_triples(old, delta)
        docs = {r["doc_id"] for r in merged.collect()}
        assert docs == {1, 2, 3, 4, 9}

    def test_idempotent_reapply(self, spark, corpus):
        old, delta = corpus
        once, _, _ = merge_triples(old, delta)
        twice, _, _ = merge_triples(once, delta)
        assert _sorted_rows(once) == _sorted_rows(twice)

    def test_deletion_wins_over_reextraction(self, spark, corpus):
        old, delta = corpus
        deleted = spark.createDataFrame([(1,), (9,)], "doc_id long")
        merged, _, _ = merge_triples(old, delta, deleted)
        docs = {r["doc_id"] for r in merged.collect()}
        assert docs == {2, 3, 4}

    def test_vertices_reflect_merge(self, spark, corpus):
        old, delta = corpus
        _, vertices, _ = merge_triples(old, delta)
        surfaces = {r["surface"] for r in vertices.collect()}
        assert "epsilon sa" in surfaces  # inserted
        assert "jane roe" not in surfaces  # replaced away with doc 1


class TestIncrementalCrawlE2E:
    """The storage layer and the KG merge composed: crawl batches land as
    APPEND snapshots, extraction re-runs only on the incremental scan's
    delta, merge_triples folds it in — and the result is identical to
    extracting + canonicalizing the whole table from scratch. This is the
    10^12-doc recrawl economics: per-batch work ∝ batch, not corpus."""

    def test_incremental_extraction_equals_full(self, spark, tmp_path):
        from docee_spark.fixtures import generate_corpus
        from docee_spark.schema import WEBTEXT
        from docee_spark.stages.pipeline import StageStore, run_pipeline

        web_rows, _ = generate_corpus(80, seed=7)
        web_df = spark.createDataFrame(web_rows, WEBTEXT)
        store = StageStore(str(tmp_path))
        half = F.crc32(F.col("url")) % 2
        store.commit("webtext", web_df.filter(half == 0), "crawl-b1")
        store.commit(
            "webtext", web_df.filter(half == 1), "crawl-b2", mode="append"
        )
        # batches partition the corpus: nothing lost at the storage layer
        assert store.snapshots("webtext")[-1]["n_rows"] == web_df.count()

        full = run_pipeline(store.load("webtext"))

        t1 = run_pipeline(store.load("webtext", snapshot_id=1))["triples"]
        delta_web = store.incremental_scan("webtext", 1)
        t2 = run_pipeline(delta_web)["triples"]
        merged, vertices, edges = merge_triples(t1, t2)

        assert _sorted_rows(merged) == _sorted_rows(full["triples"])
        assert _sorted_rows(vertices) == _sorted_rows(full["vertices"])
        assert _sorted_rows(edges) == _sorted_rows(full["edges"])


class TestAppendCli:
    """--append: the spark-submit surface for recrawl batches."""

    def test_two_batches_equal_one_shot(self, spark, tmp_path):
        from docee_spark.cli import main
        from docee_spark.fixtures import generate_corpus
        from docee_spark.schema import WEBTEXT

        web_rows, _ = generate_corpus(60, seed=7)
        web = spark.createDataFrame(web_rows, WEBTEXT)
        half = F.crc32(F.col("url")) % 2
        b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
        full = str(tmp_path / "full")
        web.filter(half == 0).write.parquet(b1)
        web.filter(half == 1).write.parquet(b2)
        web.write.parquet(full)
        store, out = str(tmp_path / "store"), str(tmp_path / "out")

        for batch, fp in ((b1, "crawl-b1"), (b2, "crawl-b2")):
            rc = main(["--input", batch, "--output", out,
                       "--store", store, "--fingerprint", fp, "--append"])
            assert rc == 0
        got = _sorted_rows(spark.read.parquet(f"{out}/triples"))

        rc = main(["--input", full, "--output", str(tmp_path / "out_full")])
        assert rc == 0
        want = _sorted_rows(
            spark.read.parquet(str(tmp_path / "out_full/triples"))
        )
        assert got == want
        assert _sorted_rows(spark.read.parquet(f"{out}/edges")) == \
            _sorted_rows(spark.read.parquet(str(tmp_path / "out_full/edges")))

        # idempotent resume: re-submitting batch 2 is a no-op
        rc = main(["--input", b2, "--output", out,
                   "--store", store, "--fingerprint", "crawl-b2", "--append"])
        assert rc == 0
        assert _sorted_rows(spark.read.parquet(f"{out}/triples")) == want
        # and the webtext stage gained no snapshot from the retry
        from docee_spark.stages.pipeline import StageStore

        assert len(StageStore(store).snapshots("webtext")) == 2
