"""Domain blocklist filtering (stages/ingest.py:host_flags/host_filter):
suffix-match semantics, allowlist carve-outs, corpus-shape plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from docee_spark.stages.ingest import host_filter, host_flags, url_host


class TestHostFilter:
    def _dfs(self, spark):
        rows = [
            (0, "https://spam.example/a"),          # blocked apex
            (1, "https://cdn.spam.example/b"),      # blocked by suffix
            (2, "https://docs.spam.example/c"),     # allowlist carve-out
            (3, "https://ok.org/d"),                # clean
            (4, "HTTP://WWW.Spam.Example:80/e"),    # case/port-insensitive
            (5, "https://example/f"),               # single-label host
            (6, "https://notspam.example.com/g"),   # 'spam.example' is NOT
                                                    # a label suffix here
        ]
        web = spark.createDataFrame(rows, "doc_id long, url string")
        blocked = spark.createDataFrame([("spam.example",)], "domain string")
        allowed = spark.createDataFrame([("docs.spam.example",)], "domain string")
        return web, blocked, allowed

    def test_suffix_semantics(self, spark):
        web, blocked, allowed = self._dfs(spark)
        got = {
            r["doc_id"]: r["is_blocked"]
            for r in host_flags(web, blocked, allowed).collect()
        }
        assert got == {0: 1, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0, 6: 0}

    def test_filter_drops_blocked_only(self, spark):
        web, blocked, allowed = self._dfs(spark)
        kept = {r["doc_id"] for r in host_filter(web, blocked, allowed).collect()}
        assert kept == {2, 3, 5, 6}

    def test_no_allowlist(self, spark):
        web, blocked, _ = self._dfs(spark)
        got = {
            r["doc_id"]: r["is_blocked"]
            for r in host_flags(web, blocked).collect()
        }
        assert got[2] == 1  # carve-out gone

    def test_url_host_grammar(self, spark):
        df = spark.createDataFrame(
            [
                ("HTTPS://User.Host.COM:8443/x", "user.host.com"),
                ("http://a.b/", "a.b"),
                ("garbage", ""),
            ],
            "url string, want string",
        ).select(url_host(F.col("url")).alias("got"), "want")
        for r in df.collect():
            assert r["got"] == r["want"], r

    def test_corpus_never_shuffles(self, spark):
        """The corpus side must reach the verdict through broadcast joins
        only — every Exchange in the plan is on the tiny host/probe side,
        and the corpus parquet scan feeds straight into a BroadcastHashJoin."""
        import __spark_entry__ as em

        df = em.q_host_filter(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", plan))
        assert n_bhj >= 2 and n_smj == 0, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
