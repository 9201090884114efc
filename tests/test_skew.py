"""Skew handling (north rule): hot hosts and oversized documents must not
create straggler partitions — salted repartitioning and length bucketing
are the two knobs, asserted here on adversarial inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


class TestSaltedRepartition:
    def test_hot_host_spreads_over_partitions(self, spark):
        from docee_spark.stages.ingest import salted_repartition

        # 80% of 4000 docs come from ONE host (Zipf head)
        rows = [
            (
                f"https://hot.example.com/doc/{i}"
                if i % 10 < 8
                else f"https://h{i % 37:03d}.example.com/doc/{i}",
                f"text {i}",
            )
            for i in range(4000)
        ]
        web = spark.createDataFrame(rows, "url string, text string")
        sizes = _partition_sizes(salted_repartition(web, 16))
        assert len(sizes) == 16
        # unsalted host partitioning would put 80% in one partition;
        # salted must stay near-uniform
        assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes)), sizes

    def test_deterministic_placement(self, spark):
        from docee_spark.stages.ingest import salted_repartition

        rows = [(f"https://h/{i}", f"t{i}") for i in range(500)]
        web = spark.createDataFrame(rows, "url string, text string")

        def placement(df):
            return sorted(
                (r["url"], r["p"])
                for r in df.withColumn(
                    "p", F.spark_partition_id()
                ).select("url", "p").collect()
            )

        a = placement(salted_repartition(web, 8))
        b = placement(salted_repartition(web, 8))
        assert a == b  # reruns place rows identically (resume invariant)


class TestLengthBucketing:
    def test_huge_docs_not_concentrated(self, spark):
        from docee_spark.stages.tag import length_bucketed

        # 64 huge docs (256 sentences) among 2000 small ones
        rows = []
        for i in range(2000):
            n = 256 if i % 31 == 0 else 4
            rows.append((f"d{i}", [f"第{j}句。" for j in range(n)]))
        docs = spark.createDataFrame(rows, "doc_id string, sentences array<string>")
        bucketed = length_bucketed(docs, 16)
        # per-partition sentence VOLUME (the actual work) must be balanced
        vols = [
            r["v"]
            for r in bucketed.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.sum(F.size("sentences")).alias("v"))
            .collect()
        ]
        assert max(vols) <= 3.0 * (sum(vols) / len(vols)), vols
