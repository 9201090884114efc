"""KG analytics at 1M-doc scale: the iterative graph operators
(pagerank / HITS / personalized PageRank / k-core / label-propagation
communities / triangles) over the canonicalized KG edge table of a
1M-document extraction run — the r4 verdict's "exercise the KG
analytics at 1M docs" item. The operators' localCheckpoint-per-pass
lineage discipline was previously evidenced only at sf0.1; this records
walls at three orders of magnitude more edges.

Builds the KG exactly like tools/staged_kg_run.py (same synthetic
corpus parquet protocol, reused if materialized; full ingest → tag →
decode → canonicalize pipeline), then times each analytic end-to-end
(trigger = .count() on the result).

Prints ONE JSON line:
  {"docs": N, "edges": E, "nodes": V, "build_sec": ..,
   "analytics": {"pagerank": {"sec": .., "rows": ..}, "hits": {...},
                 "ppr": {...}, "kcore": {...}, "communities": {...},
                 "triangles": {...}},
   "host_health_sec": [..], "host_health_saturating_sec": [..]}

Usage: python tools/kg_analytics_run.py [--docs 1000000] [--cpus 32]
       [--base /tmp/docee_staged_kg]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=1_000_000)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--base", default="/tmp/docee_staged_kg")
    args = p.parse_args()

    from pyspark.sql import functions as F

    import bench
    from docee_spark.fixtures import distributed_corpus, heuristic_entity_dict
    from docee_spark.operators.graphstats import k_core, label_propagation, triangles
    from docee_spark.operators.linkgraph import hits, pagerank, personalized_pagerank
    from docee_spark.session import get_spark
    from docee_spark.stages.pipeline import run_pipeline

    spark = get_spark(
        "kg_analytics",
        cores=args.cpus,
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 20),
        },
    )

    corpus_dir = os.path.join(args.base, f"corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        distributed_corpus(spark, args.docs).drop("html").repartition(
            max(64, 4 * args.cpus)
        ).write.mode("overwrite").parquet(corpus_dir)

    health = [bench.host_health_probe()]
    health_sat = [bench.host_health_probe_saturating()]

    web = spark.read.parquet(corpus_dir).withColumn(
        "html", F.lit(None).cast("binary")
    )
    t0 = time.perf_counter()
    result = run_pipeline(
        web,
        entity_dict=heuristic_entity_dict(),
        use_html=False,
        n_partitions=2 * args.cpus,
    )
    edges = result["edges"].select("src", "dst").localCheckpoint()
    n_edges = edges.count()
    build_sec = round(time.perf_counter() - t0, 1)
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    health.append(bench.host_health_probe())

    # two deterministic seeds for the PPR read path: the lexicographic
    # min/max node ids (no Date/random in tools that feed records)
    seed_lo = edges.agg(F.min("src")).collect()[0][0]
    seed_hi = edges.agg(F.max("dst")).collect()[0][0]

    analytics = {}

    def leg(name, fn):
        t0 = time.perf_counter()
        rows = fn().count()
        analytics[name] = {
            "sec": round(time.perf_counter() - t0, 1),
            "rows": rows,
        }
        health.append(bench.host_health_probe())

    leg("pagerank", lambda: pagerank(edges))
    leg("hits", lambda: hits(edges))
    leg("ppr", lambda: personalized_pagerank(edges, [seed_lo, seed_hi]))
    leg("kcore", lambda: k_core(edges, k=3))
    leg("communities", lambda: label_propagation(edges))
    leg("triangles", lambda: triangles(edges))

    health_sat.append(bench.host_health_probe_saturating())
    print(
        json.dumps(
            {
                "docs": args.docs,
                "cpus": args.cpus,
                "edges": n_edges,
                "nodes": n_nodes,
                "build_sec": build_sec,
                "analytics": analytics,
                "host_health_sec": health,
                "host_health_saturating_sec": health_sat,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
