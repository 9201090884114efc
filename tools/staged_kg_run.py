"""Full staged KG pipeline record at N docs: cold run + resume leg.

The complete north-rule shape end-to-end (NOT the fused bench path):
synthetic webtext parquet → ingest → tag → decode → triples →
MinHash-LSH canonicalize → vertex+edge tables, every stage materialized
and committed to the StageStore (parquet + manifest lineage), final KG
written as parquet. Then the same invocation again: every stage must be
skipped via manifest fingerprints (the at-scale chaos-resume).

Prints one JSON line:
  {"docs": N, "cold_sec": .., "docs_per_sec": .., "triples": ..,
   "vertices": .., "edges": .., "resume_sec": ..,
   "host_health_sec": [..], "host_health_saturating_sec": [..]}

Usage: python tools/staged_kg_run.py [--docs 1000000] [--cpus 32]
       [--base /tmp/docee_staged_kg] [--keep]

The corpus parquet is reused if already materialized (same protocol as
bench.py: html=NULL binary, fine scan splits, no driver bottleneck); the
store/output dirs are removed first so the cold leg is genuinely cold,
and removed at exit unless --keep.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=1_000_000)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--base", default="/tmp/docee_staged_kg")
    p.add_argument("--mode", default="clique")
    p.add_argument("--keep", action="store_true", help="keep store/output dirs")
    args = p.parse_args()

    from pyspark.sql import functions as F

    import bench
    from docee_spark.fixtures import distributed_corpus, heuristic_entity_dict
    from docee_spark.session import get_spark
    from docee_spark.stages.pipeline import StageStore, run_pipeline
    from docee_spark.stages.sinks import write_kg

    spark = get_spark(
        "staged_kg",
        cores=args.cpus,
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 20),
        },
    )

    corpus_dir = os.path.join(args.base, f"corpus_{args.docs}")
    store_dir = os.path.join(args.base, f"store_{args.docs}")
    out_dir = os.path.join(args.base, f"kg_{args.docs}")
    for d in (store_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        distributed_corpus(spark, args.docs).drop("html").repartition(
            max(64, 4 * args.cpus)
        ).write.mode("overwrite").parquet(corpus_dir)

    health = [bench.host_health_probe()]
    health_sat = [bench.host_health_probe_saturating()]

    def leg() -> tuple[float, dict]:
        from docee_spark.operators.linkgraph import pagerank

        web = spark.read.parquet(corpus_dir).withColumn(
            "html", F.lit(None).cast("binary")
        )
        t0 = time.perf_counter()
        store = StageStore(store_dir)
        fingerprint = f"staged-{args.docs}"
        result = run_pipeline(
            web,
            entity_dict=heuristic_entity_dict(),
            mode=args.mode,
            store=store,
            input_fingerprint=fingerprint,
            use_html=False,
            n_partitions=2 * args.cpus,
        )
        # entity-importance stage over the materialized KG edges (the
        # crawl-frontier / canonicalization-priority ranking), committed
        # with the same manifest lineage so resume skips it too
        if store.is_committed("ranks", fingerprint):
            result["ranks"] = store.load("ranks")
        else:
            result["ranks"] = store.commit(
                "ranks",
                pagerank(result["edges"].select("src", "dst")),
                fingerprint,
            )
        write_kg(result, out_dir)
        return round(time.perf_counter() - t0, 1), result

    cold_sec, _ = leg()
    counts = {
        name: spark.read.parquet(os.path.join(out_dir, name)).count()
        for name in ("triples", "vertices", "edges", "ranks")
    }
    resume_sec, _ = leg()
    resume_triples = spark.read.parquet(os.path.join(out_dir, "triples")).count()
    health.append(bench.host_health_probe())
    health_sat.append(bench.host_health_probe_saturating())

    print(
        json.dumps(
            {
                "docs": args.docs,
                "mode": args.mode,
                "cpus": args.cpus,
                "cold_sec": cold_sec,
                "docs_per_sec": round(args.docs / cold_sec, 0),
                **counts,
                "resume_sec": resume_sec,
                "resume_triples_match": resume_triples == counts["triples"],
                "host_health_sec": health,
                "host_health_saturating_sec": health_sat,
            }
        )
    )
    if not args.keep:
        for d in (store_dir, out_dir):
            shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
