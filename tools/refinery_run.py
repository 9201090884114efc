"""Full crawl-refinery record at N docs: cold run + resume leg.

The complete 100 TB training-data + KG story in ONE staged job
(stages/refinery.py): synthetic webtext (+ adversarial junk slice) →
robots/blocklist/url-dedup hygiene → quality gate → PII redaction →
exact + MinHash dedup → benchmark decontamination → DocEE extraction →
canonicalized vertex/edge tables → PageRank, every stage committed to
the StageStore with per-partition lineage and drop counters. The same
invocation again must skip every stage via manifest fingerprints.

Prints one JSON line:
  {"docs": N, "junk": J, "cold_sec": .., "docs_per_sec": ..,
   "stage_walls": {..}, "counters": {..}, "triples": .., "vertices": ..,
   "resume_sec": .., "resume_triples_match": true,
   "host_health_sec": [..], "host_health_saturating_sec": [..]}

Usage: python tools/refinery_run.py [--docs 1000000] [--junk-pct 5]
       [--cpus 32] [--base /tmp/docee_refinery] [--keep]
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
    p.add_argument("--junk-pct", type=int, default=5)
    p.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    p.add_argument("--base", default="/tmp/docee_refinery")
    p.add_argument("--mode", default="clique")
    p.add_argument("--commit", default="full", choices=["full", "sparse"],
                   help="checkpoint granularity: full = every stage "
                        "commits (max resumability); sparse = only the "
                        "pre-dedup and final corpora materialize "
                        "(compute-bound, isolates stage-commit I/O)")
    p.add_argument("--keep", action="store_true", help="keep store dir")
    args = p.parse_args()

    import bench
    from docee_spark.fixtures import (
        distributed_corpus,
        heuristic_entity_dict,
        junk_corpus,
        refinery_tables,
    )
    from docee_spark.session import get_spark
    from docee_spark.stages.pipeline import StageStore
    from docee_spark.stages.refinery import SPARSE_COMMIT, run_refinery

    spark = get_spark(
        "refinery",
        cores=args.cpus,
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 20),
        },
    )

    n_junk = args.docs * args.junk_pct // 100
    corpus_dir = os.path.join(args.base, f"corpus_{args.docs}_{n_junk}")
    store_dir = os.path.join(args.base, f"store_{args.docs}_{n_junk}")
    shutil.rmtree(store_dir, ignore_errors=True)
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        distributed_corpus(spark, args.docs).unionByName(
            junk_corpus(spark, n_junk, args.docs)
        ).repartition(max(64, 4 * args.cpus)).write.mode("overwrite").parquet(
            corpus_dir
        )

    robots, blocked, eval_df = refinery_tables(spark)
    health = [bench.host_health_probe()]
    health_sat = [bench.host_health_probe_saturating()]

    def leg() -> tuple[float, dict]:
        web = spark.read.parquet(corpus_dir)
        t0 = time.perf_counter()
        result = run_refinery(
            web,
            StageStore(store_dir),
            f"refinery-{args.docs}-{n_junk}",
            robots=robots,
            blocked=blocked,
            eval_df=eval_df,
            entity_dict=heuristic_entity_dict(),
            mode=args.mode,
            n_partitions=2 * args.cpus,
            commit_stages=SPARSE_COMMIT if args.commit == "sparse" else None,
        )
        # one count() to force the last (uncommitted-view) frame; all
        # stages are already materialized by their commits
        n_triples = result["triples"].count()
        return round(time.perf_counter() - t0, 1), result, n_triples

    cold_sec, cold, cold_triples = leg()
    n_vertices = cold["vertices"].count()
    resume_sec, resume, resume_triples = leg()
    health.append(bench.host_health_probe())
    health_sat.append(bench.host_health_probe_saturating())

    print(
        json.dumps(
            {
                "docs": args.docs,
                "junk": n_junk,
                "mode": args.mode,
                "commit": args.commit,
                "cpus": args.cpus,
                "cold_sec": cold_sec,
                "docs_per_sec": round((args.docs + n_junk) / cold_sec, 0),
                "stage_walls": cold["stage_walls"],
                "counters": cold["counters"],
                "triples": cold_triples,
                "vertices": n_vertices,
                "resume_sec": resume_sec,
                "resume_triples_match": resume_triples == cold_triples,
                "resume_stage_walls": resume["stage_walls"],
                "host_health_sec": health,
                "host_health_saturating_sec": health_sat,
            }
        )
    )
    if not args.keep:
        shutil.rmtree(store_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
