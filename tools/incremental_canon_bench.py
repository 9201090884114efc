"""Recrawl-canonicalization economics at 1M docs: full recompute vs the
delta-proportional incremental path (stages/canonicalize.py:
merge_triples_incremental).

Synthesizes a 1M-doc triple table with realistic vocabulary structure
(per-base near-dup surface clusters via suffix variants; bases are md5
tokens so unrelated bases never LSH-collide), cold-builds the
CanonState, then replays recrawl batches at two delta fractions. Each
batch re-extracts its docs with a new surface variant (new surfaces +
count churn + occasional cluster growth) — the realistic recrawl shape.

For each fraction it times
  * full   — merge_triples (anti-join + full re-canonicalization)
  * incr   — merge_triples_incremental (BFS-bounded re-clustering)
and sanity-checks the two paths emit identical vertex/edge COUNTS (the
row-exact equivalence is pytest-gated in test_kg_incremental_canon.py).

Prints ONE JSON line:
  {"docs": N, "triples": .., "surfaces": .., "cold_sec": ..,
   "batches": {"0.001": {"full_sec": .., "incr_sec": .., "speedup": ..,
                         "stats": {...}}, "0.01": {...}},
   "host_health_sec": [..], "host_health_saturating_sec": [..]}

Usage: python tools/incremental_canon_bench.py [--docs 1000000]
       [--cpus 32] [--fracs 0.001,0.01]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_triples(spark, n_docs: int):
    """~3 triples/doc; subj surfaces form per-base near-dup clusters."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).withColumn(
        "base", F.substring(F.md5((F.col("id") % (n_docs // 3 + 1)).cast("string")), 1, 12)
    )
    variant = F.element_at(
        F.array(F.lit(" ltd"), F.lit(" limited"), F.lit(" ltd.")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    subj = F.concat(F.lit("corp "), F.col("base"), variant)
    obj_city = F.concat(
        F.lit("city "),
        F.substring(F.md5((F.col("id") % 50_000).cast("string")), 1, 10),
    )
    obj_amt = F.concat(F.lit("amt "), (F.col("id") % 9973).cast("string"))
    rows = base.select(
        F.col("id").alias("doc_id"),
        F.lit("e").alias("event_type"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("recguid"), subj.alias("subj"),
                         F.lit("hq").alias("pred"), obj_city.alias("obj")),
                F.struct(F.lit(1).alias("recguid"), subj.alias("subj"),
                         F.lit("raised").alias("pred"), obj_amt.alias("obj")),
                F.struct(F.lit(2).alias("recguid"), obj_city.alias("subj"),
                         F.lit("hosts").alias("pred"), subj.alias("obj")),
            )
        ).alias("t"),
    ).select(
        "doc_id", "event_type",
        F.col("t.recguid").alias("recguid"), F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"), F.col("t.obj").alias("obj"),
    )
    return rows


def reextract_delta(spark, triples, frac: float, n_docs: int, tag: str):
    """Re-extraction of the first frac*n_docs docs: the subj gains a new
    ' {tag}' variant (new surfaces joining existing clusters), one triple
    per doc is dropped (count churn), plus frac/10 brand-new docs."""
    from pyspark.sql import functions as F

    cut = int(n_docs * frac)
    re_ex = (
        triples.filter(F.col("doc_id") < cut)
        .filter(F.col("recguid") < 2)  # the re-crawl lost one triple
        .withColumn(
            "subj",
            F.when(
                F.col("pred") == "hq", F.concat(F.col("subj"), F.lit(" " + tag))
            ).otherwise(F.col("subj")),
        )
    )
    fresh = synth_triples(spark, max(cut // 10, 1)).withColumn(
        "doc_id", F.col("doc_id") + n_docs * 7
    ).withColumn("subj", F.concat(F.col("subj"), F.lit(" " + tag)))
    return re_ex.unionByName(fresh)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=1_000_000)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--fracs", default="0.001,0.01")
    p.add_argument(
        "--max-bucket",
        type=int,
        default=None,
        help="band-bucket cap (production config; None = historical "
        "uncapped clustering, whose hub buckets percolate the band graph "
        "— the worst case for BFS locality)",
    )
    args = p.parse_args()

    import bench
    from docee_spark.session import get_spark
    from docee_spark.stages.canonicalize import (
        canonicalize_state,
        merge_triples,
        merge_triples_incremental,
    )

    spark = get_spark(
        "incr_canon", cores=args.cpus, shuffle_partitions=max(args.cpus, 8)
    )
    health = [bench.host_health_probe()]
    health_sat = [bench.host_health_probe_saturating()]

    triples = synth_triples(spark, args.docs).localCheckpoint()
    n_triples = triples.count()

    # .materialize(): the state tables are lazily checkpointed (r5) —
    # force them inside the timed region so cold_sec measures the build,
    # not the first batch's incidental materialization
    t0 = time.perf_counter()
    state = canonicalize_state(triples, max_bucket=args.max_bucket).materialize()
    cold_sec = round(time.perf_counter() - t0, 1)
    n_surfaces = state.resolved.count()

    batches = {}
    for frac in [float(f) for f in args.fracs.split(",")]:
        delta = reextract_delta(
            spark, triples, frac, args.docs, f"b{int(frac * 1e4)}"
        ).localCheckpoint()

        t0 = time.perf_counter()
        _, fv, fe = merge_triples(triples, delta, max_bucket=args.max_bucket)
        full_counts = (fv.count(), fe.count())
        full_sec = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        st2 = merge_triples_incremental(state, delta).materialize()
        incr_sec = round(time.perf_counter() - t0, 1)
        incr_counts = (st2.vertices.count(), st2.edges_full.count())

        assert incr_counts == full_counts, (incr_counts, full_counts)
        batches[str(frac)] = {
            "delta_docs": delta.select("doc_id").distinct().count(),
            "full_sec": full_sec,
            "incr_sec": incr_sec,
            "speedup": round(full_sec / max(incr_sec, 0.01), 1),
            "stats": st2.stats,
        }
        health.append(bench.host_health_probe())

    health_sat.append(bench.host_health_probe_saturating())
    print(
        json.dumps(
            {
                "docs": args.docs,
                "cpus": args.cpus,
                "max_bucket": args.max_bucket,
                "triples": n_triples,
                "surfaces": n_surfaces,
                "cold_sec": cold_sec,
                "batches": batches,
                "host_health_sec": health,
                "host_health_saturating_sec": health_sat,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
