#!/usr/bin/env python3
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the DocEE pipeline's docs/s (same formula as the
reference speed test: docs / total_time, run_dee_task.py:268), measured
over a deterministic synthetic webtext corpus through
tag → decode → triples in heuristic (no-gold) mode.

--scaling N: run the same workload in fresh JVM subprocesses at local[N]
and local[4N] and report throughput at both plus scaling efficiency —
the sandbox evidence for the north rule's two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
PIPELINE_DOCS = int(os.environ.get("BENCH_PIPELINE_DOCS", "2000"))

HEADLINE = [
    "agg_rollup",
    "join_region_revenue",
    "window_topk",
    "sessionize",
    "events_hourly",
    "quality",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "embed_topk",
    "embed_lsh_topk",
    "doc_mentions",
]


def _force(df) -> int:
    """Fully execute a plan without driver-side collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_bench(cpus: int = CPUS, sf_dir: str = SF_DIR) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import __spark_entry__ as em
    from docee_spark.fixtures import generate_corpus, heuristic_entity_dict
    from docee_spark.schema import WEBTEXT
    from docee_spark.session import get_spark
    from docee_spark.stages.pipeline import run_pipeline

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))

    qtimes: dict[str, float] = {}
    qs = em.queries()
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.count()  # warm plan (catalog, file listing)
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        qtimes[name] = round(time.perf_counter() - t0, 3)

    # DocEE pipeline docs/s (heuristic mode: the no-oracle production path)
    web_rows, _ = generate_corpus(PIPELINE_DOCS, seed=7)
    web = spark.createDataFrame(web_rows, WEBTEXT).cache()
    web.count()
    # warmup: one full untimed pass brings every Python UDF worker up
    # (pool spawn + imports + JIT); the timed pass then measures steady-
    # state throughput — the reference speed test does the same (resume,
    # then time only the decode epochs, run_dee_task.py:249-253)
    _force(
        run_pipeline(
            web,
            entity_dict=heuristic_entity_dict(),
            mode="clique",
            adjacency="sentence",
            use_html=False,
            n_partitions=max(cpus, 8),
        )["triples"]
    )
    t0 = time.perf_counter()
    result = run_pipeline(
        web,
        entity_dict=heuristic_entity_dict(),
        mode="clique",
        adjacency="sentence",
        use_html=False,
        n_partitions=max(cpus, 8),
    )
    _force(result["triples"])
    pipeline_sec = time.perf_counter() - t0
    qtimes["docee_pipeline"] = round(pipeline_sec, 3)
    docs_per_sec = PIPELINE_DOCS / pipeline_sec

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "docee_pipeline_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "pipeline_docs": PIPELINE_DOCS,
    }


def run_scaling(n: int) -> dict:
    """Same workload at local[n] and local[4n] in fresh JVMs.

    Uses a corpus large enough to saturate 4n cores (scheduling and
    Python-worker startup amortize out) — at 2k docs the job is overhead-
    dominated and anti-scales; 64k docs ≈ 30 s of real work at local[8].
    Run this with the machine otherwise idle: a concurrent process skews
    the 4n measurement far more than the n one."""
    docs = os.environ.get("BENCH_SCALING_DOCS", "64000")
    out = {}
    for cpus in (n, 4 * n):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_SF_DIR=SF_DIR,
            BENCH_PIPELINE_DOCS=docs,
        )
        proc = subprocess.run(
            [sys.executable, __file__],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        out[cpus] = json.loads(line)
    t_n = sum(out[n]["queries"].values())
    t_4n = sum(out[4 * n]["queries"].values())
    thr_n, thr_4n = out[n]["value"], out[4 * n]["value"]
    return {
        "N": n,
        "4N": 4 * n,
        "total_sec_N": round(t_n, 2),
        "total_sec_4N": round(t_4n, 2),
        "pipeline_docs_per_sec_N": thr_n,
        "pipeline_docs_per_sec_4N": thr_4n,
        "pipeline_scaling_efficiency": round(thr_4n / (4 * thr_n), 3),
        "total_time_scaling_efficiency": round(t_n / (4 * t_4n), 3),
        "runs": out,
    }


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling(int(sys.argv[2]))))
    else:
        print(json.dumps(run_bench()))
