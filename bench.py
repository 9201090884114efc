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

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
PIPELINE_DOCS = int(os.environ.get("BENCH_PIPELINE_DOCS", "20000"))

HEADLINE = [
    "agg_rollup",
    "join_region_revenue",
    "window_topk",
    "sessionize",
    "events_hourly",
    "quality",
    "quality_model",
    "repetition",
    "vocab_topk",
    "url_dedup",
    "pagerank",
    "kg_incremental",
    "kg_incremental_state",
    "kg_bgp",
    "join_asof",
    # r5: binned interval-containment join
    "join_interval",
    "triangles",
    "collocations",
    "recrawl_churn",
    "dedup_exact",
    "dedup_clusters",
    "dedup_minhash",
    "dedup_minhash_verified",
    "dedup_ngram",
    "dedup_substr",
    "dedup_simhash",
    "dedup_simhash64",
    "dedup_embed",
    "dedup_semantic",
    "decontaminate",
    # r5: the map-only Bloom variant — timed next to the broadcast-join
    # formulation it replaces at scale
    "decontaminate_bloom",
    # r5: the Jaccard-scored near-dup rule, same two-broadcast skeleton
    "decontaminate_fuzzy",
    "pii_scrub",
    "dsir",
    "extract_links",
    # r5: anchor-text entity dictionary (extraction + two-level vote)
    "anchor_surfaces",
    "pack_sequences",
    "embed_topk",
    "embed_lsh_topk",
    "doc_mentions",
    # r4 additions: temporal-KG SCD2, crawl-index keys, ER quality
    # metrics over the planted-dup clusterer, TransE link-prediction eval
    "kg_scd2",
    "url_keys",
    "dedup_quality",
    "kg_transe_eval",
    # r4.2 additions: HLL cardinality sketch, BM25 retrieval, histogram
    # quantile audit, HITS, Count-Min, TF-IDF keywords, seeded RWR
    "hll_tokens",
    "bm25",
    "length_quantiles",
    "hits",
    "cm_tokens",
    "keywords",
    "ppr",
]


def _force(df) -> int:
    """Fully execute a plan without driver-side collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def host_health_probe() -> float:
    """Deterministic single-thread CPU probe (seconds; lower = healthier).

    This sandbox host shows bimodal hypervisor throttling: identical
    code varies 2-5× between windows (see BENCH.md). Recording a fixed
    numpy workload alongside every bench run lets a reader normalize a
    record for host health — an idle healthy window measures ~0.1-0.4 s;
    a throttled window inflates this proportionally to the query times."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.normal(size=(512, 512))
    b = rng.normal(size=(512, 512))
    t0 = time.perf_counter()
    for _ in range(30):
        a = np.tanh(a @ b * 1e-3)
    return round(time.perf_counter() - t0, 3)


def _saturating_worker(iters: int) -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.normal(size=(512, 512))
    b = rng.normal(size=(512, 512))
    t0 = time.perf_counter()
    for _ in range(iters):
        a = np.tanh(a @ b * 1e-3)
    return time.perf_counter() - t0


def host_health_probe_saturating(n_procs: int | None = None) -> float:
    """All-cores CPU probe (wall seconds; lower = healthier).

    The single-thread probe has a documented blind spot: hypervisor
    steal that only bites when all 32 cores are busy (BENCH.md records
    a run with healthy single-thread probes while 32-thread UDF stages
    sat 40% off the floor). This probe runs the same tanh-matmul on
    EVERY core simultaneously via multiprocessing; on an unthrottled
    host wall time ≈ the single-process time (embarrassingly parallel),
    and core-saturating steal inflates it proportionally — so the pair
    (single, saturating) separates "host slow" from "host slow only
    under full load", which is exactly the regime Spark local[32]
    benches run in."""
    import multiprocessing as mp

    # affinity-aware: under taskset (scaling legs) a pool sized to the
    # MACHINE would time-slice (32 procs on 4 cores reads ~8× inflated
    # on a healthy host); sized to the mask, healthy ≈ one process's
    # time + pool setup at every leg width
    try:
        avail = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        avail = os.cpu_count() or 1
    n = n_procs or avail
    t0 = time.perf_counter()
    ctx = mp.get_context("fork")
    with ctx.Pool(n) as pool:
        pool.map(_saturating_worker, [10] * n)
    return round(time.perf_counter() - t0, 3)


def run_bench(cpus: int = CPUS, sf_dir: str = SF_DIR) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import __spark_entry__ as em
    from docee_spark.fixtures import distributed_corpus, heuristic_entity_dict
    from docee_spark.session import get_spark
    from docee_spark.stages.pipeline import run_pipeline

    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=max(cpus, 8),
        # small-file corpus: keep scan splits fine-grained so every core
        # gets work without a rebalancing exchange
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 20),
        },
    )

    health_start = host_health_probe()
    health_sat_start = host_health_probe_saturating()
    qtimes: dict[str, float] = {}
    qs = em.queries()

    # DocEE pipeline docs/s — the fused heuristic path (production shape:
    # one Arrow UDF, corpus generated ON the executors, no driver
    # bottleneck). Warmup: one full untimed pass brings every Python UDF
    # worker up; the timed pass measures steady state — the reference
    # speed test does the same (resume, then time only the decode epochs,
    # run_dee_task.py:249-253).
    # corpus materialized ONCE as parquet and shared across runs/levels:
    # identical input bytes, real scan splits (no driver cache pressure,
    # no repartition exchange of nested rows)
    corpus_dir = os.environ.get(
        "BENCH_CORPUS_DIR", f"/tmp/docee_bench_corpus_{PIPELINE_DOCS}"
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        distributed_corpus(spark, PIPELINE_DOCS).drop("html").repartition(
            max(64, 4 * cpus)
        ).write.mode("overwrite").parquet(corpus_dir)
    web = spark.read.parquet(corpus_dir).withColumn(
        "html", F.lit(None).cast("binary")
    )

    def pipe(src=None):
        return run_pipeline(
            src if src is not None else web,
            entity_dict=heuristic_entity_dict(),
            mode="clique",
            fused="deep",
            use_html=False,
            n_partitions=2 * cpus,
        )

    # warmup on a 1/8 slice that touches EVERY partition (pmod filter, not
    # limit): brings all Python UDF workers up at 1/8 the CPU burn
    warm = web.where(F.pmod(F.xxhash64("url"), F.lit(8)) == 0)
    _force(pipe(warm)["triples"])
    # best-of-k: the sandbox host shows hypervisor noise (identical runs
    # vary 2×); min over k passes measures machine capability, like the
    # reference's multi-epoch speed test (speed_test_epochs=5)
    k = int(os.environ.get("BENCH_PASSES", "5"))
    passes = []
    for _ in range(k):
        t0 = time.perf_counter()
        _force(pipe()["triples"])
        passes.append(time.perf_counter() - t0)
    pipeline_sec = min(passes)
    qtimes["docee_pipeline"] = round(pipeline_sec, 3)
    docs_per_sec = PIPELINE_DOCS / pipeline_sec
    pipeline_passes = [round(p, 2) for p in passes]

    # model-tagger pipeline (apples-to-apples with the reference's
    # trained-model speed test): trained char tagger (M1) in the tag
    # slot, sentence adjacency, clique decode
    model_docs_per_sec = None
    if not os.environ.get("BENCH_SKIP_MODEL"):
        from docee_spark.golden import ensure_tagger

        tagger = ensure_tagger()

        def model_pipe(src=None):
            return run_pipeline(
                src if src is not None else web,
                model=tagger,
                mode="clique",
                adjacency="sentence",
                use_html=False,
                # deep fusion for the model slot too (r5): one Arrow UDF
                # for segment+tag+decode, row-identical to the staged
                # path (tests/test_fused.py), ~1.5x on this battery
                fused="deep",
                n_partitions=2 * cpus,
            )

        _force(model_pipe(warm)["triples"])
        mpasses = []
        for _ in range(max(3, k - 2)):
            t0 = time.perf_counter()
            _force(model_pipe()["triples"])
            mpasses.append(time.perf_counter() - t0)
        qtimes["docee_pipeline_model"] = round(min(mpasses), 3)
        model_docs_per_sec = round(PIPELINE_DOCS / min(mpasses), 2)

    # headline queries AFTER the pipeline measurement: the dedup battery
    # heats the JVM (GC pressure, codegen cache) and on this throttling-
    # prone host running it first contaminated the r2 pipeline record
    headline = [] if os.environ.get("BENCH_SKIP_QUERIES") else HEADLINE
    for name in headline:
        df = qs[name](spark, sf_dir)
        df.count()  # warm plan (catalog, file listing)
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        qtimes[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "docee_pipeline_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "pipeline_docs": PIPELINE_DOCS,
        "pipeline_passes": pipeline_passes,
        "model_pipeline_docs_per_sec": model_docs_per_sec,
        # single-thread CPU probe at start/end (seconds; ~0.1-0.4 s
        # healthy-idle; inflated proportionally in a hypervisor-throttle
        # window — use to normalize this record for host health)
        "host_health_sec": [health_start, host_health_probe()],
        # all-cores probe at start/end: catches core-saturating steal
        # the single-thread probe is blind to (healthy ≈ the single-
        # probe's per-process time; throttled inflates 2-5×) — compare
        # records ONLY after normalizing by this pair
        "host_health_saturating_sec": [
            health_sat_start,
            host_health_probe_saturating(),
        ],
    }


def run_scaling(n: int) -> dict:
    """Same workload at local[n] and local[4n] in fresh JVMs.

    Uses a corpus large enough that per-document compute dominates the
    ~2 s fixed per-job cost (planning, exchange, Arrow stream setup): at
    2k docs the job is overhead-dominated and anti-scales; 1M docs ≈ 80 s
    of real work at local[8] and the efficiency measurement is honest.

    Each level is pinned to exactly that many physical cores with
    ``taskset``: without pinning, local[n]'s Python UDF workers silently
    spill onto the machine's remaining cores and the "small cluster"
    measurement is wrong (measured: local[8] unpinned ran 4× faster than
    8 cores' worth of CPU). Run with the machine otherwise idle."""
    docs = os.environ.get("BENCH_SCALING_DOCS", "1000000")
    out = {}
    # 4N leg first: on burst-credit hosts the large leg is the one that
    # needs headroom; measuring it before the long small leg drains the
    # budget gives the honest capability number (min-of-k either way)
    for cpus in (4 * n, n):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_SF_DIR=SF_DIR,
            BENCH_PIPELINE_DOCS=docs,
            # isolate: the scaling criterion is THE SAME JOB at two
            # levels — headline queries in the same JVM leave heap/GC
            # state that contaminates the pipeline measurement
            BENCH_SKIP_QUERIES="1",
            BENCH_SKIP_MODEL="1",
            SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "32g"),
        )
        cmd = [sys.executable, __file__]
        if os.path.exists("/usr/bin/taskset") and cpus <= (os.cpu_count() or cpus):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd,
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
