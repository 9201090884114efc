#!/usr/bin/env python3
"""Per-query optimization harness (guide §1: measure first).

NOT the frozen driver bench — bench.py stays untouched. This tool times
individual declared queries with the noop sink, optionally dumps
``.explain("formatted")`` plans, and repeats k times reporting min —
the dev-loop companion used for OPTIMIZATION_r06.md evidence.

Usage:
  python bench_extra.py q1 q2 ...            # time named queries
  python bench_extra.py --plans DIR q1 ...   # also dump formatted plans
  env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_PASSES (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
PASSES = int(os.environ.get("BENCH_EXTRA_PASSES", "2"))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    if args and args[0] == "--plans":
        plans_dir = args[1]
        args = args[2:]
        os.makedirs(plans_dir, exist_ok=True)
    suffix = os.environ.get("BENCH_EXTRA_PLAN_SUFFIX", "")

    import __spark_entry__ as em
    from docee_spark.session import get_spark

    spark = get_spark(
        "bench_extra",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 20),
        },
    )
    qs = em.queries()
    names = args or list(qs)
    out: dict[str, float] = {}
    for name in names:
        if plans_dir is not None:
            plan = qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        if PASSES <= 0:  # plans-only mode
            continue
        df = qs[name](spark, SF_DIR)
        df.count()  # warm plan (catalog, file listing) — same as bench.py
        times = []
        for _ in range(PASSES):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = min(times)
        print(f"## {name}: min={min(times)} all={times}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
