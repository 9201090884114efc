"""ANN recall curves: recall@k of the bucketed paths vs brute force.

Measures, on the driver testdata embeddings ($SPARK_GRAFT_SF_DIR, default
sf0.1, 2000×64 unit vectors):
  * sign-LSH: recall@k across n_bits ∈ {4, 6, 8} × probe_flips ∈ {0, 1, 2}
  * IVF:      recall@k across nprobe ∈ {1, 2, 4, 8, 16} (16 centroids)

Prints a JSON line per config plus a markdown table for BENCH.md. Recall
is measured against brute_force_topk over the full corpus with the first
64 vectors as queries.

Usage: python tools/recall_curves.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

K = 3
N_QUERIES = 64


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(truth: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    return hits / total


def main() -> None:
    from docee_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        train_ivf_centroids,
    )
    from docee_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = em.filter(F.col("vec_id") < N_QUERIES)

    truth = topk_sets(brute_force_topk(em, queries, k=K).collect())

    results = []
    for n_bits in (4, 6, 8):
        for flips in (0, 1, 2):
            got = topk_sets(
                lsh_topk(em, queries, k=K, n_bits=n_bits, probe_flips=flips).collect()
            )
            results.append(
                {
                    "path": "lsh",
                    "n_bits": n_bits,
                    "probe_flips": flips,
                    "probes": 1 + flips,
                    "recall_at_k": round(recall(truth, got), 4),
                }
            )

    import numpy as np
    import pyarrow.parquet as pq

    vecs = np.array(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )
    cents = train_ivf_centroids(np.round(vecs * 10000).astype(np.int64))
    for nprobe in (1, 2, 4, 8, 16):
        got = topk_sets(ivf_topk(em, queries, cents, k=K, nprobe=nprobe).collect())
        results.append(
            {
                "path": "ivf",
                "n_centroids": len(cents),
                "nprobe": nprobe,
                "recall_at_k": round(recall(truth, got), 4),
            }
        )

    for r in results:
        print(json.dumps(r))
    print()
    print("| path | config | probes | recall@%d |" % K)
    print("|---|---|---|---|")
    for r in results:
        if r["path"] == "lsh":
            cfg, probes = f"{r['n_bits']} bits", r["probes"]
        else:
            cfg, probes = f"{r['n_centroids']} cents", r["nprobe"]
        print(f"| {r['path']} | {cfg} | {probes} | {r['recall_at_k']:.3f} |")


if __name__ == "__main__":
    main()
