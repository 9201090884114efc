"""Empirical Bloom decontamination error curve vs the analytic model.

For a sweep of filter sizes m, runs `decontaminate_bloom` and the exact
`decontaminate` on the SAME sf split (documents %50: eval vs corpus,
3-grams — the registry fixture) and reports, per m:

  * misses        — contaminated docs the Bloom path failed to flag
                    (MUST be 0 at every m: one-sided error contract)
  * fp_docs       — clean docs falsely flagged
  * fp_gram_rate  — false-positive rate over clean (doc, gram) pairs
  * fp_pred       — the analytic per-gram prediction (1 - e^{-kn/m})^k
                    with k = BLOOM_K and n = |distinct eval grams|

The analytic column is what `decontaminate_bloom`'s docstring tells
callers to size m with; this tool is the evidence it tracks reality.

Usage: python tools/bloom_fp_curve.py [--sf /root/testdata/sf0.1]
Prints one JSON line (recorded in BENCH.md §decontam-bloom).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument(
        "--m-bits", type=int, nargs="*",
        default=[1 << 12, 1 << 14, 1 << 16, 1 << 18, 1 << 20],
    )
    args = p.parse_args()

    from pyspark.sql import functions as F

    from docee_spark.operators.dedup import (
        BLOOM_K,
        decontaminate,
        decontaminate_bloom,
    )
    from docee_spark.operators.textstats import token_ngrams, tokens
    from docee_spark.session import get_spark

    spark = get_spark("bloom_fp_curve", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    evald = docs.where(F.col("doc_id") % 50 == 0)

    n_eval_grams = (
        evald.select(
            F.explode(
                F.array_distinct(token_ngrams(tokens(F.col("text")), 3))
            ).alias("g")
        )
        .distinct()
        .count()
    )
    exact = decontaminate(corpus, evald, n=3).cache()
    exact_stats = exact.agg(
        F.sum("contaminated").alias("contaminated_docs"),
        F.sum("n_grams").alias("grams"),
        F.sum("n_contaminated").alias("contaminated_grams"),
    ).collect()[0]

    curve = []
    for m in args.m_bits:
        joined = (
            decontaminate_bloom(corpus, evald, n=3, m_bits=m)
            .join(
                exact.select("doc_id", "n_contaminated", "contaminated"), "doc_id"
            )
            .agg(
                F.sum(
                    ((F.col("flagged") == 0) & (F.col("contaminated") == 1))
                    .cast("long")
                ).alias("misses"),
                F.sum(
                    ((F.col("flagged") == 1) & (F.col("contaminated") == 0))
                    .cast("long")
                ).alias("fp_docs"),
                F.sum("n_bloom_hits").alias("bloom_grams"),
            )
            .collect()[0]
        )
        clean_grams = exact_stats["grams"] - exact_stats["contaminated_grams"]
        fp_grams = joined["bloom_grams"] - exact_stats["contaminated_grams"]
        load = BLOOM_K * n_eval_grams / m
        curve.append(
            {
                "m_bits": m,
                "misses": joined["misses"],
                "fp_docs": joined["fp_docs"],
                "fp_gram_rate": round(fp_grams / clean_grams, 6),
                "fp_pred": round((1 - math.exp(-load)) ** BLOOM_K, 6),
            }
        )
        assert joined["misses"] == 0, f"one-sided error violated at m={m}"

    print(
        json.dumps(
            {
                "sf": args.sf,
                "k": BLOOM_K,
                "eval_grams": n_eval_grams,
                "corpus_docs": exact.count(),
                "contaminated_docs": int(exact_stats["contaminated_docs"]),
                "curve": curve,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
