"""Head-to-head decontamination economics at 1M docs (BENCH.md
§decontam-bloom, end-of-r5 table): exact broadcast-join vs Bloom
map-only vs fuzzy Jaccard-scored, same corpus, same eval split, same
session — plus the planted-secret doctrine check (the secret-carrying
junk docs must all SCORE under fuzzy yet none cross tau = 0.1, because
a short verbatim leak inside a long page is the any-13-gram rule's
catch, not a whole-document near-dup).

Corpus: the refinery shape — 1M synthetic webtext + 50k junk with
planted eval secrets — against the 8-doc refinery eval suite; walls are
min-of-2 noop-sink passes with host-health probes in the record.

Usage: python tools/decontam_trio_bench.py  (prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import bench
    from docee_spark.fixtures import (
        distributed_corpus,
        junk_corpus,
        refinery_tables,
    )
    from docee_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
        decontaminate_fuzzy,
    )
    from docee_spark.session import get_spark

    spark = get_spark(cores=32)
    path = "/tmp/refinery_shape_corpus"
    t0 = time.time()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            distributed_corpus(spark, 1_000_000)
            .unionByName(junk_corpus(spark, 50_000, 1_000_000))
            .withColumn("doc_id", F.xxhash64("url"))
            .repartition(128)
            .write.mode("overwrite")
            .parquet(path)
        )
    gen_s = time.time() - t0
    corpus = spark.read.parquet(path)
    _, _, eval_raw = refinery_tables(spark)
    # integer eval ids: decontaminate_fuzzy reports best_eval_id as long
    eval_df = eval_raw.select(F.xxhash64("doc_id").alias("doc_id"), "text")

    def timed(make):
        walls = []
        for _ in range(2):
            t = time.time()
            make().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t, 1))
        return walls

    out = {
        "gen_s": round(gen_s, 1),
        "n_corpus": corpus.count(),
        "n_eval": eval_df.count(),
    }
    out["exact_n13"] = timed(lambda: decontaminate(corpus, eval_df, n=13))
    out["bloom_n13"] = timed(lambda: decontaminate_bloom(corpus, eval_df, n=13))
    out["fuzzy_n13"] = timed(lambda: decontaminate_fuzzy(corpus, eval_df, n=13))
    out["fuzzy_n3"] = timed(lambda: decontaminate_fuzzy(corpus, eval_df, n=3))
    f = (
        decontaminate_fuzzy(corpus, eval_df, n=13)
        .agg(
            F.sum("contaminated"),
            F.sum(F.when(F.col("jaccard_e6") > 0, 1).otherwise(0)),
        )
        .collect()[0]
    )
    out["fuzzy_n13_flagged_scored"] = [f[0], f[1]]
    out["probe"] = [
        bench.host_health_probe(),
        bench.host_health_probe_saturating(),
    ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
