"""Sinks and result-aggregation sources (S3/S5/S6 in SURVEY §2.1).

  * ``write_inference_jsonl`` — the reference's serving output shape
    (dee/tasks/dee_task.py:1698-1813): one JSON object per document with
    {id, event_list:[{event_type, arguments:[{role, argument}]}]}.
  * ``write_kg`` — vertex/edge/triple tables as parquet (Iceberg
    ``writeTo(...).append()`` in production).
  * ``read_eval_dumps`` — the S6 aggregator source: globs committed
    metrics manifests back in and exposes them as a DataFrame for
    best-epoch-style selection (J7/W1 analog over stages instead of
    epochs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def inference_records(decoded: DataFrame) -> DataFrame:
    """doc rows + events → the serving JSON shape, computed JVM-side."""
    args_arr = lambda ev: F.filter(  # noqa: E731
        F.transform(
            F.map_keys(ev["args"]),
            lambda k: F.struct(
                k.alias("role"), F.element_at(ev["args"], k).alias("argument")
            ),
        ),
        lambda s: s["argument"].isNotNull(),
    )
    return decoded.select(
        F.col("doc_id").alias("id"),
        F.transform(
            F.col("events"),
            lambda ev: F.struct(
                ev["type"].alias("event_type"),
                args_arr(ev).alias("arguments"),
            ),
        ).alias("event_list"),
    )


def write_inference_jsonl(decoded: DataFrame, out_dir: str) -> None:
    inference_records(decoded).write.mode("overwrite").json(out_dir)


def write_kg(
    result: dict[str, DataFrame], out_dir: str, fmt: str = "parquet"
) -> None:
    for name in ("triples", "vertices", "edges"):
        if name in result:
            result[name].write.mode("overwrite").format(fmt).save(
                os.path.join(out_dir, name)
            )


def read_eval_dumps(spark: SparkSession, store_root: str) -> DataFrame:
    """Manifest JSONs → DataFrame(stage, input_fingerprint, committed_at,
    counters map) — the resumable-run audit table."""
    rows = []
    for fn in sorted(os.listdir(store_root)):
        if fn.endswith(".manifest.json"):
            with open(os.path.join(store_root, fn)) as f:
                m = json.load(f)
            rows.append(
                (
                    m.get("stage"),
                    m.get("input_fingerprint"),
                    float(m.get("committed_at", 0.0)),
                    {k: float(v) for k, v in (m.get("counters") or {}).items()},
                )
            )
    return spark.createDataFrame(
        rows,
        "stage string, input_fingerprint string, committed_at double, "
        "counters map<string,double>",
    )
