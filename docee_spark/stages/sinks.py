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


def _field2types() -> dict[str, list[str]]:
    """field (exact role OR coarse type) → event types that can host it
    (the reference's create_field2class_index, dueefin_post_process.py:
    31-38, extended to the coarse-typed no-model tagger)."""
    from ..config import CHFINANN_EVENT_TYPES, ROLE_COARSE_TYPE

    out: dict[str, set[str]] = {}
    for et in CHFINANN_EVENT_TYPES:
        for f in et.fields:
            out.setdefault(f, set()).add(et.name)
            out.setdefault(ROLE_COARSE_TYPE.get(f, f), set()).add(et.name)
    return {k: sorted(v) for k, v in out.items()}


def submission_records(decoded: DataFrame, guess_strategy: str | None = "&") -> DataFrame:
    """Leaderboard submission formatting with type guessing — the generic
    half of the reference's dueefin post-process
    (dueefin_post_process.py:42-100): documents whose decode emitted no
    events get their event types *guessed* from the tagged span fields
    via the field→types index — strategy "&" intersects candidate sets
    span-by-span re-seeding when the intersection empties (the exact
    reference loop), "|" unions, None disables guessing — and one record
    per guessed type filled with every field-compatible span. Everything
    is codegen'd array algebra over the existing spans/events columns; no
    Python, no shuffle."""
    base = inference_records(decoded.filter(F.size("events") > 0))
    if guess_strategy is None:
        return base

    f2t = _field2types()
    empty_arr = F.array().cast("array<string>")

    def types_of(field):
        expr = empty_arr
        for f, types in f2t.items():
            expr = F.when(field == f, F.array(*[F.lit(t) for t in types])).otherwise(
                expr
            )
        return expr

    cand_sets = F.transform("spans", lambda s: types_of(s["field"]))
    if guess_strategy == "&":
        # the reference's sequential guess loop: empty acc is (re)seeded,
        # otherwise intersected — order-dependent by design
        merge = lambda acc, x: F.when(F.size(acc) <= 0, x).otherwise(  # noqa: E731
            F.array_intersect(acc, x)
        )
    elif guess_strategy == "|":
        merge = lambda acc, x: F.array_union(acc, x)  # noqa: E731
    else:
        raise ValueError(f"guess_strategy: {guess_strategy} not supported")
    guessed = F.aggregate(cand_sets, empty_arr, merge)

    from ..config import CHFINANN_EVENT_TYPES

    def fields_of(et):
        expr = empty_arr
        for e in CHFINANN_EVENT_TYPES:
            expr = F.when(
                et == e.name, F.array(*[F.lit(f) for f in e.fields])
            ).otherwise(expr)
        return expr

    def args_for(et):
        return F.transform(
            F.filter(
                "spans",
                lambda s: F.array_contains(fields_of(et), s["field"]),
            ),
            lambda s: F.struct(
                s["field"].alias("role"), s["text"].alias("argument")
            ),
        )

    guessed_list = F.filter(
        F.transform(
            guessed,
            lambda et: F.struct(
                et.alias("event_type"), args_for(et).alias("arguments")
            ),
        ),
        lambda ev: F.size(ev["arguments"]) > 0,
    )
    guessed_df = decoded.filter(F.size("events") <= 0).select(
        F.col("doc_id").alias("id"), guessed_list.alias("event_list")
    )
    return base.unionByName(guessed_df)


def write_kg(
    result: dict[str, DataFrame], out_dir: str, fmt: str = "parquet"
) -> None:
    for name in ("triples", "vertices", "edges", "ranks"):
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
