"""Stage 5 — triples: event records → (subj, pred, obj) rows, fully JVM-side.

Flattening semantics of FIXTURES.md §4 / the reference's serving output
(dee/tasks/dee_task.py:1236-1367: {event_type, arguments:[{role, argument}]}
flattens to (doc, event_type#role, argument)). subj = first non-null
key-field argument (falling back to first non-null argument in role order) —
computed with higher-order array functions against a *broadcast* catalog
dimension, so the whole stage is one codegen'd projection + explode, no
Python and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CHFINANN_EVENT_TYPES


def _catalog_df(spark, event_types=None):
    cat = tuple(event_types) if event_types is not None else CHFINANN_EVENT_TYPES
    rows = [
        (et.name, list(et.fields), list(et.key_fields) + list(et.fields))
        for et in cat
    ]
    return spark.createDataFrame(
        rows, "event_type string, fields array<string>, subj_order array<string>"
    )


def triples(decoded: DataFrame, event_types=None) -> DataFrame:
    """→ (doc_id, event_type, recguid, subj, pred, obj).

    ``event_types``: the schema catalog (default ChFinAnn) — the inner
    equi-join on event_type means records of types missing from the
    catalog dimension emit no triples."""
    spark = decoded.sparkSession
    cat = _catalog_df(spark, event_types)

    ev = decoded.select("doc_id", F.explode("events").alias("ev")).select(
        "doc_id",
        F.col("ev.recguid").alias("recguid"),
        F.col("ev.type").alias("event_type"),
        F.col("ev.args").alias("args"),
    )
    # broadcast dim join: catalog is 5 rows
    ev = ev.join(F.broadcast(cat), "event_type")

    non_null_in_order = F.filter(
        F.transform(F.col("subj_order"), lambda f: F.col("args")[f]),
        lambda v: v.isNotNull(),
    )
    ev = ev.withColumn("subj", F.element_at(non_null_in_order, 1))

    role_vals = F.filter(
        F.transform(
            F.col("fields"),
            lambda f: F.struct(f.alias("role"), F.col("args")[f].alias("obj")),
        ),
        lambda s: s["obj"].isNotNull(),
    )
    return (
        ev.select(
            "doc_id",
            "event_type",
            "recguid",
            "subj",
            F.explode(role_vals).alias("rv"),
        )
        .select(
            "doc_id",
            "event_type",
            "recguid",
            "subj",
            F.concat_ws("#", "event_type", F.col("rv.role")).alias("pred"),
            F.col("rv.obj").alias("obj"),
        )
    )
