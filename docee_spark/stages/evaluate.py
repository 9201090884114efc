"""Stage 7 — evaluate: pred events vs gold events, reference metric semantics.

Two layers, exactly like the reference harness:
  1. per-(doc, event_type) greedy record matching (J2, dee/metrics.py:42-79)
     — order-sensitive by design, run row-locally inside a cogrouped
     applyInPandas (the only non-relational piece);
  2. relational rollups (A1, dee/metrics.py:443-545): role → event-type →
     overall sums are a plain ``rollup`` over the emitted counts, with
     P/R/F1 as scalar column expressions (metrics.py:156-165); doc_type
     slicing (F6, helper/__init__.py:230-239) is a ``cube`` dimension.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CHFINANN_EVENT_TYPES
from ..pyref.matching import event_role_tpfpfn

_STATS_SCHEMA = (
    "doc_id string, doc_type string, event_type string, role string, "
    "tp long, fp long, fn long"
)


def _records_by_type(events, fields_of) -> dict[str, list[tuple]]:
    out: dict[str, list[tuple]] = {}
    if events is None:
        events = []
    for ev in events:
        et = ev["type"]
        args = dict(ev["args"])
        out.setdefault(et, []).append(tuple(args.get(f) for f in fields_of[et]))
    return out


def role_stats(
    pred: DataFrame, gold: DataFrame, event_types=None
) -> DataFrame:
    """→ one row per (doc, event_type, role) with tp/fp/fn counts.

    ``pred``: (doc_id, events); ``gold``: (doc_id, doc_type, events).
    Cogrouped on doc_id so a document's pred and gold meet row-locally —
    a co-partitioned shuffle each side, nothing collected to the driver.
    ``event_types``: the schema catalog (default ChFinAnn), mirroring the
    reference harness' template selection.
    """
    cat = tuple(event_types) if event_types is not None else CHFINANN_EVENT_TYPES
    fields_of = {et.name: list(et.fields) for et in cat}

    def match(key, pred_pdf: pd.DataFrame, gold_pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = key[0]
        pred_events = pred_pdf["events"].iloc[0] if len(pred_pdf) else []
        gold_events = gold_pdf["events"].iloc[0] if len(gold_pdf) else []
        doc_type = gold_pdf["doc_type"].iloc[0] if len(gold_pdf) else "unk"
        preds = _records_by_type(pred_events, fields_of)
        golds = _records_by_type(gold_events, fields_of)
        rows = []
        for et, fields in fields_of.items():
            p = preds.get(et)
            g = golds.get(et)
            if p is None and g is None:
                continue
            stats = event_role_tpfpfn(p, g, len(fields))
            for role, (tp, fp, fn) in zip(fields, stats):
                rows.append((doc_id, doc_type, et, role, tp, fp, fn))
        return pd.DataFrame(
            rows, columns=["doc_id", "doc_type", "event_type", "role", "tp", "fp", "fn"]
        )

    return (
        pred.select("doc_id", "events")
        .groupBy("doc_id")
        .cogroup(gold.select("doc_id", "doc_type", "events").groupBy("doc_id"))
        .applyInPandas(match, schema=_STATS_SCHEMA)
    )


def _prf1_cols(df: DataFrame) -> DataFrame:
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    p = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    r = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    df = df.withColumn("precision", p).withColumn("recall", r)
    pr = F.col("precision") + F.col("recall")
    return df.withColumn(
        "f1",
        F.when(pr > 0, 2 * F.col("precision") * F.col("recall") / pr).otherwise(
            F.lit(0.0)
        ),
    )


def micro_rollup(stats: DataFrame) -> DataFrame:
    """rollup(event_type, role): per-role, per-type, and grand-total rows
    (null dims = subtotal, like the reference's micro rollup)."""
    agg = stats.rollup("event_type", "role").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    return _prf1_cols(agg)


def doc_type_rollup(stats: DataFrame) -> DataFrame:
    """F6 doc-type slicing: metrics over o2o/o2m/m2m subsets + overall."""
    agg = stats.cube("doc_type").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    return _prf1_cols(agg)


def macro_f1(stats: DataFrame) -> DataFrame:
    """A1 macro: mean of per-event-type F1 (metrics.py:465-545)."""
    per_type = _prf1_cols(
        stats.groupBy("event_type").agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
        )
    )
    return per_type.agg(
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
    )


def event_type_stats(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """A2 — multi-label event-type classification P/R/F1 (reference
    dee/metrics.py:168-227): a doc's predicted type set vs its gold type
    set, counted per type. Pure relational: distinct (doc, type) both
    sides → full outer join → TP/FP/FN sums → P/R/F1 columns."""
    def types_of(df: DataFrame, doc_col: str) -> DataFrame:
        return (
            df.select(
                F.col(doc_col).alias("doc_id"),
                F.explode(
                    F.array_distinct(
                        F.transform(F.col("events"), lambda e: e["type"])
                    )
                ).alias("event_type"),
            )
            .distinct()
        )

    p = types_of(pred, "doc_id").withColumn("in_pred", F.lit(1))
    g = types_of(gold, "doc_id").withColumn("in_gold", F.lit(1))
    joined = p.join(g, ["doc_id", "event_type"], "full").fillna(
        {"in_pred": 0, "in_gold": 0}
    )
    agg = joined.groupBy("event_type").agg(
        F.sum(F.col("in_pred") * F.col("in_gold")).alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_gold"))).alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_gold")).alias("fn"),
    )
    return _prf1_cols(agg)


def instance_stats(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """A4 — instance-level (whole-record) P/R/F1 (reference
    dee/metrics.py:260-307; canonical forms dee/utils.py:241-267): a
    record matches only if its full (type, role→arg) assignment is
    identical. Canonical key = event_type + sorted non-null (role, arg)
    pairs; distinct per doc (set-of-sets semantics), then full outer
    join and per-type TP/FP/FN."""
    def keys_of(df: DataFrame) -> DataFrame:
        ev = df.select("doc_id", F.explode("events").alias("ev"))
        pairs = F.array_sort(
            F.filter(
                F.transform(
                    F.map_keys(F.col("ev.args")),
                    lambda k: F.concat_ws(
                        "=", k, F.element_at(F.col("ev.args"), k)
                    ),
                ),
                # null args: concat_ws skips nulls → bare "role" with no
                # '=' — excluded (a null role is absent from the instance
                # key, matching the reference's canonical form)
                lambda s: s.contains("="),
            )
        )
        return ev.select(
            "doc_id",
            F.col("ev.type").alias("event_type"),
            F.concat_ws("|", pairs).alias("record_key"),
        ).distinct()

    p = keys_of(pred).withColumn("in_pred", F.lit(1))
    g = keys_of(gold).withColumn("in_gold", F.lit(1))
    joined = p.join(g, ["doc_id", "event_type", "record_key"], "full").fillna(
        {"in_pred": 0, "in_gold": 0}
    )
    agg = joined.groupBy("event_type").agg(
        F.sum(F.col("in_pred") * F.col("in_gold")).alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_gold"))).alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_gold")).alias("fn"),
    )
    return _prf1_cols(agg)


def entity_stats(pred_spans: DataFrame, gold_spans: DataFrame) -> DataFrame:
    """A3 — entity-set P/R/F1 (reference dee/metrics.py:230-257): per-doc
    predicted span-surface set vs gold set; one global TP/FP/FN row.
    ``*_spans``: (doc_id, spans) with schema.SPANS columns."""
    def surfaces(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.transform("spans", lambda s: s["text"]))
            ).alias("surface"),
        ).distinct()

    p = surfaces(pred_spans).withColumn("in_pred", F.lit(1))
    g = surfaces(gold_spans).withColumn("in_gold", F.lit(1))
    joined = p.join(g, ["doc_id", "surface"], "full").fillna(
        {"in_pred": 0, "in_gold": 0}
    )
    agg = joined.agg(
        F.sum(F.col("in_pred") * F.col("in_gold")).alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_gold"))).alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_gold")).alias("fn"),
    )
    return _prf1_cols(agg)


def single_vs_multi_report(stats: DataFrame, gold: DataFrame) -> DataFrame:
    """The reference's single-vs-multi evaluation report
    (dee/helper/__init__.py:595-723, print_eval.py:370-399): documents
    split by is_multi_event (>1 gold records); per slice one row per
    event type (micro P/R/F1 from the role-stats sums), a slice micro
    total (event_type = 'TOTAL_MICRO'), and the macro average of the
    per-type scores (event_type = 'TOTAL_MACRO', computed over the
    integerized per-type scores so the average is engine-portable).
    Scores ×10⁴ floored; all relational — two groupBys over role stats.
    """
    cls = gold.select(
        F.col("guid").alias("doc_id"),
        F.when(F.size("events") > 1, F.lit("multi"))
        .otherwise(F.lit("single"))
        .alias("subset"),
    )
    st = stats.join(cls, "doc_id")

    def prf_e4_cols(df: DataFrame) -> DataFrame:
        df = _prf1_cols(df)
        return df.select(
            "subset",
            "event_type",
            "tp",
            "fp",
            "fn",
            F.floor(F.col("precision") * 10000).cast("long").alias("precision_e4"),
            F.floor(F.col("recall") * 10000).cast("long").alias("recall_e4"),
            F.floor(F.col("f1") * 10000).cast("long").alias("f1_e4"),
        )

    per_type = prf_e4_cols(
        st.groupBy("subset", "event_type").agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
        )
    )
    micro = prf_e4_cols(
        st.groupBy("subset")
        .agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
        )
        .withColumn("event_type", F.lit("TOTAL_MICRO"))
    )
    macro = per_type.groupBy("subset").agg(
        F.lit("TOTAL_MACRO").alias("event_type"),
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("long").alias("fp"),
        F.lit(None).cast("long").alias("fn"),
        F.floor(F.avg("precision_e4")).cast("long").alias("precision_e4"),
        F.floor(F.avg("recall_e4")).cast("long").alias("recall_e4"),
        F.floor(F.avg("f1_e4")).cast("long").alias("f1_e4"),
    )
    return per_type.unionByName(micro.select(*per_type.columns)).unionByName(
        macro.select(*per_type.columns)
    )


def _edge_set(adj_col):
    """array<array<int>> adjacency → array<struct<i,j>> of directed
    off-diagonal 1-edges (build_single_element_connections analog,
    adj_decoding.py:9-25) — all higher-order functions, no Python."""
    return F.flatten(
        F.transform(
            adj_col,
            lambda row, i: F.transform(
                F.filter(
                    F.transform(
                        row,
                        lambda v, j: F.struct(
                            i.alias("i"), j.alias("j"), v.alias("v")
                        ),
                    ),
                    lambda s: (s["v"] == 1) & (s["i"] != s["j"]),
                ),
                lambda s: F.struct(s["i"].alias("i"), s["j"].alias("j")),
            ),
        )
    )


def adjacency_stats(
    df: DataFrame, pred_col: str = "pred_adj", gold_col: str = "gold_adj"
) -> DataFrame:
    """A5 — adjacency / connection / trigger metrics as ONE relational
    aggregation (reference dee/metrics.py:310-399):

      * exact-match accuracy: pred ≡ gold with the diagonal ignored
        (get_adj_mat_acc zeroes it);
      * connection micro P/R/F1 over directed off-diagonal edge sets;
      * trigger-identification micro P/R/F1 over the sets of nodes with
        ≥1 out-edge.

    Input: one row per document with two array<array<int>> matrices.
    Everything is codegen'd set algebra (array_intersect/except) + one
    partial-aggregated sum — no driver-side matrix loop like the
    reference. Scores ×10⁴ floored."""
    pe = _edge_set(F.col(pred_col))
    ge = _edge_set(F.col(gold_col))
    per_doc = df.select(
        F.size(F.array_intersect(pe, ge)).alias("conn_tp"),
        F.size(F.array_except(pe, ge)).alias("conn_fp"),
        F.size(F.array_except(ge, pe)).alias("conn_fn"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.transform(pe, lambda s: s["i"])),
                F.array_distinct(F.transform(ge, lambda s: s["i"])),
            )
        ).alias("trig_tp"),
        F.size(
            F.array_except(
                F.array_distinct(F.transform(pe, lambda s: s["i"])),
                F.array_distinct(F.transform(ge, lambda s: s["i"])),
            )
        ).alias("trig_fp"),
        F.size(
            F.array_except(
                F.array_distinct(F.transform(ge, lambda s: s["i"])),
                F.array_distinct(F.transform(pe, lambda s: s["i"])),
            )
        ).alias("trig_fn"),
        (
            (F.size(F.array_except(pe, ge)) == 0)
            & (F.size(F.array_except(ge, pe)) == 0)
            & (F.size(F.col(pred_col)) == F.size(F.col(gold_col)))
        )
        .cast("int")
        .alias("exact"),
    )

    def prf_e4(tp, fp, fn, prefix):
        p = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
        r = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
        f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
        return [
            F.floor(p * 10000).cast("long").alias(f"{prefix}_precision_e4"),
            F.floor(r * 10000).cast("long").alias(f"{prefix}_recall_e4"),
            F.floor(f1 * 10000).cast("long").alias(f"{prefix}_f1_e4"),
        ]

    agg = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.floor(F.sum("exact") * 10000 / F.count("*")).alias("exact_acc_e4"),
        *[
            F.sum(c).alias(c)
            for c in ("conn_tp", "conn_fp", "conn_fn", "trig_tp", "trig_fp", "trig_fn")
        ],
    )
    conn = [F.col("conn_tp"), F.col("conn_fp"), F.col("conn_fn")]
    trig = [F.col("trig_tp"), F.col("trig_fp"), F.col("trig_fn")]
    return agg.select(
        "n_docs",
        "exact_acc_e4",
        "conn_tp",
        "conn_fp",
        "conn_fn",
        *prf_e4(*conn, "conn"),
        "trig_tp",
        "trig_fp",
        "trig_fn",
        *prf_e4(*trig, "trig"),
    )


def micro_scores(stats: DataFrame) -> dict[str, float]:
    """Driver-side convenience: the single micro P/R/F1 triple."""
    row = (
        micro_rollup(stats)
        .filter(F.col("event_type").isNull() & F.col("role").isNull())
        .collect()[0]
    )
    return {
        "precision": row["precision"],
        "recall": row["recall"],
        "f1": row["f1"],
        "tp": row["tp"],
        "fp": row["fp"],
        "fn": row["fn"],
    }
