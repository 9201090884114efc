"""KG completion on Spark: batch TransE scoring, link prediction, and
ranking evaluation over a frozen e6-integer embedding model
(model/transe.py).

Scale shape: the embedding tables are DIMENSION TABLES — (entity, vec)
and (pred, vec) — joined onto the edge stream. For a dictionary-sized
vocabulary they broadcast (default); a web-scale entity vocabulary
(10⁹+) exceeds any broadcast budget, so ``broadcast_emb=False`` keys
the join on the entity column instead — the same size-gate discipline
as canonicalize(broadcast_resolved). The score itself is pure codegen:
``zip_with`` + ``aggregate`` over int64 arrays inside whole-stage
codegen, no UDF, no Python, exact integer arithmetic.

Link prediction ranks ALL vocabulary entities per query (brute force
over the broadcast candidate table — the embed_topk baseline shape);
the 100 TB path swaps the candidate table for an IVF/LSH-blocked subset
exactly as in operators/similarity.py — the ranking, tie-break, and
scoring expressions are shared either way.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["emb_tables", "score_edges", "predict_links", "ranking_eval"]


def emb_tables(
    spark: SparkSession, model
) -> tuple[DataFrame, DataFrame]:
    """Frozen embeddings as (entity, vec) / (pred, vec) DataFrames."""
    ent = spark.createDataFrame(
        [(e, [int(x) for x in v]) for e, v in zip(model.entities, model.ent_e6)],
        "entity string, vec array<bigint>",
    )
    rel = spark.createDataFrame(
        [(r, [int(x) for x in v]) for r, v in zip(model.relations, model.rel_e6)],
        "pred string, vec array<bigint>",
    )
    return ent, rel


def _l1_score(sv: Column, rv: Column, ov: Column) -> Column:
    """-Σ|e_s + w_r - e_o| as exact int64 codegen."""
    diff = F.zip_with(F.zip_with(sv, rv, lambda a, b: a + b), ov,
                      lambda ab, c: F.abs(ab - c))
    return -F.aggregate(diff, F.lit(0).cast("long"), lambda acc, x: acc + x)


def score_edges(
    edges: DataFrame,
    ent: DataFrame,
    rel: DataFrame,
    s: str = "subj",
    p: str = "pred",
    o: str = "obj",
    broadcast_emb: bool = True,
) -> DataFrame:
    """edges + ``score_e6`` (NULL for OOV entities/relations — the
    transductive boundary surfaces as NULL, never a silent drop)."""
    e = F.broadcast(ent) if broadcast_emb else ent
    r = F.broadcast(rel) if broadcast_emb else rel
    out = (
        edges.join(e.select(F.col("entity").alias(s), F.col("vec").alias("__sv")), s, "left")
        .join(r.select(F.col("pred").alias(p), F.col("vec").alias("__rv")), p, "left")
        .join(e.select(F.col("entity").alias(o), F.col("vec").alias("__ov")), o, "left")
    )
    score = F.when(
        F.col("__sv").isNotNull()
        & F.col("__rv").isNotNull()
        & F.col("__ov").isNotNull(),
        _l1_score(F.col("__sv"), F.col("__rv"), F.col("__ov")),
    )
    return out.select(*edges.columns, score.alias("score_e6"))


def predict_links(
    queries: DataFrame,
    ent: DataFrame,
    rel: DataFrame,
    k: int = 3,
    s: str = "subj",
    p: str = "pred",
) -> DataFrame:
    """Top-``k`` predicted objects per (subj, pred) query → (subj, pred,
    obj, score_e6, rank). Candidates = the whole entity vocabulary
    (broadcast); ties break by object name ascending so ranks are a
    total order (rank_py parity)."""
    q = (
        queries.select(s, p)
        .join(F.broadcast(ent.select(F.col("entity").alias(s), F.col("vec").alias("__sv"))), s)
        .join(F.broadcast(rel.select(F.col("pred").alias(p), F.col("vec").alias("__rv"))), p)
    )
    cand = q.join(
        F.broadcast(ent.select(F.col("entity").alias("obj"), F.col("vec").alias("__ov")))
    )
    scored = cand.select(
        s, p, "obj",
        _l1_score(F.col("__sv"), F.col("__rv"), F.col("__ov")).alias("score_e6"),
    )
    w = Window.partitionBy(s, p).orderBy(F.desc("score_e6"), F.asc("obj"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ranking_eval(
    test: DataFrame,
    ent: DataFrame,
    rel: DataFrame,
    s: str = "subj",
    p: str = "pred",
    o: str = "obj",
) -> DataFrame:
    """Raw-setting link-prediction ranks per test triple → (subj, pred,
    obj, rank, hit1, hit3, hit10). rank = 1 + #{e != o : e scores
    strictly better, ties broken by entity name} — matches
    TranseModel.rank_py exactly (integer scores, total order). The
    count-better formulation never materializes a per-query sort of the
    full vocabulary into one row; it is one aggregation over the
    query × candidate stream."""
    q = (
        test.join(F.broadcast(ent.select(F.col("entity").alias(s), F.col("vec").alias("__sv"))), s)
        .join(F.broadcast(rel.select(F.col("pred").alias(p), F.col("vec").alias("__rv"))), p)
        .join(F.broadcast(ent.select(F.col("entity").alias(o), F.col("vec").alias("__tv"))), o)
        .withColumn("__target", _l1_score(F.col("__sv"), F.col("__rv"), F.col("__tv")))
    )
    cand = q.join(
        F.broadcast(ent.select(F.col("entity").alias("__cand"), F.col("vec").alias("__cv")))
    )
    csc = _l1_score(F.col("__sv"), F.col("__rv"), F.col("__cv"))
    better = (
        (F.col("__cand") != F.col(o))
        & (
            (csc > F.col("__target"))
            | ((csc == F.col("__target")) & (F.col("__cand") < F.col(o)))
        )
    ).cast("long")
    ranks = cand.groupBy(s, p, o).agg(
        (F.lit(1) + F.sum(better)).alias("rank")
    )
    return ranks.select(
        s, p, o, "rank",
        (F.col("rank") <= 1).cast("long").alias("hit1"),
        (F.col("rank") <= 3).cast("long").alias("hit3"),
        (F.col("rank") <= 10).cast("long").alias("hit10"),
    )
