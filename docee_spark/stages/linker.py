"""Entity linking: mention surfaces → dictionary entities, scored.

The north rule's canonicalization names two mechanisms: MinHash-LSH
blocking and broadcast entity-DICTIONARY resolution. The dictionary join
in stages/canonicalize.py is exact-surface; this stage adds the fuzzy
half — "entity-link scoring": LSH-blocked candidate generation against
the alias dictionary, a trained pair scorer (model/link_scorer.py,
pure-codegen integer arithmetic), and top-1-above-threshold selection.
``linked_entity_dict`` then feeds the winners straight into
``canonicalize(entity_dict=...)`` so fuzzy mentions resolve to curated
ids instead of LSH cluster reps.

Scale shape (the part that matters at 10^12 docs):
  * linking operates on DISTINCT normalized surfaces, never on mention
    occurrences — the working set is the vocabulary, not the corpus.
  * blocking is the same banded-minhash groupBy discipline as
    operators/dedup.py: alias lists per band are CAPPED with observed
    drops (a hot band — e.g. every zh company sharing the legal-form
    suffix shingles — is answered by the cap, not a blow-up), candidates
    ∝ collisions, never |mentions|·|aliases|.
  * exact-norm candidates are unioned in separately, so an over-cap band
    can never cost an exact dictionary hit (the broadcast-join guarantee
    the exact path already had).
  * scoring + top-1 are codegen expressions and one window — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model.link_scorer import LinkScorer, score_expr
from .canonicalize import band_keys, minhash_cols, normalize_surface, shingles

#: default per-band alias-list cap; a band shared by more aliases than
#: this is ambiguous boilerplate (legal-form suffixes), and any true
#: fuzzy match almost surely also collides in a rarer band.
DEFAULT_MAX_BAND = 256


def _banded(df: DataFrame, surf_col: str, k: int = 8, bands: int = 4) -> DataFrame:
    rows = k // bands
    sh = df.withColumn("_sh", shingles(F.col(surf_col)))
    for i, c in enumerate(minhash_cols(F.col("_sh"), k)):
        sh = sh.withColumn(f"m{i}", c)
    return sh.withColumn("band", F.explode(band_keys(bands, rows))).drop(
        "_sh", *[f"m{i}" for i in range(k)]
    )


def link_candidates(
    mentions: DataFrame,
    aliases: DataFrame,
    max_band: int = DEFAULT_MAX_BAND,
) -> DataFrame:
    """→ (mention, norm, entity_id, alias_norm) candidate pairs.

    ``mentions``: any DF with a ``mention`` string column (occurrences
    fine — deduped here). ``aliases``: (entity_id, alias). Candidates =
    exact normalized-surface matches ∪ banded-minhash collisions with
    per-band caps (observed drops, dedup.py discipline)."""
    m = (
        mentions.select(F.col("mention"))
        .where(F.col("mention").isNotNull() & (F.length("mention") > 0))
        .distinct()
        .withColumn("norm", normalize_surface(F.col("mention")))
    )
    a = aliases.select(
        "entity_id", normalize_surface(F.col("alias")).alias("alias_norm")
    ).distinct()

    exact = m.join(a, m["norm"] == a["alias_norm"], "inner").select(
        "mention", "norm", "entity_id", "alias_norm"
    )

    a_banded = _banded(a.withColumnRenamed("alias_norm", "surf"), "surf")
    a_buckets = a_banded.groupBy("band").agg(
        F.collect_list(F.struct("entity_id", F.col("surf").alias("alias_norm"))).alias(
            "cands"
        )
    )
    from ..operators.dedup import _metric_name

    capped = a_buckets.observe(
        _metric_name("link_band_caps"),
        F.sum(
            F.when(F.size("cands") > max_band, F.size("cands")).otherwise(0)
        ).alias("n_dropped_aliases"),
        F.sum(F.when(F.size("cands") > max_band, 1).otherwise(0)).alias(
            "n_dropped_bands"
        ),
    ).filter(F.size("cands") <= max_band)

    m_banded = _banded(m.withColumnRenamed("norm", "surf"), "surf").select(
        "mention", F.col("surf").alias("norm"), "band"
    )
    fuzzy = (
        m_banded.join(capped, "band")
        .select("mention", "norm", F.explode("cands").alias("c"))
        .select("mention", "norm", "c.entity_id", "c.alias_norm")
    )
    return exact.unionByName(fuzzy).distinct()


def score_candidates(cands: DataFrame, scorer: LinkScorer) -> DataFrame:
    """Candidates + ``score_e12`` (pure integer codegen, no Python)."""
    return cands.withColumn(
        "score_e12", score_expr(scorer, F.col("norm"), F.col("alias_norm"))
    )


def link_entities(
    mentions: DataFrame,
    aliases: DataFrame,
    scorer: LinkScorer,
    threshold_e12: int = 0,
    max_band: int = DEFAULT_MAX_BAND,
) -> DataFrame:
    """→ (mention, entity_id, alias_norm, score_e12, linked).

    Top-1 candidate per mention by (score desc, entity_id asc,
    alias_norm asc — pinned total order), ``linked`` = 1 iff the winner
    clears ``threshold_e12`` (0 = the trained decision boundary).
    Mentions with no candidate at all simply don't appear — the caller's
    fallback is the LSH cluster rep, exactly canonicalize's NIL path."""
    scored = score_candidates(link_candidates(mentions, aliases, max_band), scorer)
    w = Window.partitionBy("mention").orderBy(
        F.desc("score_e12"), F.asc("entity_id"), F.asc("alias_norm")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "norm")
        .withColumn(
            "linked",
            (F.col("score_e12") > F.lit(int(threshold_e12))).cast("long"),
        )
    )


def linked_entity_dict(
    mentions: DataFrame,
    aliases: DataFrame,
    scorer: LinkScorer,
    threshold_e12: int = 0,
) -> DataFrame:
    """Winners above threshold as a (surface, entity_id) dictionary DF —
    drop-in for ``canonicalize(entity_dict=...)``: the exact-surface
    broadcast join then resolves every linked fuzzy mention to its
    curated entity id."""
    return (
        link_entities(mentions, aliases, scorer, threshold_e12)
        .filter(F.col("linked") == 1)
        .select(F.col("mention").alias("surface"), "entity_id")
    )
