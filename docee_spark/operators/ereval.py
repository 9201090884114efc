"""Entity-resolution / dedup clustering quality metrics.

Scores a predicted clustering (canonicalizer output, duplicate_clusters
components, community labels) against a gold partition of the same
items: pairwise precision/recall/F1 over co-clustered pairs, and
B-cubed precision/recall/F1 (Bagga & Baldwin 1998 — the standard
coreference/ER clustering metric; Amigo et al. 2009 for why it
dominates purity).

Everything reduces to the pred x gold contingency cells n_ij plus the
marginal cluster sizes:

  pairs_tp   = sum_cells C(n_ij, 2)
  pairs_pred = sum_p C(|p|, 2)        pairs_gold = sum_g C(|g|, 2)
  B3-precision = (1/N) sum_cells n_ij^2 / |p|
  B3-recall    = (1/N) sum_cells n_ij^2 / |g|

Scale shape: one shuffle groups items into cells; the marginals and the
cell->marginal joins run over the CELL table (|cells| <= |items|, and
orders of magnitude smaller whenever clusters are non-trivial), so the
post-aggregation graph costs ~nothing at web scale. No self-join of
items, no pair materialization — C(n,2) is closed-form on counts.

Determinism: every reported number is integer fixed-point computed with
integer-only arithmetic (the B-cubed fraction sums are quantized PER
CELL at e8 before summing — floor((1e8 * n^2) / size) — so engine and
oracle agree bit-for-bit; quantization error is bounded by
|cells| / 1e8, far below the e4 reporting grain for any real corpus).
Float summation would round differently under different partition
orders — the same discipline as the e2/e4 integerization in the driver
oracles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["clustering_quality"]

#: per-cell fixed-point grain for the B-cubed fraction sums
_E8 = 100_000_000
_E4 = 10_000


def clustering_quality(
    assign: DataFrame,
    item: str = "doc_id",
    pred: str = "cluster_id",
    gold: str = "gold_id",
) -> DataFrame:
    """→ single-row DataFrame of clustering-quality metrics.

    ``assign``: one row per item with its predicted and gold cluster
    labels (any orderable types). Items must be unique; labels are
    compared only by equality, so pred and gold label spaces need not
    align.

    Columns (all bigint): n_items, n_pred_clusters, n_gold_clusters,
    pairs_tp, pairs_pred, pairs_gold, pair_p_e4, pair_r_e4, pair_f1_e4,
    b3_p_e4, b3_r_e4, b3_f1_e4. Ratios are floor fixed-point; an
    undefined ratio (no pairs on one side) reports the conventional 0.
    """
    cells = assign.groupBy(pred, gold).agg(F.count("*").alias("n"))
    psize = cells.groupBy(pred).agg(F.sum("n").alias("pn"))
    gsize = cells.groupBy(gold).agg(F.sum("n").alias("gn"))
    j = cells.join(psize, pred).join(gsize, gold)

    def c2(col):
        # C(n,2) = (n*(n-1)) >> 1 — integer-exact (the product is even)
        return F.shiftright(F.sum(col * (col - 1)).cast("long"), 1)

    per_cell = j.agg(
        F.sum("n").cast("long").alias("n_items"),
        c2(F.col("n")).alias("pairs_tp"),
        F.sum(F.expr(f"({_E8} * n * n) div pn")).cast("long").alias("b3p_sum"),
        F.sum(F.expr(f"({_E8} * n * n) div gn")).cast("long").alias("b3r_sum"),
    )
    pmarg = psize.agg(
        F.count("*").cast("long").alias("n_pred_clusters"),
        c2(F.col("pn")).alias("pairs_pred"),
    )
    gmarg = gsize.agg(
        F.count("*").cast("long").alias("n_gold_clusters"),
        c2(F.col("gn")).alias("pairs_gold"),
    )

    def ratio(num: str, den: str):
        return F.expr(
            f"cast(case when ({den}) > 0 then ({num}) div ({den}) "
            f"else 0 end as bigint)"
        )

    out = per_cell.crossJoin(pmarg).crossJoin(gmarg)
    out = out.withColumns(
        {
            "pair_p_e4": ratio(f"{_E4} * pairs_tp", "pairs_pred"),
            "pair_r_e4": ratio(f"{_E4} * pairs_tp", "pairs_gold"),
            "pair_f1_e4": ratio(
                f"{2 * _E4} * pairs_tp", "pairs_pred + pairs_gold"
            ),
            "b3_p_e4": ratio("b3p_sum", f"{_E4} * n_items"),
            "b3_r_e4": ratio("b3r_sum", f"{_E4} * n_items"),
        }
    )
    out = out.withColumn(
        "b3_f1_e4", ratio("2 * b3_p_e4 * b3_r_e4", "b3_p_e4 + b3_r_e4")
    )
    return out.select(
        "n_items", "n_pred_clusters", "n_gold_clusters",
        "pairs_tp", "pairs_pred", "pairs_gold",
        "pair_p_e4", "pair_r_e4", "pair_f1_e4",
        "b3_p_e4", "b3_r_e4", "b3_f1_e4",
    )
