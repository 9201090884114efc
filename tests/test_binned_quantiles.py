"""binned_quantiles tests (operators/textstats.py): a brute-force
python differential over the exact frozen semantics, bin-edge pinning,
negative/NULL handling, and DuckDB restatement parity.
"""
from __future__ import annotations

import math

import duckdb
import pytest

from docee_spark.operators.textstats import binned_quantiles, binned_quantiles_sql


def brute(values, bin_width, q):
    """Spec restated independently: smallest bin lower-edge whose
    cumulative count reaches ceil(q*n/100)."""
    vals = sorted(v for v in values if v is not None and v >= 0)
    n = len(vals)
    need = math.ceil(q * n / 100)
    bins = {}
    for v in vals:
        bins[(v // bin_width) * bin_width] = bins.get((v // bin_width) * bin_width, 0) + 1
    cum = 0
    for edge in sorted(bins):
        cum += bins[edge]
        if cum >= need:
            return edge
    return None


@pytest.fixture(scope="module")
def vals_df(spark):
    rows = [("a", (i * i * 37) % 1000) for i in range(101)] + [
        ("b", i * 13) for i in range(40)
    ] + [("b", None), ("a", -5)]
    return spark.createDataFrame(rows, "g string, v long"), rows


class TestBinnedQuantiles:
    def test_matches_brute_force(self, vals_df):
        df, rows = vals_df
        out = {
            r.g: r for r in binned_quantiles(df, "v", ["g"], bin_width=64).collect()
        }
        for g in ("a", "b"):
            vals = [v for gg, v in rows if gg == g]
            kept = [v for v in vals if v is not None and v >= 0]
            assert out[g].n_values == len(kept)
            for q in (50, 90, 99):
                assert getattr(out[g], f"p{q}") == brute(vals, 64, q)

    def test_quantile_brackets_true_value(self, vals_df):
        df, rows = vals_df
        out = {r.g: r for r in binned_quantiles(df, "v", ["g"], 64).collect()}
        for g in ("a", "b"):
            kept = sorted(v for gg, v in rows if gg == g and v is not None and v >= 0)
            for q in (50, 90):
                true_q = kept[math.ceil(q * len(kept) / 100) - 1]
                edge = getattr(out[g], f"p{q}")
                assert edge <= true_q < edge + 64

    def test_bin_edge_is_lower_edge_multiple_of_width(self, vals_df):
        df, _ = vals_df
        for r in binned_quantiles(df, "v", ["g"], 64).collect():
            for q in (50, 90, 99):
                assert getattr(r, f"p{q}") % 64 == 0

    def test_duckdb_restatement_bit_exact(self, vals_df):
        df, rows = vals_df
        got = sorted(
            tuple(r) for r in binned_quantiles(df, "v", ["g"], 64).collect()
        )
        con = duckdb.connect()
        con.execute("create table t (g varchar, v bigint)")
        con.executemany("insert into t values (?, ?)", rows)
        sql = binned_quantiles_sql("select g, v from t", "g", "v", 64)
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want
