"""Golden-fixture oracle parity: the docee_* driver queries must match
their DuckDB oracles bit-for-bit (the driver's CORRECTNESS gate).

Covers one query per oracle family: a decoder hash-compare
(triples_heuristic), an independent SQL re-implementation
(vertices = canonicalize), and a relational job (key_sentences).
The full 33-query sweep lives in tools/check_oracles.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["docee_triples_heuristic", "docee_vertices", "docee_key_sentences"]
)
def test_docee_oracle_parity(spark, name):
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, "/root/testdata/sf0.001").toPandas()
    ddf = duckdb.connect().execute(oracles[name]).df()
    assert len(sdf) == len(ddf)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    pd.testing.assert_frame_equal(_norm(sdf), _norm(ddf))
