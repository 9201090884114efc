"""Replicates the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    if val is None:
        return "␀"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return repr(round(val, 6))
    return str(val)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    return out


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    cur = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {duck_rows and len(duck_rows)}"
    )
    s = _row_set(spark_rows, spark_cols)
    d = _row_set(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{name}: value mismatch, first diffs: {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n >= 0
    assert set(df.columns) == {
        "doc_id", "event_type", "recguid", "subj", "pred", "obj",
    }
    assert n > 0  # fixture corpus guarantees events


@pytest.mark.parametrize("name", ["docee_triples_gold", "docee_triples_heuristic", "docee_vertices"])
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
