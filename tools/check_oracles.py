"""Replicates the driver's CORRECTNESS check locally.

For each query name (args, or all with oracles): run the Spark query and
the DuckDB oracle at sf0.01 (or $SPARK_GRAFT_SF_DIR), sort columns by
name, sort rows, compare row count / schema kind / values.

Usage: python tools/check_oracles.py [query ...]
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize values: ints stay ints; floats rounded; everything str
    out = df.copy()
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(6)
        out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def kinds(df: pd.DataFrame) -> dict:
    def kind(dt):
        if pd.api.types.is_integer_dtype(dt):
            return "int"
        if pd.api.types.is_float_dtype(dt):
            return "float"
        if pd.api.types.is_bool_dtype(dt):
            return "bool"
        return "other"
    return {c: kind(df[c].dtype) for c in sorted(df.columns)}


def main() -> int:
    import __spark_entry__ as E
    from docee_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    fails = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            sdf = qs[name](spark, sf).toPandas()
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            fails += 1
            continue
        rows_ok = len(sdf) == len(ddf)
        sk, dk = kinds(sdf), kinds(ddf)
        schema_ok = list(sk) == list(dk) and all(
            sk[c] == dk[c] or "other" in (sk[c], dk[c]) for c in sk
        )
        strict_schema = sk == dk
        vals_ok = rows_ok and schema_ok and norm(sdf).equals(norm(ddf))
        status = "OK" if (rows_ok and strict_schema and vals_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{name}: {status} rows={len(sdf)}/{len(ddf)} "
                  f"schema_strict={strict_schema} vals={vals_ok}")
            if not strict_schema:
                print(f"  spark kinds:  {sk}")
                print(f"  oracle kinds: {dk}")
            if rows_ok and not vals_ok and len(sdf) and sk == dk:
                a, b = norm(sdf), norm(ddf)
                diff = (a != b).any(axis=1)
                print("  first diff rows (spark / oracle):")
                print(a[diff].head(3).to_string())
                print(b[diff].head(3).to_string())
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
