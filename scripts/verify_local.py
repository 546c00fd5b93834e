"""Local mini-verify: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same sf dir; compare row count,
column names, and order-insensitive values. Usage:

    python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from util_gis_spark.datasets import TABLES
from util_gis_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_bad += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1
            continue
        dtypes_s = {c: str(sdf[c].dtype) for c in sdf.columns}
        dtypes_o = {c: str(odf[c].dtype) for c in odf.columns}
        dt_mismatch = {
            c: (dtypes_s[c], dtypes_o[c]) for c in dtypes_s if dtypes_s[c] != dtypes_o.get(c)
        }
        if dt_mismatch:
            print(f"WARN {name}: dtype mismatch {dt_mismatch}")
        cs, co = canon(sdf), canon(odf)
        if cs != co:
            diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({len([1 for a, b in zip(cs, co) if a != b])} rows); first: {diff}")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(sdf)} rows")
        n_ok += 1

    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
