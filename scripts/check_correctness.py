"""Local replica of the driver's correctness gate: run queries() and
oracle_sql() side-by-side on sf0.01 and compare rows/schema/values
(columns sorted by name, rows sorted, doubles rounded to 6 dp).

Usage: python scripts/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from util_gis_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("correctness", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = E.queries()
    os_ = E.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as exc:
            print(f"{name}: SPARK ERROR {exc}")
            bad += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"{name}: no_oracle (spark rows={len(sdf)})")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as exc:
            print(f"{name}: ORACLE ERROR {str(exc)[:200]}")
            bad += 1
            continue
        cols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        if cols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
            bad += 1
            continue
        s = sdf[cols].sort_values(cols).round(6).reset_index(drop=True)
        o = odf[cols].sort_values(cols).round(6).reset_index(drop=True)
        try:
            o = o.astype(s.dtypes.to_dict())
        except (TypeError, ValueError):
            pass
        ok = len(s) == len(o) and s.equals(o)
        print(f"{name}: spark={len(s)} oracle={len(o)} match={ok}")
        if not ok:
            bad += 1
            if len(s) == len(o):
                diff = (s != o) & ~(s.isna() & o.isna())
                badcols = [c for c in cols if diff[c].any()]
                print(f"  differing cols: {badcols}")
                for c in badcols[:3]:
                    i = diff[c].idxmax()
                    print(f"  first diff {c}[{i}]: spark={s[c][i]!r} oracle={o[c][i]!r}")
    print("FAILURES:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
