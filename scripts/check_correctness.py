"""Local replica of the driver's correctness gate: run queries() and
oracle_sql() side-by-side on sf0.01 and compare rows/schema/values
(columns sorted by name, rows sorted, doubles rounded to 6 dp) AND
output *types* (DuckDB's Arrow schema vs Spark's dtypes, canonicalized).

The type check exists because the driver's value hash is type-aware:
in round 4 `gps_time_windows` was value-identical but driver-red
because DuckDB's ``sum(BIGINT)`` yields Arrow ``decimal128(38,0)``
while Spark emits ``int64``.  A values-only replica greened it; this
one cannot (regression: tests/test_gate_replica_types.py).

Usage: python scripts/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.types as pt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def arrow_canon(t: pa.DataType) -> str:
    """Collapse an Arrow type to the equivalence class the driver's
    pandas-level hash actually distinguishes: every integer width maps
    to pandas int64, every float to float64, but decimal/date/etc stay
    distinct object representations."""
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return f"list<{arrow_canon(t.value_type)}>"
    if pt.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_canon(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pt.is_map(t):
        return f"map<{arrow_canon(t.key_type)},{arrow_canon(t.item_type)}>"
    if pt.is_null(t):
        return "null"
    return str(t)


def spark_canon(dt: str) -> str:
    """Same canonicalization for a Spark simpleString dtype."""
    dt = dt.strip()
    if dt in ("bigint", "int", "smallint", "tinyint", "long", "integer", "short", "byte"):
        return "int"
    if dt in ("double", "float"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt == "date":
        return "date"
    if dt == "boolean":
        return "bool"
    if dt == "string":
        return "string"
    if dt == "binary":
        return "binary"
    if dt.startswith("array<") and dt.endswith(">"):
        return f"list<{spark_canon(dt[6:-1])}>"
    if dt.startswith("struct<") and dt.endswith(">"):
        inner = []
        for part in _split_top(dt[7:-1]):
            name, _, sub = part.partition(":")
            inner.append(f"{name}:{spark_canon(sub)}")
        return f"struct<{','.join(inner)}>"
    if dt.startswith("map<") and dt.endswith(">"):
        k, v = _split_top(dt[4:-1])
        return f"map<{spark_canon(k)},{spark_canon(v)}>"
    if dt == "void":
        return "null"
    return dt


def _split_top(s: str) -> list[str]:
    """Split a simpleString field list on top-level commas only
    (nested struct<...>/array<...>/map<...> commas don't count)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def compare_one(spark, con, name: str, qfn, sql: str | None):
    """Run one catalogue query against its DuckDB twin.

    Returns (ok: bool, detail: str). ``sql=None`` -> rows-only check,
    always ok (mirrors the driver's weaker no-oracle path).
    """
    sdf_spark = qfn(spark, SF)
    sdf = sdf_spark.toPandas()
    if sql is None:
        return True, f"no_oracle (spark rows={len(sdf)})"
    tbl = con.execute(sql).fetch_arrow_table()
    odf = tbl.to_pandas()
    cols = sorted(sdf.columns)
    ocols = sorted(odf.columns)
    if cols != ocols:
        return False, f"SCHEMA MISMATCH spark={cols} oracle={ocols}"
    stypes = {f.name: spark_canon(f.dataType.simpleString()) for f in sdf_spark.schema}
    otypes = {f.name: arrow_canon(f.type) for f in tbl.schema}
    tbad = [c for c in cols if stypes.get(c) != otypes.get(c)]
    if tbad:
        det = ", ".join(f"{c}: spark={stypes.get(c)} oracle={otypes.get(c)}" for c in tbad)
        return False, f"TYPE MISMATCH ({det})"
    s = sdf[cols].sort_values(cols).round(6).reset_index(drop=True)
    o = odf[cols].sort_values(cols).round(6).reset_index(drop=True)
    try:
        o = o.astype(s.dtypes.to_dict())
    except (TypeError, ValueError):
        pass
    ok = len(s) == len(o) and s.equals(o)
    detail = f"spark={len(s)} oracle={len(o)} match={ok}"
    if not ok and len(s) == len(o):
        diff = (s != o) & ~(s.isna() & o.isna())
        badcols = [c for c in cols if diff[c].any()]
        detail += f"\n  differing cols: {badcols}"
        for c in badcols[:3]:
            i = diff[c].idxmax()
            detail += f"\n  first diff {c}[{i}]: spark={s[c][i]!r} oracle={o[c][i]!r}"
    return ok, detail


def open_oracle(sf: str = SF) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con


def main() -> None:
    import __spark_entry__ as E  # noqa: E402
    from util_gis_spark.session import get_spark  # noqa: E402

    spark = get_spark("correctness", master="local[16]", shuffle_partitions=16)
    con = open_oracle()
    qs = E.queries()
    os_ = E.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = 0
    for name in names:
        try:
            ok, detail = compare_one(spark, con, name, qs[name], os_.get(name))
        except Exception as exc:  # Spark or oracle error
            print(f"{name}: ERROR {str(exc)[:300]}")
            bad += 1
            continue
        print(f"{name}: {detail}")
        if not ok:
            bad += 1
    print("FAILURES:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
