"""The gate replica (scripts/check_correctness.py) must be TYPE-aware.

Round-4 driver red: gps_time_windows was value-identical but DuckDB's
``sum(BIGINT)`` yields Arrow ``decimal128(38,0)`` while Spark emits
``int64`` — the driver's type-aware hash failed while the old
values-only replica greened it.  These tests pin (a) the replica now
REJECTS that exact uncast twin, (b) it accepts the CAST-fixed one, and
(c) the canonicalizers agree on the width collapses the driver's
pandas-level hash actually performs.
"""

import os

import duckdb
import pyarrow as pa
import pytest

from scripts.check_correctness import SF, arrow_canon, compare_one, open_oracle, spark_canon
from util_gis_spark import datasets as D
from util_gis_spark.operators import windows as W
from util_gis_spark.queries import q_gps_time_windows


def test_canonicalizers_agree():
    con = duckdb.connect()
    tbl = con.execute(
        "SELECT 1::TINYINT a, 1::INTEGER b, 1::BIGINT c, sum(1::BIGINT) d, "
        "1.5::DOUBLE e, 1.5::FLOAT f, 'x' g, TIMESTAMP '2020-01-01' h, "
        "true i, [1,2] j"
    ).fetch_arrow_table()
    canon = {f.name: arrow_canon(f.type) for f in tbl.schema}
    assert canon == {
        "a": "int", "b": "int", "c": "int", "d": "decimal",
        "e": "float", "f": "float", "g": "string", "h": "timestamp",
        "i": "bool", "j": "list<int>",
    }
    assert spark_canon("bigint") == spark_canon("int") == "int"
    assert spark_canon("double") == "float"
    assert spark_canon("decimal(38,0)") == "decimal"
    assert spark_canon("array<bigint>") == "list<int>"
    assert spark_canon("timestamp") == "timestamp"
    # the r4 failure shape: int vs decimal must NOT collapse together
    assert arrow_canon(pa.decimal128(38, 0)) != spark_canon("bigint")
    # nested types canonicalize symmetrically on both sides
    st = pa.struct([("a", pa.int32()), ("b", pa.list_(pa.float32()))])
    assert arrow_canon(st) == spark_canon("struct<a:int,b:array<float>>")
    assert arrow_canon(pa.map_(pa.string(), pa.int64())) == spark_canon("map<string,bigint>")
    assert spark_canon("struct<a:struct<x:bigint,y:double>,b:int>") == (
        "struct<a:struct<x:int,y:float>,b:int>"
    )


@pytest.mark.skipif(not os.path.isdir(SF), reason="gate SF dir missing")
def test_replica_red_on_uncast_r4_twin(spark):
    """The exact round-4 driver-red twin (sum(n) without CAST) must now
    fail the replica's type check — and the shipped CAST twin passes."""
    con = open_oracle(SF)
    good_sql = W.split_time_windows_summary_sql(D.GPS_POINTS_SQL)
    assert "CAST(sum(n) AS BIGINT)" in good_sql
    bad_sql = good_sql.replace("CAST(sum(n) AS BIGINT) AS n_points", "sum(n) AS n_points")
    assert bad_sql != good_sql

    ok, detail = compare_one(spark, con, "gps_time_windows", q_gps_time_windows, bad_sql)
    assert not ok and "TYPE MISMATCH" in detail and "n_points" in detail

    ok, detail = compare_one(spark, con, "gps_time_windows", q_gps_time_windows, good_sql)
    assert ok, detail
