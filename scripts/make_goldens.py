"""Generate util_gis_spark/goldens.py: literal golden-row oracle SQL
for the queries whose semantics are NOT ANSI-SQL-expressible (raster
morphology composites, sequential state machines, Kalman recursion,
binary decode). The reference's own QA for these paths is visual
(TestUtilGis has no asserts), so pinned golden rows ARE the right bar:
they are computed ONCE at sf0.01 (the driver's correctness scale) from
the fixture-verified implementation, then guard every future change.

Run after any intentional behavior change to those operators:
    python scripts/make_goldens.py
"""

from __future__ import annotations

import math
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from util_gis_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# queries whose oracle is a golden-row pin (name -> why not SQL)
TARGETS = {
    "farm_plots": "raster morphology composite (getFarmPlot)",
    "split_road_plots": "raster morphology composite (splitRoad)",
    # gps_time_windows graduated to a REAL DuckDB twin in r4: the fixture
    # cannot trigger the cadence-switch rule, so the machine is exactly
    # SQL-expressible there (windows.split_time_windows_summary_sql).
    "merge_polygons": "raster n-ary union (mergeWgs84WKT)",
    "conflict_resolution": "raster larger-wins clip loop",
    # accumulated_union is a rotation-ready staged row (not in the
    # 50-key catalogue yet); its pin is gated like every other
    "accumulated_union": "raster accumulated-union clip (insertion order)",
    "mutual_difference": "raster mutual-difference (differenceGeometry)",
    # images_resize_stats / video_frame_sample were rotated OUT of the
    # 50-key catalogue in r5; their pins stay generated (and gated) for
    # tests/test_retired_rows_oracle.py, which re-runs the driver's
    # exact compare on them.
    "gps_kalman_drift": "Kalman recursion (extension)",
    "images_decode_stats": "binary decode kernel",
    "images_psnr_check": "binary re-encode roundtrip",
    "images_resize_stats": "binary decode + resize kernel",
    "video_frame_sample": "binary frame-sampling kernel",
}

_DUCK_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
}


def _lit(v, duck_type: str) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return f"CAST(NULL AS {duck_type})"
    if duck_type == "TIMESTAMP":
        ts = pd.Timestamp(v)
        txt = ts.strftime("%Y-%m-%d %H:%M:%S.%f") if ts.microsecond else ts.strftime("%Y-%m-%d %H:%M:%S")
        return f"TIMESTAMP '{txt}'"
    if duck_type == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if duck_type == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if duck_type == "DOUBLE":
        return f"CAST({float(v)!r} AS DOUBLE)"
    return f"CAST({v} AS {duck_type})"


def golden_sql(df) -> str:
    cols = [(f.name, _DUCK_TYPES[f.dataType.simpleString()]) for f in df.schema.fields]
    rows = df.collect()
    if not rows:
        sel = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"SELECT {sel} WHERE 1=0"
    vals = ",\n  ".join(
        "(" + ", ".join(_lit(r[n], t) for n, t in cols) + ")" for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    return f"SELECT * FROM (VALUES\n  {vals}\n) AS g({names})"


def main() -> None:
    import __spark_entry__ as E
    from independent_goldens import PIN_CHECKS, check_flagship_rows

    from util_gis_spark import queries as Q

    spark = get_spark("goldens", master="local[16]", shuffle_partitions=16)
    qs = dict(E.queries())
    # retired catalogue rows keep gated pins for the pytest gate replica
    qs.setdefault("images_resize_stats", Q.q_images_resize_stats)
    qs.setdefault("video_frame_sample", Q.q_video_frame_sample)
    # rotated out of the catalogue in r6, pin still generated + gated
    qs.setdefault("images_psnr_check", Q.q_images_psnr_check)
    qs.setdefault("accumulated_union", Q.q_accumulated_union)
    out = {}
    for name, why in TARGETS.items():
        df = qs[name](spark, SF)
        if name in ("farm_plots", "split_road_plots") or name in PIN_CHECKS:
            # every pin with an independent derivation must agree with
            # it (scripts/independent_goldens.py) before it is allowed
            # to become the oracle — a golden generated from a buggy
            # engine must fail here, not lock the bug in.
            rows = [r.asDict() for r in df.collect()]
            if name in PIN_CHECKS:
                errs = PIN_CHECKS[name](rows, SF)
            else:
                errs = check_flagship_rows(name, rows, SF)
            if errs:
                raise SystemExit(
                    f"REFUSING to pin {name}: engine output violates the "
                    f"independent expectations:\n  " + "\n  ".join(errs[:20])
                )
            print(f"{name}: independent invariants OK ({len(rows)} rows)")
        out[name] = (why, golden_sql(df))
        print(f"{name}: {df.count()} golden rows")

    with open(os.path.join(os.path.dirname(__file__), "..", "util_gis_spark", "goldens.py"), "w") as f:
        f.write('"""AUTO-GENERATED by scripts/make_goldens.py — do not edit.\n\n')
        f.write("Golden-row oracle SQL, pinned at sf0.01 (the driver's correctness\n")
        f.write("scale), for queries whose semantics are not ANSI-SQL-expressible.\n")
        f.write("Regenerate after intentional behavior changes.\n")
        f.write('"""\n\nGOLDEN_SQL = {\n')
        for name, (why, sql) in out.items():
            f.write(f"    # {why}\n")
            f.write(f"    {name!r}: '''{sql}''',\n")
        f.write("}\n")
    print("wrote util_gis_spark/goldens.py")


if __name__ == "__main__":
    main()
