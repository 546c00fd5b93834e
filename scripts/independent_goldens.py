"""Independent expectations for the flagship plot composites
(farm_plots / split_road_plots) — VERDICT r2 "Next round" #2.

Everything here is derived from the FIXTURE DEFINITION alone (the
serpentine lawnmower trajectory in datasets.field_trajectories and the
raw events parquet) using straight-line geometry; it imports NOTHING
from util_gis_spark, so it cannot inherit a bug from the operators it
guards. scripts/make_goldens.py asserts the engine output satisfies
these before pinning golden rows, and tests/test_regression_corpus.py
asserts the committed pins satisfy them.

Derivation (reference semantics G:13420-13507, G:13655-14203 on this
fixture):

- Each device traces ONE contiguous serpentine field: 1 Hz, 3 m steps,
  34 columns per row, rows 3 m apart. Row spacing (3 m) equals the
  corridor buffer diameter (2 x width/2 = 3 m), so after closing
  (p = clamp(3,2,8) = 3 m) the corridors fuse into a single solid
  region -> exactly ONE plot per device for both composites.
- n_points: every consecutive step is exactly 3 m, which exceeds the
  fast-distance-sampling drop threshold, so sampling keeps every
  point; every point lies on the corridor centerline >= width/2 inside
  the solid region, so containment keeps every point -> n_points is
  the raw per-device event count.
- Timestamps: point seq k carries ts = 2024-01-01 00:00:00 + k s, so
  start_ts = base, end_ts = base + (n-1) s.
- mileage: (n-1) steps of 3 m in the fixture plane; the Gauss plane
  re-measures the same polyline with a locally-constant scale factor
  (fixture uses 85690 / 111195 m per deg; the Krueger projection's
  true local scale at 39.5 N differs by < 1.5%) -> bound to +/- 2%.
- mu: the solid region is the union of a full block (R-1 complete
  rows, x-span 99 m, buffered 1.5 m each side -> 102 m wide) and a
  partial last-row strip ((m-1)*3 + 3 m wide, 3 m tall); corner
  rounding / raster simplification keep the engine within ~1.5% of
  this analytic area -> bound to +/- 3%. 1 mu = 2000/3 m^2.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)
COLS_PER_ROW = 34
STEP_M = 3.0
WORKING_WIDTH = 3.0
MU_PER_M2 = 0.0015  # 1 mu = 2000/3 m^2


def device_counts(sf_dir: str = SF) -> dict[int, int]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id % 10 AS device_id, count(*) AS n "
        f"FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    return {int(d): int(n) for d, n in rows}


def analytic_area_m2(n: int) -> float:
    """Area of the buffered serpentine union: full-row block + partial
    last-row strip (see module docstring)."""
    r_buf = WORKING_WIDTH / 2.0
    rows_full, m_last = divmod(n, COLS_PER_ROW)
    if m_last == 0:
        rows_full, m_last = rows_full - 1, COLS_PER_ROW
    # full block: rows 0..rows_full-1 -> y in [-r, 3*(rows_full-1)+r]
    width = (COLS_PER_ROW - 1) * STEP_M + 2 * r_buf
    block_h = STEP_M * (rows_full - 1) + 2 * r_buf
    area = width * block_h
    if m_last > 1:
        # partial strip sits on top of the block, 3 m tall
        area += ((m_last - 1) * STEP_M + 2 * r_buf) * STEP_M
    return area


def expectations(sf_dir: str = SF) -> dict[int, dict]:
    """Per-device expected flagship row: exact values for plot count /
    n_points / start_ts / end_ts, [lo, hi] bounds for mu and mileage."""
    out = {}
    for d, n in device_counts(sf_dir).items():
        mu = analytic_area_m2(n) * MU_PER_M2
        mileage = (n - 1) * STEP_M
        out[d] = {
            "plot_count": 1,
            "n_points": n,
            "start_ts": BASE_TS,
            "end_ts": BASE_TS + dt.timedelta(seconds=n - 1),
            "mu_lo": mu * 0.97,
            "mu_hi": mu * 1.03,
            "mileage_lo": mileage * 0.98,
            "mileage_hi": mileage * 1.02,
        }
    return out


def check_flagship_rows(name: str, rows: list[dict], sf_dir: str = SF) -> list[str]:
    """Validate engine/golden rows for farm_plots or split_road_plots
    against the independent expectations. Returns a list of violation
    strings (empty = pass). Rows need keys device_id, mu, n_points and
    either mileage_m (farm) or start_ts/end_ts (split_road)."""
    exp = expectations(sf_dir)
    errs = []
    by_dev: dict[int, list[dict]] = {}
    for r in rows:
        by_dev.setdefault(int(r["device_id"]), []).append(r)
    if set(by_dev) != set(exp):
        errs.append(f"{name}: device set {sorted(by_dev)} != expected {sorted(exp)}")
    for d, e in exp.items():
        got = by_dev.get(d, [])
        if len(got) != e["plot_count"]:
            errs.append(f"{name} dev {d}: {len(got)} plots, expected {e['plot_count']}")
            continue
        r = got[0]
        if int(r["n_points"]) != e["n_points"]:
            errs.append(f"{name} dev {d}: n_points {r['n_points']} != {e['n_points']}")
        if not (e["mu_lo"] <= float(r["mu"]) <= e["mu_hi"]):
            errs.append(
                f"{name} dev {d}: mu {r['mu']} outside [{e['mu_lo']:.4f}, {e['mu_hi']:.4f}]"
            )
        if "mileage_m" in r and not (
            e["mileage_lo"] <= float(r["mileage_m"]) <= e["mileage_hi"]
        ):
            errs.append(
                f"{name} dev {d}: mileage {r['mileage_m']} outside "
                f"[{e['mileage_lo']:.1f}, {e['mileage_hi']:.1f}]"
            )
        for k in ("start_ts", "end_ts"):
            if k in r:
                got_ts = r[k]
                if hasattr(got_ts, "to_pydatetime"):
                    got_ts = got_ts.to_pydatetime()
                if got_ts != e[k]:
                    errs.append(f"{name} dev {d}: {k} {got_ts} != {e[k]}")
    return errs


if __name__ == "__main__":
    for d, e in expectations().items():
        print(d, e)
