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


# ====================================================================
# r4 additions: independent expectations for the remaining golden pins
# (VERDICT r3 "Next round" #2). Same contract as check_flagship_rows:
# each check_* takes the engine/golden rows and returns a list of
# violation strings (empty = pass); make_goldens refuses to pin on
# violations and tests/test_goldens_independent.py proves injected
# bugs fail. Zero util_gis_spark imports anywhere in this module.
# ====================================================================

R_M = 6378137.0  # WGS84 equatorial radius used throughout the repo


def spherical_rect_mu(x0: float, x1: float, y0: float, y1: float) -> float:
    """Exact area-in-mu of the lat/lon-aligned rectangle on the
    R=6378137 sphere: R^2 * dlon_rad * (sin y1 - sin y0), * 0.0015."""
    import math

    return (
        R_M
        * R_M
        * math.radians(x1 - x0)
        * (math.sin(math.radians(y1)) - math.sin(math.radians(y0)))
        * MU_PER_M2
    )


# --- conflict_resolution: the fixture (queries.q_conflict_resolution)
# stacks, per group g, members r = 0..4 at y = 39.5 + 0.04 r (height
# 0.07 -> 0.03 overlap with the previous member) with widths
# 0.07 - 0.004 r. Larger-wins order == r order (strictly decreasing
# areas), so survivor r=0 is its full rectangle and each r>=1 is the
# 0.04-deg strip above the previous member's top edge. All survivors
# are axis-aligned rectangles with closed-form spherical areas; the
# engine's raster mu was measured within 0.14% of these values, bound
# set at +/-0.5% (~4x slack).
CONFLICT_MU_RTOL = 0.005


def conflict_expectations() -> dict[tuple[int, int], tuple[float, float]]:
    out = {}
    for grp in range(5):
        x0 = 116.0 + grp * 0.15
        for r in range(5):
            w = 0.07 - r * 0.004
            y0 = 39.5 + 0.04 * r
            if r == 0:
                mu = spherical_rect_mu(x0, x0 + w, y0, y0 + 0.07)
            else:
                mu = spherical_rect_mu(x0, x0 + w, y0 + 0.03, y0 + 0.07)
            out[(grp, r)] = (mu * (1 - CONFLICT_MU_RTOL), mu * (1 + CONFLICT_MU_RTOL))
    return out


def check_conflict_rows(rows: list[dict]) -> list[str]:
    exp = conflict_expectations()
    errs = []
    got = {(int(r["grp"]), int(r["member_idx"])): float(r["mu_approx"]) for r in rows}
    if len(got) != len(rows):
        errs.append("conflict_resolution: duplicate (grp, member_idx) rows")
    if set(got) != set(exp):
        errs.append(
            f"conflict_resolution: survivor set {sorted(got)} != expected {sorted(exp)}"
        )
    for key in sorted(set(got) & set(exp)):
        lo, hi = exp[key]
        if not (lo <= got[key] <= hi):
            errs.append(
                f"conflict_resolution {key}: mu {got[key]} outside [{lo:.1f}, {hi:.1f}]"
            )
    return errs


# --- merge_polygons: group g unions the 5 DISJOINT 0.07x0.07 rects in
# column g of the polygon grid (rows y = 39.5 + 0.08 k). Expected mu =
# sum of the five exact spherical rectangle areas; engine raster mu
# measured within 0.025%, bound +/-0.2%.
MERGE_MU_RTOL = 0.002
_POLY_EDGE_OFF = 1.7e-6  # datasets._EDGE_OFF, part of the fixture definition


def merge_expectations() -> dict[int, tuple[float, float]]:
    out = {}
    for grp in range(5):
        tot = 0.0
        for row in range(5):
            x0 = 116.0 + grp * 0.08 + _POLY_EDGE_OFF
            y0 = 39.5 + row * 0.08 + _POLY_EDGE_OFF
            tot += spherical_rect_mu(x0, x0 + 0.07, y0, y0 + 0.07)
        out[grp] = (tot * (1 - MERGE_MU_RTOL), tot * (1 + MERGE_MU_RTOL))
    return out


def check_merge_rows(rows: list[dict]) -> list[str]:
    exp = merge_expectations()
    errs = []
    got = {int(r["grp"]): float(r["mu_approx"]) for r in rows}
    if set(got) != set(exp) or len(rows) != len(exp):
        errs.append(f"merge_polygons: group set {sorted(got)} != {sorted(exp)}")
    for g in sorted(set(got) & set(exp)):
        lo, hi = exp[g]
        if not (lo <= got[g] <= hi):
            errs.append(f"merge_polygons grp {g}: mu {got[g]} outside [{lo:.1f}, {hi:.1f}]")
    return errs


# --- image kernels: the images table derives every column from doc_id
# (w = 64 + k%960, h = 64 + 31k%960, fmt = k%3, bytes = the md5-hex of
# str(k) repeated 8x, unhexed), and the decode stub is documented as
# "numpy default_rng seeded by the first 8 bytes (little-endian,
# masked to 31 bits), uniform uint8 (h, w, 3)". Two independent layers:
#   1. METADATA-EXACT values that need no pixel math at all: row
#      counts/ids, n_pixels (both dims >= 64 -> always the 64-cap),
#      out_w/out_h, per-fmt counts, and the video frame ladder
#      (n_frames = h%28+2, n_sampled = ceil(n/4), last_idx).
#   2. DISTRIBUTION bounds from uniformity: mean luminance of
#      uniform-uint8 pixels is 127.5 with sd 49.4/sqrt(n_pix) -> 5-6
#      sigma windows; lossy re-encode quantizes to (c & 0xFC) | 0x02,
#      whose per-channel error in {-2,-1,0,1} gives MSE 1.5 ->
#      PSNR = 10 log10(255^2/1.5) = 46.37 dB +/- ~0.05.
# Plus a SPOT-CHECK that re-derives the full pixel pipeline here (a
# straight-line reimplementation of the documented contract) for a
# deterministic sample of ids — this is what catches row-misalignment
# bugs the distribution bounds cannot see.
MEAN_LUM = 127.5
LUM_SD = 49.37  # sd of 0.299R+0.587G+0.114B over iid uniform uint8


def _pseudo_pixels(image_id: str, w: int, h: int):
    """Re-derivation of bytes -> decode from the documented contract
    (datasets.images_with_bytes + operators/images._decode_stub doc)."""
    import hashlib

    import numpy as np

    data = bytes.fromhex(hashlib.md5(image_id.encode()).hexdigest() * 8)
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8), data


def _lum(px):
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def image_meta(sf_dir: str = SF) -> list[tuple[int, int, int, str]]:
    """(doc_id, w, h, fmt) straight from the parquet + fixture formulas."""
    con = duckdb.connect()
    ids = [
        int(r[0])
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    fmts = {0: "png", 1: "jpg", 2: "webp"}
    return [(k, 64 + k % 960, 64 + (k * 31) % 960, fmts[k % 3]) for k in ids]


def _sample(ids, n=17):
    step = max(len(ids) // n, 1)
    return ids[::step][:n]


def check_decode_stats_rows(rows: list[dict], sf_dir: str = SF) -> list[str]:
    import numpy as np

    meta = image_meta(sf_dir)
    errs = []
    got = {str(r["image_id"]): r for r in rows}
    if set(got) != {str(k) for k, *_ in meta} or len(rows) != len(meta):
        errs.append(f"decode_stats: id set mismatch ({len(rows)} rows vs {len(meta)} images)")
        return errs
    sd = 6 * LUM_SD / 64.0  # 6 sigma over 64x64 pixels
    for k, w, h, _f in meta:
        r = got[str(k)]
        if int(r["n_pixels"]) != 4096:
            errs.append(f"decode_stats {k}: n_pixels {r['n_pixels']} != 4096")
        if not (MEAN_LUM - sd <= float(r["mean_lum"]) <= MEAN_LUM + sd):
            errs.append(f"decode_stats {k}: mean_lum {r['mean_lum']} outside 127.5 +/- {sd:.2f}")
        if not (44.0 <= float(r["std_lum"]) <= 54.0):
            errs.append(f"decode_stats {k}: std_lum {r['std_lum']} outside [44, 54]")
    for k, w, h, _f in _sample(meta):
        px, _ = _pseudo_pixels(str(k), min(w, 64), min(h, 64))
        lum = _lum(px)
        r = got[str(k)]
        if abs(float(r["mean_lum"]) - round(float(lum.mean()), 4)) > 1e-4:
            errs.append(
                f"decode_stats {k}: mean_lum {r['mean_lum']} != derived {lum.mean():.4f}"
            )
        if abs(float(r["std_lum"]) - round(float(lum.std()), 4)) > 1e-4:
            errs.append(f"decode_stats {k}: std_lum {r['std_lum']} != derived {lum.std():.4f}")
    _ = np
    return errs


def check_resize_stats_rows(rows: list[dict], sf_dir: str = SF) -> list[str]:
    import numpy as np

    meta = image_meta(sf_dir)
    errs = []
    got = {str(r["image_id"]): r for r in rows}
    if set(got) != {str(k) for k, *_ in meta} or len(rows) != len(meta):
        errs.append(f"resize_stats: id set mismatch ({len(rows)} rows vs {len(meta)} images)")
        return errs
    sd = 6 * LUM_SD / 32.0
    for k, *_r in meta:
        r = got[str(k)]
        if int(r["out_w"]) != 32 or int(r["out_h"]) != 32:
            errs.append(f"resize_stats {k}: out dims {r['out_w']}x{r['out_h']} != 32x32")
        if not (MEAN_LUM - sd <= float(r["mean_lum"]) <= MEAN_LUM + sd):
            errs.append(f"resize_stats {k}: mean_lum {r['mean_lum']} outside 127.5 +/- {sd:.2f}")
    for k, w, h, _f in _sample(meta):
        cw, ch = min(w, 64), min(h, 64)
        px, _ = _pseudo_pixels(str(k), cw, ch)
        yi = (np.arange(32) * ch // 32).astype(np.int64)
        xi = (np.arange(32) * cw // 32).astype(np.int64)
        lum = _lum(px[yi][:, xi])
        r = got[str(k)]
        if abs(float(r["mean_lum"]) - round(float(lum.mean()), 4)) > 1e-4:
            errs.append(
                f"resize_stats {k}: mean_lum {r['mean_lum']} != derived {lum.mean():.4f}"
            )
    return errs


def check_psnr_rows(rows: list[dict], sf_dir: str = SF) -> list[str]:
    meta = image_meta(sf_dir)
    errs = []
    exp_n = {}
    for _k, _w, _h, f in meta:
        exp_n[f] = exp_n.get(f, 0) + 1
    got = {str(r["fmt"]): r for r in rows}
    if set(got) != set(exp_n) or len(rows) != len(exp_n):
        errs.append(f"psnr_check: fmt set {sorted(got)} != {sorted(exp_n)}")
        return errs
    for f, n in exp_n.items():
        r = got[f]
        if int(r["n"]) != n:
            errs.append(f"psnr_check {f}: n {r['n']} != {n}")
        # quantization (c & 0xFC) | 0x02: error in {-2,-1,0,1}, MSE -> 1.5
        # over 64*64*3 samples => PSNR 46.37 dB, sd ~0.013 dB; min over
        # ~170 images stays within [46.0, 46.6]. >= 40 is the north-rule
        # invariant.
        p = float(r["min_psnr_db"])
        if not (46.0 <= p <= 46.6):
            errs.append(f"psnr_check {f}: min_psnr_db {p} outside [46.0, 46.6]")
        if p < 40.0:
            errs.append(f"psnr_check {f}: min_psnr_db {p} violates the 40 dB invariant")
    return errs


def check_video_rows(rows: list[dict], sf_dir: str = SF) -> list[str]:
    import numpy as np

    meta = image_meta(sf_dir)
    errs = []
    got = {str(r["video_id"]): r for r in rows}
    if set(got) != {str(k) for k, *_ in meta} or len(rows) != len(meta):
        errs.append(f"video_frame_sample: id set mismatch ({len(rows)} vs {len(meta)})")
        return errs
    for k, _w, h, _f in meta:
        r = got[str(k)]
        n_frames = h % 28 + 2
        n_sampled = (n_frames + 3) // 4
        last_idx = 4 * ((n_frames - 1) // 4)
        if int(r["n_frames"]) != n_frames:
            errs.append(f"video {k}: n_frames {r['n_frames']} != {n_frames}")
        if int(r["n_sampled"]) != n_sampled:
            errs.append(f"video {k}: n_sampled {r['n_sampled']} != {n_sampled}")
        if int(r["last_idx"]) != last_idx:
            errs.append(f"video {k}: last_idx {r['last_idx']} != {last_idx}")
        sd = 6 * LUM_SD / 32.0  # >= 1 frame of 32x32
        if not (MEAN_LUM - sd <= float(r["avg_lum"]) <= MEAN_LUM + sd):
            errs.append(f"video {k}: avg_lum {r['avg_lum']} outside 127.5 +/- {sd:.2f}")
    for k, w, h, _f in _sample(meta):
        n_frames = h % 28 + 2
        cw, ch = min(w, 32), min(h, 32)
        lums = []
        _, data = _pseudo_pixels(str(k), 1, 1)
        import hashlib

        for i in range(0, n_frames, 4):
            seed_bytes = (data + i.to_bytes(2, "little"))[:8]
            seed = int.from_bytes(seed_bytes.ljust(8, b"\0"), "little") & 0x7FFFFFFF
            px = np.random.default_rng(seed).integers(0, 256, size=(ch, cw, 3), dtype=np.uint8)
            lums.append(round(float(_lum(px).mean()), 4))
        r = got[str(k)]
        if abs(float(r["avg_lum"]) - round(float(np.mean(lums)), 4)) > 1e-4:
            errs.append(
                f"video {k}: avg_lum {r['avg_lum']} != derived {np.mean(lums):.4f}"
            )
        _ = hashlib
    return errs


# --- gps_kalman_drift: per-device (mean, max) raw-vs-smoothed planar
# displacement over the serpentine fixture + point counts. The counts
# are EXACT (the smoother adds columns, never rows -> device_counts).
# Displacement bounds come from the filter physics on this geometry,
# not from running the filter: on the straight 3 m/s rows a converged
# constant-velocity Kalman has ~zero lag, so the only error sources
# are the per-row velocity reversals (a 6 m/s step every ~34 s) and
# the start transient; their decaying response keeps the mean well
# inside [0.1, 1.5] m while the peak must EXCEED the steady lag but
# stay below ~one step + overshoot (< 8 m). The window kills the
# classic regressions: identity smoothing (0), a lag-one off-by-one
# (= 3 m step -> mean out of range), and degree/metre unit mixups
# (~1e-5 m).
KALMAN_MEAN_RANGE = (0.1, 1.5)
KALMAN_MAX_RANGE = (1.5, 8.0)


def check_kalman_rows(rows: list[dict], sf_dir: str = SF) -> list[str]:
    exp_n = device_counts(sf_dir)
    errs = []
    got = {int(r["device_id"]): r for r in rows}
    if set(got) != set(exp_n) or len(rows) != len(exp_n):
        errs.append(f"kalman: device set {sorted(got)} != {sorted(exp_n)}")
    for d in sorted(set(got) & set(exp_n)):
        r = got[d]
        if int(r["n_points"]) != exp_n[d]:
            errs.append(f"kalman dev {d}: n_points {r['n_points']} != {exp_n[d]}")
        m = float(r["mean_displacement_m"])
        if not (KALMAN_MEAN_RANGE[0] <= m <= KALMAN_MEAN_RANGE[1]):
            errs.append(f"kalman dev {d}: mean_displacement {m} outside {KALMAN_MEAN_RANGE}")
        mx = float(r["max_displacement_m"])
        if not (KALMAN_MAX_RANGE[0] <= mx <= KALMAN_MAX_RANGE[1]):
            errs.append(f"kalman dev {d}: max_displacement {mx} outside {KALMAN_MAX_RANGE}")
        if mx < m:
            errs.append(f"kalman dev {d}: max {mx} < mean {m}")
    return errs


# --- mutual_difference: the fixture (queries.q_mutual_difference)
# stacks, per group g, members r = 0..4 at y = 39.5 + 0.05 r (height
# 0.08 -> 0.03 overlap with BOTH vertical neighbors), all with the
# same 0.06-deg width at x0 = 116 + 0.15 g. Each member's mutual
# difference (member minus union of all others) is the horizontal
# strip covered by no neighbor: [y0, y0+0.05] for r=0 (nothing below),
# [y0+0.03, y0+0.05] for interior members (clipped by r-1's top edge
# at y0+0.03 and r+1's bottom edge at y0+0.05), [y0+0.03, y0+0.08] for
# r=4 (nothing above). All strips are axis-aligned rectangles with
# closed-form spherical areas. The raster bound-error scale
# (perimeter * g / area at the adaptive g ~ 6.3 m) is ~0.8% for the
# thinnest 0.02-deg strips with measured error ~1/3 of that; bound set
# at +/-1.5% — any real bug (wrong neighbor, off-by-a-band) is a
# >= 30% area error.
MUTUAL_MU_RTOL = 0.015


def mutual_expectations() -> dict[tuple[int, int], tuple[float, float]]:
    out = {}
    for grp in range(5):
        x0 = 116.0 + grp * 0.15
        for r in range(5):
            y0 = 39.5 + 0.05 * r
            if r == 0:
                mu = spherical_rect_mu(x0, x0 + 0.06, y0, y0 + 0.05)
            elif r == 4:
                mu = spherical_rect_mu(x0, x0 + 0.06, y0 + 0.03, y0 + 0.08)
            else:
                mu = spherical_rect_mu(x0, x0 + 0.06, y0 + 0.03, y0 + 0.05)
            out[(grp, r)] = (mu * (1 - MUTUAL_MU_RTOL), mu * (1 + MUTUAL_MU_RTOL))
    return out


def check_mutual_rows(rows: list[dict]) -> list[str]:
    exp = mutual_expectations()
    errs = []
    got = {(int(r["grp"]), int(r["member_idx"])): float(r["mu_approx"]) for r in rows}
    if len(got) != len(rows):
        errs.append("mutual_difference: duplicate (grp, member_idx) rows")
    if set(got) != set(exp):
        errs.append(
            f"mutual_difference: member set {sorted(got)} != expected {sorted(exp)}"
        )
    for key in sorted(set(got) & set(exp)):
        lo, hi = exp[key]
        if not (lo <= got[key] <= hi):
            errs.append(
                f"mutual_difference {key}: mu {got[key]} outside [{lo:.1f}, {hi:.1f}]"
            )
    return errs


# --- accumulated_union: the fixture (queries.q_accumulated_union)
# stacks, per group g, members r = 0..4 at y = 39.5 + 0.04 r (height
# 0.07 -> 0.03 overlap with the previous member) with widths
# 0.05 + 0.004 r (INCREASING — insertion order is the opposite of
# area order). Insertion-order clip: r=0 keeps its full rectangle;
# r>=1 keeps the 0.04-deg strip above the previous member's top edge
# plus the 0.004-deg-wide sliver where it outgrows the previous
# member's width over the 0.03-deg overlap band (only member r-1 can
# overlap member r: r-2 tops out at y_r - 0.01). Both pieces are
# axis-aligned rectangles with closed-form spherical areas.
ACCUM_MU_RTOL = 0.01


def accumulated_expectations() -> dict[tuple[int, int], tuple[float, float]]:
    out = {}
    for grp in range(5):
        x0 = 116.0 + grp * 0.15
        for r in range(5):
            w = 0.05 + r * 0.004
            y0 = 39.5 + 0.04 * r
            if r == 0:
                mu = spherical_rect_mu(x0, x0 + w, y0, y0 + 0.07)
            else:
                w_prev = 0.05 + (r - 1) * 0.004
                mu = spherical_rect_mu(x0, x0 + w, y0 + 0.03, y0 + 0.07) + spherical_rect_mu(
                    x0 + w_prev, x0 + w, y0, y0 + 0.03
                )
            out[(grp, r)] = (mu * (1 - ACCUM_MU_RTOL), mu * (1 + ACCUM_MU_RTOL))
    return out


def check_accumulated_rows(rows: list[dict]) -> list[str]:
    exp = accumulated_expectations()
    errs = []
    got = {(int(r["grp"]), int(r["member_idx"])): float(r["mu_approx"]) for r in rows}
    if len(got) != len(rows):
        errs.append("accumulated_union: duplicate (grp, member_idx) rows")
    if set(got) != set(exp):
        errs.append(
            f"accumulated_union: survivor set {sorted(got)} != expected {sorted(exp)}"
        )
    for key in sorted(set(got) & set(exp)):
        lo, hi = exp[key]
        if not (lo <= got[key] <= hi):
            errs.append(
                f"accumulated_union {key}: mu {got[key]} outside [{lo:.1f}, {hi:.1f}]"
            )
    return errs


#: name -> checker for every pin make_goldens gates beyond the flagships
PIN_CHECKS = {
    "accumulated_union": lambda rows, sf: check_accumulated_rows(rows),
    "mutual_difference": lambda rows, sf: check_mutual_rows(rows),
    "conflict_resolution": lambda rows, sf: check_conflict_rows(rows),
    "merge_polygons": lambda rows, sf: check_merge_rows(rows),
    "images_decode_stats": check_decode_stats_rows,
    "images_resize_stats": check_resize_stats_rows,
    "images_psnr_check": check_psnr_rows,
    "video_frame_sample": check_video_rows,
    "gps_kalman_drift": check_kalman_rows,
}
