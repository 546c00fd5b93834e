"""Sequential window operators that need per-trajectory state machines
(applyInPandas) rather than SQL windows:

- split_time_windows: the cadence session machine (G:6249-6424):
  force-split when dt > 300 s; switch window when a different dt value
  repeats >= 59 times consecutively; window label = majority-vote dt
  (tie -> smaller; the reference's HashMap stream-max is order-
  unstable, we pin the deterministic choice); merge adjacent windows
  with the same label (G:6603-6647).
- median_smooth_speeds: centered k-point median filter of x/y +
  two-sided speed + low-speed-run removal (G:7251-7386).
- split_time_overlaps / has_time_overlap (G:8385-8485, G:10128-10151).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .grouped import sorted_with_secs

MAX_INTERVAL_S = 300  # G:556
MIN_CONSECUTIVE = 59  # G:547


def np_split_time_windows(
    ts_seconds: np.ndarray,
    max_interval_s: int = MAX_INTERVAL_S,
    min_consecutive: int = MIN_CONSECUTIVE,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact port of the reference state machine over one time-sorted
    trajectory. Returns (window_id per point, window_label per point)
    AFTER the adjacent-same-label merge."""
    n = len(ts_seconds)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    windows: list[tuple[int, list[int]]] = []  # (label, point indices)

    cur: list[int] = [0]
    counts: dict[int, int] = {}
    cur_type: int | None = None
    consec = 0
    last_type: int | None = None

    def vote() -> int:
        if not counts:
            return 0
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        return best[0]

    for i in range(n - 1):
        dt = int(ts_seconds[i + 1] - ts_seconds[i])
        if dt > max_interval_s:
            if cur:
                windows.append((vote(), cur))
            cur = [i + 1]
            counts = {}
            cur_type = None
            consec = 0
            last_type = None
            continue
        counts[dt] = counts.get(dt, 0) + 1
        if cur_type is None:
            cur_type = dt
        consec = consec + 1 if dt == last_type else 1
        if dt != cur_type and consec >= min_consecutive:
            if cur:
                windows.append((vote(), cur))
            cur = [i, i + 1]
            counts = {dt: 1}
            cur_type = dt
            consec = 0
        else:
            cur.append(i + 1)
        last_type = dt

    if cur:
        windows.append((vote(), cur))

    # merge adjacent same-label windows (G:6603-6647)
    merged: list[tuple[int, list[int]]] = []
    for label, idx in windows:
        if merged and merged[-1][0] == label:
            merged[-1][1].extend(idx)
        else:
            merged.append((label, list(idx)))

    win_id = np.zeros(n, dtype=np.int64)
    win_label = np.zeros(n, dtype=np.int64)
    for wid, (label, idx) in enumerate(merged):
        arr = np.asarray(idx, dtype=np.int64)
        win_id[arr] = wid
        win_label[arr] = label
    return win_id, win_label


def split_time_windows(df: DataFrame, group_cols=("device_id",)) -> DataFrame:
    """Adds window_id + window_interval_s per point. Note: points can
    appear in two raw windows at a cadence switch (the reference puts
    the pivot point in both); the merged assignment keeps the LAST
    window's id for such points, preserving per-window membership
    counts to within the reference's own duplication."""
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("window_id", T.LongType()),
            T.StructField("window_interval_s", T.LongType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, secs = sorted_with_secs(pdf, float_secs=False)
        wid, lab = np_split_time_windows(secs)
        out = pdf.copy()
        out["window_id"] = wid
        out["window_interval_s"] = lab
        return out

    from .grouped import grouped_apply

    return grouped_apply(df, group_cols, run, schema)


# ------------------------------------------------------------- smoothing
def np_median_smooth(
    x: np.ndarray,
    y: np.ndarray,
    ts_s: np.ndarray,
    k: int = 5,
    speed_threshold_ms: float = 0.05,
    min_parking_s: float = 120.0,
) -> np.ndarray:
    """Median-filter smoothing + low-speed-run removal (G:7251-7386).
    Returns keep-mask. Median window is centered, shrunk at the edges
    (G:7271-7276); speed(i) = mean of dist/dt to prev and next on the
    SMOOTHED track, edges = inf (G:7303-7340); runs with speed <=
    threshold lasting >= min_parking_s are dropped (G:7346-7382)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    half = k // 2
    w = 2 * half + 1  # the [i-half, i+half] window is always odd-sized
    sx = np.empty(n)
    sy = np.empty(n)
    if n >= w:
        # interior: an odd window's median is a pure order statistic
        # (no arithmetic), so the vectorized partition is bit-identical
        # to np.median AND to the DuckDB twin — the old per-point
        # np.median loop dominated kernel time on long trajectories
        # (r6 review)
        from numpy.lib.stride_tricks import sliding_window_view

        sx[half : n - half] = np.partition(sliding_window_view(x, w), half, axis=1)[:, half]
        sy[half : n - half] = np.partition(sliding_window_view(y, w), half, axis=1)[:, half]
        edge_ix = list(range(half)) + list(range(n - half, n))
    else:
        edge_ix = range(n)
    for i in edge_ix:
        lo, hi = max(0, i - half), min(n, i + half + 1)
        sx[i] = np.median(x[lo:hi])
        sy[i] = np.median(y[lo:hi])
    speed = np.full(n, np.inf)
    if n >= 3:
        # sqrt(dx*dx + dy*dy), NOT np.hypot: hypot is rounded
        # differently at ulp level, and the DuckDB twin spells out the
        # sqrt-of-sum form — a smoothed speed within 1 ulp of the
        # threshold must flip `slow` in BOTH engines or neither
        # (r6 review; the bit-identical-twin standard)
        dpx = sx[1:-1] - sx[:-2]
        dpy = sy[1:-1] - sy[:-2]
        d_prev = np.sqrt(dpx * dpx + dpy * dpy)
        dnx = sx[2:] - sx[1:-1]
        dny = sy[2:] - sy[1:-1]
        d_next = np.sqrt(dnx * dnx + dny * dny)
        dt_prev = np.maximum(ts_s[1:-1] - ts_s[:-2], 1e-9)
        dt_next = np.maximum(ts_s[2:] - ts_s[1:-1], 1e-9)
        speed[1:-1] = (d_prev / dt_prev + d_next / dt_next) / 2.0
    keep = np.ones(n, dtype=bool)
    slow = speed <= speed_threshold_ms
    i = 0
    while i < n:
        if slow[i]:
            j = i
            while j + 1 < n and slow[j + 1]:
                j += 1
            if ts_s[j] - ts_s[i] >= min_parking_s:
                keep[i : j + 1] = False
            i = j + 1
        else:
            i += 1
    return keep


def median_smooth_filter(df_projected: DataFrame, group_cols=("device_id",), **kw) -> DataFrame:
    schema = df_projected.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, secs = sorted_with_secs(pdf)
        mask = np_median_smooth(
            pdf["x"].to_numpy(np.float64), pdf["y"].to_numpy(np.float64), secs, **kw
        )
        return pdf.loc[mask]

    from .grouped import grouped_apply

    return grouped_apply(df_projected, group_cols, run, schema)


# ------------------------------------------------------------- kalman
def np_kalman_smooth(
    x: np.ndarray,
    y: np.ndarray,
    ts_s: np.ndarray,
    process_accel_ms2: float = 0.5,
    measure_sigma_m: float = 3.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Constant-velocity Kalman filter over a planar trajectory — the
    engine's EXTENSION next to the reference's rolling-median smoother
    (the reference smooths with a median, G:7251; BASELINE.json's
    north-star names Kalman, so both are offered; outputs are compared
    in tests). State [pos, vel] per axis; process noise from an
    assumed acceleration bound, measurement noise = GPS sigma."""
    n = len(x)
    if n == 0:
        return x.copy(), y.copy()
    out = np.empty((n, 2))
    q = process_accel_ms2
    r = measure_sigma_m**2
    for axis, series in ((0, x), (1, y)):
        pos, vel = float(series[0]), 0.0
        # covariance
        p00, p01, p11 = r, 0.0, 1.0
        out[0, axis] = pos
        for i in range(1, n):
            dt = max(float(ts_s[i] - ts_s[i - 1]), 1e-3)
            # predict
            pos += vel * dt
            p00 += dt * (2 * p01 + dt * p11) + 0.25 * q * dt**4
            p01 += dt * p11 + 0.5 * q * dt**3
            p11 += q * dt**2
            # update
            s = p00 + r
            k0, k1 = p00 / s, p01 / s
            innov = float(series[i]) - pos
            pos += k0 * innov
            vel += k1 * innov
            p11 -= k1 * p01
            p01 -= k1 * p00
            p00 -= k0 * p00
            out[i, axis] = pos
    return out[:, 0], out[:, 1]


def kalman_smooth_trajectories(df_projected: DataFrame, group_cols=("device_id",), **kw) -> DataFrame:
    """Adds x_smooth/y_smooth columns per trajectory."""
    schema = T.StructType(
        df_projected.schema.fields
        + [T.StructField("x_smooth", T.DoubleType()), T.StructField("y_smooth", T.DoubleType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, secs = sorted_with_secs(pdf)
        xs, ys = np_kalman_smooth(
            pdf["x"].to_numpy(np.float64), pdf["y"].to_numpy(np.float64), secs, **kw
        )
        out = pdf.copy()
        out["x_smooth"] = xs
        out["y_smooth"] = ys
        return out

    from .grouped import grouped_apply

    return grouped_apply(df_projected, group_cols, run, schema)


def split_time_windows_summary_sql(
    pts_src: str, max_interval_s: int = MAX_INTERVAL_S
) -> str:
    """DuckDB twin of q_gps_time_windows' summary, valid whenever the
    input cannot trigger the cadence-SWITCH rule (a different dt value
    repeating >= MIN_CONSECUTIVE times consecutively). On such inputs
    the state machine reduces exactly to: raw windows split where
    dt > max_interval_s, label = modal in-window dt (tie -> smaller,
    empty -> 0), then adjacent same-label windows merged. The driver's
    events fixture satisfies the precondition — its timestamps are
    jitter-random, so equal consecutive integer dts are one-off
    (asserted by tests/test_plots_and_windows.py); the switch path is
    covered by the dedicated cadence fixtures there. NULL-ts rows are
    filtered like the kernel's sorted_with_secs does (r6 review: the
    twin previously kept them, a latent divergence if the fixture ever
    grows NULL timestamps)."""
    return f"""
WITH pts AS ({pts_src}),
s AS (SELECT device_id, ts, point_id, epoch_us(ts) // 1000000 AS sec
      FROM pts WHERE ts IS NOT NULL),
d AS (SELECT *, sec - lag(sec) OVER (PARTITION BY device_id ORDER BY ts, point_id) AS dt FROM s),
r AS (SELECT *, sum(CASE WHEN dt IS NULL OR dt > {max_interval_s} THEN 1 ELSE 0 END)
          OVER (PARTITION BY device_id ORDER BY ts, point_id ROWS UNBOUNDED PRECEDING) - 1 AS raw_id FROM d),
m AS (SELECT device_id, raw_id, dt, count(*) AS c FROM r
      WHERE dt IS NOT NULL AND dt <= {max_interval_s} GROUP BY 1, 2, 3),
best AS (SELECT device_id, raw_id, dt AS label FROM
         (SELECT *, row_number() OVER (PARTITION BY device_id, raw_id ORDER BY c DESC, dt ASC) AS rn FROM m)
         WHERE rn = 1),
w0 AS (SELECT r.device_id, r.raw_id, coalesce(b.label, 0) AS label,
              count(*) AS n, min(r.ts) AS st, max(r.ts) AS en
       FROM r LEFT JOIN best b ON r.device_id = b.device_id AND r.raw_id = b.raw_id
       GROUP BY 1, 2, 3),
w1 AS (SELECT *, lag(label) OVER (PARTITION BY device_id ORDER BY raw_id) AS plabel FROM w0),
mg AS (SELECT *, sum(CASE WHEN label = plabel THEN 0 ELSE 1 END)
           OVER (PARTITION BY device_id ORDER BY raw_id ROWS UNBOUNDED PRECEDING) - 1 AS window_id FROM w1)
SELECT device_id, CAST(window_id AS BIGINT) AS window_id, CAST(label AS BIGINT) AS window_interval_s,
       CAST(sum(n) AS BIGINT) AS n_points, min(st) AS start_ts, max(en) AS end_ts
FROM mg GROUP BY 1, 2, 3
"""


def median_smooth_summary_sql(
    proj_src: str,
    k: int = 5,
    speed_threshold_ms: float = 0.05,
    min_parking_s: float = 120.0,
) -> str:
    """DuckDB twin of median_smooth_filter (G:7251-7386) summarized per
    device: `proj_src` must yield projected points (device_id,
    point_id, ts, x, y). The kernel is exactly SQL-expressible: the
    centered shrunk median window is a ROWS BETWEEN frame (DuckDB
    median interpolates even-sized windows like numpy), speed is the
    mean of dist/dt to the prev/next SMOOTHED point (edges = +inf,
    never slow), and the low-speed-run removal is gaps-and-islands over
    the slow flag with the run's raw-time span tested against
    min_parking_s."""
    half = k // 2
    return f"""
WITH proj AS ({proj_src}),
s AS (SELECT device_id, point_id, ts, x, y, epoch_us(ts)/1000000.0 AS sec
      FROM proj WHERE ts IS NOT NULL),
sm AS (SELECT *, median(x) OVER win5 AS sx, median(y) OVER win5 AS sy FROM s
       WINDOW win5 AS (PARTITION BY device_id ORDER BY ts, point_id
                       ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)),
nb AS (SELECT *, lag(sx) OVER win AS px, lag(sy) OVER win AS py,
              lead(sx) OVER win AS qx, lead(sy) OVER win AS qy,
              lag(sec) OVER win AS psec, lead(sec) OVER win AS qsec
       FROM sm WINDOW win AS (PARTITION BY device_id ORDER BY ts, point_id)),
sp AS (SELECT *, CASE WHEN px IS NULL OR qx IS NULL THEN FALSE
            ELSE (sqrt((sx-px)*(sx-px)+(sy-py)*(sy-py)) / greatest(sec-psec, 1e-9)
                + sqrt((qx-sx)*(qx-sx)+(qy-sy)*(qy-sy)) / greatest(qsec-sec, 1e-9)) / 2.0
                 <= {speed_threshold_ms!r} END AS slow
       FROM nb),
rg AS (SELECT *, sum(CASE WHEN slow AND NOT coalesce(pslow, FALSE) THEN 1 ELSE 0 END)
            OVER (PARTITION BY device_id ORDER BY ts, point_id ROWS UNBOUNDED PRECEDING) AS rid
       FROM (SELECT *, lag(slow) OVER (PARTITION BY device_id ORDER BY ts, point_id) AS pslow
             FROM sp)),
runs AS (SELECT device_id, rid, max(sec) - min(sec) AS dur FROM rg WHERE slow GROUP BY 1, 2),
kept AS (SELECT rg.device_id, rg.point_id
         FROM rg LEFT JOIN runs USING (device_id, rid)
         WHERE NOT rg.slow OR runs.dur < {min_parking_s!r})
SELECT device_id, count(*) AS n_kept, CAST(sum(point_id) AS BIGINT) AS id_sum
FROM kept GROUP BY device_id
"""


# --------------------------------------------------------- time overlaps
def has_time_overlap(ranges_df: DataFrame, group_cols=("device_id",)) -> DataFrame:
    """hasTimeOverlap (G:10128-10151): sort ranges by start; overlap
    iff any previous end > next start."""
    w = Window.partitionBy(*group_cols).orderBy("start_ts")
    flagged = ranges_df.withColumn("_prev_end", F.lag("end_ts").over(w)).withColumn(
        "_ovl", (F.col("_prev_end") > F.col("start_ts")).cast("int")
    )
    return flagged.groupBy(*group_cols).agg(
        (F.coalesce(F.sum("_ovl"), F.lit(0)) > 0).alias("has_overlap")
    )


def has_time_overlap_sql(ranges_src: str) -> str:
    """DuckDB twin of has_time_overlap: `ranges_src` must yield
    (device_id, start_ts, end_ts) with per-device distinct start_ts
    (the operator's lag window orders by start_ts alone)."""
    return f"""
WITH r AS ({ranges_src}),
l AS (SELECT device_id, start_ts,
             lag(end_ts) OVER (PARTITION BY device_id ORDER BY start_ts) AS prev_end
      FROM r)
SELECT device_id,
       coalesce(sum(CASE WHEN prev_end > start_ts THEN 1 ELSE 0 END), 0) > 0 AS has_overlap
FROM l GROUP BY device_id
"""
