"""Parking / drift detectors (GisUtil §parking):

- grid_density_stats: 5 m grid occupancy on the Gauss plane
  (G:10012-10086): dense cell = count > 20; drift flag when dense
  cells / valid cells > 0.3.
- is_parking_drift (G:10384-10495): verdict = 90%-distribution area
  <= 3 mu AND heading change > 85 deg for >= 30% of valid points
  (circular wrap fix G:10456).
- filter_parking_by_time_window (G:7956-8065): sliding wall-clock
  window (step = window/2); windows with >= min_points and bbox <=
  max_range on both axes are parking clouds — their points are
  dropped.
- split_time_overlaps (G:8385-8485): cut segment time ranges so no
  two [start,end] overlap; cut point = next start - 1 s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.sphere import MU_PER_M2
from .grouped import sorted_with_secs
from .projection import distribution_area
from .trajectory import heading_changes

GRID_M = 5.0  # G:10036
DENSE_COUNT = 20  # G:697
DENSE_RATIO = 0.3  # G:706
DRIFT_AREA_MU = 3.0  # G:599/651
DRIFT_HEADING_DEG = 85.0  # G:660
DRIFT_HEADING_RATIO = 0.3  # G:669


def grid_density_stats(df_projected: DataFrame, grid_m: float = GRID_M) -> DataFrame:
    """Per-device grid occupancy: n_cells, n_dense, dense_ratio,
    drift flag."""
    base = df_projected.groupBy("device_id").agg(
        F.min("x").alias("_minx"), F.min("y").alias("_miny")
    )
    cells_df = (
        df_projected.join(base, "device_id")
        .withColumn("_gx", F.floor((F.col("x") - F.col("_minx")) / grid_m))
        .withColumn("_gy", F.floor((F.col("y") - F.col("_miny")) / grid_m))
        .groupBy("device_id", "_gx", "_gy")
        .agg(F.count("*").alias("cnt"))
    )
    return cells_df.groupBy("device_id").agg(
        F.count("*").alias("n_cells"),
        F.sum((F.col("cnt") > DENSE_COUNT).cast("long")).alias("n_dense"),
        F.round(
            F.sum((F.col("cnt") > DENSE_COUNT).cast("long")) / F.count("*"), 4
        ).alias("dense_ratio"),
        (
            F.sum((F.col("cnt") > DENSE_COUNT).cast("long")) / F.count("*") > DENSE_RATIO
        ).alias("grid_drift"),
    )


def is_parking_drift(df_projected: DataFrame) -> DataFrame:
    """Two-stage drift verdict per device."""
    area = distribution_area(df_projected, ratio=0.9).select(
        "device_id", (F.col("area_m2") * MU_PER_M2).alias("area_mu")
    )
    hc = heading_changes(df_projected)
    turns = hc.filter(F.col("heading_change").isNotNull()).groupBy("device_id").agg(
        F.count("*").alias("n_valid"),
        F.sum((F.col("heading_change") > DRIFT_HEADING_DEG).cast("long")).alias("n_turns"),
    )
    j = area.join(turns, "device_id", "left").fillna({"n_valid": 0, "n_turns": 0})
    # ONE guarded ratio for both columns: the old is_drift conjunction
    # repeated the division unguarded and survived n_valid=0 only by
    # And's left-to-right operand order — under Spark 4's default ANSI
    # mode a reordered conjunct raises DIVIDE_BY_ZERO (r6 review)
    ratio = F.when(F.col("n_valid") > 0, F.col("n_turns") / F.col("n_valid")).otherwise(0.0)
    return j.select(
        "device_id",
        F.round("area_mu", 4).alias("area_mu"),
        F.round(ratio, 4).alias("turn_ratio"),
        (
            (F.col("area_mu") <= DRIFT_AREA_MU)
            & (F.col("n_valid") > 0)
            & (ratio >= DRIFT_HEADING_RATIO)
        ).alias("is_drift"),
    )


def np_filter_parking_by_time_window(
    x: np.ndarray,
    y: np.ndarray,
    ts_s: np.ndarray,
    window_s: float = 300.0,
    min_points: int = 10,
    max_range_m: float = 20.0,
) -> np.ndarray:
    """Keep-mask: sliding windows (step = window/2) whose point count
    >= min_points and bbox <= max_range on both axes mark ALL their
    points deleted (exact reference control flow)."""
    n = len(ts_s)
    keep = np.ones(n, dtype=bool)
    if n == 0:
        return keep
    t0, t1 = ts_s[0], ts_s[-1]
    step = window_s / 2.0
    # window start = t0 + k*step computed per index, NOT accumulated
    # (r6: `start += step` drifts ~1 ulp per iteration for fractional
    # t0, which would make the window edges diverge from the SQL twin's
    # t0 + k*step form; identical for whole-second fixtures)
    k = 0
    while t0 + k * step <= t1:
        start = t0 + k * step
        sel = (ts_s >= start) & (ts_s < start + window_s)
        idx = np.flatnonzero(sel)
        if len(idx) >= min_points:
            wx, wy = x[idx], y[idx]
            if (wx.max() - wx.min() <= max_range_m) and (wy.max() - wy.min() <= max_range_m):
                keep[idx] = False
        k += 1
    return keep


def filter_parking_by_time_window(df_projected: DataFrame, **kw) -> DataFrame:
    unknown = set(kw) - {"window_s", "min_points", "max_range_m"}
    if unknown:
        raise TypeError(f"filter_parking_by_time_window: unknown option(s) {sorted(unknown)}")
    if kw.get("window_s", 1) <= 0:
        # step = window_s/2 drives the sweep; <= 0 would spin the
        # executor task forever instead of erroring on the driver
        raise ValueError("filter_parking_by_time_window: window_s must be > 0")
    if kw.get("min_points", 1) < 1:
        # min_points <= 0 lets an EMPTY window pass the count gate and
        # crash wx.max() on a zero-size array inside the executor
        # whenever a time gap exceeds one window step (r6 review)
        raise ValueError("filter_parking_by_time_window: min_points must be >= 1")
    schema = df_projected.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, secs = sorted_with_secs(pdf)
        mask = np_filter_parking_by_time_window(
            pdf["x"].to_numpy(np.float64), pdf["y"].to_numpy(np.float64), secs, **kw
        )
        return pdf.loc[mask]

    from .grouped import grouped_apply

    return grouped_apply(df_projected, ["device_id"], run, schema)


def np_filter_parking_points_by_index(
    x: np.ndarray,
    y: np.ndarray,
    ts_s: np.ndarray,
    parking_range_m: float = 10.0,
    min_points: int = 20,
    min_duration_s: float = 120.0,
) -> np.ndarray:
    """filterParkingPointsByIndex (G:7009-7142), exact semantics: for
    every point, its neighbors within parking_range form a parking
    cloud if >= min_points, their time span >= min_duration, AND the
    cloud bbox is <= 0.6*parking_range on both axes; all points of any
    detected cloud are dropped. Neighbor search is grid-binned (the
    STRtree analogue); the scatter-reduces (bincount / minimum.at /
    maximum.at) fold each CHUNK of source points incrementally, so
    peak memory is bounded by ~pair_budget pairs even when the whole
    trajectory is one dense dwell — a day parked at 1 Hz (86k points,
    all mutual neighbors) would otherwise materialize n^2 ~ 7.5e9
    pairs in one list. Two passes: accumulate cloud stats, then
    re-walk the chunks to mark members of qualifying clouds.
    Returns keep-mask."""
    from .clustering import _GridIndex

    n = len(x)
    is_parking = np.zeros(n, dtype=bool)
    if n == 0:
        return ~is_parking
    gi = _GridIndex(x, y, max(parking_range_m, 1e-9))
    pair_budget = 1 << 26  # ~64M pairs = ~1 GB of (src, nb) int64 per chunk
    chunk = max(pair_budget // n, 1)
    counts = np.zeros(n, dtype=np.int64)
    tmin = np.full(n, np.inf); tmax = np.full(n, -np.inf)
    xmin = np.full(n, np.inf); xmax = np.full(n, -np.inf)
    ymin = np.full(n, np.inf); ymax = np.full(n, -np.inf)
    for s in range(0, n, chunk):
        idx = np.arange(s, min(s + chunk, n), dtype=np.int64)
        sp, nb = gi.query(idx)  # sp indexes into idx
        src = idx[sp]
        counts += np.bincount(src, minlength=n)
        np.minimum.at(tmin, src, ts_s[nb]); np.maximum.at(tmax, src, ts_s[nb])
        np.minimum.at(xmin, src, x[nb]); np.maximum.at(xmax, src, x[nb])
        np.minimum.at(ymin, src, y[nb]); np.maximum.at(ymax, src, y[nb])
    lim = parking_range_m * 0.6
    cloud = (
        (counts >= min_points)
        & (tmax - tmin >= min_duration_s)
        & (xmax - xmin <= lim)
        & (ymax - ymin <= lim)
    )
    if cloud.any():
        # pass 2 queries ONLY the cloud members: every source in these
        # chunks qualifies, so all returned neighbors are marked — the
        # old full-n re-sweep redid the entire chunked neighbor query
        # just to filter by membership, doubling kernel time on dense
        # dwell trajectories (r6 review)
        cloud_idx = np.flatnonzero(cloud).astype(np.int64)
        for s in range(0, len(cloud_idx), chunk):
            _sp, nb = gi.query(cloud_idx[s : s + chunk])
            is_parking[nb] = True
    return ~is_parking


def filter_parking_points_by_index(df_projected: DataFrame, **kw) -> DataFrame:
    """DataFrame form of filterParkingPointsByIndex (G:7009-7142): one
    trajectory (device_id group) per applyInPandas call, the np kernel
    drops every detected parking cloud's points. Expects projected
    points (x/y meters); same schema out (filter-only)."""
    unknown = set(kw) - {"parking_range_m", "min_points", "min_duration_s"}
    if unknown:
        raise TypeError(f"filter_parking_points_by_index: unknown option(s) {sorted(unknown)}")
    schema = df_projected.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, secs = sorted_with_secs(pdf)
        mask = np_filter_parking_points_by_index(
            pdf["x"].to_numpy(np.float64), pdf["y"].to_numpy(np.float64), secs, **kw
        )
        return pdf.loc[mask]

    from .grouped import grouped_apply

    return grouped_apply(df_projected, ["device_id"], run, schema)


def split_time_overlaps(ranges_df: DataFrame, group_cols=("device_id",)) -> DataFrame:
    """splitTimeOverlaps (G:8385-8485) at RANGE level: per group, sort
    ranges by start and clip each range's end to next_start - 1 s where
    it overlaps the next range; ranges whose clipped end falls before
    their start are dropped. One shuffle on the group key.

    INTENTIONAL DIVERGENCE from the reference (ADVICE r5 #1): the
    reference operates on segments OF POINTS and re-emits the part of
    the current segment past the split boundary as a new segment that
    is re-sorted and reprocessed; this range-level form DROPS the
    overlapping remainder [next_start, end] instead. The remainder
    cannot be re-emitted faithfully here: a re-emitted range would
    start exactly at next_start, and on equal-start segments the
    reference's own loop fails to make progress (its termination
    depends on the discrete point times being strictly past the
    boundary), so any range-level tie-break invents semantics the
    reference does not define. Callers who need the reference's
    keep-the-tail behavior should use split_time_overlap_segments on
    the underlying points — it replicates the reference loop exactly."""
    from pyspark.sql import types as T

    cols = list(group_cols)
    schema = T.StructType(
        [T.StructField(c, ranges_df.schema[c].dataType) for c in cols]
        + [T.StructField("start_s", T.DoubleType()), T.StructField("end_s", T.DoubleType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        res = np_split_time_overlaps(
            list(zip(pdf["start_s"].astype(float), pdf["end_s"].astype(float)))
        )
        out = pd.DataFrame(
            {
                "start_s": np.array([s for s, _ in res], dtype=np.float64),
                "end_s": np.array([e for _, e in res], dtype=np.float64),
            }
        )
        for c in reversed(cols):
            out.insert(0, c, pd.Series([pdf[c].iloc[0]] * len(out), dtype=pdf[c].dtype))
        return out

    from .grouped import grouped_apply

    return grouped_apply(ranges_df.select(*cols, "start_s", "end_s"), cols, run, schema)


def split_time_overlaps_sql(ranges_src: str) -> str:
    """DuckDB twin of split_time_overlaps: `ranges_src` must yield
    (device_id, start_s, end_s)."""
    return f"""
WITH r AS ({ranges_src}),
c AS (SELECT device_id, start_s, end_s,
             lead(start_s) OVER (PARTITION BY device_id ORDER BY start_s, end_s) AS nxt
      FROM r),
f AS (SELECT device_id, start_s,
             CASE WHEN nxt IS NOT NULL AND end_s > nxt THEN nxt - 1.0 ELSE end_s END AS end_s
      FROM c)
SELECT device_id, start_s, end_s FROM f WHERE end_s >= start_s
"""


def np_split_time_overlaps(ranges: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """splitTimeOverlaps: sort by start; clip each range's end to
    next_start - 1 s when it overlaps the next (iterated to fixpoint
    in the reference; a single sorted pass is the fixpoint here)."""
    if not ranges:
        return []
    out = sorted(ranges)
    res = []
    for i, (s, e) in enumerate(out):
        if i + 1 < len(out) and e > out[i + 1][0]:
            e = out[i + 1][0] - 1.0
        if e >= s:
            res.append((s, e))
    return res


def np_split_time_overlap_segments(segments: list[np.ndarray]) -> list[np.ndarray]:
    """The reference splitTimeOverlaps loop (G:8385-8485), EXACTLY, on
    segments of point times (seconds): sort segments by first-point
    time; when a segment's last point passes the next segment's start,
    split it at next_start - 1 s — points <= the boundary are emitted
    as their own segment, points past it re-enter the worklist and are
    re-sorted/reprocessed (the keep-the-tail semantics the range-level
    operator intentionally drops). One divergence: the reference
    livelocks when the tail's first point lands exactly on next_start
    (the empty head makes no progress and the stable re-sort keeps the
    pair order); we detect the no-progress state and stop, keeping the
    segments as-is. Each input array must be ascending (the reference
    guarantees per-segment GPS-time order)."""
    out = _split_overlap_worklist(
        [
            (np.asarray(s, dtype=np.float64), np.arange(len(s), dtype=np.int64))
            for s in segments
            if len(s)
        ]
    )
    return [t for t, _i in out]


def _split_overlap_worklist(segs):
    """The worklist loop shared by the time-only and DataFrame forms;
    each item is (times ascending, point indices) split in lockstep so
    point identity survives duplicate timestamps."""
    while True:
        segs.sort(key=lambda a: a[0][0])  # stable, like List.sort
        found = False
        new = []
        for i, (cur, ci) in enumerate(segs):
            if i < len(segs) - 1 and cur[-1] > segs[i + 1][0][0]:
                split_end = segs[i + 1][0][0] - 1.0
                mask = cur <= split_end
                head, hi = cur[mask], ci[mask]
                tail, ti = cur[~mask], ci[~mask]
                if len(head) == 0:
                    # reference livelock state: every point of cur is
                    # past the boundary, so there is no head to emit
                    # and the tail would re-sort into the same slot —
                    # the reference spins forever here. Freeze ONLY
                    # this pair (keep cur whole, no progress flag) and
                    # keep scanning: later segments still split
                    # normally (r6 review — the old early-return froze
                    # the entire remaining worklist).
                    new.append((cur, ci))
                    continue
                found = True
                new.append((head, hi))
                # tail is never empty here: cur[-1] > split_end
                new.extend([(tail, ti)] + segs[i + 1 :])
                break
            new.append((cur, ci))
        segs = new
        if not found:
            return segs


def split_time_overlap_segments(
    points_df: DataFrame, group_cols=("device_id",), seg_col: str = "seg_id"
) -> DataFrame:
    """DataFrame form of the reference's point-level splitTimeOverlaps:
    input points carry a segment id (e.g. from split_cluster_by_time);
    output is the same points with `seg_col` REASSIGNED to the
    re-segmentation's ordinal (segments ordered by start time, 0-based
    per group) so that no two segments of a group overlap in time and
    overlapping tails survive as their own segments. One shuffle on
    the group key, per-group python loop == the reference's."""
    from pyspark.sql import types as T

    cols = list(group_cols)
    schema = T.StructType(
        [f for f in points_df.schema.fields if f.name != seg_col]
        + [T.StructField(seg_col, T.LongType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, secs = sorted_with_secs(pdf)
        pdf = pdf.reset_index(drop=True)
        by_seg = pdf.groupby(seg_col, sort=False).indices
        out = _split_overlap_worklist(
            [(secs[idx], np.asarray(idx, dtype=np.int64)) for _s, idx in by_seg.items()]
        )
        # new segment ordinal = rank of segment start time (the loop
        # already returns the list sorted by start, bar the final
        # no-progress exit — rank explicitly to be safe)
        ranks = np.argsort([t[0] for t, _i in out], kind="stable")
        new_id = np.full(len(pdf), -1, dtype=np.int64)
        for rank, si in enumerate(ranks):
            new_id[out[si][1]] = rank
        keep = pdf.drop(columns=[seg_col]).copy()
        keep[seg_col] = new_id
        return keep

    from .grouped import grouped_apply

    return grouped_apply(points_df, cols, run, schema)
