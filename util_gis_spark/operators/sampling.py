"""Trajectory thinning / sampling kernels (order-dependent sequential
scans in the reference -> per-trajectory numpy passes inside
applyInPandas here).

- simplify_by_angle        (G:5269-5411; params G:489/499/508)
- fast_distance_sampling   (G:7786-7860; params G:527/537)

Both are exact re-implementations of the reference control flow so
that plot geometry built on top matches point-for-point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .grouped import sorted_with_secs

MIN_EDGE_LEN_M = 0.5  # G:489 noise edge
MIN_ANGLE_DEG = 10.0  # G:499 corner threshold
MAX_EDGE_LEN_M = 1.0  # G:508 accumulated-length force keep
FDS_MIN_DIST_M = 0.5  # G:527
FDS_KEEP_RATIO = 0.1  # G:537 -> keep 1 per floor(1/0.1)=10 in dense runs


def np_simplify_by_angle(
    xy: np.ndarray,
    min_edge_len: float = MIN_EDGE_LEN_M,
    min_angle_deg: float = MIN_ANGLE_DEG,
    max_edge_len: float = MAX_EDGE_LEN_M,
) -> np.ndarray:
    """Boolean keep-mask over points (endpoints always kept,
    G:5301/5391). Sequential thinning: edges < min_edge_len are noise
    (skipped without advancing the anchor); a point is kept when the
    turn angle at it exceeds min_angle_deg or the accumulated kept
    length exceeds max_edge_len."""
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = True
    if n <= 2:
        keep[-1] = True
        return keep
    x, y = xy[:, 0], xy[:, 1]
    last = 0
    acc = 0.0
    for i in range(1, n - 1):
        dx1, dy1 = x[i] - x[last], y[i] - y[last]
        len1 = float(np.hypot(dx1, dy1))
        if len1 < min_edge_len:
            continue
        acc += len1
        dx2, dy2 = x[i + 1] - x[i], y[i + 1] - y[i]
        turn = abs(np.arctan2(dy2, dx2) - np.arctan2(dy1, dx1))
        if turn > np.pi:
            turn = 2 * np.pi - turn
        if np.degrees(turn) > min_angle_deg or acc > max_edge_len:
            keep[i] = True
            last = i
            acc = 0.0
    keep[-1] = True
    return keep


def np_fast_distance_sampling(
    xy: np.ndarray,
    min_distance: float = FDS_MIN_DIST_M,
    keep_ratio: float = FDS_KEEP_RATIO,
) -> np.ndarray:
    """Boolean keep-mask: keep a point if >= min_distance from the last
    kept; inside dense runs keep 1 per int(1/keep_ratio) via a skip
    counter (exact reference control flow, G:7830)."""
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = True
    x, y = xy[:, 0], xy[:, 1]
    lx, ly = x[0], y[0]
    skip = 0
    thresh = int(1.0 / keep_ratio)
    for i in range(1, n):
        d = np.hypot(x[i] - lx, y[i] - ly)
        if d < min_distance:
            skip += 1
            if skip >= thresh:
                keep[i] = True
                lx, ly = x[i], y[i]
                skip = 0
        else:
            keep[i] = True
            lx, ly = x[i], y[i]
            skip = 0
    return keep


def np_density_based_sampling(
    xy: np.ndarray,
    epsilon: float,
    min_pts: int,
    max_neighbors: int,
) -> np.ndarray:
    """densityBasedSampling (G:7568-7700), exact semantics:
    pass 1 tiers by eps-ball neighbor count (self included): keep all
    if < 2*minPts; every 3rd (i % 3 == 0) if <= maxNeighbors; every
    10th otherwise. Pass 2 force-keeps dropped points whose eps-ball
    has fewer than minPts KEPT neighbors (DBSCAN-core guarantee).
    Neighbor search is grid-binned (the STRtree analogue)."""
    from .clustering import _GridIndex

    n = len(xy)
    if n == 0:
        return np.zeros(n, dtype=bool)
    x, y = np.ascontiguousarray(xy[:, 0]), np.ascontiguousarray(xy[:, 1])
    # shared neighbor engine (clustering._GridIndex) instead of a
    # second dict-binned implementation; chunked queries bound memory
    gi = _GridIndex(x, y, max(epsilon, 1e-9))
    chunk = max((1 << 26) // n, 1)

    # pass 1 is order-independent: one vectorized count per point
    counts = np.zeros(n, dtype=np.int64)
    for s in range(0, n, chunk):
        idx = np.arange(s, min(s + chunk, n), dtype=np.int64)
        sp, _nb = gi.query(idx)
        counts += np.bincount(idx[sp], minlength=n)
    ar = np.arange(n, dtype=np.int64)
    keep = (
        (counts < min_pts * 2)
        | ((counts <= max_neighbors) & (ar % 3 == 0))
        | ((counts > max_neighbors) & (ar % 10 == 0))
    )

    # pass 2 is SEQUENTIAL (each force-keep is visible to later scan
    # positions), so each chunk's CSR lists are scanned IMMEDIATELY and
    # discarded — retaining every dropped point's list made memory
    # O(total neighbor pairs) again (r6 review: a day-long 1 Hz dwell
    # dropping 90% of points would hold ~6.7e9 int64 indices, the
    # exact blow-up the chunking exists to bound). The lists are pure
    # geometry (independent of `keep`) and chunks run in ascending
    # dropped order, so the keep reads/writes happen in the identical
    # sequence — bit-identical output, peak memory one chunk of pairs.
    dropped = np.flatnonzero(~keep)
    for s in range(0, len(dropped), chunk):
        idx = dropped[s : s + chunk]
        sp, nb = gi.query(idx)
        order = np.argsort(sp, kind="stable")
        sp_s, nb_s = sp[order], nb[order]
        bounds = np.searchsorted(sp_s, np.arange(len(idx) + 1))
        for k, i in enumerate(idx):
            if int(keep[nb_s[bounds[k] : bounds[k + 1]]].sum()) < min_pts:
                keep[i] = True
    return keep


def _masked_thin(df_projected: DataFrame, group_cols, mask_fn) -> DataFrame:
    """ONE wrapper for every thinning operator: (ts, point_id)-sort
    each trajectory, build a keep-mask from its (n, 2) x/y array,
    filter (schema unchanged). The four operators below were verbatim
    copies of this body with only the mask function varying (r6
    review) — a preamble fix now lands once, as with sorted_with_secs."""
    schema = df_projected.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, _secs = sorted_with_secs(pdf)
        return pdf.loc[mask_fn(pdf[["x", "y"]].to_numpy(np.float64))]

    from .grouped import grouped_apply

    return grouped_apply(df_projected, group_cols, run, schema)


def simplify_by_angle(df_projected: DataFrame, group_cols=("device_id",)) -> DataFrame:
    """DataFrame form: keep the simplified subset of each trajectory
    (input must carry x/y from project_trajectories and be groupable)."""
    return _masked_thin(df_projected, group_cols, np_simplify_by_angle)


def douglas_peucker_sampling(
    df_projected: DataFrame, tol: float, group_cols=("device_id",)
) -> DataFrame:
    """DataFrame form of the reference's DouglasPeuckerSimplifier use
    (vertex-count capping at G:1283/G:2456/G:2591, applied there to
    plot rings; the trajectory form keeps the DP subset of each
    (ts, point_id)-sorted track). Same grouped-kernel shape as the
    other thinning operators."""
    from ..geo.geometry import douglas_peucker_mask

    return _masked_thin(df_projected, group_cols, lambda a: douglas_peucker_mask(a, tol))


def fast_distance_sampling(df_projected: DataFrame, group_cols=("device_id",)) -> DataFrame:
    return _masked_thin(df_projected, group_cols, np_fast_distance_sampling)


def density_based_sampling(
    df_projected: DataFrame,
    epsilon: float,
    min_pts: int,
    max_neighbors: int,
    group_cols=("device_id",),
) -> DataFrame:
    """DataFrame form of densityBasedSampling (G:7568-7700): keep the
    density-tiered subset of each trajectory (np_density_based_sampling
    over (ts, point_id)-sorted x/y)."""
    return _masked_thin(
        df_projected,
        group_cols,
        lambda a: np_density_based_sampling(a, epsilon, min_pts, max_neighbors),
    )
