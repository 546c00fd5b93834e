"""DBSCAN on the Gauss plane, pure numpy (no ELKI/sklearn available).

The reference runs ELKI DBSCAN on (x, y) with Euclidean distance
(G:4499-4626), drops the Noise cluster (G:4584), and time-sorts each
cluster. For the Euclidean core-point definition DBSCAN's cluster SET
is implementation-independent (border points on two clusters are
assigned by visit order — we scan points in time order, matching the
reference's DBID order).

Grid-binned implementation: bin points into eps-sized cells; a point's
eps-neighbors live in its 3x3 cell block -> O(n * local density)
without a KD-tree. Runs per (device, window) group inside
applyInPandas — one trajectory window is one task, the reference's own
unit of work.

Presets from splitRoad (G:13767-13783): interval 1 s -> (eps 11,
minPts 30); <= 5 s -> (20, 15); else (20, 10). Dynamic eps
(G:8164-8193): min(max(1.2*width, 5*dt*1.2), 4*width).
"""

from __future__ import annotations

import numpy as np


_CELL_PACK = np.int64(1) << np.int64(32)


def _ranges_concat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate arange(starts[i], ends[i]) for all i, vectorized
    (the classic cumsum-of-ones trick; every range is non-empty)."""
    cnt = ends - starts
    total = int(cnt.sum())
    out = np.ones(total, dtype=np.int64)
    out[0] = starts[0]
    cum = np.cumsum(cnt)[:-1]
    out[cum] = starts[1:] - (ends[:-1] - 1)
    return np.cumsum(out)


def grid_neighbor_pairs(
    x: np.ndarray, y: np.ndarray, radius: float
) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) pairs with dist(i, j) <= radius, via radius-sized
    grid bins (CSR layout over a sorted packed key; one vectorized
    pass, self-pairs included). The batch form of the per-point
    3x3-bin probe used by DBSCAN and the parking-cloud detector."""
    n = len(x)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    inv = 1.0 / radius
    cx = np.floor(x * inv).astype(np.int64)
    cy = np.floor(y * inv).astype(np.int64)
    key = cx * _CELL_PACK + cy
    order = np.argsort(key, kind="stable")
    uniq_keys, starts = np.unique(key[order], return_index=True)
    ends = np.append(starts[1:], n)
    r2 = radius * radius
    srcs, nbs = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            k = (cx + dx) * _CELL_PACK + (cy + dy)
            b = np.searchsorted(uniq_keys, k)
            bc = np.minimum(b, len(uniq_keys) - 1)
            vi = np.flatnonzero(uniq_keys[bc] == k)
            if not len(vi):
                continue
            s, e = starts[bc[vi]], ends[bc[vi]]
            src = np.repeat(vi, e - s)
            cand = order[_ranges_concat(s, e)]
            d2 = (x[cand] - x[src]) ** 2 + (y[cand] - y[src]) ** 2
            m = d2 <= r2
            srcs.append(src[m])
            nbs.append(cand[m])
    if not srcs:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    return np.concatenate(srcs), np.concatenate(nbs)


def np_dbscan(xy: np.ndarray, eps: float, min_pts: int) -> np.ndarray:
    """Cluster labels per point: -1 = noise, else 0..k-1 in order of
    cluster discovery (points scanned in input = time order).

    Fully vectorized: the grid bins are a CSR layout over a sorted
    packed (cx, cy) key; neighbor queries run for a whole BFS frontier
    at once (9 searchsorted lookups + one distance mask), core flags
    are precomputed in one pass. Label semantics are identical to the
    sequential BFS: cluster ids follow seed scan order, border points
    go to the first cluster that reaches them (within a cluster,
    frontier-level batching reaches the same points as the per-point
    queue)."""
    n = len(xy)
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels
    x, y = np.ascontiguousarray(xy[:, 0]), np.ascontiguousarray(xy[:, 1])
    inv = 1.0 / eps
    cx = np.floor(x * inv).astype(np.int64)
    cy = np.floor(y * inv).astype(np.int64)
    key = cx * _CELL_PACK + cy  # unique: |cy/eps| << 2^31 for planar meters
    order = np.argsort(key, kind="stable")
    sk = key[order]
    uniq_keys, starts = np.unique(sk, return_index=True)
    ends = np.append(starts[1:], n)
    eps2 = eps * eps

    def neighbors_of(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(src_pos, nb_point) pairs within eps for a batch of points
        (src_pos indexes into `idx`; self-pairs included)."""
        srcs, nbs = [], []
        base_kx = cx[idx]
        base_ky = cy[idx]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = (base_kx + dx) * _CELL_PACK + (base_ky + dy)
                b = np.searchsorted(uniq_keys, k)
                bc = np.minimum(b, len(uniq_keys) - 1)
                vi = np.flatnonzero(uniq_keys[bc] == k)
                if not len(vi):
                    continue
                s, e = starts[bc[vi]], ends[bc[vi]]
                src = np.repeat(vi, e - s)
                cand = order[_ranges_concat(s, e)]
                d2 = (x[cand] - x[idx[src]]) ** 2 + (y[cand] - y[idx[src]]) ** 2
                m = d2 <= eps2
                srcs.append(src[m])
                nbs.append(cand[m])
        if not srcs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        return np.concatenate(srcs), np.concatenate(nbs)

    # Lazy core detection: each point's neighborhood is computed AT
    # MOST once over the whole run (exactly the sequential algorithm's
    # work), but whole frontier levels are batched. `expanded` tracks
    # "neighborhood computed" (the sequential `visited`).
    expanded = np.zeros(n, dtype=bool)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or expanded[i]:
            continue
        expanded[i] = True
        one = np.array([i], dtype=np.int64)
        _s, nb = neighbors_of(one)
        if len(nb) < min_pts:
            continue  # noise (may be claimed as border later)
        labels[i] = cluster
        fresh = nb[labels[nb] == -1]
        labels[fresh] = cluster
        frontier = fresh[~expanded[fresh]]
        while len(frontier):
            expanded[frontier] = True
            src, nb = neighbors_of(frontier)
            counts = np.bincount(src, minlength=len(frontier))
            is_core_src = counts >= min_pts
            nb = nb[is_core_src[src]]
            fresh = np.unique(nb[labels[nb] == -1])
            labels[fresh] = cluster
            frontier = fresh[~expanded[fresh]]
        cluster += 1
    return labels


def eps_minpts_preset(interval_s: int) -> tuple[float, int]:
    """splitRoad presets (G:13767-13783)."""
    if interval_s == 1:
        return 11.0, 30
    if interval_s <= 5:
        return 20.0, 15
    return 20.0, 10


def dynamic_eps(width: float, interval_s: float) -> float:
    """eps = min(max(1.2*width, 5*dt*1.2), 4*width) (G:8164-8193)."""
    return float(min(max(1.2 * width, 5.0 * interval_s * 1.2), 4.0 * width))
