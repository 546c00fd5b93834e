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


def np_dbscan(xy: np.ndarray, eps: float, min_pts: int) -> np.ndarray:
    """Cluster labels per point: -1 = noise, else 0..k-1 in order of
    cluster discovery (points scanned in input = time order)."""
    n = len(xy)
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels
    x, y = xy[:, 0], xy[:, 1]
    inv = 1.0 / eps
    cx = np.floor(x * inv).astype(np.int64)
    cy = np.floor(y * inv).astype(np.int64)
    # bin index: dict cell -> point indices
    order = np.lexsort((cy, cx))
    bins: dict[tuple[int, int], np.ndarray] = {}
    start = 0
    sc_x, sc_y = cx[order], cy[order]
    for i in range(1, n + 1):
        if i == n or sc_x[i] != sc_x[start] or sc_y[i] != sc_y[start]:
            bins[(int(sc_x[start]), int(sc_y[start]))] = order[start:i]
            start = i
    eps2 = eps * eps

    def neighbors(i: int) -> np.ndarray:
        bx, by = int(cx[i]), int(cy[i])
        cand = [
            bins[(bx + dx, by + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (bx + dx, by + dy) in bins
        ]
        cand = np.concatenate(cand)
        d2 = (x[cand] - x[i]) ** 2 + (y[cand] - y[i]) ** 2
        return cand[d2 <= eps2]

    cluster = 0
    visited = np.zeros(n, dtype=bool)
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        seeds = neighbors(i)
        if len(seeds) < min_pts:
            continue  # noise (may be claimed as border later)
        labels[i] = cluster
        queue = list(seeds[labels[seeds] == -1])
        labels[seeds[labels[seeds] == -1]] = cluster
        qi = 0
        while qi < len(queue):
            j = int(queue[qi])
            qi += 1
            if not visited[j]:
                visited[j] = True
                nb = neighbors(j)
                if len(nb) >= min_pts:
                    fresh = nb[(labels[nb] == -1)]
                    labels[fresh] = cluster
                    queue.extend(int(v) for v in fresh if not visited[v])
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
