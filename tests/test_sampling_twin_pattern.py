"""The gps_simplify_angle / gps_distance_sampling driver rows use REAL
DuckDB twins that restate the closed-form keep-mask of the crafted
tracks (queries._sampling_track):

  zigzag  (simplify_by_angle):       keep iff i==0, i==n-1, or i%3 != 1
  cluster (fast_distance_sampling):  keep iff i % 10 == 0

These tests prove the closed forms equal the sequential kernels for
EVERY track length, not just the 50 per-device lengths the driver
fixture happens to produce — the same precondition-pinning idea as the
gps_time_windows twin. The track geometry is re-derived here with
plain numpy from the documented construction (serpentine of 0.6 m
edges turning every 3rd edge; 20-point clusters 0.6 m apart
oscillating 0.1 m), NOT by calling the engine's fixture builder, so a
builder bug cannot hide a kernel bug or vice versa.
"""

import numpy as np
import pytest

from util_gis_spark.operators.sampling import (
    np_fast_distance_sampling,
    np_simplify_by_angle,
)


def zigzag_xy(n: int) -> np.ndarray:
    out = np.zeros((n, 2))
    pos = np.array([0.0, 0.0])
    dirs = [(0.6, 0.0), (0.0, 0.6), (-0.6, 0.0), (0.0, 0.6)]
    for i in range(1, n):
        d = dirs[((i - 1) // 3) % 4]
        pos = pos + d
        out[i] = pos
    return out


def cluster_xy(n: int) -> np.ndarray:
    i = np.arange(n)
    return np.stack([(i // 20) * 0.6, (i % 2) * 0.1], axis=1)


def expected_simplify(n: int) -> np.ndarray:
    i = np.arange(n)
    keep = (i % 3) != 1
    keep[0] = True
    if n:
        keep[-1] = True
    return keep


def expected_fds(n: int) -> np.ndarray:
    return (np.arange(n) % 10) == 0


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 9, 10, 11, 19, 20, 21, 59, 100, 176, 200, 313])
def test_simplify_closed_form_matches_kernel(n):
    got = np_simplify_by_angle(zigzag_xy(n))
    want = expected_simplify(n)
    assert np.array_equal(got, want), f"n={n}: {np.flatnonzero(got != want)}"


@pytest.mark.parametrize("n", [1, 2, 9, 10, 11, 20, 21, 30, 100, 176, 200, 313])
def test_fds_closed_form_matches_kernel(n):
    got = np_fast_distance_sampling(cluster_xy(n))
    want = expected_fds(n)
    assert np.array_equal(got, want), f"n={n}: {np.flatnonzero(got != want)}"


def expected_density_line(n: int) -> np.ndarray:
    """Closed form of densityBasedSampling(eps=10.5, min_pts=1,
    max_neighbors=15) on the 1 m line: counts = min(i,10)+min(n-1-i,10)
    +1; tier-2 keeps i%3==0, tier-3 keeps i%10==0; keep-all tier fires
    only at n=1 where the closed form agrees anyway; pass 2 provably
    never fires (every dropped point's >= 11-wide index ball holds a
    kept point — see q_gps_density_sampling's docstring)."""
    i = np.arange(n)
    cnt = np.minimum(i, 10) + np.minimum(n - 1 - i, 10) + 1
    return ((cnt <= 15) & (i % 3 == 0)) | ((cnt > 15) & (i % 10 == 0))


@pytest.mark.parametrize("n", [1, 2, 5, 11, 12, 15, 21, 26, 31, 100, 176, 200, 313])
def test_density_closed_form_matches_kernel(n):
    from util_gis_spark.operators.sampling import np_density_based_sampling

    xy = np.stack([np.arange(n, dtype=float), np.zeros(n)], axis=1)
    got = np_density_based_sampling(xy, 10.5, 1, 15)
    want = expected_density_line(n)
    assert np.array_equal(got, want), f"n={n}: {np.flatnonzero(got != want)}"


def spike_xy(n: int) -> np.ndarray:
    out = np.stack([np.arange(n, dtype=float), np.zeros(n)], axis=1)
    if n:
        out[n // 2, 1] = 100.0
    return out


def expected_dp_spike(n: int) -> np.ndarray:
    """Closed form of douglas_peucker_mask(tol=0.5) on the spike line:
    keep {0, m-1, m, m+1, n-1}, m = n//2 (derivation in
    queries._sampling_track's docstring)."""
    i = np.arange(n)
    m = n // 2
    keep = (i == 0) | (i == n - 1) | (np.abs(i - m) <= 1)
    return keep


@pytest.mark.parametrize("n", list(range(1, 40)) + [59, 100, 176, 200, 313, 1001])
def test_dp_spike_closed_form_matches_kernel(n):
    from util_gis_spark.geo.geometry import douglas_peucker_mask

    got = douglas_peucker_mask(spike_xy(n), 0.5)
    want = expected_dp_spike(n)
    assert np.array_equal(got, want), f"n={n}: {np.flatnonzero(got != want)}"


def test_fixture_builder_matches_independent_geometry(spark, sf_dir):
    """The Spark fixture builder must produce the exact geometry the
    closed forms were derived for (per device, positions keyed by the
    per-device (ts, point_id) rank)."""
    from util_gis_spark import queries as Q

    sf = sf_dir
    line_xy = lambda n: np.stack([np.arange(n, dtype=float), np.zeros(n)], axis=1)
    for shape, ref in (
        ("zigzag", zigzag_xy),
        ("clusters", cluster_xy),
        ("line", line_xy),
        ("spike", spike_xy),
    ):
        pdf = (
            Q._sampling_track(spark, sf, shape)
            .toPandas()
            .sort_values(["device_id", "i"])
        )
        for _dev, g in pdf.groupby("device_id"):
            assert np.array_equal(g["i"].to_numpy(), np.arange(len(g)))
            np.testing.assert_allclose(
                g[["x", "y"]].to_numpy(), ref(len(g)), atol=1e-9
            )
