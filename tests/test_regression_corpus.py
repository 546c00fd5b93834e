"""Regression fixtures reproducing the reference's curated bug list
(test/resources/test.json shapes):

- "停车的被计算了亩数" — parking clouds must not be counted as plot area
- "路切不掉" — roads must be cut by the opening step
- "高斯投影带号计算错误，导致一块地拆成了两块" — a field straddling a
  6-degree zone boundary must stay ONE plot (unified-zone rule)
"""

import numpy as np
import pytest

from tests.test_plots_and_windows import serpentine
from util_gis_spark.geo import gauss
from util_gis_spark.operators.plots import build_split_road_plots


def _at(lon0: float, lat0: float, xy_m: np.ndarray, zone: int):
    x0, y0, _ = gauss.gauss_forward(np.array([lon0]), np.array([lat0]), zone=zone)
    return xy_m + np.array([x0[0], y0[0]])


class TestParkingNotCounted:
    def test_parking_cloud_rejected_by_speed_filter_contract(self, spark):
        """The composite expects quality+speed-filtered input
        (G:13707-13716): zero-speed parking points never reach the
        clusterer. Verify the upstream filter drops them."""
        import datetime as dt

        from util_gis_spark.operators.filters import speed_filter

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(seconds=i), 116.2, 39.7, 0.0, 1, 1, i) for i in range(50)
        ] + [
            (1, t0 + dt.timedelta(seconds=100 + i), 116.21, 39.71, 5.0, 1, 1, 100 + i)
            for i in range(50)
        ]
        df = spark.createDataFrame(
            rows,
            "device_id long, ts timestamp, lon double, lat double, speed double, gps_status int, job_status int, point_id long",
        )
        kept = speed_filter(df).collect()
        assert all(r["speed"] == 5.0 for r in kept)

    def test_median_smooth_removes_cloud_before_plots(self):
        """When speeds are missing (NULL passes the speed filter), the
        median-smoothing stage (G:7251-7386, built to fix exactly this
        defect) removes the low-speed parking run; split_road over the
        smoothed track then yields only the field plot."""
        from util_gis_spark.operators.windows import np_median_smooth

        rng = np.random.default_rng(11)
        # stationary GPS drift is a slow correlated wander (~0.3 m/s),
        # not white noise — model it as a random walk
        cloud = np.cumsum(rng.normal(0.0, 0.3, (600, 2)), axis=0)
        field = serpentine(x0=500.0)
        xy = _at(116.2, 39.7, np.vstack([cloud, field]), 50)
        ts = np.arange(len(xy), dtype=float)
        keep = np_median_smooth(
            xy[:, 0], xy[:, 1], ts, k=5, speed_threshold_ms=1.0, min_parking_s=60
        )
        assert keep[:600].sum() <= 10  # the parked run is removed
        assert keep[600:].all()  # the working field is untouched
        plots = build_split_road_plots(xy[keep], ts[keep], 50, working_width=3.0)
        assert len(plots) == 1
        assert plots[0]["mu"] == pytest.approx(9.7, rel=0.15)


class TestRoadCut:
    def test_long_connecting_road_removed(self):
        a = serpentine(x0=0.0)
        road = np.column_stack([np.arange(103, 700, 3.0), np.full(199, 30.0)])
        b = serpentine(x0=700.0)
        xy = _at(116.2, 39.7, np.vstack([a, road, b]), 50)
        ts = np.arange(len(xy), dtype=float)
        plots = build_split_road_plots(xy, ts, 50, working_width=3.0)
        assert len(plots) == 2
        # neither plot's longitude span covers the road middle
        for p in plots:
            assert p["mu"] < 12  # fields ~9.7 mu; a road-merged blob would be far larger


class TestZoneBoundary:
    def test_field_straddling_zone_seam_stays_one_plot(self):
        """Field centered on lon=114.0 (zone 49/50 seam). The unified-
        zone rule (G:12411) projects the whole trajectory in one zone,
        so the plot must come back in one piece."""
        field_m = serpentine()
        zone = gauss.unified_zone(113.9995, 114.0005)
        # place the pattern so it spans the seam: center x at lon 114
        x0, y0, _ = gauss.gauss_forward(np.array([113.9994]), np.array([39.7]), zone=zone)
        xy = field_m + np.array([x0[0], y0[0]])
        # sanity: the unprojected lons really straddle 114
        lon, lat, _ = gauss.gauss_inverse(xy[:, 0], xy[:, 1], zone=zone)
        assert lon.min() < 114.0 < lon.max()
        ts = np.arange(len(xy), dtype=float)
        plots = build_split_road_plots(xy, ts, zone, working_width=3.0)
        assert len(plots) == 1
        assert plots[0]["mu"] == pytest.approx(9.7, rel=0.15)

    def test_projection_roundtrip_across_seam(self):
        lon = np.linspace(113.99, 114.01, 100)
        lat = np.full(100, 39.7)
        z = gauss.unified_zone(113.99, 114.01)
        x, y, _ = gauss.gauss_forward(lon, lat, zone=z)
        lon2, lat2, _ = gauss.gauss_inverse(x, y, zone=z)
        assert np.max(np.abs(lon2 - lon)) < 1e-9
        # and the planar track is continuous (no seam jump)
        assert np.all(np.diff(x) > 0)
