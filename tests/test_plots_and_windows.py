"""Fixture tests for the plot-construction pipeline and the sequential
window/sampling/clustering kernels — synthetic trajectories shaped
like the reference's regression corpus (field serpentine + connecting
road, parking cloud, cadence switches)."""

import os

import numpy as np
import pytest

from util_gis_spark.geo import gauss
from util_gis_spark.operators.clustering import dynamic_eps, eps_minpts_preset, np_dbscan
from util_gis_spark.operators.plots import (
    build_farm_plot,
    build_split_road_plots,
)
from util_gis_spark.operators.sampling import (
    np_fast_distance_sampling,
    np_simplify_by_angle,
)
from util_gis_spark.operators.windows import np_median_smooth, np_split_time_windows


def serpentine(x0=0.0, y0=0.0, n_rows=21, row_len=100.0, row_gap=3.0, step=3.0):
    """Lawnmower field pattern: n_rows passes of row_len, 3 m apart."""
    pts = []
    for r in range(n_rows):
        xs = np.arange(0.0, row_len + 1e-9, step)
        if r % 2:
            xs = xs[::-1]
        for x in xs:
            pts.append((x0 + x, y0 + r * row_gap))
    return np.array(pts)


class TestSplitTimeWindows:
    def test_force_split_then_same_label_remerge(self):
        # the reference force-splits at dt>300 but mergeAdjacentWindows
        # (G:6603-6647) re-merges adjacent windows with EQUAL labels, so
        # two 1s-cadence runs around a gap end up as one window
        ts = np.concatenate([np.arange(100), 1000 + np.arange(50)])
        wid, lab = np_split_time_windows(ts)
        assert len(np.unique(wid)) == 1 and lab[0] == 1

    def test_force_split_different_labels_stay_separate(self):
        ts = np.concatenate([np.arange(100), 1000 + 10 * np.arange(50)])
        wid, lab = np_split_time_windows(ts)
        assert len(np.unique(wid)) == 2
        assert lab[0] == 1 and lab[-1] == 10

    def test_cadence_switch_after_59(self):
        # 100 pts at 1 s then 70 at 10 s: switch after 59 consecutive 10s
        ts = np.concatenate([np.arange(100), 99 + 10 * np.arange(1, 71)])
        wid, lab = np_split_time_windows(ts)
        assert len(np.unique(wid)) == 2
        assert lab[0] == 1 and lab[-1] == 10

    def test_no_switch_below_59(self):
        ts = np.concatenate([np.arange(100), 99 + 10 * np.arange(1, 41)])
        wid, lab = np_split_time_windows(ts)
        assert len(np.unique(wid)) == 1
        assert lab[0] == 1  # majority vote: 99 ones vs 40 tens

    def test_vote_tie_prefers_smaller(self):
        ts = np.array([0, 2, 4, 9, 14])  # dt: 2,2,5,5
        _, lab = np_split_time_windows(ts)
        assert lab[0] == 2


class TestDbscan:
    def test_two_blobs_and_noise(self):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1.0, (100, 2))
        b = rng.normal(50, 1.0, (100, 2))
        noise = np.array([[25.0, 25.0], [100.0, 100.0]])
        xy = np.vstack([a, b, noise])
        labels = np_dbscan(xy, eps=3.0, min_pts=5)
        assert set(labels[:100]) == {0}
        assert set(labels[100:200]) == {1}
        assert (labels[200:] == -1).all()

    def test_min_pts_boundary(self):
        xy = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
        assert (np_dbscan(xy, eps=2.0, min_pts=4) == -1).all()
        assert (np_dbscan(xy, eps=2.0, min_pts=3) == 0).all()

    def test_presets(self):
        assert eps_minpts_preset(1) == (11.0, 30)
        assert eps_minpts_preset(5) == (20.0, 15)
        assert eps_minpts_preset(10) == (20.0, 10)
        assert dynamic_eps(3.0, 1.0) == pytest.approx(6.0)  # max(3.6, 6.0) vs 12

    def test_column_forms_match_scalars(self, spark):
        """dynamic_eps_expr / eps_minpts_preset_exprs are the exact
        same chains as the scalars — bit-equality across every branch
        (1.2w dominant, 6dt dominant, 4w cap; all three presets)."""
        from pyspark.sql import functions as F

        from util_gis_spark.operators.clustering import (
            dynamic_eps_expr,
            eps_minpts_preset_exprs,
        )

        cases = [(3.0, 1), (2.0, 5), (6.0, 10), (30.0, 1), (2.5, 60), (4.7, 3)]
        df = spark.createDataFrame(cases, "w double, dt long")
        eps_c, mp_c = eps_minpts_preset_exprs(F.col("dt"))
        rows = df.select(
            "w",
            "dt",
            dynamic_eps_expr(F.col("w"), F.col("dt").cast("double")).alias("eps"),
            eps_c.alias("peps"),
            mp_c.alias("pmp"),
        ).collect()
        for r in rows:
            assert r["eps"] == dynamic_eps(r["w"], float(r["dt"])), (r["w"], r["dt"])
            assert (r["peps"], r["pmp"]) == eps_minpts_preset(int(r["dt"]))


class TestSampling:
    def test_simplify_straight_line_keeps_sparse(self):
        # straight line: only accumulated-length keeps fire
        xy = np.column_stack([np.arange(0, 100, 0.6), np.zeros(167)])
        keep = np_simplify_by_angle(xy)
        assert keep[0] and keep[-1]
        assert keep.sum() < len(xy)  # thinned

    def test_simplify_keeps_corner(self):
        xy = np.array([[0, 0], [5, 0], [5, 5], [10, 5]], dtype=float)
        keep = np_simplify_by_angle(xy)
        assert keep.all()  # 90-degree corners all kept

    def test_fds_dense_run_keeps_1_in_10(self):
        xy = np.zeros((101, 2))  # all identical -> dense run
        keep = np_fast_distance_sampling(xy)
        assert keep[0]
        assert keep.sum() == 1 + 10  # first + every 10th

    def test_fds_spread_keeps_all(self):
        xy = np.column_stack([np.arange(50) * 2.0, np.zeros(50)])
        assert np_fast_distance_sampling(xy).all()


class TestKalmanSmooth:
    def test_denoise_straight_track(self):
        from util_gis_spark.operators.windows import np_kalman_smooth

        rng = np.random.default_rng(4)
        n = 400
        true_x = np.arange(n) * 3.0
        true_y = np.zeros(n)
        x = true_x + rng.normal(0, 3.0, n)
        y = true_y + rng.normal(0, 3.0, n)
        ts = np.arange(n, dtype=float)
        sx, sy = np_kalman_smooth(x, y, ts)
        # smoothed track is closer to the truth than the raw one
        raw_err = np.mean(np.hypot(x[50:] - true_x[50:], y[50:] - true_y[50:]))
        sm_err = np.mean(np.hypot(sx[50:] - true_x[50:], sy[50:] - true_y[50:]))
        assert sm_err < raw_err * 0.8

    def test_tracks_turns(self):
        from util_gis_spark.operators.windows import np_kalman_smooth

        # sharp 90-degree turn: the filter must follow within a few
        # samples (no runaway lag)
        leg1 = np.column_stack([np.arange(0, 150, 3.0), np.zeros(50)])
        leg2 = np.column_stack([np.full(50, 147.0), np.arange(3, 153, 3.0)])
        xy = np.vstack([leg1, leg2])
        ts = np.arange(len(xy), dtype=float)
        sx, sy = np_kalman_smooth(xy[:, 0], xy[:, 1], ts)
        tail_err = np.hypot(sx[-10:] - xy[-10:, 0], sy[-10:] - xy[-10:, 1])
        assert tail_err.max() < 5.0

    def test_identity_on_clean_input(self):
        from util_gis_spark.operators.windows import np_kalman_smooth

        x = np.arange(100) * 3.0
        y = np.zeros(100)
        sx, sy = np_kalman_smooth(x, y, np.arange(100, dtype=float))
        assert np.abs(sx[20:] - x[20:]).max() < 1.0


class TestMedianSmooth:
    def test_parking_run_removed(self):
        # drive 100 m, park 300 s, drive on
        drive1 = np.column_stack([np.arange(0, 100, 3.0), np.zeros(34)])
        park = np.tile([[100.0, 0.0]], (300, 1)) + np.random.default_rng(2).normal(0, 0.01, (300, 2))
        drive2 = np.column_stack([100 + np.arange(3, 100, 3.0), np.zeros(33)])
        xy = np.vstack([drive1, park, drive2])
        ts = np.arange(len(xy), dtype=float)
        keep = np_median_smooth(xy[:, 0], xy[:, 1], ts, k=5, speed_threshold_ms=0.05, min_parking_s=120)
        assert keep[:30].all()
        assert not keep[40:300].all()  # parking cloud dropped
        assert keep[-20:].all()


class TestFarmPlot:
    ZONE = 50

    def _project(self, xy_m):
        """Place a local metric pattern near (116.2, 39.7) and return
        plane coords (identity: pattern already in meters, offset into
        the zone-50 plane at that location)."""
        x0, y0, _ = gauss.gauss_forward(np.array([116.2]), np.array([39.7]), zone=self.ZONE)
        return xy_m + np.array([x0[0], y0[0]])

    def test_single_field(self):
        field = self._project(serpentine())
        ts = np.arange(len(field), dtype=float)
        plots = build_farm_plot(field, ts, self.ZONE, working_width=3.0)
        assert len(plots) == 1
        # 100x60 m footprint + width/2 margin: ~103x63 m = 6489 m2 = 9.73 mu
        assert plots[0]["mu"] == pytest.approx(9.73, rel=0.1)
        assert plots[0]["n_points"] == len(field)
        assert plots[0]["wkt"].startswith("POLYGON")
        # mileage ~ 21 rows * 100 m + 20 turns * 3 m = 2160 m
        assert plots[0]["mileage_m"] == pytest.approx(2160, rel=0.05)

    def test_split_road_two_fields(self):
        a = serpentine(x0=0.0)
        road = np.column_stack([np.arange(103, 400, 3.0), np.full(99, 30.0)])
        b = serpentine(x0=400.0)
        xy = self._project(np.vstack([a, road, b]))
        ts = np.arange(len(xy), dtype=float)  # 1 s cadence
        plots = build_split_road_plots(xy, ts, self.ZONE, working_width=3.0)
        assert len(plots) == 2  # road clipped away, fields separate
        for p in plots:
            assert p["mu"] == pytest.approx(9.7, rel=0.15)
            assert p["n_points"] > 60
        assert plots[0]["start_ts"] < plots[1]["start_ts"]

    def test_algorithm0_merges_time_overlapping_plots(self):
        # machine works field A (first half), detours to field B, then
        # finishes A: A's time range encloses B's -> algorithm 0 unions
        a = serpentine()
        half = len(a) // 2
        b = serpentine(x0=400.0)
        xy = self._project(np.vstack([a[:half], b, a[half:]]))
        ts = np.arange(len(xy), dtype=float)
        merged = build_split_road_plots(xy, ts, self.ZONE, working_width=3.0, algorithm=0)
        unmerged = build_split_road_plots(xy, ts, self.ZONE, working_width=3.0, algorithm=-1)
        assert len(unmerged) >= 2  # without merging: separate overlapping plots
        assert len(merged) < len(unmerged)  # algorithm 0 unioned them
        assert merged[0]["wkt"].startswith(("POLYGON", "MULTIPOLYGON"))
        total_unmerged = sum(p["mu"] for p in unmerged)
        total_merged = sum(p["mu"] for p in merged)
        assert total_merged == pytest.approx(total_unmerged, rel=0.05)

    def test_algorithm1_resegments_interleaved_visits(self):
        a = serpentine()
        half = len(a) // 2
        b = serpentine(x0=400.0)
        xy = self._project(np.vstack([a[:half], b, a[half:]]))
        ts = np.arange(len(xy), dtype=float)
        plots = build_split_road_plots(xy, ts, self.ZONE, working_width=3.0, algorithm=1)
        # re-segmentation: A-first-half, B, A-second-half -> up to 3
        # plots, no time overlaps remain, all above the mu gate
        assert 2 <= len(plots) <= 3
        for p1, p2 in zip(plots, plots[1:]):
            assert p1["end_ts"] <= p2["start_ts"] + 1e-9
        assert all(p["mu"] > 0.55 for p in plots)
        merged = build_split_road_plots(xy, ts, self.ZONE, working_width=3.0, algorithm=0)
        total1 = sum(p["mu"] for p in plots)
        total0 = sum(p["mu"] for p in merged)
        assert total1 == pytest.approx(total0, rel=0.25)

    def test_all_road_returns_nothing(self):
        road = self._project(np.column_stack([np.arange(0, 3000, 3.0), np.zeros(1000)]))
        ts = np.arange(len(road), dtype=float)
        plots = build_split_road_plots(road, ts, self.ZONE, working_width=3.0)
        assert plots == []  # "all road" regression shape: DBSCAN noise


class TestSparkPlots:
    def test_get_farm_plot_dataframe(self, spark):
        import pandas as pd

        z = 50
        x0, y0, _ = gauss.gauss_forward(np.array([116.2]), np.array([39.7]), zone=z)
        field = serpentine() + np.array([x0[0], y0[0]])
        lon, lat, _ = gauss.gauss_inverse(field[:, 0], field[:, 1], zone=z)
        pdf = pd.DataFrame(
            {
                "device_id": np.int64(7),
                "ts": pd.to_datetime(np.arange(len(lon)), unit="s"),
                "lon": lon,
                "lat": lat,
                "point_id": np.arange(len(lon), dtype=np.int64),
            }
        )
        df = spark.createDataFrame(pdf)
        out = __import__(
            "util_gis_spark.operators.plots", fromlist=["plots"]
        ).get_farm_plot(df, working_width=3.0).collect()
        assert len(out) == 1
        assert out[0]["mu"] == pytest.approx(9.73, rel=0.1)
        assert out[0]["device_id"] == 7


class TestPointsInTimeRange:
    """getGaussPointsByPolygonTimeRange (G:8899-8925): range join of
    points into per-device polygon time ranges."""

    def test_range_join(self, spark):
        from datetime import datetime, timedelta

        from util_gis_spark.operators.ranges import points_in_time_range

        t0 = datetime(2024, 1, 1)
        pts = spark.createDataFrame(
            [(1, i, t0 + timedelta(seconds=i), 116.0, 39.5) for i in range(10)],
            "device_id long, point_id long, ts timestamp, lon double, lat double",
        )
        ranges = spark.createDataFrame(
            [
                (1, 7, t0 + timedelta(seconds=2), t0 + timedelta(seconds=4)),
                (1, 8, t0 + timedelta(seconds=8), t0 + timedelta(seconds=20)),
                (2, 7, t0, t0 + timedelta(seconds=100)),  # other device: no match
            ],
            "device_id long, polygon_id long, start_ts timestamp, end_ts timestamp",
        )
        out = points_in_time_range(pts, ranges).collect()
        got = sorted((r["point_id"], r["polygon_id"]) for r in out)
        # inclusive bounds: ts in [2,4] -> polygon 7; ts in [8,9] -> polygon 8
        assert got == [(2, 7), (3, 7), (4, 7), (8, 8), (9, 8)]


class TestTimeWindowsSqlTwin:
    """gps_time_windows graduated from a golden pin to a real DuckDB
    twin in r4. The twin is exact ONLY when the input cannot fire the
    cadence-switch rule (>= MIN_CONSECUTIVE consecutive equal dts);
    these tests pin (a) that precondition on the driver fixture and
    (b) the twin's equality with the actual state machine on it."""

    SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    def _device_secs(self):
        import duckdb

        from util_gis_spark.datasets import GPS_POINTS_SQL

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{self.SF}/events.parquet')"
        )
        return con.execute(
            f"WITH pts AS ({GPS_POINTS_SQL}) "
            "SELECT device_id, epoch_us(ts) // 1000000 AS sec, ts, point_id "
            "FROM pts ORDER BY device_id, ts, point_id"
        ).df()

    def test_fixture_cannot_fire_cadence_switch(self):
        import numpy as np

        from util_gis_spark.operators.windows import MIN_CONSECUTIVE

        df = self._device_secs()
        worst = 0
        for _d, g in df.groupby("device_id"):
            dt = np.diff(g["sec"].to_numpy(np.int64))
            if len(dt) == 0:
                continue
            runs = np.diff(np.flatnonzero(np.concatenate(([True], dt[1:] != dt[:-1], [True]))))
            worst = max(worst, int(runs.max()))
        assert worst < MIN_CONSECUTIVE, (
            f"fixture has a {worst}-long equal-dt run; the SQL twin for "
            "gps_time_windows is no longer exact — revert it to a golden pin"
        )

    def test_twin_sql_equals_state_machine(self):
        import duckdb
        import numpy as np
        import pandas as pd

        from util_gis_spark.datasets import GPS_POINTS_SQL
        from util_gis_spark.operators.windows import (
            np_split_time_windows,
            split_time_windows_summary_sql,
        )

        df = self._device_secs()
        rows = []
        for d, g in df.groupby("device_id"):
            wid, lab = np_split_time_windows(g["sec"].to_numpy(np.int64))
            gg = g.assign(window_id=wid, window_interval_s=lab)
            rows.append(
                gg.groupby(["window_id", "window_interval_s"], as_index=False).agg(
                    n_points=("sec", "size"), start_ts=("ts", "min"), end_ts=("ts", "max")
                ).assign(device_id=d)
            )
        expect = pd.concat(rows, ignore_index=True)

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{self.SF}/events.parquet')"
        )
        got = con.execute(split_time_windows_summary_sql(GPS_POINTS_SQL)).df()
        cols = sorted(got.columns)
        e = expect[cols].sort_values(cols).reset_index(drop=True).astype(got.dtypes.to_dict())
        g = got[cols].sort_values(cols).reset_index(drop=True)
        assert len(e) == len(g) and e.equals(g)
