"""Parking/drift detector fixtures: a parked-with-GPS-jitter cloud
must read as drift; a working serpentine field must not."""

import numpy as np
import pytest

from util_gis_spark.operators.parking import (
    np_filter_parking_by_time_window,
    np_split_time_overlaps,
)


class TestParkingWindow:
    def test_parking_cloud_deleted(self):
        rng = np.random.default_rng(3)
        drive = np.column_stack([np.arange(0, 300, 3.0), np.zeros(100)])
        cloud = np.tile([[300.0, 0.0]], (200, 1)) + rng.normal(0, 2.0, (200, 2))
        xy = np.vstack([drive, cloud])
        ts = np.arange(len(xy), dtype=float)
        keep = np_filter_parking_by_time_window(
            xy[:, 0], xy[:, 1], ts, window_s=100, min_points=50, max_range_m=20
        )
        assert keep[:100].all()  # moving part kept
        assert not keep[100:].any()  # cloud dropped

    def test_spread_track_untouched(self):
        xy = np.column_stack([np.arange(0, 3000, 3.0), np.zeros(1000)])
        ts = np.arange(1000, dtype=float)
        keep = np_filter_parking_by_time_window(xy[:, 0], xy[:, 1], ts)
        assert keep.all()


class TestParkingByIndex:
    def test_tight_cloud_dropped_track_kept(self):
        from util_gis_spark.operators.parking import np_filter_parking_points_by_index

        rng = np.random.default_rng(9)
        drive = np.column_stack([np.arange(0, 600, 3.0), np.zeros(200)])
        cloud = np.tile([[700.0, 0.0]], (100, 1)) + rng.normal(0, 1.0, (100, 2))
        xy = np.vstack([drive, cloud])
        ts = np.arange(len(xy), dtype=float) * 3.0  # cloud spans 300 s
        keep = np_filter_parking_points_by_index(
            xy[:, 0], xy[:, 1], ts, parking_range_m=10.0, min_points=20, min_duration_s=120
        )
        assert keep[:200].all()  # moving track untouched
        assert not keep[200:].any()  # cloud dropped

    def test_wide_cloud_survives_bbox_gate(self):
        from util_gis_spark.operators.parking import np_filter_parking_points_by_index

        rng = np.random.default_rng(10)
        # dense but SPREAD cloud (bbox > 0.6*range) — e.g. slow work in
        # a small area, must NOT be treated as parking
        cloud = rng.uniform(-8, 8, (100, 2))
        ts = np.arange(100, dtype=float) * 3
        keep = np_filter_parking_points_by_index(
            cloud[:, 0], cloud[:, 1], ts, parking_range_m=10.0, min_points=20, min_duration_s=60
        )
        assert keep.all()


class TestSplitTimeOverlaps:
    def test_overlap_clipped(self):
        out = np_split_time_overlaps([(0, 100), (50, 150), (200, 300)])
        assert out == [(0, 49.0), (50, 150), (200, 300)]

    def test_no_overlap_identity(self):
        r = [(0, 10), (20, 30)]
        assert np_split_time_overlaps(r) == r

    def test_contained_range_dropped_or_clipped(self):
        out = np_split_time_overlaps([(0, 100), (10, 20)])
        # first clipped to 9; second survives
        assert out == [(0, 9.0), (10, 20)]

    def test_sub_second_neighbor_dropped(self):
        # clip target next_start - 1 falls BEFORE the range's own start
        out = np_split_time_overlaps([(10.0, 30.0), (10.5, 40.0)])
        assert out == [(10.5, 40.0)]

    def test_dataframe_wrapper_matches_np(self, spark):
        from util_gis_spark.operators.parking import split_time_overlaps

        raw = {
            1: [(0.0, 100.0), (50.0, 150.0), (200.0, 300.0)],
            2: [(10.0, 30.0), (10.5, 40.0)],  # first range fully dropped
            3: [(5.0, 6.0)],
        }
        rows = [(d, s, e) for d, rs in raw.items() for s, e in rs]
        df = spark.createDataFrame(rows, "device_id long, start_s double, end_s double")
        got: dict = {}
        for r in split_time_overlaps(df).collect():
            got.setdefault(r["device_id"], []).append((r["start_s"], r["end_s"]))
        got = {d: sorted(v) for d, v in got.items()}
        assert got == {d: sorted(np_split_time_overlaps(rs)) for d, rs in raw.items()}


class TestSplitTimeOverlapSegments:
    """The POINT-level splitTimeOverlaps (G:8385-8485) — the form that
    keeps the reference's re-emit-the-tail semantics the range-level
    operator intentionally drops (ADVICE r5 #1)."""

    def test_reference_cascade(self):
        from util_gis_spark.operators.parking import np_split_time_overlap_segments

        # hand-traced against the reference loop:
        # A=[0,10,20,30] overlaps B=[15,25] -> split at 14: emit [0,10],
        # tail [20,30] re-enters; sort puts B first; B overlaps tail ->
        # emit [15], tail-of-B [25] re-enters; [20,30] overlaps [25] ->
        # emit [20], tail [30]; final pairs no longer overlap.
        got = np_split_time_overlap_segments(
            [np.array([0.0, 10.0, 20.0, 30.0]), np.array([15.0, 25.0])]
        )
        assert [list(s) for s in sorted(got, key=lambda s: s[0])] == [
            [0.0, 10.0],
            [15.0],
            [20.0],
            [25.0],
            [30.0],
        ]

    def test_no_overlap_identity(self):
        from util_gis_spark.operators.parking import np_split_time_overlap_segments

        segs = [np.array([0.0, 5.0]), np.array([5.0, 9.0]), np.array([20.0])]
        got = np_split_time_overlap_segments(segs)
        assert [list(s) for s in got] == [list(s) for s in segs]

    def test_livelock_state_terminates(self):
        from util_gis_spark.operators.parking import np_split_time_overlap_segments

        # tail's first point == next start: the reference's own loop
        # never progresses here; ours stops with the state as-is
        got = np_split_time_overlap_segments(
            [np.array([10.0, 30.0]), np.array([10.5, 40.0])]
        )
        flat = sorted(x for s in got for x in s)
        assert flat == [10.0, 10.5, 30.0, 40.0]  # no point lost

    def test_livelock_freezes_only_its_pair(self):
        """r6 review: the livelock exit used to abort the ENTIRE
        remaining worklist; segments unrelated to the frozen pair must
        still split."""
        from util_gis_spark.operators.parking import np_split_time_overlap_segments

        got = np_split_time_overlap_segments(
            [
                np.array([10.0, 30.0]),   # livelocks against the next
                np.array([10.5, 40.0]),
                np.array([100.0, 130.0]),  # overlaps the next, resolvable
                np.array([115.0, 140.0]),
            ]
        )
        segs = sorted([list(s) for s in got], key=lambda s: s[0])
        # frozen pair kept whole, later pair split like the cascade
        assert segs == [
            [10.0, 30.0],
            [10.5, 40.0],
            [100.0],
            [115.0],
            [130.0],
            [140.0],
        ]

    def test_dataframe_form_reassigns_segments(self, spark):
        from datetime import datetime, timedelta

        from util_gis_spark.operators.parking import split_time_overlap_segments

        t0 = datetime(2024, 1, 1)
        rows = [
            (1, 0, t0 + timedelta(seconds=s))
            for s in (0.0, 10.0, 20.0, 30.0)
        ] + [(1, 1, t0 + timedelta(seconds=s)) for s in (15.0, 25.0)]
        df = spark.createDataFrame(rows, "device_id long, seg_id long, ts timestamp")
        got = {}
        for r in split_time_overlap_segments(df).collect():
            got.setdefault(r["seg_id"], []).append(
                (r["ts"] - t0).total_seconds()
            )
        got = {k: sorted(v) for k, v in got.items()}
        assert got == {0: [0.0, 10.0], 1: [15.0], 2: [20.0], 3: [25.0], 4: [30.0]}
        # points survive in full — nothing dropped, unlike the range form
        assert sum(len(v) for v in got.values()) == 6


class TestDriftVerdict:
    def test_drift_vs_field(self, spark):
        import pandas as pd

        from util_gis_spark.geo import gauss
        from util_gis_spark.operators.parking import is_parking_drift
        from util_gis_spark.operators.projection import project_trajectories

        rng = np.random.default_rng(7)
        # device 1: parked cloud, ~30 m jitter (area << 3 mu, headings random)
        cloud = rng.normal(0, 8.0, (400, 2))
        # device 2: serpentine field (large area, smooth headings)
        from tests.test_plots_and_windows import serpentine

        field = serpentine()
        x0, y0, _ = gauss.gauss_forward(np.array([116.2]), np.array([39.7]), zone=50)

        def to_lonlat(xy):
            lon, lat, _ = gauss.gauss_inverse(xy[:, 0] + x0[0], xy[:, 1] + y0[0], zone=50)
            return lon, lat

        lon1, lat1 = to_lonlat(cloud)
        lon2, lat2 = to_lonlat(field)
        pdf = pd.DataFrame(
            {
                "device_id": np.concatenate([np.full(len(lon1), 1), np.full(len(lon2), 2)]).astype(np.int64),
                "ts": pd.to_datetime(
                    np.concatenate([np.arange(len(lon1)), np.arange(len(lon2))]), unit="s"
                ),
                "lon": np.concatenate([lon1, lon2]),
                "lat": np.concatenate([lat1, lat2]),
                "point_id": np.arange(len(lon1) + len(lon2), dtype=np.int64),
            }
        )
        df = project_trajectories(spark.createDataFrame(pdf))
        verdicts = {r["device_id"]: r["is_drift"] for r in is_parking_drift(df).collect()}
        assert verdicts[1] is True
        assert verdicts[2] is False


class TestParkingIndex:
    """filterParkingPointsByIndex (G:7009-7142): compact long-duration
    clouds drop; passes through/near the field must survive."""

    def test_cloud_dropped_track_kept(self):
        from util_gis_spark.operators.parking import np_filter_parking_points_by_index

        rng = np.random.default_rng(5)
        drive = np.column_stack([np.arange(0, 600, 3.0), np.zeros(200)])
        # compact cloud 100 m south of the track, 2 m jitter, 200 s dwell
        cloud = np.tile([[300.0, -100.0]], (200, 1)) + rng.normal(0, 0.5, (200, 2))
        xy = np.vstack([drive, cloud])
        ts = np.arange(len(xy), dtype=float)
        keep = np_filter_parking_points_by_index(xy[:, 0], xy[:, 1], ts)
        assert keep[:200].all()
        assert not keep[200:].any()

    def test_cloud_near_track_rejected_by_bbox(self):
        """A dwell INSIDE the working area is contaminated by passing
        points -> bbox > 0.6*range -> reference keeps it."""
        from util_gis_spark.operators.parking import np_filter_parking_points_by_index

        drive = np.column_stack([np.arange(0, 600, 3.0), np.zeros(200)])
        cloud = np.tile([[300.0, 4.0]], (200, 1))  # 4 m off the track
        xy = np.vstack([drive, cloud])
        ts = np.arange(len(xy), dtype=float)
        keep = np_filter_parking_points_by_index(xy[:, 0], xy[:, 1], ts)
        assert keep.all()

    def test_dataframe_wrapper(self, spark):
        from datetime import datetime, timedelta

        from util_gis_spark.operators.parking import filter_parking_points_by_index

        rng = np.random.default_rng(9)
        t0 = datetime(2024, 1, 1)
        rows = []
        for dev in (1, 2):
            for i in range(150):
                rows.append((dev, i, t0 + timedelta(seconds=i), i * 3.0, 0.0))
            for i in range(150, 350):  # parked cloud, 200 s
                rows.append((dev, i, t0 + timedelta(seconds=i),
                             450.0 + 50.0 + rng.normal(0, 0.5), -100.0 + rng.normal(0, 0.5)))
        df = spark.createDataFrame(rows, "device_id long, point_id long, ts timestamp, x double, y double")
        out = filter_parking_points_by_index(df)
        got = out.groupBy("device_id").count().collect()
        assert {r["device_id"]: r["count"] for r in got} == {1: 150, 2: 150}


class TestSafeBuffer:
    def test_clamp_and_floor(self):
        from util_gis_spark.geo.gauss import calculate_safe_buffer

        # mid-zone: requested passes through
        assert calculate_safe_buffer(5.04e7, 4.3e6, 5.05e7, 4.4e6, 12.0) == 12.0
        # near the X floor: clamped to 0.9 * margin
        assert calculate_safe_buffer(5.0e5 + 100.0, 0.0, 5.1e5, 10.0, 500.0) == 90.0
        # pathological: floored at MIN_BUFFER_DISTANCE
        assert calculate_safe_buffer(5.0e5, 0.0, 5.1e5, 10.0, 500.0) == 1.0

    def test_column_form_matches_scalar(self, spark):
        """safe_buffer_expr is the exact same IEEE chain as the scalar
        — bit-equality on branch-covering and irrational-ish inputs."""
        from pyspark.sql import functions as F

        from util_gis_spark.geo.gauss import calculate_safe_buffer, safe_buffer_expr

        cases = [
            (5.04e7, 4.3e6, 5.05e7, 4.4e6, 12.0),
            (5.0e5 + 100.0, 0.0, 5.1e5, 10.0, 500.0),
            (5.0e5, 0.0, 5.1e5, 10.0, 500.0),
            (50_499_123.456789, 4_321_987.654321, 50_511_234.987654, 4_398_765.123456, 1.0e9),
            (50_499_123.456789, -9_999_000.5, 50_511_234.987654, 4_398_765.123456, 0.25),
        ]
        df = spark.createDataFrame(
            [(i, *c) for i, c in enumerate(cases)],
            "i long, x_min double, y_min double, x_max double, y_max double, req double",
        )
        got = {
            r["i"]: r["safe"]
            for r in df.select(
                "i",
                safe_buffer_expr(
                    F.col("x_min"), F.col("y_min"), F.col("x_max"), F.col("y_max"), F.col("req")
                ).alias("safe"),
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == calculate_safe_buffer(*c), c


class TestR6ReviewRegressions:
    def test_min_points_validated_eagerly(self, spark):
        """min_points <= 0 must raise on the driver: an empty sliding
        window would pass the count gate and crash wx.max() on a
        zero-size array inside the executor (r6 review)."""
        import pytest

        from util_gis_spark.operators.parking import filter_parking_by_time_window

        df = spark.createDataFrame(
            [(1, 1, 0.0, 0.0, "2024-01-01 00:00:00")],
            "device_id long, point_id long, x double, y double, ts string",
        ).selectExpr("device_id", "point_id", "x", "y", "CAST(ts AS timestamp) AS ts")
        with pytest.raises(ValueError, match="min_points"):
            filter_parking_by_time_window(df, min_points=0)

    def test_parking_index_pass2_matches_brute_force(self):
        """The r6 cloud-only pass-2 sweep must produce the identical
        keep-mask to a straight-line O(n^2) restatement of the rule
        (same d^2 <= r^2 metric, self included) on random clustered
        tracks."""
        import numpy as np

        from util_gis_spark.operators.parking import np_filter_parking_points_by_index

        rng = np.random.default_rng(17)
        for trial in range(8):
            n = int(rng.integers(5, 160))
            # half the points huddle in dense clouds, half roam
            x = np.where(
                rng.random(n) < 0.5,
                rng.normal(0.0, 2.0, n),
                rng.uniform(-400, 400, n),
            )
            y = np.where(
                rng.random(n) < 0.5,
                rng.normal(0.0, 2.0, n),
                rng.uniform(-400, 400, n),
            )
            ts = np.sort(rng.uniform(0, 600, n))
            r, min_pts, min_dur = 10.0, 6, 120.0
            got = np_filter_parking_points_by_index(
                x, y, ts, parking_range_m=r, min_points=min_pts, min_duration_s=min_dur
            )
            d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
            nbmat = d2 <= r * r
            is_parking = np.zeros(n, dtype=bool)
            lim = r * 0.6
            for i in range(n):
                nb = np.flatnonzero(nbmat[i])
                if (
                    len(nb) >= min_pts
                    and ts[nb].max() - ts[nb].min() >= min_dur
                    and x[nb].max() - x[nb].min() <= lim
                    and y[nb].max() - y[nb].min() <= lim
                ):
                    is_parking[nb] = True
            assert np.array_equal(got, ~is_parking), f"trial {trial}"

    def test_median_smooth_vectorized_matches_loop(self):
        """The r6 interior-median vectorization (partition order
        statistic) must be BIT-identical to the per-point np.median
        loop, including tracks shorter than the window."""
        import numpy as np

        from util_gis_spark.operators.windows import np_median_smooth

        rng = np.random.default_rng(23)
        for n in (0, 1, 2, 3, 4, 5, 7, 30, 211):
            x = rng.normal(0, 50, n)
            y = rng.normal(0, 50, n)
            ts = np.sort(rng.uniform(0, 3600, n))
            got = np_median_smooth(x, y, ts)
            # straight-line restatement with the loop median + the
            # twin's sqrt(dx*dx+dy*dy) speed form
            half = 2
            sx = np.array([np.median(x[max(0, i - half) : i + half + 1]) for i in range(n)])
            sy = np.array([np.median(y[max(0, i - half) : i + half + 1]) for i in range(n)])
            speed = np.full(n, np.inf)
            if n >= 3:
                dpx, dpy = sx[1:-1] - sx[:-2], sy[1:-1] - sy[:-2]
                dnx, dny = sx[2:] - sx[1:-1], sy[2:] - sy[1:-1]
                speed[1:-1] = (
                    np.sqrt(dpx * dpx + dpy * dpy) / np.maximum(ts[1:-1] - ts[:-2], 1e-9)
                    + np.sqrt(dnx * dnx + dny * dny) / np.maximum(ts[2:] - ts[1:-1], 1e-9)
                ) / 2.0
            keep = np.ones(n, dtype=bool)
            slow = speed <= 0.05
            i = 0
            while i < n:
                if slow[i]:
                    j = i
                    while j + 1 < n and slow[j + 1]:
                        j += 1
                    if ts[j] - ts[i] >= 120.0:
                        keep[i : j + 1] = False
                    i = j + 1
                else:
                    i += 1
            assert np.array_equal(got, keep), n
