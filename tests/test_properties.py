"""Property-based tests (hypothesis) for the pure-numpy kernels:
projection roundtrip, cell-index invariants, haversine metric
properties, WKT roundtrip, mu rounding, PIP vs winding."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from util_gis_spark.geo import cells, gauss
from util_gis_spark.geo.geometry import (
    convex_clip,
    parse_wkt,
    points_in_polygon,
    polygon_wkt,
    shoelace_area,
)
from util_gis_spark.geo.sphere import calc_mu, np_haversine

lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
lat_st = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)


class TestProjectionProperties:
    @settings(max_examples=200, deadline=None)
    @given(lon=lon_st, lat=lat_st)
    def test_roundtrip(self, lon, lat):
        x, y, z = gauss.gauss_forward(np.array([lon]), np.array([lat]))
        lon2, lat2, _ = gauss.gauss_inverse(x, y)
        assert abs(lon2[0] - lon) < 1e-8 and abs(lat2[0] - lat) < 1e-8

    @settings(max_examples=100, deadline=None)
    @given(lon=lon_st, lat=st.floats(min_value=-80, max_value=80))
    def test_local_distance_preserved(self, lon, lat):
        # planar distance of a 100 m great-circle step stays within
        # TM scale distortion (<0.1% inside a zone)
        zone = int(gauss.zone_from_lon(lon))
        dlat = 100.0 / 111194.93
        x1, y1, _ = gauss.gauss_forward(np.array([lon]), np.array([lat]), zone=zone)
        x2, y2, _ = gauss.gauss_forward(np.array([lon]), np.array([lat + dlat]), zone=zone)
        d = float(np.hypot(x2 - x1, y2 - y1))
        assert abs(d - 100.0) < 1.0

    @settings(max_examples=100, deadline=None)
    @given(lon=lon_st)
    def test_zone_consistency(self, lon):
        z = int(gauss.zone_from_lon(lon))
        assert 1 <= z <= 60
        cm = float(gauss.central_meridian(z))
        assert abs(lon - cm) <= 3.0 + 1e-9 or z in (1, 60)


class TestCellProperties:
    @settings(max_examples=200, deadline=None)
    @given(lon=lon_st, lat=lat_st, res=st.integers(min_value=2, max_value=20))
    def test_point_in_own_cell(self, lon, lat, res):
        c = int(cells.np_cell(lon, lat, res))
        x0, y0, x1, y1 = cells.cell_bounds(c)
        # float rounding at cell boundaries can push a point one ulp
        # into the neighbor (consistent across engines — the encoder
        # IS the semantics); allow a 1e-9-degree tolerance
        assert x0 - 1e-9 <= lon < x1 + 1e-9 and y0 - 1e-9 <= lat < y1 + 1e-9

    @settings(max_examples=100, deadline=None)
    @given(lon=lon_st, lat=lat_st, res=st.integers(min_value=3, max_value=18))
    def test_parent_is_coarser_container(self, lon, lat, res):
        c = int(cells.np_cell(lon, lat, res))
        p = int(cells.parent(c))
        assert int(cells.np_cell(lon, lat, res - 1)) == p

    @settings(max_examples=100, deadline=None)
    @given(lon=lon_st, lat=lat_st, res=st.integers(min_value=2, max_value=16))
    def test_cover_contains_cell(self, lon, lat, res):
        c = int(cells.np_cell(lon, lat, res))
        cov = cells.cover_bbox(lon, lat, lon, lat, res)
        assert c in cov


class TestHaversineProperties:
    @settings(max_examples=200, deadline=None)
    @given(a=lon_st, b=lat_st, c=lon_st, d=lat_st)
    def test_symmetric_nonnegative(self, a, b, c, d):
        d1 = float(np_haversine(a, b, c, d))
        d2 = float(np_haversine(c, d, a, b))
        assert d1 >= 0 and abs(d1 - d2) < 1e-6

    @settings(max_examples=100, deadline=None)
    @given(a=lon_st, b=lat_st)
    def test_identity_zero(self, a, b):
        assert float(np_haversine(a, b, a, b)) == 0.0


class TestGeometryProperties:
    @settings(max_examples=100, deadline=None)
    @given(
        x0=st.floats(min_value=-170, max_value=160),
        y0=st.floats(min_value=-80, max_value=70),
        w=st.floats(min_value=0.01, max_value=5.0),
        h=st.floats(min_value=0.01, max_value=5.0),
    )
    def test_wkt_roundtrip_and_center_inside(self, x0, y0, w, h):
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
        )
        typ, rings = parse_wkt(polygon_wkt([ring]))
        assert typ == "POLYGON"
        assert np.allclose(rings[0], ring)
        assert points_in_polygon([x0 + w / 2], [y0 + h / 2], rings)[0]
        assert not points_in_polygon([x0 - w], [y0 - h], rings)[0]

    @settings(max_examples=100, deadline=None)
    @given(
        x0=st.floats(min_value=-50, max_value=50),
        y0=st.floats(min_value=-50, max_value=50),
        w=st.floats(min_value=1.0, max_value=20.0),
        dx=st.floats(min_value=-25.0, max_value=25.0),
    )
    def test_convex_clip_area_bounds(self, x0, y0, w, dx):
        a = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w], [x0, y0]])
        b = a + np.array([dx, 0.0])
        ring = convex_clip(a, b)
        if len(ring):
            area = shoelace_area(ring)
            assert area <= shoelace_area(a) + 1e-6
            expected = max(w - abs(dx), 0.0) * w
            assert abs(area - expected) < 1e-6

    @settings(max_examples=200, deadline=None)
    @given(m2=st.floats(min_value=0, max_value=1e9, allow_nan=False))
    def test_mu_monotone_and_scaled(self, m2):
        mu = calc_mu(m2)
        assert mu >= 0
        assert abs(mu - m2 * 3.0 / 2000.0) <= 5e-5 + 1e-12 * m2


class TestGridNearestProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=10_000),
        n_cand=st.integers(min_value=1, max_value=120),
        n_probe=st.integers(min_value=1, max_value=60),
        spread=st.floats(min_value=1e-4, max_value=5.0),
    )
    def test_grid_ladder_equals_brute_force(self, seed, n_cand, n_probe, spread):
        """The grid kNN ladder's pure-numpy core must return EXACTLY the
        brute-force nearest (distance and id, including ties broken by
        cand_id) for arbitrary clouds — probes inside, outside, and far
        from the candidate bbox."""
        from util_gis_spark.operators.joins import _cand_grid_index, _grid_nearest_all

        rng = np.random.default_rng(seed)
        clon = 116.0 + rng.uniform(-spread, spread, n_cand)
        clat = 39.5 + rng.uniform(-spread, spread, n_cand)
        cands = [(int(i * 7 + 3), float(x), float(y)) for i, (x, y) in enumerate(zip(clon, clat))]
        # probes: half near the cloud, half far outside the bbox
        plon = np.concatenate(
            [116.0 + rng.uniform(-spread, spread, (n_probe + 1) // 2),
             116.0 + rng.uniform(3 * spread + 0.1, 6 * spread + 0.2, n_probe // 2)]
        )
        plat = np.concatenate(
            [39.5 + rng.uniform(-spread, spread, (n_probe + 1) // 2),
             39.5 - rng.uniform(3 * spread + 0.1, 6 * spread + 0.2, n_probe // 2)]
        )
        idx = _cand_grid_index(cands)
        max_levels = max(int(np.ceil(np.log2(max(idx["dims"], 2)))), 1)
        got_id, got_d = _grid_nearest_all(plon, plat, idx, max_levels)

        d = np_haversine(plon[:, None], plat[:, None], idx["clon"][None, :], idx["clat"][None, :])
        j = np.argmin(d, axis=1)  # first min = smallest cand_id (sorted)
        want_id = idx["cid"][j]
        want_d = d[np.arange(len(plon)), j]
        assert (got_id == want_id).all()
        assert np.allclose(got_d, want_d, rtol=0, atol=1e-9)


class TestGridNearestAntimeridianAndNaN:
    """r5 review findings: the grid kernel had no east-west wraparound
    (a cross-antimeridian candidate could be closer than the accepted
    ring-local one) and a single NaN candidate poisoned every probe's
    argmin. Both now fixed; these pin the exact repros plus a
    world-spanning differential."""

    @staticmethod
    def _brute(plon, plat, idx):
        d = np_haversine(plon[:, None], plat[:, None], idx["clon"][None, :], idx["clat"][None, :])
        j = np.argmin(d, axis=1)
        return idx["cid"][j], d[np.arange(len(plon)), j]

    @staticmethod
    def _run(cands, plon, plat):
        from util_gis_spark.operators.joins import _cand_grid_index, _grid_nearest_all

        idx = _cand_grid_index(cands)
        max_levels = max(int(np.ceil(np.log2(max(idx["dims"], 2)))), 1)
        return idx, _grid_nearest_all(np.asarray(plon), np.asarray(plat), idx, max_levels)

    def test_wraparound_candidate_beats_ring_local(self):
        """The review's empirical repro: candidates spread across the
        full longitude range with one just across the antimeridian from
        the probe — the wrap candidate is the true nearest."""
        rng = np.random.default_rng(7)
        n = 10_000
        clon = rng.uniform(-179.95, 179.95, n)
        clat = rng.uniform(-5, 5, n)
        clon[0], clat[0] = -179.9, 0.0
        cands = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(clon, clat))]
        idx, (got_id, got_d) = self._run(cands, [179.9], [0.0])
        want_id, want_d = self._brute(np.array([179.9]), np.array([0.0]), idx)
        assert got_id[0] == want_id[0]
        assert abs(got_d[0] - want_d[0]) < 1e-9

    def test_dateline_cluster_uses_shifted_frame(self):
        """A candidate set straddling the dateline (170..190) must grid
        compactly (shift360) and answer probes from BOTH frames."""
        from util_gis_spark.operators.joins import _cand_grid_index

        rng = np.random.default_rng(11)
        lon = np.mod(170.0 + rng.uniform(0, 20, 400), 360.0)
        lon = np.where(lon >= 180.0, lon - 360.0, lon)  # [-180,180) frame
        lat = rng.uniform(-3, 3, 400)
        cands = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(lon, lat))]
        idx = _cand_grid_index(cands)
        assert idx["shift360"] and idx["span_x"] < 30.0
        plon = np.array([-179.9, 179.9, 171.0, -171.0, 0.0])
        plat = np.array([0.0, 0.5, -1.0, 1.0, 0.0])
        _, (got_id, got_d) = self._run(cands, plon, plat)
        want_id, want_d = self._brute(plon, plat, idx)
        assert (got_id == want_id).all()
        assert np.allclose(got_d, want_d, rtol=0, atol=1e-9)

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(min_value=0, max_value=10_000))
    def test_world_spanning_cloud_equals_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        n_cand = int(rng.integers(2, 200))
        clon = rng.uniform(-180, 180, n_cand)
        clat = rng.uniform(-60, 60, n_cand)
        cands = [(int(i * 3 + 1), float(x), float(y)) for i, (x, y) in enumerate(zip(clon, clat))]
        plon = rng.uniform(-180, 180, 25)
        plat = rng.uniform(-60, 60, 25)
        idx, (got_id, got_d) = self._run(cands, plon, plat)
        want_id, want_d = self._brute(plon, plat, idx)
        assert (got_id == want_id).all()
        assert np.allclose(got_d, want_d, rtol=0, atol=1e-9)

    def test_nan_candidates_dropped_not_poisoning(self):
        """The review's second repro: a NaN-coordinate candidate must be
        dropped at ingestion, not returned as everyone's nearest."""
        cands = [(10, 0.0, 0.0), (11, 1.0, 1.0), (12, float("nan"), 2.0)]
        idx, (got_id, got_d) = self._run(cands, [0.01], [0.01])
        assert list(idx["cid"]) == [10, 11]
        assert got_id[0] == 10 and np.isfinite(got_d[0])

    def test_all_nan_candidates_raise(self):
        from util_gis_spark.operators.joins import _cand_grid_index

        with pytest.raises(ValueError):
            _cand_grid_index([(1, float("nan"), 0.0)])


class TestTimeWindowsSqlTwinProperty:
    """The r4 SQL twin for split_time_windows claims exact equivalence
    with the state machine WHENEVER the cadence-switch precondition
    holds (no >= MIN_CONSECUTIVE equal-dt run). Differential-test that
    claim on RANDOM dt sequences, not just the driver fixture."""

    @settings(max_examples=40, deadline=None)
    @given(
        dts=st.lists(
            st.integers(min_value=1, max_value=400), min_size=1, max_size=60
        ),
        dev2=st.booleans(),
    )
    def test_sql_equals_machine_on_random_cadences(self, dts, dev2):
        import duckdb
        import pandas as pd

        from util_gis_spark.operators.windows import (
            MIN_CONSECUTIVE,
            np_split_time_windows,
            split_time_windows_summary_sql,
        )

        # enforce the precondition (max_size=60 could produce a 59-run)
        run = 1
        for a, b in zip(dts, dts[1:]):
            run = run + 1 if a == b else 1
            if run >= MIN_CONSECUTIVE:
                return  # precondition violated -> twin makes no claim
        base = 1_700_000_000
        secs = np.cumsum([0] + dts) + base
        rows = []
        for dev in ([0, 1] if dev2 else [0]):
            for i, sc in enumerate(secs):
                rows.append(
                    {
                        "device_id": dev,
                        "ts": pd.Timestamp(sc + dev * 10_000_000, unit="s"),
                        "point_id": i,
                    }
                )
        pdf = pd.DataFrame(rows)

        # expected: run the actual machine per device
        expect = []
        for dev, g in pdf.groupby("device_id"):
            s = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1_000_000_000
            wid, lab = np_split_time_windows(s)
            gg = g.assign(window_id=wid, window_interval_s=lab)
            expect.append(
                gg.groupby(["window_id", "window_interval_s"], as_index=False)
                .agg(n_points=("ts", "size"), start_ts=("ts", "min"), end_ts=("ts", "max"))
                .assign(device_id=dev)
            )
        expect = pd.concat(expect, ignore_index=True)

        con = duckdb.connect()
        con.register("pts_src", pdf)
        got = con.execute(
            split_time_windows_summary_sql("SELECT * FROM pts_src")
        ).df()
        cols = sorted(got.columns)
        e = (
            expect[cols]
            .sort_values(cols)
            .reset_index(drop=True)
            .astype(got.dtypes.to_dict())
        )
        g = got[cols].sort_values(cols).reset_index(drop=True)
        assert len(e) == len(g) and e.equals(g)


class TestDensitySamplingDifferential:
    """The r4 refactor moved densityBasedSampling onto the shared
    _GridIndex engine; differential-test it against a straight-line
    O(n^2) reference of the documented semantics (tiered keep by
    eps-ball count, then the SEQUENTIAL force-keep pass)."""

    @staticmethod
    def _reference(xy, epsilon, min_pts, max_neighbors):
        n = len(xy)
        keep = np.zeros(n, dtype=bool)
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
        nbm = d2 <= epsilon * epsilon
        for i in range(n):
            cnt = int(nbm[i].sum())
            if cnt < min_pts * 2:
                keep[i] = True
            elif cnt <= max_neighbors:
                keep[i] = i % 3 == 0
            else:
                keep[i] = i % 10 == 0
        for i in range(n):
            if not keep[i] and int(keep[nbm[i]].sum()) < min_pts:
                keep[i] = True
        return keep

    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=10_000),
        n=st.integers(min_value=1, max_value=160),
        spread=st.floats(min_value=0.5, max_value=30.0),
    )
    def test_matches_reference(self, seed, n, spread):
        from util_gis_spark.operators.sampling import np_density_based_sampling

        rng = np.random.default_rng(seed)
        xy = rng.normal(scale=spread, size=(n, 2))
        got = np_density_based_sampling(xy, epsilon=5.0, min_pts=4, max_neighbors=12)
        want = self._reference(xy, 5.0, 4, 12)
        assert (got == want).all()
