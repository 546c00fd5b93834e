"""Golden tests on the reference's OWN test WKTs (the two real farm
plots from TestUtilGis.java 测试合并WKT / 测试4维数组, extracted verbatim
to tests/data_merge_wkt*.txt). The reference logs rather than asserts;
we pin the invariants its semantics imply."""

import os

import numpy as np
import pytest

from util_gis_spark.geo.geometry import geom_envelope, parse_wkt, points_in_geom, wkt_to_4d_array
from util_gis_spark.geo.sphere import calc_mu, np_polygon_area_m2
from util_gis_spark.operators.geometry_ops import np_intersection_mu, np_merge_wkts

HERE = os.path.dirname(os.path.abspath(__file__))
WKT1 = open(os.path.join(HERE, "data_merge_wkt1.txt")).read()
WKT2 = open(os.path.join(HERE, "data_merge_wkt2.txt")).read()


class TestReferenceWkts:
    def test_parse_real_plots(self):
        t1, r1 = parse_wkt(WKT1)
        t2, r2 = parse_wkt(WKT2)
        assert t1 == "POLYGON" and t2 == "POLYGON"
        assert len(r1[0]) > 100 and len(r2[0]) > 100  # real vertex-dense plots

    def test_mu_of_each_plot_is_field_sized(self):
        for w in (WKT1, WKT2):
            _, rings = parse_wkt(w)
            mu = calc_mu(np_polygon_area_m2(rings))
            assert 1.0 < mu < 500.0  # an actual farm plot, not garbage

    def test_centroid_inside(self):
        for w in (WKT1, WKT2):
            _, rings = parse_wkt(w)
            c = rings[0][:-1].mean(axis=0)
            # centroid of a mostly-convex plot lies inside
            assert points_in_geom([c[0]], [c[1]], (("POLYGON")), ) is not None
            assert points_in_geom([c[0]], [c[1]], parse_wkt(w))[0]

    def test_merge_two_real_plots(self):
        merged_wkt, mu = np_merge_wkts([WKT1, WKT2])
        _, r1 = parse_wkt(WKT1)
        _, r2 = parse_wkt(WKT2)
        mu1 = calc_mu(np_polygon_area_m2(r1))
        mu2 = calc_mu(np_polygon_area_m2(r2))
        _, inter_mu = np_intersection_mu(WKT1, WKT2)
        # inclusion-exclusion within raster tolerance
        assert mu == pytest.approx(mu1 + mu2 - inter_mu, rel=0.02)
        assert merged_wkt.startswith("MULTIPOLYGON")
        tm, _ = parse_wkt(merged_wkt)
        assert tm == "MULTIPOLYGON"

    def test_4d_array_of_real_plot(self):
        arr = wkt_to_4d_array(WKT1)
        assert len(arr) == 1 and len(arr[0]) >= 1
        ring0 = np.asarray(arr[0][0])
        assert ring0.shape[1] == 2
        env = geom_envelope(parse_wkt(WKT1))
        assert env[0] <= ring0[:, 0].min() and ring0[:, 0].max() <= env[2]
