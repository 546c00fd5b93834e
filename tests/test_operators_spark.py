"""Spark integration tests: operator semantics on tiny deterministic
fixtures + cross-flavor equivalence of the spatial joins."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from util_gis_spark import datasets as D
from util_gis_spark.operators import filters, joins, trajectory


def _mk_points(spark, rows):
    return spark.createDataFrame(
        rows, "device_id long, ts timestamp, lon double, lat double, speed double, gps_status int, job_status int, point_id long"
    )


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


class TestFilterWgs84:
    def test_five_rules_and_dup_drop(self, spark):
        rows = [
            (1, _t(0), 116.1, 39.9, 5.0, 1, 1, 0),     # keep
            (1, _t(1), 116.1, 39.9, 5.0, 1, 1, 1),     # dup (lon,lat) -> dropped, keep first
            (1, _t(2), 0.0, 39.9, 5.0, 1, 1, 2),        # lon==0 -> drop
            (1, _t(3), 116.2, 39.9, 5.0, 2, 1, 3),      # gps_status=2 -> drop
            (1, _t(4), 116.2, 39.9, 5.0, 1, 3, 4),      # job_status=3 -> drop
            (1, _t(5), 200.0, 39.9, 5.0, 1, 1, 5),      # lon>180 -> drop
            (1, None, 116.3, 39.9, 5.0, 1, 1, 6),       # null ts -> drop
            (1, _t(7), 116.4, 39.9, None, 1, 0, 7),     # keep (null speed ok here)
            (2, _t(0), 116.1, 39.9, 5.0, 0, 0, 8),      # keep — dup drop is per device
        ]
        out = filters.filter_wgs84_points(_mk_points(spark, rows))
        got = sorted(r["point_id"] for r in out.collect())
        assert got == [0, 7, 8]

    def test_speed_filter_null_passes(self, spark):
        rows = [
            (1, _t(0), 116.1, 39.9, None, 1, 1, 0),   # null -> keep (G:13709)
            (1, _t(1), 116.2, 39.9, 0.05, 1, 1, 1),   # < 0.1 -> drop
            (1, _t(2), 116.3, 39.9, 18.0, 1, 1, 2),   # == max -> keep
            (1, _t(3), 116.4, 39.9, 18.01, 1, 1, 3),  # > max -> drop
        ]
        out = filters.speed_filter(_mk_points(spark, rows))
        assert sorted(r["point_id"] for r in out.collect()) == [0, 2]


class TestSessionize:
    def test_cut_on_gap(self, spark):
        rows = [(1, _t(i * 10), 116.0 + i * 1e-4, 39.9, 1.0, 1, 1, i) for i in range(5)]
        rows += [(1, _t(1000 + i * 10), 116.1 + i * 1e-4, 39.9, 1.0, 1, 1, 10 + i) for i in range(3)]
        out = trajectory.session_summary(_mk_points(spark, rows), max_gap_s=300).collect()
        segs = {r["seg_id"]: r["n_points"] for r in out}
        assert segs == {1: 5, 2: 3}

    def test_modal_interval_tie_prefers_smaller(self, spark):
        # dt sequence: 5,5,9,9 -> tie on count, modal = 5 (G:3966-3975)
        times = [0, 5, 10, 19, 28]
        rows = [(1, _t(t), 116.0 + i * 1e-4, 39.9, 1.0, 1, 1, i) for i, t in enumerate(times)]
        out = trajectory.modal_interval(_mk_points(spark, rows)).collect()
        assert out[0]["modal_interval_s"] == 5


class TestSpatialJoins:
    def test_broadcast_equals_cells_flavor(self, spark, sf_dir):
        imgs = D.images(spark, sf_dir)
        polys = D.polygons_wkt(spark, sf_dir)
        a = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_broadcast(imgs, polys).collect()
        }
        b = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_cells(imgs, polys, res=14).collect()
        }
        assert a == b and len(a) > 0

    def test_pip_join_dispatcher_picks_strategy(self, spark, sf_dir):
        imgs = D.images(spark, sf_dir)
        polys = D.polygons_wkt(spark, sf_dir)
        auto = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join(imgs, polys, res=16, carry_cols=["image_key"]).collect()
        }
        forced_shuffle = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join(
                imgs, polys, res=16, carry_cols=["image_key"], broadcast_threshold_cells=1
            ).collect()
        }
        ref = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_broadcast(imgs, polys, carry_cols=["image_key"]).collect()
        }
        assert auto == forced_shuffle == ref

    def test_hybrid_equals_broadcast_flavor(self, spark, sf_dir):
        imgs = D.images(spark, sf_dir)
        polys = D.polygons_wkt(spark, sf_dir)
        a = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_broadcast(imgs, polys, carry_cols=["image_key"]).collect()
        }
        b = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_hybrid(imgs, polys, res=16, carry_cols=["image_key"]).collect()
        }
        c = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_hybrid(
                imgs, polys, res=16, carry_cols=["image_key"], broadcast_cellmap=False
            ).collect()
        }
        assert a == b == c and len(a) > 0

    def test_classify_cells_conservative(self, spark):
        from util_gis_spark.geo.cells import cell_bounds
        from util_gis_spark.geo.geometry import parse_wkt, points_in_geom

        # non-convex polygon: L-shape
        parsed = parse_wkt("POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))")
        inside, boundary = joins.classify_polygon_cells(parsed, 8)
        # every cell classified inside must have its center truly inside
        for c in inside:
            x0, y0, x1, y1 = cell_bounds(int(c))
            assert points_in_geom([(x0 + x1) / 2], [(y0 + y1) / 2], parsed)[0]
        assert len(boundary) > 0

    def test_images_range_equals_images_scaled(self, spark, sf_dir):
        a = D.images_scaled(spark, sf_dir, 3).select("image_key", "lon", "lat", "w", "h")
        n = a.count()
        b = D.images_range(spark, n, 4)
        sym = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert sym == 0

    def test_salting_preserves_rows(self, spark, sf_dir):
        imgs = D.images(spark, sf_dir)
        polys = D.polygons_wkt(spark, sf_dir)
        plain = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_cells(imgs, polys, res=14).collect()
        }
        salted = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_cells(imgs, polys, res=14, salt_buckets=4).collect()
        }
        assert plain == salted

    def test_pip_strict_interior(self, spark):
        pts = spark.createDataFrame(
            [(1, 0.5, 0.5), (2, 0.0, 0.5), (3, 2.0, 2.0)], "image_key long, lon double, lat double"
        )
        polys = spark.createDataFrame(
            [(10, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")], "polygon_id long, wkt string"
        )
        got = {(r["image_key"], r["polygon_id"]) for r in joins.pip_join_broadcast(pts, polys).collect()}
        assert got == {(1, 10)}  # boundary point 2 excluded, outside point 3 excluded

    def test_knn_nearest_and_tolerance(self, spark):
        probes = spark.createDataFrame(
            [(1, 116.0, 39.9), (2, 116.5, 39.9)], "image_key long, lon double, lat double"
        )
        cands = [(100, 116.01, 39.9), (200, 116.4, 39.9)]
        out = {r["probe_id"]: r["nearest_id"] for r in joins.knn_join_broadcast(probes, cands).collect()}
        assert out == {1: 100, 2: 200}
        capped = joins.knn_join_broadcast(probes, cands, max_dist_m=2000.0).collect()
        assert [r["probe_id"] for r in capped] == [1]  # probe 2 is ~8.5km from its nearest

    def test_tile_assignment_covers_point_tile(self, spark):
        imgs = spark.createDataFrame(
            [(1, 116.2, 39.7, 100, 100)], "image_key long, lon double, lat double, w int, h int"
        )
        out = joins.tile_assignment(imgs, res=16).collect()
        from util_gis_spark.geo.cells import np_cell

        tiles = {r["tile"] for r in out}
        assert int(np_cell(116.2, 39.7, 16)) in tiles


class TestSqlApi:
    def test_sql_over_registered_views(self, spark, sf_dir):
        from util_gis_spark.sql_api import register

        names = register(spark, sf_dir)
        assert {"gps_points", "images", "polygons", "pip_pairs", "tiles"} <= set(names)
        n = spark.sql(
            """
            SELECT p.polygon_id, count(*) AS n_images
            FROM pip_pairs p JOIN images i ON p.image_key = i.image_key
            GROUP BY p.polygon_id ORDER BY n_images DESC LIMIT 1
            """
        ).collect()
        assert n[0]["n_images"] > 0
        t = spark.sql("SELECT count(DISTINCT tile) AS nt FROM tiles").collect()
        assert t[0]["nt"] > 0


class TestDerivedViews:
    def test_images_schema_matches_input_hint(self, spark, sf_dir):
        cols = set(D.images_with_bytes(spark, sf_dir).columns)
        assert {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"} <= cols

    def test_caption_bytes_deterministic(self, spark, sf_dir):
        a = D.images_with_bytes(spark, sf_dir).select("image_id", "bytes", "caption").collect()
        b = D.images_with_bytes(spark, sf_dir).select("image_id", "bytes", "caption").collect()
        assert sorted((r["image_id"], bytes(r["bytes"]), r["caption"]) for r in a) == sorted(
            (r["image_id"], bytes(r["bytes"]), r["caption"]) for r in b
        )


class TestAnnIvf:
    def test_ivf_structure_and_self_exclusion(self, spark, sf_dir):
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import ann_ivf_topk

        out = ann_ivf_topk(D.load(spark, sf_dir, "embeddings"), k=3, nprobe=3).collect()
        assert out, "IVF returned nothing"
        by_probe = {}
        for r in out:
            assert r["probe_id"] != r["neighbor_id"]
            assert -1.0001 <= r["cos_sim"] <= 1.0001
            by_probe.setdefault(r["probe_id"], []).append(r["cos_sim"])
        for sims in by_probe.values():
            assert len(sims) <= 3
            assert sims == sorted(sims, reverse=True)

    def test_probe_transports_identical(self, spark, sf_dir):
        """The closure (r7 default: fused assign+score kernel, numpy
        probe ranking, matrices in the task closure), join and
        broadcast probe transports must produce identical rows — same
        matrices, same ordered folds, only the shipping (and the
        closure form's quantum-safe in-kernel top-k prune, a provable
        superset cut) differs."""
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import ann_ivf_topk

        emb = D.load(spark, sf_dir, "embeddings")
        key = lambda r: (r["probe_id"], r["neighbor_id"], r["list_id"], r["cos_sim"])
        jn = sorted(key(r) for r in ann_ivf_topk(emb, probe_transport="join").collect())
        cl = sorted(key(r) for r in ann_ivf_topk(emb, probe_transport="closure").collect())
        assert jn == cl and jn
        # closure + expr assignment: the non-fused closure branch
        ce = sorted(
            key(r)
            for r in ann_ivf_topk(
                emb, probe_transport="closure", assign_transport="expr"
            ).collect()
        )
        assert jn == ce
        bcast_df = ann_ivf_topk(emb, probe_transport="broadcast")
        bc = sorted(key(r) for r in bcast_df.collect())
        bcast_df.probes_bc.destroy()
        assert jn == bc

    def test_transports_agree_on_degenerate_rows(self, spark, sf_dir):
        """r7 review guards: a NULL embedding row must be SKIPPED (not
        crash np.vstack) by every kernel, and a zero-norm vector's NaN
        cosine must survive the closure path's top-k prune exactly as
        the unfused kernels emit it (Spark ranks NaN first under desc,
        so silently dropping it would diverge the transports)."""
        import math

        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import ann_ivf_topk

        emb = D.load(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()["embedding"])
        dirty = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") == 7, F.lit(None))
            .when(
                F.col("vec_id") == 11,
                F.array(*[F.lit(0.0) for _ in range(dim)]),
            )
            .otherwise(F.col("embedding").cast("array<double>")),
        )
        key = lambda r: (
            r["probe_id"],
            r["neighbor_id"],
            r["list_id"],
            "nan" if (r["cos_sim"] is not None and math.isnan(r["cos_sim"])) else r["cos_sim"],
        )
        jn = sorted(key(r) for r in ann_ivf_topk(dirty, probe_transport="join").collect())
        cl = sorted(key(r) for r in ann_ivf_topk(dirty, probe_transport="closure").collect())
        assert jn == cl and jn

    def test_probe_transport_validated(self, spark, sf_dir):
        import pytest

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import ann_ivf_topk

        with pytest.raises(ValueError, match="probe_transport"):
            ann_ivf_topk(D.load(spark, sf_dir, "embeddings"), probe_transport="carrier-pigeon")
        with pytest.raises(ValueError, match="assign_transport"):
            ann_ivf_topk(D.load(spark, sf_dir, "embeddings"), assign_transport="osmosis")

    def test_assign_transports_identical(self, spark, sf_dir):
        """The Arrow argmax assignment kernel must be BIT-IDENTICAL to
        the literal greatest() expression form end-to-end: same
        ascending-d fold, same first-max == smaller-list_id tie-break,
        so every (probe, neighbor, cos, list) row matches exactly."""
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import ann_ivf_topk

        emb = D.load(spark, sf_dir, "embeddings")
        key = lambda r: (r["probe_id"], r["neighbor_id"], r["cos_sim"], r["list_id"])
        ex = sorted(key(r) for r in ann_ivf_topk(emb, assign_transport="expr").collect())
        kr = sorted(key(r) for r in ann_ivf_topk(emb, assign_transport="kernel").collect())
        assert ex == kr and ex

    def test_assign_auto_switches_to_kernel_beyond_expr_cap(self, spark, sf_dir):
        """Past _ASSIGN_EXPR_MAX_TERMS (lists x dim) 'auto' must route
        to the kernel (the expression form's Janino compile is the
        thing being avoided — it OOMs a 48 GiB driver at 300 lists x
        64 dims — so the test never builds it at this size) and the
        assignment must match an independent numpy replica of the
        ordered-fold argmax."""
        import numpy as np

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import (
            _ASSIGN_EXPR_MAX_TERMS,
            _assign_kernel,
            ann_ivf_topk,
        )

        emb = D.load(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()["embedding"])
        n_lists = _ASSIGN_EXPR_MAX_TERMS // dim + 44
        rng = np.random.default_rng(11)
        cents = []
        for j in range(n_lists):
            c = rng.standard_normal(dim)
            cents.append((j, (c / np.linalg.norm(c)).tolist()))

        e = emb.selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
        got = {
            (r["vec_id"], r["list_id"]) for r in _assign_kernel(e, cents).collect()
        }
        pdf = e.orderBy("vec_id").toPandas()
        C = np.array([c for _j, c in cents])
        want = set()
        for vid, v in zip(pdf["vec_id"], pdf["v"]):
            V = np.asarray(v, dtype=np.float64)
            dot = np.zeros(n_lists)
            for d in range(dim):  # same ordered fold as expr/kernel
                dot = dot + V[d] * C[:, d]
            want.add((int(vid), int(np.argmax(dot))))
        assert got == want and len(got) > 0

        # auto == explicit kernel end-to-end at this list count
        key = lambda r: (r["probe_id"], r["neighbor_id"], r["cos_sim"], r["list_id"])
        auto = sorted(
            key(r)
            for r in ann_ivf_topk(emb, centroids=cents, nprobe=5).collect()
        )
        kern = sorted(
            key(r)
            for r in ann_ivf_topk(
                emb, centroids=cents, nprobe=5, assign_transport="kernel"
            ).collect()
        )
        assert auto == kern and auto

        # explicit expr past the cap must REFUSE (the compile is a
        # measured OOM cliff), not attempt the build
        import pytest

        with pytest.raises(ValueError, match="unrolled terms"):
            ann_ivf_topk(emb, centroids=cents, assign_transport="expr")


class TestResPlanner:
    def test_pick_res_scales_with_polygon_size(self):
        from util_gis_spark.geo import cells
        from util_gis_spark.operators.joins import pick_res

        big = [(0.0, 0.0, 10.0, 10.0)]       # continent-scale
        small = [(0.0, 0.0, 0.001, 0.001)]   # city-block
        assert pick_res(big) < pick_res(small)
        assert 8 <= pick_res(big) <= cells.MAX_RES
        assert 8 <= pick_res(small) <= cells.MAX_RES
        # field-plot scale (the engine's native layer): mid-range res
        assert 13 <= pick_res([(0.0, 0.0, 0.07, 0.07)] * 25) <= 17

    def test_auto_res_join_matches_fixed_res(self, spark, sf_dir):
        from util_gis_spark import datasets as D
        from util_gis_spark.operators import joins

        imgs = D.images(spark, sf_dir)
        polys = D.polygons_wkt(spark, sf_dir)
        auto = {(r["image_key"], r["polygon_id"])
                for r in joins.pip_join(imgs, polys, carry_cols=["image_key"]).collect()}
        fixed = {(r["image_key"], r["polygon_id"])
                 for r in joins.pip_join(imgs, polys, res=16, carry_cols=["image_key"]).collect()}
        assert auto == fixed

    def test_knn_grid_kernel_equals_dense_kernel(self, spark, sf_dir):
        """knn_join_grid (broadcast grid index + in-kernel escalation +
        exact fallback) must reproduce knn_join_broadcast's full-matrix
        result EXACTLY: same nearest ids, same distances, same
        (dist, cand_id) tie-breaks."""
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators import filters, joins

        imgs = D.images(spark, sf_dir).select(
            F.col("image_key").alias("probe_id"), "lon", "lat"
        )
        cands = [
            (int(r["point_id"]), float(r["lon"]), float(r["lat"]))
            for r in filters.filter_wgs84_points(D.gps_points(spark, sf_dir))
            .select("point_id", "lon", "lat")
            .collect()
        ]
        dense = {
            (r["probe_id"], r["nearest_id"], round(r["dist_m"], 6))
            for r in joins.knn_join_broadcast(imgs, cands, probe_id_col="probe_id").collect()
        }
        grid = {
            (r["probe_id"], r["nearest_id"], round(r["dist_m"], 6))
            for r in joins.knn_join_grid(imgs, cands, probe_id_col="probe_id").collect()
        }
        assert grid == dense and len(grid) > 0

    def test_knn_planner_dispatch(self, spark, sf_dir):
        """knn_join picks dense for tiny candidate sets, grid for
        mid-size, and returns an empty typed frame for empty sides."""
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators import filters, joins

        imgs = D.images(spark, sf_dir).select(
            F.col("image_key").alias("probe_id"), "lon", "lat"
        )
        cdf = filters.filter_wgs84_points(D.gps_points(spark, sf_dir)).select(
            F.col("point_id").alias("cand_id"), "lon", "lat"
        )
        via_planner = {
            (r["probe_id"], r["nearest_id"]) for r in joins.knn_join(imgs, cdf).collect()
        }
        cands = [(int(r["cand_id"]), float(r["lon"]), float(r["lat"])) for r in cdf.collect()]
        want = {
            (r["probe_id"], r["nearest_id"])
            for r in joins.knn_join_broadcast(imgs, cands, probe_id_col="probe_id").collect()
        }
        assert via_planner == want
        empty = joins.knn_join(imgs, cdf.filter("cand_id < 0"))
        assert empty.count() == 0 and set(empty.columns) == {"probe_id", "nearest_id", "dist_m"}

    def test_overlapping_collection_parts_union_semantics(self, spark):
        """VERDICT r2 'Next round' #5: a GEOMETRYCOLLECTION with two
        OVERLAPPING squares must behave as their union in every join
        flavor — r2's combined-parity ray cast wrongly excluded points
        covered by an even number of parts."""
        from util_gis_spark.operators import joins

        gc = ("GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
              "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1)))")
        polys = spark.createDataFrame([(7, gc)], "polygon_id long, wkt string")
        pts = spark.createDataFrame(
            [
                (1, 1.5, 1.5),   # in the OVERLAP of both squares -> inside
                (2, 0.5, 0.5),   # in square A only -> inside
                (3, 2.5, 2.5),   # in square B only -> inside
                (4, 3.5, 0.5),   # outside both
                (5, 1.0, 1.5),   # on square B's edge, interior of A -> inside
            ],
            "image_key long, lon double, lat double",
        )
        want = {(1, 7), (2, 7), (3, 7), (5, 7)}
        flavors = {
            "broadcast": joins.pip_join_broadcast(pts, polys, carry_cols=["image_key"]),
            "hybrid_jvm": joins.pip_join_hybrid(pts, polys, res=8, carry_cols=["image_key"]),
            "hybrid_arrow": joins.pip_join_hybrid(
                pts, polys, res=8, carry_cols=["image_key"], refine="arrow"
            ),
            "cells": joins.pip_join_cells(pts, polys, res=8, carry_cols=["image_key"]),
        }
        for name, df in flavors.items():
            got = {(r["image_key"], r["polygon_id"]) for r in df.collect()}
            assert got == want, f"{name}: {got}"

    def test_pick_res_distributed_matches_driver_side(self, spark):
        from util_gis_spark.operators.joins import pick_res, pick_res_distributed

        # mixed-size squares; distributed median must land on the same res
        sizes = [0.001, 0.01, 0.01, 0.05, 0.07, 0.07, 0.07, 0.2, 1.0]
        envs = [(i * 2.0, 0.0, i * 2.0 + s, s) for i, s in enumerate(sizes)]
        wkts = [
            (i, f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
            for i, (x0, y0, x1, y1) in enumerate(envs)
        ]
        df = spark.createDataFrame(wkts, "polygon_id long, wkt string")
        assert pick_res_distributed(df) == pick_res(envs)

    def test_planner_large_polygon_side_never_collects(self, spark):
        """VERDICT r2 'Next round' #3: above collect_threshold_polys the
        planner must go through the fully distributed pip_join_cells path
        (executor-side classification, shuffle join) with an identical
        row set to the broadcast flavor."""
        from util_gis_spark.operators import joins

        # 4,200 small squares on a 70x60 grid (> default threshold 4096)
        step, size = 0.05, 0.02
        polys = []
        for gy in range(60):
            for gx in range(70):
                x0, y0 = gx * step, gy * step
                x1, y1 = x0 + size, y0 + size
                polys.append(
                    (gy * 70 + gx,
                     f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
                )
        pdf = spark.createDataFrame(polys, "polygon_id long, wkt string").repartition(8)
        # one point inside every 9th polygon + a miss offset between polygons
        pts = []
        for pid in range(0, 4200, 9):
            gx, gy = pid % 70, pid // 70
            pts.append((pid, gx * step + size / 2, gy * step + size / 2))       # hit
            pts.append((100000 + pid, gx * step + step - 0.005, gy * step))     # miss
        pts_df = spark.createDataFrame(pts, "image_key long, lon double, lat double")

        auto = joins.pip_join(pts_df, pdf, res=13, carry_cols=["image_key"])
        # mechanism: the distributed path classifies polygons executor-side
        # (MapInPandas in the plan); the broadcast hybrid has no Python op
        assert "MapInPandas" in auto._jdf.queryExecution().executedPlan().toString()
        got = {(r["image_key"], r["polygon_id"]) for r in auto.collect()}
        want = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_broadcast(pts_df, pdf, carry_cols=["image_key"]).collect()
        }
        assert got == want
        assert len(got) == len(range(0, 4200, 9))


class TestBucketedSink:
    def test_colocated_join_is_exchange_free(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.geo.cells import cell_expr
        from util_gis_spark.io.bucketed import count_exchanges, read_bucketed, write_bucketed

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            imgs = D.images(spark, sf_dir).select(
                "image_key", cell_expr(F.col("lon"), F.col("lat"), 14).alias("cell")
            )
            pts = D.gps_points(spark, sf_dir).select(
                "point_id", cell_expr(F.col("lon"), F.col("lat"), 14).alias("cell")
            )
            plain = imgs.join(pts, "cell")
            n_plain = plain.count()
            assert count_exchanges(plain) >= 2

            write_bucketed(imgs, "t_img_b", n_buckets=8)
            write_bucketed(pts, "t_pts_b", n_buckets=8)
            co = read_bucketed(spark, "t_img_b").join(read_bucketed(spark, "t_pts_b"), "cell")
            assert count_exchanges(co) == 0
            assert co.count() == n_plain
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS t_img_b")
            spark.sql("DROP TABLE IF EXISTS t_pts_b")

    def test_minhash_bucketed_stage_band_join_exchange_free(self, spark, sf_dir):
        """VERDICT r2 'Next round' #8: the persisted signature stage
        makes the band self-join exchange-free, with the pair set
        unchanged vs the in-query path."""
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.io.bucketed import count_exchanges
        from util_gis_spark.operators.dedup import (
            minhash_near_dup_pairs,
            minhash_pairs_from_stage,
            write_minhash_stage,
        )

        docs = D.load(spark, sf_dir, "documents")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            write_minhash_stage(docs, "t_mh", n_buckets=8)
            bands = spark.table("t_mh_bands")
            band_join = (
                bands.alias("l")
                .join(bands.alias("r"), "bkey")
                .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            )
            assert count_exchanges(band_join) == 0
            staged = {
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in minhash_pairs_from_stage(spark, "t_mh").collect()
            }
            inline = {
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in minhash_near_dup_pairs(docs).collect()
            }
            assert staged == inline
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS t_mh_bands")
            spark.sql("DROP TABLE IF EXISTS t_mh_hashes")

    def test_minhash_incremental_matches_batch(self, spark, sf_dir):
        """New-shard-vs-corpus dedup through the bucketed stage must
        find exactly the cross pairs the full batch run finds, without
        recomputing corpus signatures."""
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.dedup import (
            minhash_dedup_incremental,
            minhash_near_dup_pairs,
            write_minhash_stage,
        )

        docs = D.load(spark, sf_dir, "documents")
        corpus = docs.filter(F.col("doc_id") % 4 != 0)
        fresh = docs.filter(F.col("doc_id") % 4 == 0)
        try:
            write_minhash_stage(corpus, "t_inc", n_buckets=8)
            got = {
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in minhash_dedup_incremental(fresh, "t_inc").collect()
            }
            # reference: full-batch pairs restricted to one-new-one-corpus,
            # reoriented to (new, corpus)
            full = minhash_near_dup_pairs(docs).collect()
            want = set()
            for r in full:
                a_new, b_new = r["doc_a"] % 4 == 0, r["doc_b"] % 4 == 0
                if a_new and not b_new:
                    want.add((r["doc_a"], r["doc_b"], r["jaccard"]))
                elif b_new and not a_new:
                    want.add((r["doc_b"], r["doc_a"], r["jaccard"]))
            assert got == want
        finally:
            spark.sql("DROP TABLE IF EXISTS t_inc_bands")
            spark.sql("DROP TABLE IF EXISTS t_inc_hashes")


class TestBlockedTopK:
    def test_blocked_equals_single_broadcast(self, spark, sf_dir):
        """embed_topk_blocked (per-block broadcasts, B candidate scans)
        must emit exactly the baseline kernel's rows even with a block
        size that forces multiple blocks."""
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import embed_topk_blocked
        from util_gis_spark.queries import q_embed_topk

        base = {
            (r["probe_id"], r["neighbor_id"], r["cos_sim"])
            for r in q_embed_topk(spark, sf_dir).collect()
        }
        blocked = {
            (r["probe_id"], r["neighbor_id"], r["cos_sim"])
            for r in embed_topk_blocked(
                D.load(spark, sf_dir, "embeddings"), block_size=2
            ).collect()
        }
        assert blocked == base and len(blocked) > 0

    def test_empty_probe_set(self, spark, sf_dir):
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import embed_topk_blocked

        out = embed_topk_blocked(D.load(spark, sf_dir, "embeddings"), probe_filter="vec_id < 0")
        assert out.count() == 0

    def test_null_embedding_probe_skipped(self, spark, sf_dir):
        """ADVICE r6 #4: a NULL-embedding row matching probe_filter
        crashed the probe ingestion at np.vstack; it must be skipped
        like the dim probe skips it, leaving the non-null probes'
        rows unchanged."""
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import embed_topk_blocked

        emb = D.load(spark, sf_dir, "embeddings")
        nulled = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") == 100, F.lit(None)).otherwise(F.col("embedding")),
        )
        clean = {
            (r["probe_id"], r["neighbor_id"], r["cos_sim"])
            for r in embed_topk_blocked(
                emb.filter("vec_id <> 100"), probe_filter="vec_id % 100 = 0"
            ).collect()
        }
        dirty = {
            (r["probe_id"], r["neighbor_id"], r["cos_sim"])
            for r in embed_topk_blocked(nulled, probe_filter="vec_id % 100 = 0").collect()
        }
        # probe 100 is skipped in both forms; candidate sets differ by
        # one row (100 absent vs NULL) which the kernel also skips via
        # the NULL row never reaching a block, so rows must agree
        assert dirty == clean and len(dirty) > 0

    def test_probe_byte_cap_refuses(self, spark, sf_dir):
        """The probe ingestion is byte-capped like the kNN candidate
        ingestion (VERDICT r5 Wrong #4): an over-cap probe set must
        refuse with a pointer at LSH/IVF, never silently collect."""
        import pytest

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import embed_topk_blocked

        with pytest.raises(ValueError, match="max_probe_bytes"):
            embed_topk_blocked(
                D.load(spark, sf_dir, "embeddings"),
                probe_filter="vec_id % 2 = 0",
                max_probe_bytes=1024,
            )


class TestEdgeAttachment:
    def test_broadcast_and_inline_edges_equal(self, spark, sf_dir):
        """pip_join_cells attach_edges flavors (narrow cell map +
        broadcast edges vs per-boundary-cell duplication) must produce
        identical row sets, with and without salting."""
        imgs = D.images(spark, sf_dir)
        polys = D.polygons_wkt(spark, sf_dir)
        want = {
            (r["image_key"], r["polygon_id"])
            for r in joins.pip_join_cells(
                imgs, polys, res=14, attach_edges="inline"
            ).collect()
        }
        for kw in (
            {"attach_edges": "broadcast"},
            {"attach_edges": "auto"},
            {"attach_edges": "broadcast", "salt_buckets": 4},
        ):
            got = {
                (r["image_key"], r["polygon_id"])
                for r in joins.pip_join_cells(imgs, polys, res=14, **kw).collect()
            }
            assert got == want, kw
        assert len(want) > 0


class TestMinhashBandCap:
    def test_cap_drops_only_boilerplate_buckets(self, spark):
        """max_band_bucket must keep every pair from small buckets and
        drop candidates only via oversized (boilerplate) buckets. On
        the generated corpus the surviving pair set is identical
        because boilerplate-bucket pairs fail the Jaccard verify."""
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.dedup import minhash_near_dup_pairs

        docs = D.documents_range(spark, 600, 8)
        exact = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_near_dup_pairs(docs).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_near_dup_pairs(docs, max_band_bucket=16).collect()
        }
        assert capped <= exact
        assert capped == exact  # boilerplate pairs all fail verify here
        # sanity: a cap of 1 kills every bucket with a partner -> no pairs
        none = minhash_near_dup_pairs(docs, max_band_bucket=1).count()
        assert none == 0


class TestSimhashKernelParity:
    def test_arrow_kernel_equals_hof(self, spark, sf_dir):
        """The r4 Arrow simhash kernel must be bit-identical to the
        all-JVM HOF formulation it replaced (same md5 token hashes,
        same strict-majority vote)."""
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.dedup import simhash_docs, simhash_docs_hof

        docs = D.load(spark, sf_dir, "documents")
        a = {(r["doc_id"], r["simhash"]) for r in simhash_docs(docs).collect()}
        b = {(r["doc_id"], r["simhash"]) for r in simhash_docs_hof(docs).collect()}
        assert a == b and len(a) > 0

    def test_wide_simhash_lo_half_matches_narrow(self, spark):
        """The 64-bit scale path strictly extends the pinned 32-bit
        fingerprint: sim_lo must be BIT-IDENTICAL to simhash_docs."""
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.dedup import simhash_docs, simhash_docs_wide

        docs = D.documents_range(spark, 500, 4)
        narrow = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
        wide = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in simhash_docs_wide(docs).collect()}
        assert set(narrow) == set(wide) and len(narrow) == 500
        assert all(wide[d][1] == narrow[d] for d in narrow)
        # the hi half is a genuinely different fingerprint family
        assert sum(wide[d][0] != wide[d][1] for d in wide) > 400

    def test_wide_simhash_pairs_equal_brute_force(self, spark):
        """4x16-bit band LSH + two-half popcount == exhaustive 64-bit
        hamming<=2 over the corpus (pigeonhole guarantees no band miss
        at <=3 flips)."""
        import numpy as np

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.dedup import simhash_docs_wide, simhash_near_dup_pairs_wide

        docs = D.documents_range(spark, 2000, 8)
        fp = sorted(
            (r["doc_id"], (int(r["sim_hi"]) << 32) | int(r["sim_lo"]))
            for r in simhash_docs_wide(docs).collect()
        )
        ids = np.array([d for d, _ in fp], dtype=np.int64)
        h = np.array([v for _, v in fp], dtype=np.uint64)
        x = h[:, None] ^ h[None, :]
        ham = np.zeros_like(x, dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        want = {
            (int(ids[i]), int(ids[j]), int(ham[i, j]))
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if ham[i, j] <= 2
        }
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_dup_pairs_wide(docs, max_hamming=2).collect()
        }
        assert got == want and len(want) > 0

    def test_md5_memo_is_transparent_and_bounded(self):
        """r5: both kernels route per-string md5 through a bounded
        per-worker memo — hit and miss must return the exact direct
        computation, and the cache must refuse growth past its cap."""
        import hashlib

        from util_gis_spark.operators import dedup

        direct = lambda s: int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)  # noqa: E731
        for s in ("hello", "hello", "é中", ""):
            assert dedup._md5_60(s) == direct(s)
        old, old_max = dict(dedup._MD5_CACHE), dedup._MD5_CACHE_MAX
        try:
            dedup._MD5_CACHE.clear()
            dedup._MD5_CACHE_MAX = 2
            vals = [dedup._md5_60(f"tok{i}") for i in range(10)]
            assert vals == [direct(f"tok{i}") for i in range(10)]
            assert len(dedup._MD5_CACHE) <= 2
            # over-cap strings still compute correctly on repeat calls
            assert dedup._md5_60("tok9") == direct("tok9")
        finally:
            dedup._MD5_CACHE_MAX = old_max
            dedup._MD5_CACHE.clear()
            dedup._MD5_CACHE.update(old)


class TestKnnIndexHandle:
    def test_prebuilt_index_matches_direct(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators import joins

        cands = D.polygons(spark, sf_dir).select(
            F.col("polygon_id").alias("cand_id"),
            ((F.col("xmin") + F.col("xmax")) / 2.0).alias("lon"),
            ((F.col("ymin") + F.col("ymax")) / 2.0).alias("lat"),
        )
        probes = D.images(spark, sf_dir).select(
            F.col("image_key").alias("probe_id"), "lon", "lat"
        )
        idx = joins.build_knn_index(spark, cands)
        assert idx.n_candidates == cands.count()
        direct = {
            (r["probe_id"], r["nearest_id"], r["dist_m"])
            for r in joins.knn_join_grid(
                probes,
                [(int(r["cand_id"]), float(r["lon"]), float(r["lat"])) for r in cands.collect()],
            ).collect()
        }
        via_idx_1 = {
            (r["probe_id"], r["nearest_id"], r["dist_m"])
            for r in joins.knn_join_grid(probes, idx).collect()
        }
        via_idx_2 = {
            (r["probe_id"], r["nearest_id"], r["dist_m"])
            for r in joins.knn_join_grid(probes.limit(50), idx).collect()
        }
        assert via_idx_1 == direct and len(direct) > 0
        assert via_idx_2 <= via_idx_1 and len(via_idx_2) > 0
        idx.unpersist()


class TestIvfKmeans:
    def test_kmeans_ivf_matches_numpy_replica(self, spark, sf_dir):
        """ann_ivf_topk with the sampled-k-means quantizer must equal a
        straight-line numpy replica of the whole search (same
        centroids -> same assignment tie-breaks -> same nprobe lists
        -> same exact re-rank) row for row."""
        import duckdb
        import numpy as np

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import ann_ivf_topk, kmeans_centroids

        emb = D.load(spark, sf_dir, "embeddings")
        cents = kmeans_centroids(emb, k=8, iters=5)
        assert len(cents) == 8
        got = {
            (r["probe_id"], r["neighbor_id"], r["cos_sim"], r["list_id"])
            for r in ann_ivf_topk(
                emb, probe_filter="vec_id % 10 = 0", nprobe=3, centroids=cents
            ).collect()
        }

        df = duckdb.connect().execute(
            f"SELECT vec_id, embedding::DOUBLE[] AS v "
            f"FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        ).df()
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["v"].to_numpy())
        C = np.stack([np.asarray(c) for _i, c in cents])
        dots = m @ C.T
        # engine tie-break: dot desc, list_id asc -> argmax keeps first max
        order = np.argsort(-dots, axis=1, kind="stable")
        assign = order[:, 0]
        want = set()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        for i, pid in enumerate(ids):
            if pid % 10 != 0:
                continue
            probe_lists = set(order[i, :3])
            cand = [
                j
                for j in range(len(ids))
                if assign[j] in probe_lists and ids[j] != pid
            ]
            scored = sorted(
                (
                    (-round(float(mn[i] @ mn[j]), 5), int(ids[j]), int(assign[j]))
                    for j in cand
                ),
            )[:3]
            for negcos, nid, lid in scored:
                want.add((int(pid), nid, -negcos, lid))
        assert got == want and len(got) > 0

    def test_lsh_signature_kernel_matches_column_form(self, spark, sf_dir):
        """The r5 Arrow signature kernel must be BIT-IDENTICAL to the
        bucket_expr Column form (same int64 plane arithmetic, same
        ascending-d float fold) — the Column form stays as the twin the
        SQL oracle is built from."""
        from pyspark.sql import functions as F

        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import (
            N_TABLES,
            bucket_expr,
            lsh_signatures_kernel,
        )

        base = D.load(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        kern = {
            r["vec_id"]: list(r["buckets"]) for r in lsh_signatures_kernel(base).collect()
        }
        col = (
            base.withColumn("t", F.explode(F.expr(f"sequence(0, {N_TABLES - 1})")))
            .withColumn("bucket", F.expr(bucket_expr("v")).cast("long"))
            .collect()
        )
        want: dict = {}
        for r in col:
            want.setdefault(r["vec_id"], [0] * N_TABLES)[r["t"]] = r["bucket"]
        assert kern == want and len(kern) > 0

    def test_cos_kernel_matches_hof_expr(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from util_gis_spark.operators.ann import _cos_expr, _cos_kernel

        from util_gis_spark import datasets as D

        base = D.load(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        pairs = (
            base.select(F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"))
            .join(base.select(F.col("vec_id").alias("neighbor_id"), "v"))
            .filter("probe_id % 50 = 0 AND neighbor_id % 17 = 0")
        )
        got = {
            (r["probe_id"], r["neighbor_id"]): r["cos_raw"]
            for r in _cos_kernel(pairs).collect()
        }
        want = {
            (r["probe_id"], r["neighbor_id"]): r["c"]
            for r in pairs.select(
                "probe_id", "neighbor_id", _cos_expr("pv", "v").alias("c")
            ).collect()
        }
        assert len(got) > 100 and got == want  # exact double equality

    def test_kmeans_deterministic(self, spark, sf_dir):
        from util_gis_spark import datasets as D
        from util_gis_spark.operators.ann import kmeans_centroids

        emb = D.load(spark, sf_dir, "embeddings")
        assert kmeans_centroids(emb, k=5, iters=3) == kmeans_centroids(emb, k=5, iters=3)

    def test_kmeans_empty_clusters_respawn_distinct(self, spark):
        """r5 review: clusters emptying in the SAME Lloyd iteration
        must respawn on DISTINCT farthest points — one shared argmin
        gave them identical centroids, permanently deadening all but
        the smallest list_id. Near-identical corpus forces most of the
        k=6 clusters empty every iteration."""
        from util_gis_spark.operators.ann import kmeans_centroids

        rows = [(i, [1.0 + i * 1e-6, float(i % 3) * 1e-5, 0.5]) for i in range(30)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_centroids(emb, k=6, iters=4)
        assert len(cents) == 6
        uniq = {tuple(c) for _j, c in cents}
        assert len(uniq) == 6, f"duplicate centroids: {6 - len(uniq)}"


class TestReviewRegressionsR4:
    """Pins for the round-4 code-review findings."""

    def test_simhash_null_and_unicode_ws_text(self, spark):
        """NULL text must be dropped (not crash), and an NBSP must NOT
        split tokens — the kernel, the HOF path, and (by the ASCII
        regex) the DuckDB twin all treat it as part of the token."""
        from util_gis_spark.operators.dedup import simhash_docs, simhash_docs_hof

        docs = spark.createDataFrame(
            [(1, "foo bar baz"), (2, None), (3, "plain ascii words here")],
            "doc_id long, text string",
        )
        a = sorted((r["doc_id"], r["simhash"]) for r in simhash_docs(docs).collect())
        b = sorted((r["doc_id"], r["simhash"]) for r in simhash_docs_hof(docs).collect())
        assert a == b
        assert [i for i, _ in a] == [1, 3]  # null-text row dropped

    def test_minhash_null_text_dropped(self, spark):
        from util_gis_spark.operators.dedup import minhash_near_dup_pairs

        docs = spark.createDataFrame(
            [(1, None), (2, "a b c d e f"), (3, "a b c d e f")],
            "doc_id long, text string",
        )
        pairs = minhash_near_dup_pairs(docs).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(2, 3)}

    def test_cand_arrays_tuple_of_rows_is_rows(self):
        import numpy as np

        from util_gis_spark.operators.joins import _cand_arrays

        rows = ((3, 116.0, 39.5), (1, 116.1, 39.6), (2, 116.2, 39.7))
        cid, clon, clat = _cand_arrays(rows)
        assert list(cid) == [1, 2, 3]
        assert np.allclose(clon, [116.1, 116.2, 116.0])

    def test_cand_arrays_empty_raises(self):
        import pytest as _pytest

        from util_gis_spark.operators.joins import _cand_arrays

        with _pytest.raises(ValueError, match="empty candidate"):
            _cand_arrays([])


class TestR4TrajectoryPlotsRegressions:
    def test_speed_average_includes_no_interval_devices(self, spark):
        """A device with no positive whole-second interval must appear
        with the documented 0.0, not vanish (its presence in the
        output anchors on the device set, not the modal table)."""
        import datetime as dt

        from util_gis_spark.operators.trajectory import speed_average

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (1, t0, 116.0, 39.5, 1.0, 10),
                (1, t0 + dt.timedelta(seconds=1), 116.001, 39.5, 1.0, 11),
                (2, t0, 116.0, 39.6, 1.0, 20),  # single point: no interval
            ],
            "device_id long, ts timestamp, lon double, lat double, speed double, point_id long",
        )
        rows = {r["device_id"]: r["speed_avg_ms"] for r in speed_average(df).collect()}
        assert set(rows) == {1, 2}
        assert rows[2] == 0.0 and rows[1] > 0.0

    def test_sessionizers_emit_same_shape(self, spark):
        import datetime as dt

        from util_gis_spark.operators.trajectory import (
            sessionize_by_distance,
            sessionize_by_time,
        )

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, t0, 116.0, 39.5, 10)],
            "device_id long, ts timestamp, lon double, lat double, point_id long",
        )
        a = set(sessionize_by_time(df).columns)
        b = set(sessionize_by_distance(df).columns)
        assert a == b  # no leaked helper columns on either side

    def test_null_step_cuts_consistently_across_sessionizers(self, spark):
        """A mid-stream NULL coordinate makes the step distance NULL;
        sessionize_by_distance and sessionize_by_time_or_distance must
        both cut there (r6 review: the OR form's NULL comparison
        silently continued the segment while the sibling cut)."""
        import datetime as dt

        from util_gis_spark.operators.trajectory import (
            sessionize_by_distance,
            sessionize_by_time_or_distance,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(seconds=i), None if i == 2 else 116.0 + i * 1e-5, 39.5, i)
            for i in range(5)
        ]
        df = spark.createDataFrame(
            rows, "device_id long, ts timestamp, lon double, lat double, point_id long"
        )
        segs_d = {
            r["point_id"]: r["seg_id"] for r in sessionize_by_distance(df).collect()
        }
        segs_td = {
            r["point_id"]: r["seg_id"]
            for r in sessionize_by_time_or_distance(df).collect()
        }
        assert segs_d == segs_td
        # the NULL-coord row starts a new segment, and so does the row
        # after it (its step from the NULL row is NULL too)
        assert segs_d[1] < segs_d[2] < segs_d[3] == segs_d[4]

    def test_plots_all_null_ts_device_yields_no_plots(self, spark):
        import datetime as dt

        from util_gis_spark.operators.plots import get_farm_plot, split_road

        rows = [(1, None, 116.0, 39.5, i) for i in range(5)] + [
            (2, dt.datetime(2024, 1, 1, 0, 0, s), 116.0 + s * 1e-5, 39.5, 100 + s)
            for s in range(5)
        ]
        df = spark.createDataFrame(
            rows, "device_id long, ts timestamp, lon double, lat double, point_id long"
        )
        # must not crash; the all-null device contributes nothing
        farm = get_farm_plot(df, working_width=3.0).collect()
        assert all(r["device_id"] == 2 for r in farm)
        road = split_road(df, working_width=3.0).collect()
        assert all(r["device_id"] == 2 for r in road)

    def test_split_road_rejects_unknown_option(self, spark):
        import pytest as _pytest

        from util_gis_spark.operators.plots import split_road

        df = spark.createDataFrame(
            [], "device_id long, ts timestamp, lon double, lat double, point_id long"
        )
        with _pytest.raises(TypeError, match="unknown option"):
            split_road(df, 3.0, algorithmm=1)


class TestR6DedupImagesRegressions:
    def test_vertical_tab_tokenizes_identically_across_engines(self, spark):
        """RE2's \\s misses \\x0B while Java/Python \\s include it —
        the oracle regex now spells the class explicitly (r6 review).
        'a\\x0Bb' must tokenize to ['a','b'] in Spark, the kernel
        tokenizer, AND DuckDB."""
        import duckdb

        from pyspark.sql import functions as F

        from util_gis_spark.operators.dedup import _tokens, _toks, _toks_sql

        text = "a\x0bb  c"
        want = ["a", "b", "c"]
        assert _tokens(text) == want
        got_spark = (
            spark.createDataFrame([(text,)], "text string")
            .select(_toks("text").alias("t"))
            .first()["t"]
        )
        assert list(got_spark) == want
        got_duck = (
            duckdb.connect()
            .execute(f"SELECT {_toks_sql('t')} FROM (SELECT ? AS t)", [text])
            .fetchone()[0]
        )
        assert list(got_duck) == want

    def test_caption_checker_catches_null_flips_and_drops(self, spark):
        """The invariant checker must flag NULL->value corruption,
        value->NULL corruption, and dropped rows (r6 review: the old
        inner join + NULL-propagating != passed on all three)."""
        from util_gis_spark.operators.images import caption_byte_equality

        src = spark.createDataFrame(
            [("a", "keep"), ("b", None), ("c", "v"), ("d", None), ("e", "same")],
            "image_id string, caption string",
        )
        out = spark.createDataFrame(
            [("a", "keep"), ("b", "corrupted"), ("c", None), ("e", "same")],
            "image_id string, caption string",
        )  # d dropped entirely (and its caption was NULL)
        bad = {r["image_id"] for r in caption_byte_equality(src, out).collect()}
        assert bad == {"b", "c", "d"}
