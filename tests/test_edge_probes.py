"""Adversarial edge probes over the PUBLIC operator APIs: empty
inputs on either side, degenerate/garbage/NULL WKT, single-point
groups, all-null text corpora, polar and antimeridian coordinates.
Every probe must return a result (possibly empty), never raise."""

import datetime as dt

from pyspark.sql import functions as F


def _bad_polys(spark):
    return spark.createDataFrame(
        [
            (1, "POLYGON EMPTY"),
            (2, "GARBAGE((("),
            (3, None),
            (4, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            (5, "POLYGON ((0 0, 0 0, 0 0, 0 0))"),
            (6, "POINT (3 4)"),
        ],
        "polygon_id long, wkt string",
    )


class TestPipEdges:
    def test_empty_points_all_flavors(self, spark):
        from util_gis_spark.operators import joins

        pts = spark.createDataFrame([], "image_key long, lon double, lat double")
        polys = spark.createDataFrame(
            [(1, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")], "polygon_id long, wkt string"
        )
        assert joins.pip_join_hybrid(pts, polys).count() == 0
        assert joins.pip_join_cells(pts, polys).count() == 0
        assert joins.pip_join(pts, polys).count() == 0

    def test_empty_polygon_side(self, spark):
        from util_gis_spark.operators import joins

        pts = spark.createDataFrame([(1, 0.5, 0.5)], "image_key long, lon double, lat double")
        polys = spark.createDataFrame([], "polygon_id long, wkt string")
        assert joins.pip_join_hybrid(pts, polys).count() == 0
        assert joins.pip_join(pts, polys).count() == 0

    def test_degenerate_wkts_degrade_not_crash(self, spark):
        from util_gis_spark.operators import joins

        pts = spark.createDataFrame([(1, 0.5, 0.5)], "image_key long, lon double, lat double")
        # only the one valid polygon matches; EMPTY/garbage/NULL/point
        # degrade to no-match instead of raising
        assert joins.pip_join_hybrid(pts, _bad_polys(spark)).count() == 1
        assert joins.pip_join_cells(pts, _bad_polys(spark)).count() == 1


class TestGeometryOpEdges:
    def test_merge_and_conflicts_on_degenerate(self, spark):
        from util_gis_spark.operators.geometry_ops import (
            merge_wkts_agg,
            resolve_conflicts_agg,
        )

        bad = _bad_polys(spark).withColumn("grp", F.lit(0))
        assert merge_wkts_agg(bad, ["grp"]).count() == 1
        assert resolve_conflicts_agg(bad, ["grp"], sort_cols=["polygon_id"]).count() == 1


class TestTrajectoryEdges:
    def _one(self, spark):
        return spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 116.0, 39.5, 1.0, 1, 1, 10)],
            "device_id long, ts timestamp, lon double, lat double, "
            "speed double, gps_status int, job_status int, point_id long",
        )

    def test_single_point_device(self, spark):
        from util_gis_spark.operators import trajectory
        from util_gis_spark.operators.windows import split_time_windows

        one = self._one(spark)
        rows = trajectory.great_circle_mileage(one).collect()
        assert rows[0]["mileage_km"] == 0.0 and rows[0]["n_points"] == 1
        assert trajectory.session_summary(one).count() == 1
        assert split_time_windows(one).count() == 1

    def test_empty_trajectories(self, spark):
        from util_gis_spark.operators import trajectory

        assert trajectory.great_circle_mileage(self._one(spark).filter("device_id < 0")).count() == 0

    def test_plot_composites_degrade_on_tiny_input(self, spark):
        from util_gis_spark.operators.plots import get_farm_plot, split_road

        traj = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 116.0, 39.5, 1)],
            "device_id long, ts timestamp, lon double, lat double, point_id long",
        )
        # one point cannot form a plot — empty result, no crash
        assert get_farm_plot(traj, working_width=3.0).count() == 0
        assert split_road(traj, working_width=3.0).count() == 0
        assert get_farm_plot(traj.filter("device_id < 0"), working_width=3.0).count() == 0


class TestKnnAndTextEdges:
    def test_polar_antimeridian_knn(self, spark):
        from util_gis_spark.operators import joins

        far = spark.createDataFrame(
            [(1, 179.999, 89.5), (2, -179.999, -89.5)], "probe_id long, lon double, lat double"
        )
        cands = spark.createDataFrame(
            [(7, 179.99, 89.4)], "cand_id long, lon double, lat double"
        )
        rows = {r["probe_id"]: r for r in joins.knn_join(far, cands).collect()}
        assert rows[1]["nearest_id"] == 7 and rows[1]["dist_m"] < 20_000
        # the anti-podal probe still resolves (exact haversine, ~half
        # the circumference away)
        assert rows[2]["dist_m"] > 19_000_000

    def test_all_null_and_empty_corpora(self, spark):
        from util_gis_spark.operators.dedup import (
            minhash_near_dup_pairs,
            simhash_near_dup_pairs,
        )

        nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
        assert minhash_near_dup_pairs(nulls).count() == 0
        assert simhash_near_dup_pairs(nulls).count() == 0
        assert minhash_near_dup_pairs(nulls.filter("doc_id < 0")).count() == 0

    def test_ann_empty_embeddings(self, spark):
        from util_gis_spark.operators.ann import ann_ivf_topk, ann_lsh_topk

        empty = spark.createDataFrame([], "vec_id long, label long, embedding array<float>")
        assert ann_lsh_topk(empty).count() == 0
        assert ann_ivf_topk(empty).count() == 0
