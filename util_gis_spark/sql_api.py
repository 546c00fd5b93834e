"""SQL surface: register the engine's derived views and operator
results as temp views so everything is queryable with plain
``spark.sql`` — the migration path for reference users who want SQL
over their trajectories/images instead of the operator API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import datasets as D


def register(spark: SparkSession, sf_dir: str, with_operators: bool = True) -> list[str]:
    """Create temp views; returns the registered names.

    Base views: gps_points, images, polygons, field_trajectories and
    the raw tables. With ``with_operators``: filtered_points (quality
    filter), pip_pairs (hybrid PIP join), tiles (tile assignment) —
    each a lazily-planned DataFrame, so SQL over them composes into
    one Catalyst plan."""
    names = []
    for t in D.TABLES:
        D.load(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    D.gps_points(spark, sf_dir).createOrReplaceTempView("gps_points")
    D.images(spark, sf_dir).createOrReplaceTempView("images")
    D.polygons_wkt(spark, sf_dir).createOrReplaceTempView("polygons")
    D.field_trajectories(spark, sf_dir).createOrReplaceTempView("field_trajectories")
    names += ["gps_points", "images", "polygons", "field_trajectories"]

    if with_operators:
        from .operators import filters, joins

        filters.filter_wgs84_points(D.gps_points(spark, sf_dir)).createOrReplaceTempView(
            "filtered_points"
        )
        joins.pip_join_hybrid(
            D.images(spark, sf_dir),
            D.polygons_wkt(spark, sf_dir),
            res=16,
            carry_cols=["image_key", "w", "h"],
        ).createOrReplaceTempView("pip_pairs")
        joins.tile_assignment(D.images(spark, sf_dir), res=16).select(
            "image_key", "tile"
        ).createOrReplaceTempView("tiles")
        names += ["filtered_points", "pip_pairs", "tiles"]
    return names
