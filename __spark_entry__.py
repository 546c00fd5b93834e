"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: images -> cell-encode -> PIP join against the
                 polygon layer -> tile assignment -> per-polygon rollup.
queries()      — operator catalogue (util_gis_spark.queries).
oracle_sql()   — DuckDB oracle twins for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from util_gis_spark import datasets as D  # noqa: E402
from util_gis_spark import queries as Q  # noqa: E402
from util_gis_spark.operators import joins  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: spatial join +
    tile assignment over the image+caption table (the BASELINE.json
    headline pipeline), rolled up per polygon."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    images = D.images(spark, sf_dir)
    polys = D.polygons_wkt(spark, sf_dir)
    joined = joins.pip_join_hybrid(images, polys, res=16, carry_cols=["image_key", "w", "h"])
    tiled = joins.tile_assignment(joined, res=16)
    return (
        tiled.groupBy("polygon_id")
        .agg(
            F.countDistinct("image_key").alias("n_images"),
            F.countDistinct("tile").alias("n_tiles"),
            F.count("*").alias("n_assignments"),
        )
        .orderBy("polygon_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.catalogue()


def oracle_sql() -> dict[str, str]:
    # Q.oracles() also carries twins/pins for retired catalogue rows
    # (kept pytest-gated); the driver artifact records exactly the
    # catalogue's 50 keys, so the contract exposes exactly those.
    qs = set(Q.catalogue())
    return {k: v for k, v in Q.oracles().items() if k in qs}
