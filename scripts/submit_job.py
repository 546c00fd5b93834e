"""spark-submit entry point: the flagship spatial-join + tiling job,
checkpointed and resumable. Run via scripts/submit_demo.sh:

    spark-submit --py-files util_gis_spark.zip scripts/submit_job.py \
        [sf_dir] [checkpoint_root]

Prints the per-stage manifest (rows / bytes / resumed) as JSON.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/util_gis_ckpt"

    spark = SparkSession.builder.appName("util_gis_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from util_gis_spark import datasets as D
    from util_gis_spark.io.checkpoint import CheckpointedPipeline
    from util_gis_spark.operators import joins

    pipe = CheckpointedPipeline(spark, root)
    pipe.stage("images", lambda: D.images(spark, sf_dir))
    pipe.stage(
        "pip_join",
        lambda images: joins.pip_join_hybrid(
            images,
            D.polygons_wkt(spark, sf_dir),
            res=16,
            carry_cols=["image_key", "w", "h"],
        ),
        deps=["images"],
    )
    pipe.stage(
        "tiles",
        lambda joined: joins.tile_assignment(joined, res=16),
        deps=["pip_join"],
    )
    pipe.stage(
        "rollup",
        lambda tiles: tiles.groupBy("polygon_id").agg(
            F.countDistinct("image_key").alias("n_images"),
            F.countDistinct("tile").alias("n_tiles"),
        ),
        deps=["tiles"],
    )
    print(json.dumps(pipe.manifest()))
    spark.stop()


if __name__ == "__main__":
    main()
