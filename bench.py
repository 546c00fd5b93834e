"""Benchmark harness: headline = images/sec through spatial-join +
tile-assignment (the BASELINE.json metric), plus the other engine
pillars (cell-join PIP, kNN, GPS pipeline, dedup/text, ANN).

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "images_per_sec": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local cores (default 32)
  BENCH_IMAGE_FACTOR   images replication factor (default 100 ->
                       500k images at sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from util_gis_spark import datasets as D
from util_gis_spark.operators import filters, joins, trajectory
from util_gis_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("BENCH_IMAGE_FACTOR", "400"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # bench image table: same deterministic rows as images_scaled (see
    # tests) but generated straight from spark.range — the stand-in for
    # a well-partitioned Iceberg scan, no repartition shuffle needed.
    n_docs = D.load(spark, sf_dir, "documents").count()
    n_images = n_docs * factor
    images = D.images_range(spark, n_images, cpus * 2)
    polys = D.polygons_wkt(spark, sf_dir)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    # warm up JVM codegen + Python UDF workers + Arrow once, untimed
    joins.pip_join_hybrid(
        D.images_range(spark, 50000, 4), polys, carry_cols=["image_key"]
    ).count()

    def run(name, fn, reps: int = 1):
        # this sandbox has heavy co-tenant interference: min-of-reps is
        # the capability number (reps>1 for the headline)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            counts[name] = fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)

    # --- headline: spatial join + tile assignment over the image table.
    # carry_cols prunes the wide payload (caption) out of the Arrow
    # path — mapInPandas is opaque to Catalyst's column pruning.
    CARRY = ["image_key", "w", "h"]

    def headline():
        joined = joins.pip_join_hybrid(images, polys, res=18, carry_cols=CARRY)
        tiled = joins.tile_assignment(joined, res=16)
        return tiled.groupBy("polygon_id").agg(F.count("*").alias("n")).count()

    run("spatial_join_tile_assign", headline, reps=3)

    if os.environ.get("BENCH_ONLY") == "headline":
        _emit(sf, cpus, factor, n_images, timings, counts)
        return

    # --- large-large flavor: cell equi-join PIP, shuffled cell map
    # (the non-broadcast path + AQE skew handling)
    run(
        "pip_join_cells",
        lambda: joins.pip_join_hybrid(
            images, polys, res=18, carry_cols=CARRY, broadcast_cellmap=False
        ).count(),
        reps=2,
    )

    # --- kNN join: nearest polygon center for every image
    centers = [
        (int(r["polygon_id"]), (r["xmin"] + r["xmax"]) / 2.0, (r["ymin"] + r["ymax"]) / 2.0)
        for r in D.polygons(spark, sf_dir).collect()
    ]
    run("knn_join", lambda: joins.knn_join_broadcast(images, centers).count(), reps=2)

    # --- grid-index kNN at a skewed probe:candidate ratio (500k x ~13k):
    # the shuffle ladder is pathological here (one rep of the 2M job
    # did not finish in 10 min); the broadcast grid kernel is the
    # planner's choice. 500k probes keeps the row bounded under
    # co-tenant load; the kernel is linear in probes.
    def knn_grid():
        cand_df = filters.filter_wgs84_points(D.gps_points(spark, sf_dir)).select(
            F.col("point_id").alias("cand_id"), "lon", "lat"
        )
        probes = D.images_range(spark, 500_000, cpus).select(
            F.col("image_key").alias("probe_id"), "lon", "lat"
        )
        return joins.knn_join(probes, cand_df).count()

    run("knn_join_grid", knn_grid, reps=2)

    # --- GPS trajectory pipeline: filter -> sessionize -> mileage
    def gps_pipeline():
        pts = filters.filter_wgs84_points(D.gps_points(spark, sf_dir))
        return trajectory.great_circle_mileage(pts).count() + trajectory.session_summary(pts).count()

    run("gps_pipeline", gps_pipeline, reps=2)

    # --- text dedup + quality over documents
    def text_ops():
        from util_gis_spark.queries import q_docs_dedup_exact, q_docs_token_stats

        return q_docs_dedup_exact(spark, sf_dir).count() + q_docs_token_stats(spark, sf_dir).count()

    run("text_ops", text_ops, reps=2)

    # --- ANN brute-force cosine top-k over embeddings
    def ann():
        from util_gis_spark.queries import q_embed_topk

        return q_embed_topk(spark, sf_dir).count()

    run("ann_topk", ann, reps=2)

    # --- MinHash-LSH near-dup pairs over documents
    def minhash():
        from util_gis_spark.operators.dedup import minhash_near_dup_pairs

        return minhash_near_dup_pairs(D.load(spark, sf_dir, "documents")).count()

    run("minhash_dedup", minhash, reps=2)

    # --- plot construction composite (splitRoad) over field trajectories
    def plots():
        from util_gis_spark.operators.plots import split_road

        return split_road(D.field_trajectories(spark, sf_dir), working_width=3.0).count()

    run("split_road", plots, reps=2)

    # --- same composite at realistic group cardinality: 320 devices
    # (vs the oracle fixture's 10) — grouped-map parallelism must track
    # the group count, since one device = one task is the unit of
    # parallelism at warehouse scale
    def plots_many():
        from util_gis_spark.operators.plots import split_road

        return split_road(
            D.field_trajectories_many(spark, sf_dir, n_devices=320), working_width=3.0
        ).count()

    run("split_road_320dev", plots_many, reps=2)

    # --- 10x data-growth ladder (VERDICT r2 'Next round' #7): the same
    # two spatial jobs at sf1-equivalent image volume (10x rows from the
    # same deterministic generator — documents/events are driver-
    # provided and stop at sf0.1, but the image fact table IS the
    # headline's input). A ~10x time ratio at 10x rows is the linear-
    # slope evidence for the 100-TB argument; the slope is emitted as
    # scale_slope_10x per query. Disable with BENCH_SKIP_LADDER=1.
    if not os.environ.get("BENCH_SKIP_LADDER"):
        images10 = D.images_range(spark, n_images * 10, cpus * 4)
        run(
            "spatial_join_tile_assign_10x",
            lambda: joins.tile_assignment(
                joins.pip_join_hybrid(images10, polys, res=18, carry_cols=CARRY), res=16
            ).groupBy("polygon_id").agg(F.count("*").alias("n")).count(),
            reps=2,
        )
        run(
            "pip_join_cells_10x",
            lambda: joins.pip_join_hybrid(
                images10, polys, res=18, carry_cols=CARRY, broadcast_cellmap=False
            ).count(),
            reps=2,
        )

    _emit(sf, cpus, factor, n_images, timings, counts)


def _emit(sf, cpus, factor, n_images, timings, counts):
    headline_sec = timings["spatial_join_tile_assign"]
    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assign_sec",
                "value": headline_sec,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_images": n_images,
                "images_per_sec": round(n_images / headline_sec, 1) if headline_sec else None,
                "cpus": cpus,
                "image_factor": factor,
                "row_counts": counts,
                "scale_slope_10x": {
                    q: round(timings[f"{q}_10x"] / timings[q], 2)
                    for q in ("spatial_join_tile_assign", "pip_join_cells")
                    if f"{q}_10x" in timings and timings.get(q)
                },
            }
        )
    )


if __name__ == "__main__":
    main()
