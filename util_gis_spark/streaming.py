"""Structured Streaming surface.

The reference is batch-only; its cadence/session windows (SURVEY §2.5)
are the batch analogue of event-time session windows. This module maps
the same semantics onto readStream -> session_window + watermark so
the engine can ingest live trajectories:

- session gap rule == splitClusterByTime's `dt > gap` cut, with one
  documented boundary difference: Spark session windows are
  half-open ([start, last+gap)), so a step of EXACTLY `gap` seconds
  starts a new session, while the batch rule keeps it (`>` vs `>=`).
  Tests use data away from the exact boundary.
- late data handled by the watermark; state eviction is automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gps_point_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-based stream over the events table (the sandbox stand-in
    for a Kafka topic of GPS reports), derived to the gps_points shape
    with the same deterministic rules as datasets.gps_points."""
    import hashlib
    import os

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # file streams need a DIRECTORY source: stage a symlink dir
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stage = f"/tmp/util_gis_spark_stream_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )
    k = F.col("event_id")
    kq = k % 2000
    return stream.select(
        (F.col("user_id") % 50).alias("device_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        (116.0 + ((kq * 7919) % 100000) / 250000.0).alias("lon"),
        (39.5 + ((kq * 104729) % 100000) / 250000.0).alias("lat"),
    )


def sessionize_stream(
    points_stream: DataFrame,
    gap: str = "300 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time session windows per device: the streaming form of
    splitClusterByTime (G:2864-2932)."""
    return (
        points_stream.withWatermark("ts", watermark)
        .groupBy("device_id", F.session_window("ts", gap).alias("session"))
        .agg(
            F.count("*").alias("n_points"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .select("device_id", "n_points", "start_ts", "end_ts")
    )


def tile_count_stream(points_stream: DataFrame, res: int = 14, watermark: str = "10 minutes") -> DataFrame:
    """Streaming tile rollup: images/points per cell per 5-minute
    tumbling window — the live ingestion counterpart of the batch
    tile-assignment rollup."""
    from .geo.cells import cell_expr

    return (
        points_stream.withWatermark("ts", watermark)
        .withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), res))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "cell")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "cell", "n")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Complete-mode execution into an in-memory table (tests/demos):
    processes everything available, stops, returns the result."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    return spark.table(name)
