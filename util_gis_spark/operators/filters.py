"""Row-level quality filters (GisUtil G:10886-10947, G:13709-13716).

All pure Column expressions — fully codegen'd, pushed to the scan by
Catalyst where possible. Set-oriented reformulation: the reference
filters one in-memory List<Wgs84Point>; here the same rules run over
the whole fleet partitioned by device.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import _check_reserved_cols

MIN_SPEED_KMH = 0.1  # G:628
MAX_SPEED_KMH = 18.0  # G:642


def filter_wgs84_points(df: DataFrame) -> DataFrame:
    """5-rule quality filter + per-device exact-duplicate drop.

    Rules (G:10886-10947): ts non-null; lon/lat != 0.0; lon in
    [-180,180], lat in [-90,90]; gps_status in {0,1}; job_status in
    {0,1}; then sort by ts and drop exact (lon,lat) duplicates keeping
    the FIRST by time (G:10933-10940). Dup-drop is per device — the
    set-oriented analogue of the reference's per-trajectory scan.
    """
    _check_reserved_cols(df, ("_rn",), "filter_wgs84_points")
    f = df.filter(
        F.col("ts").isNotNull()
        & (F.col("lon") != 0.0) & (F.col("lat") != 0.0)
        & F.col("lon").between(-180.0, 180.0)
        & F.col("lat").between(-90.0, 90.0)
        & F.col("gps_status").isin(0, 1)
        & F.col("job_status").isin(0, 1)
    )
    w = Window.partitionBy("device_id", "lon", "lat").orderBy("ts", "point_id")
    return f.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


FILTER_WGS84_SQL_TEMPLATE = """
SELECT * EXCLUDE (_rn) FROM (
  SELECT *, row_number() OVER (PARTITION BY device_id, lon, lat ORDER BY ts, point_id) AS _rn
  FROM ({src})
  WHERE ts IS NOT NULL
    AND lon <> 0.0 AND lat <> 0.0
    AND lon BETWEEN -180.0 AND 180.0
    AND lat BETWEEN -90.0 AND 90.0
    AND gps_status IN (0, 1)
    AND job_status IN (0, 1)
) WHERE _rn = 1
"""


def speed_filter(df: DataFrame) -> DataFrame:
    """Keep MIN_SPEED <= speed <= MAX_SPEED km/h, NULL passes
    (G:13709-13716)."""
    return df.filter(
        F.col("speed").isNull() | F.col("speed").between(MIN_SPEED_KMH, MAX_SPEED_KMH)
    )


def speed_filter_sql(src: str) -> str:
    return (
        f"SELECT * FROM ({src}) "
        f"WHERE speed IS NULL OR (speed >= {MIN_SPEED_KMH} AND speed <= {MAX_SPEED_KMH})"
    )
