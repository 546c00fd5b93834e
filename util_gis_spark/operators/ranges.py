"""Polygon enter/exit interval tracking (PolygonTimeRange).

Reference (G:8550-8668): scan time-sorted points; per polygon, record
entry ts at false->true; at true->false emit (polygon, entry, current
ts) — i.e. the END is the timestamp of the FIRST point OUTSIDE; open
ranges close at the trajectory's last ts; output sorted by start.
getPolygonTimeRanges (G:8729-8763) then merges ranges of the same
polygon that are ADJACENT in that start-sorted order.

Set-oriented: PIP join gives the inside flag per (point, polygon);
maximal consecutive-rn runs are islands (rn - row_number); the island
end is max(coalesce(next_ts, ts)) which equals the exit point's ts or
the last ts. Pure window functions after the join — one shuffle per
step, no state machine."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import _check_reserved_cols, pip_join


def polygon_time_ranges(
    points_df: DataFrame, polygons_wkt_df: DataFrame, res: int | None = None
) -> DataFrame:
    """(device_id, polygon_id, start_ts, end_ts), reference split
    semantics (before adjacent merge).

    `res=None` routes through the pip_join planner's resolution
    heuristic (~128 cells per median polygon); the old hardcoded
    res=17 over-covered the sandbox layer ~16x (r6 review). res only
    sizes the filter grid — output is res-invariant."""
    _check_reserved_cols(points_df, ("rn", "next_ts", "island"), "polygon_time_ranges")
    w_dev = Window.partitionBy("device_id").orderBy("ts", "point_id")
    pts = (
        points_df.withColumn("rn", F.row_number().over(w_dev))
        .withColumn("next_ts", F.lead("ts").over(w_dev))
    )
    inside = pip_join(
        pts, polygons_wkt_df, res=res, carry_cols=["device_id", "point_id", "ts", "rn", "next_ts"]
    )
    w_isl = Window.partitionBy("device_id", "polygon_id").orderBy("rn")
    isl = inside.withColumn("island", F.col("rn") - F.row_number().over(w_isl))
    return (
        isl.groupBy("device_id", "polygon_id", "island")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max(F.coalesce("next_ts", "ts")).alias("end_ts"),
        )
        .drop("island")
    )


def polygon_time_ranges_sql(points_src: str, polygons_src: str) -> str:
    """DuckDB oracle twin (rectangle polygon layer: strict-interior
    containment is the BETWEEN predicate)."""
    return f"""
WITH pts AS (
  SELECT device_id, point_id, ts, lon, lat,
         row_number() OVER (PARTITION BY device_id ORDER BY ts, point_id) AS rn,
         lead(ts)     OVER (PARTITION BY device_id ORDER BY ts, point_id) AS next_ts
  FROM ({points_src})
), inside AS (
  SELECT p.device_id, p.ts, p.rn, p.next_ts, g.polygon_id
  FROM pts p JOIN ({polygons_src}) g
    ON p.lon > g.xmin AND p.lon < g.xmax AND p.lat > g.ymin AND p.lat < g.ymax
), isl AS (
  SELECT device_id, polygon_id, ts, next_ts,
         rn - row_number() OVER (PARTITION BY device_id, polygon_id ORDER BY rn) AS island
  FROM inside
)
SELECT device_id, polygon_id, min(ts) AS start_ts, max(coalesce(next_ts, ts)) AS end_ts
FROM isl GROUP BY device_id, polygon_id, island
"""


def merge_adjacent_ranges(ranges_df: DataFrame) -> DataFrame:
    """getPolygonTimeRanges: in global start order (per device), merge
    runs of the SAME polygon; end = max(end) over the run."""
    w = Window.partitionBy("device_id").orderBy("start_ts", "polygon_id")
    flagged = ranges_df.withColumn(
        "chg",
        F.when(
            F.lag("polygon_id").over(w).isNull()
            | (F.lag("polygon_id").over(w) != F.col("polygon_id")),
            1,
        ).otherwise(0),
    ).withColumn("grp", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        flagged.groupBy("device_id", "polygon_id", "grp")
        .agg(F.min("start_ts").alias("start_ts"), F.max("end_ts").alias("end_ts"))
        .drop("grp")
    )


def merge_adjacent_ranges_sql(ranges_src: str) -> str:
    return f"""
WITH flagged AS (
  SELECT device_id, polygon_id, start_ts, end_ts,
         CASE WHEN lag(polygon_id) OVER w IS NULL
                OR lag(polygon_id) OVER w <> polygon_id THEN 1 ELSE 0 END AS chg
  FROM ({ranges_src})
  WINDOW w AS (PARTITION BY device_id ORDER BY start_ts, polygon_id)
), grouped AS (
  SELECT device_id, polygon_id, start_ts, end_ts,
         sum(chg) OVER (PARTITION BY device_id ORDER BY start_ts, polygon_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
)
SELECT device_id, polygon_id, min(start_ts) AS start_ts, max(end_ts) AS end_ts
FROM grouped GROUP BY device_id, polygon_id, grp
"""


def points_in_time_range(points_df: DataFrame, ranges_df: DataFrame) -> DataFrame:
    """getGaussPointsByPolygonTimeRange (G:8899-8925): range-join
    start <= ts <= end per device."""
    return points_df.alias("p").join(
        ranges_df.alias("r"),
        (F.col("p.device_id") == F.col("r.device_id"))
        & F.col("p.ts").between(F.col("r.start_ts"), F.col("r.end_ts")),
        "inner",
    ).select("p.*", "r.polygon_id", "r.start_ts", "r.end_ts")
