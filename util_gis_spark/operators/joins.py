"""Spatial joins: the engine's core custom physical operators.

The reference implements filter-refine point-in-polygon with an
in-memory STRtree envelope query (coarse, G:5736-5767) and
PreparedGeometry.contains (refine, G:5870-5936), and kNN with an
STRtree + progressive tolerance ladder (G:3184-3416, G:471). The
distributed re-expression:

- **broadcast PIP** (small polygon side): polygons ship with the task
  closure; one mapInPandas over the points — zero shuffle. Coarse
  phase inside the kernel = vectorized envelope mask (the STRtree
  analogue); refine = vectorized ray casting (strict interior,
  matching JTS contains at G:5916).
- **cell sort-merge PIP** (large-large): polygons explode to their
  covering cells (cover_bbox of the envelope), points cell-encode with
  the same resolution, equi-join on cell (Catalyst picks SMJ/shuffled
  hash; AQE splits skewed cells), then the same vectorized refine on
  the joined candidates. Salting for hot cells is available via
  `salt_buckets`.
- **kNN join**: candidates broadcast, per-batch numpy brute force with
  envelope pre-cut — the set form of findClosestPointList; the
  progressive tolerance ladder (G:3503-3563) becomes an upper bound
  `max_dist_m` filter after the exact min.
- **tile assignment**: each image footprint (point + pixel-derived
  bbox) explodes to its covering tile set — pure Column arithmetic
  (sequence + explode), no UDF at all.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells
from ..geo.geometry import geom_envelope, parse_wkt, points_in_geom
from ..geo.sphere import np_haversine


def _collect_polygons(polygons_wkt_df: DataFrame) -> list[tuple]:
    """Materialize the SMALL polygon side for broadcast: (id, parsed,
    envelope). The collect here is the moral equivalent of Spark's own
    broadcast-exchange build side — only ever the dimension table."""
    rows = polygons_wkt_df.select("polygon_id", "wkt").collect()
    out = []
    for r in rows:
        parsed = parse_wkt(r["wkt"])
        env = geom_envelope(parsed)
        if env is not None:
            out.append((r["polygon_id"], parsed, env))
    return out


def pip_join_broadcast(
    points_df: DataFrame,
    polygons_wkt_df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Inner PIP join, broadcast flavor. Output: points columns +
    polygon_id (one row per (point, containing polygon))."""
    polys = _collect_polygons(polygons_wkt_df)
    schema = T.StructType(points_df.schema.fields + [T.StructField("polygon_id", T.LongType())])

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            outs = []
            for pid, parsed, (x0, y0, x1, y1) in polys:
                # coarse: envelope mask (vectorized STRtree analogue)
                m = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                hit = points_in_geom(px[idx], py[idx], parsed)
                if hit.any():
                    sub = pdf.iloc[idx[hit]].copy()
                    sub["polygon_id"] = np.int64(pid)
                    outs.append(sub)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return points_df.mapInPandas(refine, schema=schema)


def polygon_cover_cells(polygons_wkt_df: DataFrame, res: int) -> DataFrame:
    """Explode each polygon to the cells covering its envelope
    (coarse cover; exact refine happens after the join)."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover(wkts: pd.Series) -> pd.Series:
        out = []
        for w in wkts:
            env = geom_envelope(parse_wkt(w))
            out.append([] if env is None else cells.cover_bbox(*env, res).tolist())
        return pd.Series(out)

    return polygons_wkt_df.withColumn("cell", F.explode(cover(F.col("wkt"))))


def pip_join_cells(
    points_df: DataFrame,
    polygons_wkt_df: DataFrame,
    res: int = cells.DEFAULT_RES,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt_buckets: int = 0,
) -> DataFrame:
    """Inner PIP join, cell equi-join flavor (large-large path).

    Shuffles both sides once on the cell key; AQE handles residual
    skew; `salt_buckets > 0` additionally salts the point side and
    explodes the polygon side x k for pathological hot cells."""
    pts = points_df.withColumn("cell", cells.cell_expr(F.col(lon_col), F.col(lat_col), res))
    pol = polygon_cover_cells(polygons_wkt_df, res)
    if salt_buckets > 0:
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(lon_col, lat_col), F.lit(salt_buckets)))
        pol = pol.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
        keys = ["cell", "salt"]
    else:
        keys = ["cell"]
    cand = pts.join(pol.select(*keys, "polygon_id", "wkt"), on=keys, how="inner")

    out_fields = [f for f in points_df.schema.fields] + [T.StructField("polygon_id", T.LongType())]
    schema = T.StructType(out_fields)
    pt_cols = [f.name for f in points_df.schema.fields]

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            for wkt, grp in pdf.groupby("wkt", sort=False):
                parsed = cache.get(wkt)
                if parsed is None:
                    parsed = cache[wkt] = parse_wkt(wkt)
                idx = grp.index.to_numpy()
                pos = pdf.index.get_indexer(idx)
                keep[pos] = points_in_geom(px[pos], py[pos], parsed)
            if keep.any():
                yield pdf.loc[keep, pt_cols + ["polygon_id"]]

    return cand.mapInPandas(refine, schema=schema)


def knn_join_broadcast(
    probes_df: DataFrame,
    candidates: list[tuple],
    probe_id_col: str = "image_key",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_dist_m: float | None = None,
) -> DataFrame:
    """Nearest-candidate join. `candidates` = [(cand_id, lon, lat)].
    Per Arrow batch: full vectorized haversine matrix (P x C) -> argmin
    with deterministic tie-break on cand_id (candidates pre-sorted, and
    np.argmin keeps the first minimum). Equivalent row set to the
    reference's findClosestPointList (G:12269-12296); `max_dist_m` is
    the tolerance cap (G:12151-12196 keeps min dist <= tolerance)."""
    cand = sorted(candidates)
    cid = np.array([c[0] for c in cand], dtype=np.int64)
    clon = np.array([c[1] for c in cand], dtype=np.float64)
    clat = np.array([c[2] for c in cand], dtype=np.float64)

    schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("nearest_id", T.LongType()),
            T.StructField("dist_m", T.DoubleType()),
        ]
    )

    def nearest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[lon_col].to_numpy(np.float64)[:, None]
            py = pdf[lat_col].to_numpy(np.float64)[:, None]
            d = np_haversine(px, py, clon[None, :], clat[None, :])
            j = np.argmin(d, axis=1)
            dist = d[np.arange(len(pdf)), j]
            out = pd.DataFrame(
                {
                    "probe_id": pdf[probe_id_col].to_numpy(np.int64),
                    "nearest_id": cid[j],
                    "dist_m": dist,
                }
            )
            if max_dist_m is not None:
                out = out[out["dist_m"] <= max_dist_m]
            yield out

    return probes_df.select(probe_id_col, lon_col, lat_col).mapInPandas(nearest, schema=schema)


def tile_cover_exprs(lon: str, lat: str, half_w_deg: str, half_h_deg: str, res: int):
    """Column expressions for the ix/iy ranges of a bbox cover — shared
    by tile_assignment and its SQL oracle twin."""
    n = float(1 << res)
    nmax = int(n) - 1

    def ix(e):
        return F.greatest(F.least(F.floor((e + 180.0) / 360.0 * n), F.lit(float(nmax))), F.lit(0.0)).cast("long")

    def iy(e):
        return F.greatest(F.least(F.floor((e + 90.0) / 180.0 * n), F.lit(float(nmax))), F.lit(0.0)).cast("long")

    lo, la = F.col(lon), F.col(lat)
    hw, hh = F.expr(half_w_deg), F.expr(half_h_deg)
    return ix(lo - hw), ix(lo + hw), iy(la - hh), iy(la + hh)


def tile_assignment(
    images_df: DataFrame,
    res: int = 16,
    id_col: str = "image_key",
) -> DataFrame:
    """Raster<->vector tiling: each image's ground footprint (a bbox of
    w*1e-6 x h*1e-6 degrees around its lon/lat — deterministic
    pixel->ground rule) maps to its covering tile set at `res`.
    Pure Column arithmetic: sequence + explode, no UDF, no shuffle."""
    ix0, ix1, iy0, iy1 = tile_cover_exprs("lon", "lat", "w * 1e-6", "h * 1e-6", res)
    return (
        images_df.withColumn("_ix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("_iy", F.explode(F.sequence(iy0, iy1)))
        .withColumn(
            "tile",
            F.lit(res).cast("long") * F.lit(cells.RES_SHIFT) + F.col("_ix") * F.lit(cells.IX_SHIFT) + F.col("_iy"),
        )
        .drop("_ix", "_iy")
    )


def tile_assignment_sql(images_src: str, res: int = 16) -> str:
    """DuckDB oracle twin of tile_assignment (generate_series in SQL)."""
    n = float(1 << res)
    nmax = (1 << res) - 1

    def ix(e):
        return f"greatest(least(cast(floor((({e})+180.0)/360.0*{n}) as bigint), {nmax}), 0)"

    def iy(e):
        return f"greatest(least(cast(floor((({e})+90.0)/180.0*{n}) as bigint), {nmax}), 0)"

    return f"""
SELECT i.*, cast({res} as bigint)*{cells.RES_SHIFT} + gx.ix*{cells.IX_SHIFT} + gy.iy AS tile
FROM ({images_src}) i,
     LATERAL (SELECT unnest(generate_series({ix('i.lon - i.w * 1e-6')}, {ix('i.lon + i.w * 1e-6')})) AS ix) gx,
     LATERAL (SELECT unnest(generate_series({iy('i.lat - i.h * 1e-6')}, {iy('i.lat + i.h * 1e-6')})) AS iy) gy
"""
