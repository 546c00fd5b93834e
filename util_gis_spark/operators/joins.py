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
  covering cells classified inside/boundary, points cell-encode with
  the same resolution, equi-join on cell (Catalyst picks SMJ/shuffled
  hash; AQE splits skewed cells). Interior-cell candidates are
  accepted outright; boundary-cell candidates are refined by a
  JVM-side ray cast (higher-order aggregate over the polygon's edge
  array — no Python worker, no Arrow, ONE scan of the fact table).
  Salting for hot cells is available via `salt_buckets`.
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
from pyspark.sql import DataFrame, Window
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


def _check_reserved_cols(df: DataFrame, reserved: tuple, op: str) -> None:
    """Fail loud instead of silently clobbering: the join flavors
    attach internal/output columns with withColumn, which REPLACES an
    existing column of the same name — a point table already carrying
    e.g. its own 'cell' would come back with the internal join key in
    that column (r5 review finding). carry_cols pruning runs first, so
    callers can simply not carry the clashing column."""
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"{op}: input column(s) {clash} collide with internal/output "
            f"column names {list(reserved)} — rename them or leave them "
            f"out of carry_cols"
        )


def pip_join_broadcast(
    points_df: DataFrame,
    polygons_wkt_df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Inner PIP join, broadcast flavor. Output: carried point columns
    + polygon_id (one row per (point, containing polygon)).

    `carry_cols` is an explicit column-pruning knob: mapInPandas is
    opaque to Catalyst, so wide payloads (captions, bytes) must not
    enter the Arrow path — pass only what downstream needs. Default:
    all columns (reference semantics)."""
    if carry_cols is not None:
        cols = list(dict.fromkeys(carry_cols + [lon_col, lat_col]))
        points_df = points_df.select(*cols)
    _check_reserved_cols(points_df, ("polygon_id",), "pip_join_broadcast")
    polys = _collect_polygons(polygons_wkt_df)
    schema = T.StructType(points_df.schema.fields + [T.StructField("polygon_id", T.LongType())])

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            row_ix: list[np.ndarray] = []
            pid_out: list[np.ndarray] = []
            for pid, parsed, (x0, y0, x1, y1) in polys:
                # coarse: envelope mask (vectorized STRtree analogue)
                m = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                hit = points_in_geom(px[idx], py[idx], parsed)
                if hit.any():
                    row_ix.append(idx[hit])
                    pid_out.append(np.full(int(hit.sum()), pid, dtype=np.int64))
            if row_ix:
                rows = np.concatenate(row_ix)
                out = pdf.take(rows)
                out["polygon_id"] = np.concatenate(pid_out)
                yield out

    return points_df.mapInPandas(refine, schema=schema)


# the shared flattener lives next to parse_wkt (r6 review: this module
# and geometry_ops.py carried identical copies)
from ..geo.geometry import geom_polys as _polys_from_parsed  # noqa: E402


def _edge_parts_from_parsed(parsed) -> list[list[tuple[float, float, float, float]]]:
    """Ring edges grouped BY POLYGONAL PART: one (x1, y1, x2, y2) list
    per part, each flattening that part's exterior + hole rings.
    Within a part, even-odd parity over its combined rings IS strict
    polygon-with-holes containment; across parts the ray cast ORs the
    per-part results (union semantics). r2 flattened ALL parts into one
    parity test, which mis-excluded points covered by an even number of
    OVERLAPPING collection parts (VERDICT r2 'What's missing' #4) —
    valid MULTIPOLYGONs were unaffected, arbitrary user WKT was not."""
    parts: list[list[tuple[float, float, float, float]]] = []
    for rings in _polys_from_parsed(parsed):
        edges: list[tuple[float, float, float, float]] = []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 2:
                continue
            closed = bool((r[0] == r[-1]).all())
            seq = r if closed else np.vstack([r, r[:1]])
            for i in range(len(seq) - 1):
                edges.append(
                    (float(seq[i, 0]), float(seq[i, 1]), float(seq[i + 1, 0]), float(seq[i + 1, 1]))
                )
        if edges:
            parts.append(edges)
    return parts


def _edge_count_from_parsed(parsed) -> int:
    """Total refine-edge count WITHOUT materializing the per-edge tuple
    lists — the pip_join planner only needs the count for its bytes
    estimate (r5 review: it used to allocate ~2M tuples at 4k polygons
    x 500 vertices just to multiply by 32)."""
    n = 0
    for rings in _polys_from_parsed(parsed):
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 2:
                continue
            n += len(r) - 1 if bool((r[0] == r[-1]).all()) else len(r)
    return n


EDGES_TYPE = T.ArrayType(  # array of parts, each an edge array
    T.ArrayType(
        T.StructType(
            [
                T.StructField("x1", T.DoubleType()),
                T.StructField("y1", T.DoubleType()),
                T.StructField("x2", T.DoubleType()),
                T.StructField("y2", T.DoubleType()),
            ]
        )
    )
)


def raycast_inside_expr(px, py, parts):
    """Strict-interior point-in-geometry as a pure Column expression
    over an `EDGES_TYPE` (array-of-parts) payload: the point is inside
    iff SOME polygonal part contains it strictly — per part, even-odd
    crossing parity AND not on any of that part's edges. This is the
    exact JVM twin of geo.geometry.points_in_geom (points_in_polygon
    OR-ed across parts), evaluated by Catalyst's higher-order
    functions. No Python worker, no Arrow; this is what lets the PIP
    joins refine boundary candidates in the SAME stage that accepted
    interior candidates (single scan of the fact table).

    Matches the numpy kernel exactly: a horizontal edge makes the
    parity condition false before the (NULL) intercept comparison is
    reached, the on-edge test is exact-zero cross product within the
    segment bbox (the polygon layers keep vertices off the point
    lattice, see datasets._EDGE_OFF), and overlapping collection parts
    get union semantics via the per-part OR."""
    def _crossing(acc, e):
        xint = e["x1"] + (py - e["y1"]) * (e["x2"] - e["x1"]) / (e["y2"] - e["y1"])
        c = ((e["y1"] > py) != (e["y2"] > py)) & (px < xint)
        return acc + F.when(c, 1).otherwise(0)

    def _on_edge(e):
        cross = (e["x2"] - e["x1"]) * (py - e["y1"]) - (e["y2"] - e["y1"]) * (px - e["x1"])
        return (
            (cross == 0.0)
            & (px >= F.least(e["x1"], e["x2"]))
            & (px <= F.greatest(e["x1"], e["x2"]))
            & (py >= F.least(e["y1"], e["y2"]))
            & (py <= F.greatest(e["y1"], e["y2"]))
        )

    def _part_inside(edges):
        crossings = F.aggregate(edges, F.lit(0), _crossing)
        return (crossings % 2 == 1) & ~F.exists(edges, _on_edge)

    return F.exists(parts, _part_inside)


def classify_polygon_cells(parsed, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Partition a polygon's covering cells into (fully_inside,
    boundary) at resolution `res`. A cell is fully inside iff no ring
    edge passes through it (grid supercover) and all 4 of its corners
    are strictly inside — then every point in the cell is inside
    (Jordan curve), so the join can accept it JVM-side with no exact
    test. Everything else overlapping the envelope is `boundary` and
    goes to the vectorized ray-cast refine. Conservative by
    construction: misclassification can only move cells from `inside`
    to `boundary` (costing speed, never correctness)."""
    env = geom_envelope(parsed)
    if env is None:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    cover = cells.cover_bbox(*env, res)
    polys = _polys_from_parsed(parsed)
    edge_cells: set[int] = set()
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            for i in range(len(r) - 1):
                edge_cells |= cells.segment_cells(r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1], res)
    is_edge = np.isin(cover, np.fromiter(edge_cells, dtype=np.int64, count=len(edge_cells)))
    # corner test for non-edge cells
    resv, ix, iy = cells.np_decode(cover)
    n = 1 << res
    w, h = 360.0 / n, 180.0 / n
    x0 = -180.0 + ix * w
    y0 = -90.0 + iy * h
    cx = np.concatenate([x0, x0 + w, x0 + w, x0])
    cy = np.concatenate([y0, y0, y0 + h, y0 + h])
    corner_in = points_in_geom(cx, cy, parsed).reshape(4, -1).all(axis=0)
    inside = cover[~is_edge & corner_in]
    boundary = cover[is_edge | (~is_edge & ~corner_in)]
    return inside, boundary


def pip_join_hybrid(
    points_df: DataFrame,
    polygons_wkt_df: DataFrame,
    res: int = 17,
    lon_col: str = "lon",
    lat_col: str = "lat",
    carry_cols: list[str] | None = None,
    broadcast_cellmap: bool = True,
    refine: str = "jvm",
) -> DataFrame:
    """Filter-refine PIP join with interior-cell fast accept (the
    engine's flagship physical strategy) — ONE scan of the fact table.

    Phase 1 (all JVM, whole-stage codegen): points cell-encode; an
    equi-join against the broadcast cell map (cell -> polygon_id,
    inside?) produces candidates tagged interior/boundary.
    Phase 2 (same stage): interior candidates are accepted outright
    (`when(_inside, true)` — the exact test is skipped entirely);
    boundary candidates are refined by `raycast_inside_expr` over the
    polygon's broadcast edge array — JVM higher-order functions, no
    Python worker. The whole join is scan -> 2 broadcast hash joins ->
    filter, with no DAG diamond (round-1 branched accepted/band and
    scanned the fact table twice; this is the single-scan fix).

    This strictly dominates the reference's design (STRtree envelope
    coarse + exact contains on EVERY candidate, G:5736-5936): the
    interior-cell accept eliminates the exact test for interior hits,
    and the boundary refine is the same O(edges) JVM cost as JTS
    contains. Set `broadcast_cellmap=False` to shuffle-join the cell
    map instead (large polygon side); `refine="arrow"` keeps a
    pass-through Arrow kernel variant (numpy ray cast; used by the
    equivalence tests and as a fallback for exotic geometry)."""
    if carry_cols is not None:
        cols = list(dict.fromkeys(carry_cols + [lon_col, lat_col]))
        points_df = points_df.select(*cols)
    _check_reserved_cols(
        points_df, ("cell", "_inside", "_edges", "polygon_id"), "pip_join_hybrid"
    )
    spark = points_df.sparkSession
    polys = _collect_polygons(polygons_wkt_df)

    cell_parts: list[np.ndarray] = []
    pid_parts: list[np.ndarray] = []
    inside_parts: list[np.ndarray] = []
    edge_rows = []
    refine_wkts: dict[int, object] = {}
    for pid, parsed, _env in polys:
        inside, boundary = classify_polygon_cells(parsed, res)
        n_in, n_bd = len(inside), len(boundary)
        if n_in + n_bd:
            cell_parts.append(np.concatenate([inside, boundary]))
            pid_parts.append(np.full(n_in + n_bd, int(pid), dtype=np.int64))
            inside_parts.append(
                np.concatenate([np.ones(n_in, dtype=bool), np.zeros(n_bd, dtype=bool)])
            )
        refine_wkts[int(pid)] = parsed
        if n_bd:
            edge_rows.append((int(pid), _edge_parts_from_parsed(parsed)))
    # the cell map ships driver -> JVM as ONE Arrow table built from
    # numpy columns (r7): at fine resolutions it holds ~10^5 rows, and
    # materializing those as Python tuples for createDataFrame cost
    # ~0.5 s PER CALL (a third of the whole headline join) against
    # ~0.1 s for the Arrow path — same rows, same schema.
    cellmap_schema = T.StructType(
        [
            T.StructField("cell", T.LongType(), False),
            T.StructField("polygon_id", T.LongType(), False),
            T.StructField("_inside", T.BooleanType(), False),
        ]
    )
    if cell_parts:
        cellmap_pdf = pd.DataFrame(
            {
                "cell": np.concatenate(cell_parts),
                "polygon_id": np.concatenate(pid_parts),
                "_inside": np.concatenate(inside_parts),
            }
        )
        cellmap = spark.createDataFrame(cellmap_pdf, schema=cellmap_schema)
    else:
        cellmap = spark.createDataFrame([], cellmap_schema)
    if broadcast_cellmap:
        cellmap = F.broadcast(cellmap)

    pts = points_df.withColumn("cell", cells.cell_expr(F.col(lon_col), F.col(lat_col), res))
    cand = pts.join(cellmap, on="cell", how="inner")
    out_cols = [c for c in points_df.columns] + ["polygon_id"]

    if refine == "jvm":
        edges_df = spark.createDataFrame(
            edge_rows,
            T.StructType(
                [T.StructField("polygon_id", T.LongType()), T.StructField("_edges", EDGES_TYPE)]
            ),
        )
        j = cand.join(F.broadcast(edges_df), on="polygon_id", how="left")
        keep = F.when(F.col("_inside"), F.lit(True)).otherwise(
            raycast_inside_expr(F.col(lon_col), F.col(lat_col), F.col("_edges"))
        )
        return j.filter(keep).select(*out_cols)

    # Arrow fallback: single pass-through kernel (interior rows skip the
    # numpy ray cast but still cross the Arrow boundary once)
    schema = T.StructType(points_df.schema.fields + [T.StructField("polygon_id", T.LongType())])
    narrowed = cand.select(*out_cols, "_inside")

    def refine_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = pdf["_inside"].to_numpy(bool).copy()
            band = np.flatnonzero(~keep)
            if len(band):
                px = pdf[lon_col].to_numpy(np.float64)
                py = pdf[lat_col].to_numpy(np.float64)
                sub = pdf.iloc[band]
                for pid, grp_idx in sub.groupby("polygon_id", sort=False).indices.items():
                    parsed = refine_wkts.get(int(pid))
                    if parsed is None:
                        continue
                    rows_ix = band[grp_idx]
                    keep[rows_ix] = points_in_geom(px[rows_ix], py[rows_ix], parsed)
            if keep.any():
                yield pdf.loc[keep, out_cols]

    return narrowed.mapInPandas(refine_fn, schema=schema)


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


def polygon_cells_classified(
    polygons_wkt_df: DataFrame, res: int, with_edges: bool = True
) -> DataFrame:
    """(polygon_id, cell, _inside[, _edges]): every covering cell of
    each polygon, classified interior/boundary; with `with_edges`,
    boundary rows carry the polygon's per-part edge arrays (null on
    interior rows — the downstream ray cast never runs there). The
    classification runs once per POLYGON (the small-in-rows,
    maybe-large-in-total side), so the per-point refine cost is paid
    only where a cell truly straddles a boundary. With `with_edges`
    the edge arrays are duplicated per boundary cell through the cell
    shuffle; `with_edges=False` emits the narrow map for the
    broadcast-edges join flavor (see pip_join_cells attach_edges)."""
    fields = [
        T.StructField("polygon_id", T.LongType()),
        T.StructField("cell", T.LongType()),
        T.StructField("_inside", T.BooleanType()),
    ]
    if with_edges:
        fields.append(T.StructField("_edges", EDGES_TYPE))
    out_schema = T.StructType(fields)

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pids, cls, ins, eds = [], [], [], []
            for pid, wkt in zip(pdf["polygon_id"], pdf["wkt"]):
                parsed = parse_wkt(wkt)
                inside, boundary = classify_polygon_cells(parsed, res)
                edges = (
                    [
                        [{"x1": e[0], "y1": e[1], "x2": e[2], "y2": e[3]} for e in part]
                        for part in _edge_parts_from_parsed(parsed)
                    ]
                    if (with_edges and len(boundary))
                    else None
                )
                for c in inside:
                    pids.append(pid); cls.append(int(c)); ins.append(True); eds.append(None)
                for c in boundary:
                    pids.append(pid); cls.append(int(c)); ins.append(False); eds.append(edges)
            if pids:  # empty frames infer float64 cols, breaking the Arrow struct cast
                data = {"polygon_id": pids, "cell": cls, "_inside": ins}
                if with_edges:
                    data["_edges"] = eds
                yield pd.DataFrame(data)

    return polygons_wkt_df.select("polygon_id", "wkt").mapInPandas(classify, schema=out_schema)


def polygon_edges_table(polygons_wkt_df: DataFrame) -> DataFrame:
    """(polygon_id, _edges): ONE row per polygon with its per-part edge
    arrays — the build side of the broadcast-edges refine join."""
    out_schema = T.StructType(
        [T.StructField("polygon_id", T.LongType()), T.StructField("_edges", EDGES_TYPE)]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pids, eds = [], []
            for pid, wkt in zip(pdf["polygon_id"], pdf["wkt"]):
                parts = [
                    [{"x1": e[0], "y1": e[1], "x2": e[2], "y2": e[3]} for e in part]
                    for part in _edge_parts_from_parsed(parse_wkt(wkt))
                ]
                if parts:
                    pids.append(pid)
                    eds.append(parts)
            if pids:
                yield pd.DataFrame({"polygon_id": pids, "_edges": eds})

    return polygons_wkt_df.select("polygon_id", "wkt").mapInPandas(build, schema=out_schema)


def pip_join_cells(
    points_df: DataFrame,
    polygons_wkt_df: DataFrame,
    res: int = cells.DEFAULT_RES,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt_buckets: int = 0,
    carry_cols: list[str] | None = None,
    attach_edges: str = "inline",
    edges_broadcast_bytes: int = 64 << 20,
) -> DataFrame:
    """Inner PIP join, cell equi-join flavor (large-large path).

    Shuffles both sides once on the cell key; AQE handles residual
    skew; `salt_buckets > 0` additionally salts the point side and
    explodes the polygon side x k for pathological hot cells.
    After the join everything is JVM: interior-cell candidates are
    accepted with no exact test (`_inside` fast path — the same
    classification the hybrid flavor uses), boundary candidates go
    through the higher-order-function ray cast. No Python touches the
    fact rows at any point, and the fact table is scanned ONCE.
    `carry_cols`: explicit column pruning (see pip_join_broadcast).

    `attach_edges` controls how the refine's edge arrays reach the
    boundary candidates:
    - "broadcast": the cell map stays NARROW (polygon_id, cell,
      _inside) through the shuffle; edges ride a one-row-per-polygon
      broadcast table joined AFTER the cell join. For boundary-heavy
      layers the r2 inline layout shipped edges x boundary_cells
      through the exchange (a 500-edge polygon covering 1,000 boundary
      cells = ~16 MB of duplicated payload PER POLYGON); broadcast
      attachment ships each polygon's edges once per executor.
    - "inline": r2 behavior — edges duplicated per boundary cell; no
      broadcast needed, right when the polygon side is too big to fit
      executor memory.
    - "auto": broadcast when sum(length(wkt)) (a proportional proxy
      for total edge bytes) fits `edges_broadcast_bytes`. NOTE: auto
      runs that size aggregation EAGERLY at call time (the mode shapes
      the plan, so it cannot wait for the first action) — hence the
      lazy "inline" default here; the pip_join planner measures the
      layer once anyway and passes the right mode explicitly."""
    if carry_cols is not None:
        cols = list(dict.fromkeys(carry_cols + [lon_col, lat_col]))
        points_df = points_df.select(*cols)
    _check_reserved_cols(
        points_df, ("cell", "salt", "_inside", "_edges", "polygon_id"), "pip_join_cells"
    )
    if attach_edges == "auto":
        sz = polygons_wkt_df.agg(F.sum(F.length("wkt"))).first()[0] or 0
        attach_edges = "broadcast" if int(sz) <= edges_broadcast_bytes else "inline"

    pts = points_df.withColumn("cell", cells.cell_expr(F.col(lon_col), F.col(lat_col), res))
    pol = polygon_cells_classified(
        polygons_wkt_df, res, with_edges=(attach_edges == "inline")
    )
    if salt_buckets > 0:
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(lon_col, lat_col), F.lit(salt_buckets)))
        pol = pol.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
        keys = ["cell", "salt"]
    else:
        keys = ["cell"]
    pol_cols = ["polygon_id", "_inside"] + (["_edges"] if attach_edges == "inline" else [])
    cand = pts.join(pol.select(*keys, *pol_cols), on=keys, how="inner")
    if attach_edges != "inline":
        cand = cand.join(
            F.broadcast(polygon_edges_table(polygons_wkt_df)), on="polygon_id", how="left"
        )
    keep = F.when(F.col("_inside"), F.lit(True)).otherwise(
        raycast_inside_expr(F.col(lon_col), F.col(lat_col), F.col("_edges"))
    )
    out_cols = [f.name for f in points_df.schema.fields] + ["polygon_id"]
    return cand.filter(keep).select(*out_cols)


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
    the tolerance cap (G:12151-12196 keeps min dist <= tolerance).
    `candidates` also accepts a (cid, clon, clat) numpy triple (the
    Arrow ingestion path — see _cand_arrays)."""
    cid, clon, clat = _cand_arrays(candidates)

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
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            # non-finite probes get a NULL nearest, matching the cells
            # flavor's empty-ring rows — an all-NaN distance row made
            # argmin return 0, claiming cid[0] as nearest (r6 review:
            # the three strategies must agree on dirty probes)
            good = np.isfinite(px) & np.isfinite(py)
            nid = pd.Series(np.zeros(len(pdf), dtype=np.int64), dtype="Int64")
            dist = np.full(len(pdf), np.nan)
            if good.any():
                d = np_haversine(
                    px[good][:, None], py[good][:, None], clon[None, :], clat[None, :]
                )
                j = np.argmin(d, axis=1)
                nid[good] = cid[j]
                dist[good] = d[np.arange(int(good.sum())), j]
            nid[~good] = pd.NA
            out = pd.DataFrame(
                {
                    "probe_id": pdf[probe_id_col].to_numpy(np.int64),
                    "nearest_id": nid,
                    "dist_m": dist,
                }
            )
            out.loc[~good, "dist_m"] = None
            if max_dist_m is not None:
                out = out[good & (out["dist_m"] <= max_dist_m)]
            yield out

    return probes_df.select(probe_id_col, lon_col, lat_col).mapInPandas(nearest, schema=schema)


def pick_res(
    envs: list[tuple[float, float, float, float]],
    target_cells_per_poly: int = 128,
    lo: int = 8,
    hi: int = cells.MAX_RES,
) -> int:
    """Resolution heuristic: pick the grid resolution at which the
    MEDIAN polygon envelope covers ~`target_cells_per_poly` cells.
    Too coarse -> interior accept never fires and every candidate
    refines; too fine -> the cell map explodes (classification cost +
    broadcast size scale with cells). ~128 cells/polygon keeps the
    boundary band at ~4/sqrt(128) ≈ 35% of covered cells (perimeter/
    area) while the map stays O(100) rows per polygon — measured sweet
    spot for both flavors; clamped to [lo, hi]."""
    if not envs:
        return 14
    areas = sorted(max((x1 - x0), 1e-12) * max((y1 - y0), 1e-12) for x0, y0, x1, y1 in envs)
    return _res_from_median_area(areas[len(areas) // 2], target_cells_per_poly, lo, hi)


def _res_from_median_area(
    med_area: float, target_cells_per_poly: int = 128, lo: int = 8, hi: int = cells.MAX_RES
) -> int:
    # cells(r) = area / ((360/2^r)*(180/2^r)) = area * 4^r / 64800
    import math

    r = 0.5 * math.log2(target_cells_per_poly * 64800.0 / max(med_area, 1e-12))
    return int(min(max(round(r), lo), hi))


def _envelope_area_col() -> "F.Column":
    """Envelope area (deg^2) from a `wkt` column, as an Arrow-batched
    pandas_udf — the distributed twin of the driver-side
    `geom_envelope` pass in `_collect_polygons`."""

    @F.pandas_udf(T.DoubleType())
    def env_area(wkts: pd.Series) -> pd.Series:
        out = np.full(len(wkts), np.nan)
        for i, w in enumerate(wkts):
            env = geom_envelope(parse_wkt(w))
            if env is not None:
                x0, y0, x1, y1 = env
                out[i] = max(x1 - x0, 1e-12) * max(y1 - y0, 1e-12)
        return pd.Series(out)

    return env_area(F.col("wkt"))


def _layer_stats(polygons_wkt_df: DataFrame) -> tuple[float | None, int]:
    """(median envelope area, total WKT bytes) of a polygon layer in
    ONE distributed aggregation — everything the planner needs for a
    large layer without collecting it."""
    row = (
        polygons_wkt_df.select(
            _envelope_area_col().alias("_area"), F.length("wkt").alias("_len")
        )
        .agg(
            # EMPTY/invalid WKT yields NaN, which Spark sorts as the
            # LARGEST double — it would poison the median, so gate it
            F.percentile_approx(
                F.when(~F.isnan("_area"), F.col("_area")), 0.5
            ).alias("med"),
            F.sum("_len").alias("bytes"),
        )
        .first()
    )
    med = row["med"]
    return (None if med is None else float(med)), int(row["bytes"] or 0)


def pick_res_distributed(
    polygons_wkt_df: DataFrame,
    target_cells_per_poly: int = 128,
    lo: int = 8,
    hi: int = cells.MAX_RES,
) -> int:
    """pick_res without collecting the polygon side: one distributed
    aggregation computes the approximate median envelope area
    (percentile_approx), then the same formula applies. Used by the
    pip_join planner when the polygon layer is too large to collect."""
    med, _ = _layer_stats(polygons_wkt_df)
    if med is None:
        return 14
    return _res_from_median_area(med, target_cells_per_poly, lo, hi)


def pip_join(
    points_df: DataFrame,
    polygons_wkt_df: DataFrame,
    res: int | None = None,
    carry_cols: list[str] | None = None,
    broadcast_threshold_cells: int = 2_000_000,
    collect_threshold_polys: int = 4096,
    lon_col: str = "lon",
    lat_col: str = "lat",
    **kw,
) -> DataFrame:
    """Strategy-selecting PIP join (the thin planner from SURVEY §4).

    Dispatch ladder (mirrors the reference's threshold-based dispatch,
    G:12284-12295, at distributed scale):

    1. Probe the polygon side with `limit(k+1).count()` — a bounded
       scan, never a full count of a huge layer. If it exceeds
       `collect_threshold_polys`, the polygon side NEVER touches the
       driver: resolution comes from a distributed median-envelope
       aggregation (`pick_res_distributed`) and the join runs as
       `pip_join_cells` — classification happens executor-side in
       `polygon_cells_classified`, the join shuffles on the cell key.
    2. Small polygon side: collect it (the moral broadcast build side),
       pick the resolution driver-side, and estimate the cell-map size
       (envelope area / cell area). Under `broadcast_threshold_cells`
       (~16 bytes/cell => ~32 MB) the hybrid broadcast flavor wins; a
       small-count-but-huge-area layer (continent polygons at fine res)
       instead dispatches to `pip_join_cells` so the cell map is both
       built AND joined distributed — the r2 planner shuffled the join
       but still classified in a driver loop, which was its 100x
       bottleneck."""
    unknown = set(kw) - {"refine", "salt_buckets", "edges_broadcast_bytes"}
    if unknown:
        raise TypeError(f"pip_join: unknown option(s) {sorted(unknown)}")
    edges_cap = kw.get("edges_broadcast_bytes", 64 << 20)

    def _cells(res_: int, attach: str) -> DataFrame:
        if kw.get("refine", "jvm") != "jvm":
            raise ValueError(
                "pip_join: refine='arrow' is only available on the hybrid "
                "(collectable polygon side) path; the distributed cells path "
                "refines with the JVM ray cast"
            )
        return pip_join_cells(
            points_df,
            polygons_wkt_df,
            res=res_,
            lon_col=lon_col,
            lat_col=lat_col,
            carry_cols=carry_cols,
            salt_buckets=kw.get("salt_buckets", 0),
            attach_edges=attach,
            edges_broadcast_bytes=edges_cap,
        )

    n_polys = polygons_wkt_df.limit(collect_threshold_polys + 1).count()
    if n_polys > collect_threshold_polys:
        # ONE aggregation gives both the resolution and the edge-
        # attachment mode — no extra eager probe inside pip_join_cells
        med, wkt_bytes = _layer_stats(polygons_wkt_df)
        if res is None:
            res = 14 if med is None else _res_from_median_area(med)
        return _cells(res, "broadcast" if wkt_bytes <= edges_cap else "inline")
    polys = _collect_polygons(polygons_wkt_df)
    if res is None:
        res = pick_res([env for _pid, _parsed, env in polys])
    n = float(1 << res)
    cell_w, cell_h = 360.0 / n, 180.0 / n
    est_cells = 0.0
    for _pid, _parsed, (x0, y0, x1, y1) in polys:
        est_cells += max((x1 - x0) / cell_w, 1.0) * max((y1 - y0) / cell_h, 1.0)
    if est_cells > broadcast_threshold_cells:
        # the layer is already collected: size the edge payload from it
        n_edges = sum(_edge_count_from_parsed(parsed) for _p, parsed, _e in polys)
        return _cells(res, "broadcast" if n_edges * 32 <= edges_cap else "inline")
    if kw.get("salt_buckets", 0):
        # salting exists to spread a hot shuffle key; the hybrid flavor
        # has no shuffle (broadcast join), so the option cannot apply —
        # say so instead of silently dropping a skew-tuning attempt.
        import warnings

        warnings.warn(
            "pip_join: salt_buckets only applies to the shuffled cells "
            "path; the planner chose the broadcast hybrid flavor (no "
            "shuffle to salt), so it is ignored here",
            stacklevel=2,
        )
    return pip_join_hybrid(
        points_df,
        polygons_wkt_df,
        res=res,
        lon_col=lon_col,
        lat_col=lat_col,
        carry_cols=carry_cols,
        broadcast_cellmap=True,
        **{k: v for k, v in kw.items() if k == "refine"},
    )


def _cand_arrays(candidates):
    """Normalize a candidate set to id-sorted numpy columns
    (cid int64, clon f64, clat f64). Accepts a list of (id, lon, lat)
    tuples or a (cid, clon, clat) triple of numpy arrays / pandas
    Series — the latter is the Arrow ingestion path (knn_join collects
    via toPandas, never materializing per-row Python objects). The
    triple form is recognized ONLY when all three elements are actual
    arrays, so a 3-tuple of candidate rows parses as rows. Raises on
    an empty candidate set. Sort order matches the old tuple sort
    exactly: (id, lon, lat) lexicographic."""
    is_triple = (
        isinstance(candidates, tuple)
        and len(candidates) == 3
        and all(isinstance(c, (np.ndarray, pd.Series)) for c in candidates)
    )
    # the triple form requires ACTUAL arrays: a plain tuple of three
    # (id, lon, lat) rows must parse as a candidate list, not as three
    # column vectors (which would silently produce garbage neighbors)
    if is_triple:
        cid = np.asarray(candidates[0], dtype=np.int64)
        clon = np.asarray(candidates[1], dtype=np.float64)
        clat = np.asarray(candidates[2], dtype=np.float64)
    else:
        cid = np.array([c[0] for c in candidates], dtype=np.int64)
        clon = np.array([c[1] for c in candidates], dtype=np.float64)
        clat = np.array([c[2] for c in candidates], dtype=np.float64)
    finite = np.isfinite(clon) & np.isfinite(clat)
    if not finite.all():
        # degrade, never corrupt: one NaN coordinate would poison every
        # probe's argmin (np.argmin returns the NaN position) and, in
        # the grid kernel, a NaN bbox extent degenerates the whole
        # index — a coordinate-less candidate can never be a meaningful
        # nearest, so it is dropped like the WGS84 filters drop it.
        cid, clon, clat = cid[finite], clon[finite], clat[finite]
    if len(cid) == 0:
        raise ValueError(
            "knn: empty candidate set after dropping non-finite "
            "coordinates (knn_join handles the empty-input case by "
            "returning an empty result before the index is built)"
        )
    order = np.lexsort((clat, clon, cid))
    return cid[order], clon[order], clat[order]


def _cand_grid_index(candidates):
    """Build the broadcastable grid index over a candidate set:
    candidates sorted by id, bucketed into a local ~1-per-cell grid
    over their bbox (CSR layout: order + offsets). The executor-side
    analogue of the reference's STRtree build (G:3184-3416)."""
    cid, clon, clat = _cand_arrays(candidates)
    dims = max(int(np.sqrt(len(cid))), 1)
    # antimeridian-aware frame: grid in whichever of the [-180,180) /
    # [0,360) frames gives the tighter longitude extent, so a candidate
    # set straddling the dateline doesn't span the whole grid with a
    # seam in the middle. Haversine itself is wrap-correct; only the
    # grid indexing and the accept guard are frame-sensitive.
    clon_s = np.mod(clon, 360.0)
    shift360 = float(clon_s.max() - clon_s.min()) < float(clon.max() - clon.min()) - 1e-9
    cx = clon_s if shift360 else clon
    x0, x1 = float(cx.min()), float(cx.max())
    y0, y1 = float(clat.min()), float(clat.max())
    w = max((x1 - x0) / dims, 1e-9)
    h = max((y1 - y0) / dims, 1e-9)
    gx = np.clip(((cx - x0) / w).astype(np.int64), 0, dims - 1)
    gy = np.clip(((clat - y0) / h).astype(np.int64), 0, dims - 1)
    flat = gx * dims + gy
    order = np.argsort(flat, kind="stable")
    starts = np.searchsorted(flat[order], np.arange(dims * dims + 1))
    return {
        "cid": cid, "clon": clon, "clat": clat,
        "order": order.astype(np.int64), "starts": starts.astype(np.int64),
        "dims": dims, "x0": x0, "y0": y0, "w": w, "h": h,
        "shift360": shift360, "span_x": x1 - x0,
    }


def _grid_nearest_batch(plon, plat, idx, level: int):
    """Vectorized ring lookup at `level` (cells grow 2x per level):
    for each probe, gather candidates in its 3x3 ring of the (possibly
    coarsened) grid, take the (dist, cand_id)-min, and ACCEPT it only
    when it provably beats anything outside the ring (same
    conservative worst-case-latitude guard as knn_join_cells).
    Returns (nearest_pos or -1, dist, accepted mask)."""
    from ..geo.sphere import np_haversine

    dims0 = idx["dims"]
    scale = 1 << level
    dims = max(dims0 // scale, 1)
    w, h = idx["w"] * (dims0 / dims), idx["h"] * (dims0 / dims)
    npr = len(plon)
    # map each probe lon to its mod-360 copy nearest the grid center,
    # so probes across the antimeridian from the candidate frame index
    # the right cells. ONLY the frame coordinate (gx + guard) uses the
    # remap: distances always use the original lon (haversine wraps
    # correctly), and in-frame probes keep their exact value — the
    # mod round-trip is not ulp-exact.
    xc = idx["x0"] + idx.get("span_x", 0.0) / 2.0
    shifted = xc + np.mod(plon - xc + 180.0, 360.0) - 180.0
    plon_f = np.where(np.abs(plon - xc) <= 180.0, plon, shifted)
    gx = np.floor((plon_f - idx["x0"]) / w).astype(np.int64)
    gy = np.floor((plat - idx["y0"]) / h).astype(np.int64)

    clon, clat, cid = idx["clon"], idx["clat"], idx["cid"]
    # per-level candidate CSR, built ONCE per worker process: the
    # broadcast value is deserialized once per executor, so mutating
    # the dict caches coarser re-bucketings across Arrow batches
    # (level 0 reuses the CSR prebuilt at index time)
    cache = idx.setdefault("_levels", {0: (idx["order"], idx["starts"])})
    if level not in cache:
        cxf = np.mod(clon, 360.0) if idx.get("shift360") else clon
        cgx = np.clip(((cxf - idx["x0"]) / w).astype(np.int64), 0, dims - 1)
        cgy = np.clip(((clat - idx["y0"]) / h).astype(np.int64), 0, dims - 1)
        cflat = cgx * dims + cgy
        corder = np.argsort(cflat, kind="stable")
        cache[level] = (corder, np.searchsorted(cflat[corder], np.arange(dims * dims + 1)))
    corder, cstarts = cache[level]

    from .clustering import _ranges_concat

    seg_parts, gather_parts = [], []
    for dx in (-1, 0, 1):
        jx = gx + dx
        for dy in (-1, 0, 1):
            jy = gy + dy
            ok = (jx >= 0) & (jx < dims) & (jy >= 0) & (jy < dims)
            cell = np.where(ok, jx * dims + jy, 0)
            cnt = np.where(ok, cstarts[cell + 1] - cstarts[cell], 0)
            nz = np.flatnonzero(cnt > 0)
            if not len(nz):
                continue
            starts_i = cstarts[cell[nz]]
            gather_parts.append(corder[_ranges_concat(starts_i, starts_i + cnt[nz])])
            seg_parts.append(np.repeat(nz, cnt[nz]))

    nearest = np.full(npr, -1, dtype=np.int64)
    dist = np.full(npr, np.inf)
    if gather_parts:
        seg = np.concatenate(seg_parts)
        gather = np.concatenate(gather_parts)
        d = np_haversine(plon[seg], plat[seg], clon[gather], clat[gather])
        # (dist, cand_id)-lexicographic min per probe segment
        order2 = np.lexsort((cid[gather], d, seg))
        seg_sorted = seg[order2]
        first = np.unique(seg_sorted, return_index=True)[1]
        probes_with = seg_sorted[first]
        nearest[probes_with] = gather[order2][first]
        dist[probes_with] = d[order2][first]

    # guard: strict lower bound on distance to anything OUTSIDE the ring
    m_per_deg = 111319.49079327358
    left = idx["x0"] + (gx - 1) * w
    right = idx["x0"] + (gx + 2) * w
    bot = idx["y0"] + (gy - 1) * h
    top = idx["y0"] + (gy + 2) * h
    dx_deg = np.minimum(plon_f - left, right - plon_f)
    # wrap bound: when the frame spans most of the circle, a candidate
    # across the seam sits at angular gap >= 360 - span even though it
    # is far outside the ring in frame coordinates; fold that into the
    # lower bound (inactive for spans < ~180: the term is then huge)
    dx_deg = np.minimum(dx_deg, 360.0 - idx.get("span_x", 0.0))
    dy_deg = np.minimum(plat - bot, top - plat)
    worst_lat = np.minimum(np.abs(plat) + np.abs(top - bot), 90.0)
    guard = 0.999 * np.minimum(
        dy_deg * m_per_deg,
        dx_deg * m_per_deg * np.maximum(np.cos(np.radians(worst_lat)), 0.0),
    )
    accepted = (nearest >= 0) & (dist < guard)
    return nearest, dist, accepted


def _grid_nearest_all(plon, plat, idx, max_levels: int):
    """Pure-numpy exact nearest over a grid index: the escalation
    ladder (accepted = provably global min) plus a blocked brute-force
    pass for leftovers. Tie-breaks by (dist, cand_id) throughout —
    identical output contract to knn_join_broadcast's argmin over
    cand_id-sorted candidates. Kept Spark-free so the property tests
    can differential-test it directly against brute force."""
    from ..geo.sphere import np_haversine

    cid, clon, clat = idx["cid"], idx["clon"], idx["clat"]
    n = len(plon)
    out_id = np.empty(n, dtype=np.int64)
    out_d = np.empty(n)
    todo = np.arange(n)
    for level in range(max_levels):
        nr, dd, acc = _grid_nearest_batch(plon[todo], plat[todo], idx, level)
        hit = todo[acc]
        out_id[hit] = cid[nr[acc]]
        out_d[hit] = dd[acc]
        todo = todo[~acc]
        if not len(todo):
            break
    if len(todo):
        # block rows sized to a ~2^22-element distance matrix (32 MB
        # float64): the old fixed 4096-row block at 2M candidates
        # allocated a ~65 GB matrix and OOM'd the executor (r6 review)
        blk_rows = int(max(min(4096, (1 << 22) // max(len(cid), 1)), 1))
        for s in range(0, len(todo), blk_rows):
            blk = todo[s : s + blk_rows]
            d = np_haversine(
                plon[blk][:, None], plat[blk][:, None], clon[None, :], clat[None, :]
            )
            j = np.argmin(d, axis=1)
            out_id[blk] = cid[j]
            out_d[blk] = d[np.arange(len(blk)), j]
    return out_id, out_d


class KnnGridIndex:
    """Reusable broadcast grid index over one candidate set (the
    executor-side STRtree build paid once per session instead of per
    knn_join_grid call). Build via build_knn_index; release the
    executor copies with .unpersist() when done."""

    def __init__(self, idx: dict, bidx):
        self.idx = idx
        self.bidx = bidx
        self.n_candidates = len(idx["cid"])

    def unpersist(self) -> None:
        self.bidx.unpersist()


def build_knn_index(
    spark,
    candidates_df: DataFrame,
    cand_id_col: str = "cand_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> KnnGridIndex:
    """Arrow-collect a candidate DataFrame and build the broadcast CSR
    grid index once. The returned handle feeds knn_join_grid directly:

        idx = build_knn_index(spark, stations)
        a = knn_join_grid(probes_monday, idx)
        b = knn_join_grid(probes_tuesday, idx)   # no rebuild
        idx.unpersist()
    """
    cpdf = candidates_df.select(cand_id_col, lon_col, lat_col).toPandas()
    idx = _cand_grid_index(
        (
            cpdf[cand_id_col].to_numpy(np.int64),
            cpdf[lon_col].to_numpy(np.float64),
            cpdf[lat_col].to_numpy(np.float64),
        )
    )
    return KnnGridIndex(idx, spark.sparkContext.broadcast(idx))


def knn_join_grid(
    probes_df: DataFrame,
    candidates: list[tuple],
    probe_id_col: str = "probe_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_dist_m: float | None = None,
) -> DataFrame:
    """Nearest-candidate join via a BROADCAST GRID INDEX — the
    executor-side STRtree analogue for mid-size candidate sets (10^3 -
    10^6), where knn_join_broadcast's full P x C matrix is too much
    work and knn_join_cells' shuffle ladder is overkill. Per Arrow
    batch: ring lookup on a ~1-candidate-per-cell grid, conservative
    accept guard, in-kernel escalation to 2x coarser rings, and a
    final exact brute-force pass for the (few) still-unaccepted
    probes. Output rows are EXACTLY knn_join_broadcast's (same
    distance, same (dist, cand_id) tie-break).

    `candidates` also accepts a handle from `build_knn_index` — a
    session that runs MANY joins against one candidate set then pays
    the collect + CSR build + task broadcast once instead of per
    call."""
    if isinstance(candidates, KnnGridIndex):
        idx, bidx = candidates.idx, candidates.bidx
        spark = probes_df.sparkSession
    else:
        idx = _cand_grid_index(candidates)
        spark = probes_df.sparkSession
        bidx = spark.sparkContext.broadcast(idx)

    schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("nearest_id", T.LongType()),
            T.StructField("dist_m", T.DoubleType()),
        ]
    )
    max_levels = max(int(np.ceil(np.log2(max(idx["dims"], 2)))), 1)

    def nearest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ix = bidx.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            plon = pdf[lon_col].to_numpy(np.float64)
            plat = pdf[lat_col].to_numpy(np.float64)
            # same dirty-probe contract as knn_join_broadcast/cells:
            # non-finite coords -> NULL nearest (r6 review)
            good = np.isfinite(plon) & np.isfinite(plat)
            nid = pd.Series(np.zeros(len(pdf), dtype=np.int64), dtype="Int64")
            dist = np.full(len(pdf), np.nan)
            if good.any():
                gid, gd = _grid_nearest_all(plon[good], plat[good], ix, max_levels)
                nid[good] = gid
                dist[good] = gd
            nid[~good] = pd.NA
            out = pd.DataFrame(
                {
                    "probe_id": pdf[probe_id_col].to_numpy(np.int64),
                    "nearest_id": nid,
                    "dist_m": dist,
                }
            )
            out.loc[~good, "dist_m"] = None
            if max_dist_m is not None:
                out = out[good & (out["dist_m"] <= max_dist_m)]
            yield out

    return probes_df.select(probe_id_col, lon_col, lat_col).mapInPandas(nearest, schema=schema)


def knn_join(
    probes_df: DataFrame,
    candidates_df: DataFrame,
    probe_id_col: str = "probe_id",
    cand_id_col: str = "cand_id",
    max_broadcast_bytes: int = 48 << 20,
    max_broadcast_candidates: int | None = None,
    dense_threshold: int = 256,
    res: int = 14,
) -> DataFrame:
    """Strategy-selecting kNN join: probe the candidate side with a
    bounded limit-count; tiny sets take the dense matrix kernel
    (knn_join_broadcast), anything that still fits a task broadcast
    takes the grid-index kernel (knn_join_grid), larger sets go to the
    shuffled cell ladder (knn_join_cells). The broadcast flavors beat
    the ladder by orders of magnitude at skewed probe:candidate ratios
    (measured: 2M probes x 12.7k candidates did not finish one ladder
    rep in 10 min; the grid kernel does it in seconds).

    The broadcast cap is BYTE-based: the index costs ~24 B/candidate
    (int64 id + 2 x f64), so the default 48 MB admits ~2M candidates —
    sized to the task-broadcast budget, not to driver Python-object
    overhead, because ingestion is Arrow (toPandas -> numpy columns;
    never a per-row Python list). `max_broadcast_candidates` remains
    as an explicit row override.

    CONTRACT NOTE at the cap boundary: the broadcast flavors are exact
    and total (every probe gets its true global nearest). Above the
    cap, knn_join_cells is exact for every CONFIRMED level, but its
    final level keeps the ring-local minimum — a probe whose true
    nearest lies outside the final 3x3 ring (possible only when it is
    >~ one final-level cell, hundreds of km at the default levels,
    from every candidate) gets that ring's minimum, or a NULL
    nearest_id when the final ring is empty. Callers needing the
    exact-total contract above the cap should raise
    max_broadcast_bytes (the grid kernel stays exact) or pre-filter
    probes to the candidate region."""
    cap_rows = (
        max_broadcast_candidates
        if max_broadcast_candidates is not None
        else max(max_broadcast_bytes // 24, 1)
    )
    # ONE bounded ingestion job doubles as the size probe (r7): the old
    # limit-count probe evaluated the whole candidate subplan (scan +
    # filters + window) once for the count and again for the Arrow
    # collect. Trade-off: an OVER-cap candidate set now transfers its
    # first cap+1 rows (<= max_broadcast_bytes, ~48 MB) before
    # dispatching to the cells ladder — the old count moved no rows on
    # that path — but the common under-cap call pays one subplan
    # evaluation instead of two, and the ladder it dispatches to dwarfs
    # one bounded transfer.
    cpdf = candidates_df.select(cand_id_col, "lon", "lat").limit(cap_rows + 1).toPandas()
    n_cand = len(cpdf)
    if n_cand == 0:
        spark = probes_df.sparkSession
        return spark.createDataFrame(
            [], "probe_id long, nearest_id long, dist_m double"
        )
    if n_cand <= cap_rows:
        cands = (
            cpdf[cand_id_col].to_numpy(np.int64),
            cpdf["lon"].to_numpy(np.float64),
            cpdf["lat"].to_numpy(np.float64),
        )
        if n_cand <= dense_threshold:
            return knn_join_broadcast(probes_df, cands, probe_id_col=probe_id_col)
        return knn_join_grid(probes_df, cands, probe_id_col=probe_id_col)
    return knn_join_cells(
        probes_df, candidates_df, res=res, probe_id_col=probe_id_col, cand_id_col=cand_id_col
    )


def knn_join_cells(
    probes_df: DataFrame,
    candidates_df: DataFrame,
    res: int = 14,
    probe_id_col: str = "probe_id",
    cand_id_col: str = "cand_id",
    levels: int = 4,
) -> DataFrame:
    """Large-large nearest-neighbor join, 100% JVM (no Python).

    The distributed form of the reference's progressive tolerance
    ladder (G:471, G:3503-3563): at each level probes equi-join
    candidates in their 3x3 cell neighborhood at resolution r; the
    per-probe minimum is CONFIRMED when dist < one cell size (no
    candidate outside the 3x3 ring can be closer); unmatched probes
    escalate to a 4x coarser resolution (ring expansion). Expects
    probes (probe_id, lon, lat) and candidates (cand_id, lon, lat).
    Returns (probe_id, nearest_id, dist_m)."""
    spark = probes_df.sparkSession
    out = None
    remaining = probes_df.select(
        F.col(probe_id_col).alias("probe_id"), F.col("lon").alias("plon"), F.col("lat").alias("plat")
    )
    cand_base = candidates_df.select(
        F.col(cand_id_col).alias("cand_id"), F.col("lon").alias("clon"), F.col("lat").alias("clat")
    )
    from ..geo.sphere import haversine_m

    for level in range(levels):
        r = max(res - 2 * level, 2)
        n = float(1 << r)
        last = level == levels - 1
        p = (
            remaining.withColumn("_ix", cells.lon_ix_expr(F.col("plon"), r))
            .withColumn("_iy", cells.lat_iy_expr(F.col("plat"), r))
            .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
            .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
            .withColumn("_jy", F.col("_iy") + F.col("_dy"))
            .filter((F.col("_jy") >= 0) & (F.col("_jy") < F.lit(int(n))))
            .withColumn("_jx", F.pmod(F.col("_ix") + F.col("_dx"), F.lit(int(n))))
            .withColumn("cell", cells.pack_expr(r, F.col("_jx"), F.col("_jy")))
            .select("probe_id", "plon", "plat", "cell")
        )
        c = cand_base.withColumn(
            "cell", cells.cell_expr(F.col("clon"), F.col("clat"), r)
        )
        joined = p.join(c, "cell").withColumn(
            "dist_m", haversine_m(F.col("plon"), F.col("plat"), F.col("clon"), F.col("clat"))
        )
        w = Window.partitionBy("probe_id").orderBy("dist_m", "cand_id")
        best = (
            joined.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("probe_id", "plon", "plat", F.col("cand_id").alias("nearest_id"), "dist_m")
        )
        # Safe acceptance radius: a strict LOWER bound on the distance
        # to anything outside the 3x3 ring. Meters/degree uses the same
        # R=6378137 sphere as haversine_m; the east-west width is taken
        # at the ring's worst-case (poleward-most) latitude |plat| +
        # 2*cell_h_deg — a ring candidate can sit up to two cell
        # heights poleward where parallels are shorter — and a 0.999
        # slack absorbs the chord-vs-parallel-arc deficit (<= dlam^2/24
        # relative). At coarse levels the guard can reach 0 (cos <= 0
        # near the pole): then nothing is accepted early, which is
        # conservative, never wrong.
        m_per_deg = 111319.49079327358  # 6378137 * pi / 180
        cell_h_deg = 180.0 / n
        worst_lat = F.least(F.abs(F.col("plat")) + F.lit(2.0 * cell_h_deg), F.lit(90.0))
        cell_w_m = F.lit(360.0 / n * m_per_deg) * F.greatest(
            F.cos(F.radians(worst_lat)), F.lit(0.0)
        )
        guard = F.lit(0.999) * F.least(F.lit(cell_h_deg * m_per_deg), cell_w_m)
        if last:
            # final level: keep the ring-local minimum, and emit probes
            # whose ring is EMPTY with a null nearest instead of
            # silently dropping them
            confirmed = remaining.select("probe_id").join(
                best.select("probe_id", "nearest_id", "dist_m"), "probe_id", "left"
            )
        else:
            confirmed = best.filter(F.col("dist_m") < guard).select(
                "probe_id", "nearest_id", "dist_m"
            )
        out = confirmed if out is None else out.unionByName(confirmed)
        if last:
            break
        remaining = remaining.join(
            confirmed.select("probe_id"), "probe_id", "left_anti"
        )
    return out


def tile_cover_exprs(lon: str, lat: str, half_w_deg: str, half_h_deg: str, res: int):
    """Column expressions for the ix/iy ranges of a bbox cover — shared
    by tile_assignment and its SQL oracle twin; the clamp is
    cells.lon_ix_expr/lat_iy_expr, the one definition."""
    lo, la = F.col(lon), F.col(lat)
    hw, hh = F.expr(half_w_deg), F.expr(half_h_deg)
    return (
        cells.lon_ix_expr(lo - hw, res),
        cells.lon_ix_expr(lo + hw, res),
        cells.lat_iy_expr(la - hh, res),
        cells.lat_iy_expr(la + hh, res),
    )


def tile_assignment(
    images_df: DataFrame,
    res: int = 16,
    id_col: str = "image_key",
) -> DataFrame:
    """Raster<->vector tiling: each image's ground footprint (a bbox of
    w*1e-6 x h*1e-6 degrees around its lon/lat — deterministic
    pixel->ground rule) maps to its covering tile set at `res`.
    Pure Column arithmetic: sequence + explode, no UDF, no shuffle."""
    _check_reserved_cols(images_df, ("_ix", "_iy", "tile"), "tile_assignment")
    ix0, ix1, iy0, iy1 = tile_cover_exprs("lon", "lat", "w * 1e-6", "h * 1e-6", res)
    return (
        images_df.withColumn("_ix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("_iy", F.explode(F.sequence(iy0, iy1)))
        .withColumn("tile", cells.pack_expr(res, F.col("_ix"), F.col("_iy")))
        .drop("_ix", "_iy")
    )


def tile_assignment_sql(images_src: str, res: int = 16) -> str:
    """DuckDB oracle twin of tile_assignment (generate_series in SQL).
    Carries the same NULL/NaN guard as cells.lon_ix_expr/lat_iy_expr
    (r6 review: the guarded Spark side drops a NaN-coordinate image,
    while the unguarded twin either died on the NaN->bigint cast or
    emitted a corner tile for NULL — generate_series(NULL, ...) in a
    LATERAL yields zero rows, matching explode(sequence(NULL, ...)))."""
    n = float(1 << res)
    nmax = (1 << res) - 1

    def ix(e):
        clamp = f"greatest(least(cast(floor((({e})+180.0)/360.0*{n}) as bigint), {nmax}), 0)"
        return f"(CASE WHEN ({e}) IS NULL OR isnan({e}) THEN NULL ELSE {clamp} END)"

    def iy(e):
        clamp = f"greatest(least(cast(floor((({e})+90.0)/180.0*{n}) as bigint), {nmax}), 0)"
        return f"(CASE WHEN ({e}) IS NULL OR isnan({e}) THEN NULL ELSE {clamp} END)"

    return f"""
SELECT i.*, cast({res} as bigint)*{cells.RES_SHIFT} + gx.ix*{cells.IX_SHIFT} + gy.iy AS tile
FROM ({images_src}) i,
     LATERAL (SELECT unnest(generate_series({ix('i.lon - i.w * 1e-6')}, {ix('i.lon + i.w * 1e-6')})) AS ix) gx,
     LATERAL (SELECT unnest(generate_series({iy('i.lat - i.h * 1e-6')}, {iy('i.lat + i.h * 1e-6')})) AS iy) gy
"""
