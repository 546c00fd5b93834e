"""util_gis_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reproduces the query/data-processing capabilities of the reference
``util-gis`` library (sunyu.util.GisUtil, a single-JVM Java geometry
utility) as set-oriented DataFrame operators:

- pure-numpy geo kernels (Gauss-Krüger projection, haversine, spherical
  area, ray-cast point-in-polygon) exposed as vectorized Arrow UDFs,
- a hierarchical quadkey cell index replacing the reference's in-memory
  STRtree as the *distributed* spatial index,
- filter-refine spatial joins (cell-prefix equi-join coarse phase +
  exact numpy refine), kNN with ring expansion, raster<->vector tiling,
- trajectory operators (quality filters, sessionization, mileage,
  cadence windows, sampling, DBSCAN, plot morphology) as window
  functions / applyInPandas,
- training-data-pipeline operators over documents/embeddings (dedup,
  MinHash-LSH, simhash, ANN, text quality).

Everything is DataFrame-first: Catalyst handles pushdown/pruning/AQE;
Python only runs vectorized (Arrow) in the refine/morphology kernels.
"""

__version__ = "0.1.0"
