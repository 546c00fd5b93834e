"""Grouped-map execution helper.

AQE sizes shuffle partitions by BYTES (advisory 64 MB), so the tiny
shuffles that feed per-trajectory Python kernels coalesce to one or
two partitions — and the kernels, whose cost AQE cannot see, run
serially. Measured on split_road at sf0.1: 320 devices x 31 ms of
numpy per device ran at loadavg < 1 with 3 Python workers, 15.3 s
wall; with partitioning pinned it spreads across all cores.

The fix is an explicit NUMBERED repartition on the grouping key:
`repartition(n, cols)` carries the REPARTITION_BY_NUM shuffle origin,
which AQE is forbidden to coalesce, and its hash partitioning
satisfies FlatMapGroupsInPandas' required distribution, so the stage
still has exactly ONE exchange. `n` tracks max(cores, configured
shuffle partitions): cores when data is small but kernels are hot
(this sandbox), the configured width on a real cluster where both are
large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kernel_partitions(df: DataFrame) -> int:
    spark = df.sparkSession
    return max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )


def grouped_apply(df: DataFrame, group_cols, fn, schema) -> DataFrame:
    """groupBy(*group_cols).applyInPandas(fn, schema) with the shuffle
    width pinned against AQE byte-based coalescing (see module doc)."""
    cols = list(group_cols)
    return (
        df.repartition(kernel_partitions(df), *cols)
        .groupBy(*cols)
        .applyInPandas(fn, schema=schema)
    )


def sorted_with_secs(pdf, float_secs: bool = True):
    """The shared per-trajectory kernel preamble: drop null-ts rows
    (pandas sorts NaT LAST and int64-casts it to -2^63 — one NULL
    timestamp would silently corrupt every downstream duration/gap
    rule), sort by (ts, point_id when present), and return
    (sorted_pdf, epoch_seconds) with secs as float (default) or
    floored int64. One definition for the seven kernels that need it —
    the '.astype(datetime64[ns]) before int64' pitfall lives here
    only."""
    if pdf["ts"].isna().any():
        pdf = pdf[pdf["ts"].notna()]
    pdf = pdf.sort_values(["ts", "point_id"] if "point_id" in pdf else ["ts"])
    ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
    secs = ns / 1_000_000_000.0 if float_secs else ns // 1_000_000_000
    return pdf, secs
