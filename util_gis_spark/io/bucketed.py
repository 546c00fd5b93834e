"""Bucketed (co-located) table sink/source for the spatial keys.

At 10^12 rows the win isn't the single join — it's making EVERY
subsequent cell-key join exchange-free. Writing both sides bucketed by
the same column/count (the local-warehouse stand-in for an Iceberg
`bucket(N, cell)` partition transform) lets Spark plan a SortMergeJoin
with ZERO Exchange operators: each task reads matching buckets from
both tables. This module wraps the managed-table plumbing so pipelines
don't hand-roll `bucketBy` (asserted exchange-free in
tests/test_operators_spark.py; measured in scripts/bucketing_demo.py —
Exchange count 2 -> 0 on the sf0.1 cell join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "cell",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist as a managed table bucketed+sorted on `bucket_col`.
    Both sides of a future co-located join must use the SAME
    n_buckets and column."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; joins on the bucket column against
    another table with the same bucketing plan without an Exchange."""
    return spark.table(table)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators in the executed plan — the
    co-location assertion used by tests and the demo."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)
