"""Shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ensure_parallelism(df, min_partitions: int | None = None):
    """Repartition iff the input has fewer partitions than the session's
    parallelism — a driver-side metadata check.

    Needed because a small parquet file (one row group) scans as ONE
    partition, serializing every downstream CPU-heavy expression (notably
    higher-order array functions, which are interpreted, not codegen'd).
    At 100 TB the scan already has thousands of partitions and this is a
    no-op; at test scale it unlocks the other 31 cores for the price of a
    few-MB shuffle.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


def dround(col: Column, n: int = 2) -> Column:
    """Round a DOUBLE like DuckDB does: half-away-from-zero on the scaled
    binary value — ``sign(x) * floor(abs(x)*10^n + 0.5) / 10^n``.

    Spark's ``F.round`` instead applies HALF_UP to the exact decimal
    expansion of the double, which disagrees with DuckDB whenever the
    scaled value lands exactly on .5 (e.g. round(0.86875, 4):
    Spark → 0.8687, DuckDB → 0.8688). Since the correctness oracle runs
    in DuckDB, every rounded double in a query result must use this.
    """
    p = float(10**n)
    scaled = F.floor(F.abs(col) * p + F.lit(0.5)) / F.lit(p)
    return F.when(col < 0, -scaled).otherwise(scaled)
