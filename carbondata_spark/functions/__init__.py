"""Shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
