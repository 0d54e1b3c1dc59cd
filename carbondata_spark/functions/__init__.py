"""Shared column-expression helpers and scale utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the other.

    A hot key that would land one reducer with most of the data is spread
    over ``n_salts`` buckets: the skewed side gets a random salt column,
    the small side is exploded across all salt values (n_salts× blowup —
    keep that side the smaller one), and the join keys become
    (keys..., salt). AQE's skew-join split handles moderate skew
    automatically; this is the explicit remedy for pathological keys
    (or engines/configs without AQE).
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left.join(right, on + ["_salt"], how)
    return out.drop("_salt")


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


# Exact-decimal money arithmetic: doubles carrying <=6 decimal digits
# (prices, discounts, their products) cast losslessly to this type, sums
# over it are exact in BOTH Spark and DuckDB (no partial-agg order drift),
# and round-then-cast-to-double is deterministic — so a rounded total can
# never straddle an engine-dependent boundary (tools/margin_audit.py).
MONEY_DEC = "decimal(30,6)"


def dsum(col: Column, n: int = 2) -> Column:
    """Drift-free rounded sum of a money-valued double expression:
    exact DECIMAL(30,6) sum -> round (HALF_UP == DuckDB ties-away) ->
    double. Oracle mirror:
    ``CAST(round(sum(CAST(x AS DECIMAL(30,6))), n) AS DOUBLE)``."""
    return F.round(F.sum(col.cast(MONEY_DEC)), n).cast("double")


def davg(col: Column, n: int = 2) -> Column:
    """Drift-free rounded average: exact decimal sum cast to double (a
    correctly-rounded, engine-identical conversion) divided by the count,
    then DuckDB-style double rounding. Oracle mirror:
    ``round(CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(x), n)``."""
    return dround(F.sum(col.cast(MONEY_DEC)).cast("double") / F.count(col), n)


def epoch_seconds(col: Column) -> Column:
    """Seconds since epoch (double, sub-second precision) for TIMESTAMP
    *or* TIMESTAMP_NTZ input.

    A direct ``cast("double")`` is illegal on TIMESTAMP_NTZ in Spark 4,
    and parquet written with isAdjustedToUTC=false (pyarrow default)
    infers as NTZ. The intermediate cast to TIMESTAMP interprets NTZ in
    the session timezone (pinned to UTC by session.py/catalog.py), which
    matches DuckDB's epoch() over the same naive timestamps; on an
    already-TIMESTAMP column it is a no-op.
    """
    return col.cast("timestamp").cast("double")


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
