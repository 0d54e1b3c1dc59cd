"""Test-data catalog: load the driver's parquet tables and register views.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` at ``/root/testdata/sf{0.001,0.01,0.1}``
(TESTDATA.md). Queries address tables by name; this module is the single
place that maps name → DataFrame so store-backed tables can later shadow
raw parquet ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the runtime confs queries depend on, whatever session we get.

    The driver calls ``queries()[name](spark, sf_dir)`` with its own
    SparkSession; these two confs are correctness-critical: nanosAsLong
    lets the INT64 TIMESTAMP(NANOS) events column load at all, and a UTC
    session timezone makes date extraction match the (TZ-naive) DuckDB
    oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts is INT64 TIMESTAMP(NANOS); with nanosAsLong it surfaces as a
        # long — truncate to microseconds (matching a DuckDB
        # CAST(ts AS TIMESTAMP)) and restore TimestampType.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view named after the table."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
