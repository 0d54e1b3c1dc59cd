"""Additional sources/sinks beyond CSV/Parquet (SURVEY.md §2.1).

The reference reads CSV for loads and exposes a generic JDBC RDD for
dimension tables (integration/spark/.../rdd/JdbcRDDExt.scala,
sql/jdbc/JdbcResultSetRDD.scala). Spark gives every format below
natively; these wrappers exist so CarbonStore loads can ingest any of
them uniformly and so schema handling is consistent (explicit schema
preferred — inference reads the data twice).

JDBC needs a driver jar on the classpath; ``read_jdbc`` raises a clear
error if the driver is missing rather than failing deep in py4j.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None, multiline: bool = False
) -> DataFrame:
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Parallel JDBC read (reference JdbcRDDExt parity).

    With ``partition_column`` + bounds the read issues ``num_partitions``
    range-sliced queries — the scale path for dimension snapshots; without
    them it is a single-connection read (small tables only).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - driver-dependent
        if "No suitable driver" in str(e) or "ClassNotFoundException" in str(e):
            raise RuntimeError(
                "JDBC driver not on Spark classpath; add the driver jar via "
                "spark.jars before calling read_jdbc"
            ) from e
        raise
