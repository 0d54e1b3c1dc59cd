"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent for the driver's differential check. Column names are aliased
identically on both sides; double aggregates are rounded to 2 decimals on
both sides (Spark and DuckDB accumulate floats in different orders, so raw
bit-equality is not achievable — see carbondata_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from carbondata_spark.queries import registry

    return registry()["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from carbondata_spark.queries import registry

    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    from carbondata_spark.queries import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
