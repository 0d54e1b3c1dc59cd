"""Salted-join equivalence on skewed data; CSV timestamp-format parity."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from carbondata_spark.functions import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key — the classic skew shape
    skewed = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))

    plain = skewed.join(dim, ["k"]).groupBy("k").agg(F.count("*").alias("n"), F.sum("w").alias("s"))
    salted = (
        salted_join(skewed, dim, ["k"], n_salts=8)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("w").alias("s"))
    )
    a = {r["k"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_csv_timestamp_format(spark, tmp_path):
    from carbondata_spark.sources.csv import read_csv

    p = tmp_path / "ts.csv"
    # reference format: yyyy-MM-dd HH:mm:ss (carbon.timestamp.format,
    # datasample.csv fixture F2)
    p.write_text("empno,doj,salary\n1,2015-12-01 00:10:22,50000.5\n2,2016-01-11 10:00:00,60000.0\n")
    schema = T.StructType(
        [
            T.StructField("empno", T.IntegerType()),
            T.StructField("doj", T.TimestampType()),
            T.StructField("salary", T.DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema=schema, timestamp_format="yyyy-MM-dd HH:mm:ss")
    rows = df.orderBy("empno").collect()
    assert rows[0]["doj"].year == 2015 and rows[0]["doj"].minute == 10
    # range filter on the parsed timestamp (retention-style predicate)
    n = df.filter(F.col("doj") < F.lit("2016-01-01").cast("timestamp")).count()
    assert n == 1
