"""Reference table-property semantics: dictionary_include promotes sort
columns; int_measures_as_double opt-in coercion (SURVEY.md §1.3 quirk)."""

from __future__ import annotations

from pyspark.sql import types as T

from carbondata_spark.store import CarbonStore

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("amount", T.LongType()),
    ]
)


def test_dictionary_include_promotes_sort_column(spark, tmp_path):
    store = CarbonStore(spark, str(tmp_path / "s"))
    store.create_table("t", SCHEMA, properties={"dictionary_include": "code"})
    assert store.describe("t")["sort_columns"] == ["name", "code"]


def test_int_measures_as_double_coercion(spark, tmp_path):
    store = CarbonStore(spark, str(tmp_path / "s"))
    store.create_table(
        "t",
        SCHEMA,
        properties={"int_measures_as_double": "true", "dictionary_include": "code"},
    )
    schema = store.schema("t")
    # measures (amount) coerced, dimension-promoted int (code) untouched
    assert isinstance(schema["amount"].dataType, T.DoubleType)
    assert isinstance(schema["code"].dataType, T.IntegerType)

    df = spark.createDataFrame([("a", 1, 10)], SCHEMA)
    store.load("t", df)
    row = store.table("t").collect()[0]
    assert row["amount"] == 10.0 and isinstance(row["amount"], float)


def test_default_no_coercion(spark, tmp_path):
    store = CarbonStore(spark, str(tmp_path / "s"))
    store.create_table("t", SCHEMA)
    assert isinstance(store.schema("t")["amount"].dataType, T.LongType)


def test_exact_money_summary_equals_single_phase_decimal(spark):
    """The two-phase long-micro/decimal-combine form must be bit-identical
    to the single-phase decimal sum at any grouping, including negatives
    and values using all 6 decimal digits."""
    from pyspark.sql import functions as F

    from carbondata_spark.functions import dround, exact_money_summary

    rows = [
        ("a", 1.005), ("a", -2.115), ("a", 123456.789012), ("a", 0.000001),
        ("b", -0.005), ("b", 99999999.999999), ("b", 0.125),
    ] * 41
    df = spark.createDataFrame(rows, "k string, v double").repartition(7)
    out = {
        r.k: (r.total, r.mean)
        for r in exact_money_summary(
            df, ["k"], sums={"total": F.col("v")}, avgs={"mean": F.col("v")}
        ).collect()
    }
    ref = {
        r.k: (r.total, r.mean)
        for r in df.groupBy("k")
        .agg(
            F.round(F.sum(F.col("v").cast("decimal(30,6)")), 2).cast("double").alias("total"),
            dround(
                F.sum(F.col("v").cast("decimal(30,6)")).cast("double") / F.count("v"), 2
            ).alias("mean"),
        )
        .collect()
    }
    assert out == ref
