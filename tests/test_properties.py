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
