"""Reference-exact CUBE statement forms (CarbonSqlParser.scala): every
statement a reference user types — FOR CUBE / FROM CUBE management,
SHOW LOADS ... LIMIT, DELETE LOAD, retention by date, IF EXISTS drops,
auto-named CREATE AGGREGATETABLE, SHOW CUBES DETAIL, DESC aliases,
schema qualifiers — must run verbatim against CarbonSession."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carbondata_spark.sql import CarbonSession
from carbondata_spark.store import CarbonStore


@pytest.fixture()
def cs(spark, tmp_path):
    sess = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    sess.sql(
        "CREATE CUBE sales DIMENSIONS (city string, ts timestamp) "
        "MEASURES (amount double)"
    )
    df = spark.createDataFrame(
        [(f"c{i % 3}", f"2020-01-0{1 + i % 5} 00:00:00", float(i)) for i in range(12)],
        "city string, ts string, amount double",
    ).select("city", F.col("ts").cast("timestamp").alias("ts"), "amount")
    for _ in range(3):
        sess.store.load("sales", df)
    return sess


def test_show_loads_for_cube_with_limit(cs):
    all_rows = cs.sql("SHOW LOADS FOR CUBE sales").collect()
    assert [r["segment_id"] for r in all_rows] == [0, 1, 2]
    # LIMIT n = the n most recent loads, newest first
    top = cs.sql("SHOW LOADS FOR CUBE sales LIMIT 2").collect()
    assert [r["segment_id"] for r in top] == [2, 1]
    # the schema qualifier every reference form allows is accepted
    q = cs.sql("SHOW LOADS FOR CUBE default.sales LIMIT 1").collect()
    assert [r["segment_id"] for r in q] == [2]


def test_delete_load_from_cube(cs):
    assert cs.sql("DELETE LOAD 0,2 FROM CUBE sales").collect()[0]["deleted"] == 2
    left = cs.sql("SHOW LOADS FOR CUBE sales").collect()
    assert [r["segment_id"] for r in left if r["status"] == "Success"] == [1]
    assert cs.sql("SELECT count(*) AS n FROM sales").collect()[0]["n"] == 12


def test_delete_from_cube_before_date(cs):
    import time

    cutoff = time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(time.time() + 3600))
    n = cs.sql(f"DELETE FROM CUBE sales WHERE ts BEFORE '{cutoff}'").collect()[0][
        "deleted"
    ]
    assert n == 3  # all three loads started before one hour from now
    # a typo'd field is rejected, not silently accepted (the reference
    # validates the field against the cube's time dimensions)
    with pytest.raises(ValueError, match="not a column"):
        cs.sql("DELETE FROM CUBE sales WHERE nope BEFORE '2020-01-01T00:00:00'")


def test_clean_files_for_cube(cs):
    cs.sql("DELETE LOAD 0 FROM CUBE sales")
    removed = cs.sql("CLEAN FILES FOR CUBE sales").collect()
    assert [r["removed_segment"] for r in removed] == [0]


def test_drop_cube_if_exists(cs):
    assert cs.sql("DROP CUBE IF EXISTS nope").count() == 0  # no raise
    cs.sql("DROP CUBE IF EXISTS sales")
    assert "sales" not in cs.store.tables()
    with pytest.raises(Exception):
        cs.sql("DROP CUBE sales")  # without IF EXISTS a missing cube raises


def test_create_aggregatetable_from_cube_auto_named(cs):
    created = cs.sql(
        "CREATE AGGREGATETABLE city, sum(amount), count(amount) FROM CUBE sales"
    ).collect()[0]["created"]
    assert created == "auto0"
    # a second one gets the next free name
    assert (
        cs.sql("CREATE AGGREGATETABLE city, max(amount) FROM CUBE sales")
        .collect()[0]["created"]
        == "auto1"
    )
    rows = cs.sql("SHOW AGGREGATE TABLES").collect()
    assert {(r["fact_table"], r["aggregate_table"]) for r in rows} == {
        ("sales", "auto0"),
        ("sales", "auto1"),
    }
    # the per-fact form still works and agrees
    per = cs.sql("SHOW AGGREGATE TABLES FOR TABLE sales").collect()
    assert {r["aggregate_table"] for r in per} == {"auto0", "auto1"}
    # the rollup it created routes a matching GROUP BY correctly
    out = cs.sql(
        "SELECT city, sum(amount) AS total FROM sales GROUP BY city ORDER BY city"
    ).collect()
    want = {"c0": 3 * (0 + 3 + 6 + 9), "c1": 3 * (1 + 4 + 7 + 10), "c2": 3 * (2 + 5 + 8 + 11)}
    assert {r["city"]: r["total"] for r in out} == want
    # an unparseable attribute is a loud error
    with pytest.raises(ValueError, match="cannot parse"):
        cs.sql("CREATE AGGREGATETABLE city + 1 FROM CUBE sales")


def test_drop_aggregate_table_if_exists(cs):
    cs.sql("CREATE AGGREGATETABLE city, sum(amount) FROM CUBE sales")
    assert cs.sql("DROP AGGREGATE TABLE auto0").collect()[0]["dropped"] == "auto0"
    assert cs.sql("SHOW AGGREGATE TABLES").count() == 0
    assert cs.sql("DROP AGGREGATE TABLE IF EXISTS auto0").count() == 0  # no raise
    with pytest.raises(ValueError, match="not found"):
        cs.sql("DROP AGGREGATE TABLE auto0")


def test_show_cubes_forms(cs):
    for stmt in ("SHOW CUBES", "SHOW ALL CUBES", "SHOW CUBES IN default"):
        assert [r["cube_name"] for r in cs.sql(stmt).collect()] == ["sales"]
    det = cs.sql("SHOW CUBES DETAIL").collect()
    assert det[0]["cube_name"] == "sales"
    assert det[0]["valid_segments"] == 3 and det[0]["rows"] == 36


def test_describe_aliases(cs):
    """Plain DESCRIBE lists columns Hive-style with dimension/measure
    annotations (the reference routes it to DescribeCommand);
    EXTENDED/FORMATTED appends the detailed-table-information rows."""
    base = cs.sql("DESCRIBE sales").collect()
    assert [(r["col_name"], r["data_type"], r["comment"]) for r in base] == [
        ("city", "string", "dimension"),
        ("ts", "timestamp", "dimension"),
        ("amount", "double", "measure"),
    ]
    assert cs.sql("DESC sales").collect() == base
    for stmt in ("DESCRIBE EXTENDED sales", "DESC FORMATTED default.sales"):
        rows = cs.sql(stmt).collect()
        assert rows[: len(base)] == base  # columns first, verbatim
        detail = {r["col_name"]: r["data_type"] for r in rows[len(base) + 1 :]}
        assert detail["name"] == "sales" and detail["segments"] == "3"


def test_namespace_statements(cs):
    assert cs.sql("SHOW SCHEMAS").collect()[0]["namespace"] == "default"
    assert cs.sql("SHOW DATABASES").collect()[0]["namespace"] == "default"
    assert cs.sql("USE default").collect()[0]["ok"] is True


def test_load_data_overwrite_and_cube_forms(cs, spark, tmp_path):
    """loadDataNew's OVERWRITE + INTO CUBE (CarbonSqlParser.scala:795-805)
    and the legacy star-schema form LOAD DATA FACT FROM ... INTO CUBE
    with FIELDS TERMINATED BY (:779-793). DIMENSION FROM is rejected
    loudly (flat-table model)."""
    csv1 = tmp_path / "one.csv"
    csv1.write_text("city,ts,amount\nx,2021-01-01 00:00:00,5.0\n")
    seg = cs.sql(
        f"LOAD DATA INPATH '{csv1}' INTO CUBE sales"
    ).collect()[0]["segment_id"]
    assert seg == 3  # appended after the fixture's three loads
    assert cs.sql("SELECT count(*) AS n FROM sales").collect()[0]["n"] == 37

    # OVERWRITE atomically replaces all prior segments
    seg = cs.sql(
        f"LOAD DATA INPATH '{csv1}' OVERWRITE INTO TABLE sales"
    ).collect()[0]["segment_id"]
    assert cs.sql("SELECT count(*) AS n FROM sales").collect()[0]["n"] == 1
    ok = [r for r in cs.sql("SHOW LOADS FOR CUBE sales").collect() if r["status"] == "Success"]
    assert [r["segment_id"] for r in ok] == [seg]

    # legacy fact-load form with a custom field terminator
    csv2 = tmp_path / "two.csv"
    csv2.write_text("city|ts|amount\ny|2021-01-02 00:00:00|7.0\nz|2021-01-03 00:00:00|9.0\n")
    cs.sql(f"LOAD DATA FACT FROM '{csv2}' INTO CUBE default.sales FIELDS TERMINATED BY '|'")
    assert cs.sql("SELECT count(*) AS n FROM sales").collect()[0]["n"] == 3

    with pytest.raises(ValueError, match="DIMENSION FROM"):
        cs.sql(
            f"LOAD DATA FACT FROM '{csv2}' DIMENSION FROM city:'/tmp/d.csv' INTO CUBE sales"
        )


def test_create_cube_structured_options(spark, tmp_path):
    """The reference's CREATE CUBE OPTIONS payloads (CarbonSqlParser:
    noDictionaryDims:975, aggregation:973, partitioner:983) plus IF NOT
    EXISTS: PARTITIONER columns become hive partition directories (the
    PARTITIONER pruning analogue), NO_DICTIONARY dims are excluded from
    dictionary_include, and AGGREGATION pre-declares an auto rollup."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE CUBE IF NOT EXISTS f DIMENSIONS (region string, uid string) "
        "MEASURES (amount double) OPTIONS ("
        "PARTITIONER [CLASS = 'org.example.HashPartitioner', "
        "COLUMNS = (region), PARTITION_COUNT = 4], "
        "NO_DICTIONARY (uid), AGGREGATION [sum(amount), count(amount)])"
    )
    # idempotent under IF NOT EXISTS, loud without it
    assert cs.sql(
        "CREATE CUBE IF NOT EXISTS f DIMENSIONS (region string) MEASURES (x int)"
    ).count() == 0
    with pytest.raises(Exception):
        cs.sql("CREATE CUBE f DIMENSIONS (region string) MEASURES (x int)")

    d = {r["col_name"]: r["data_type"] for r in cs.sql("DESC FORMATTED f").collect()}
    props = d["properties"]
    assert "partitioner_class" in props and "'partition_count': '4'" in props.replace('"', "'")
    assert "uid" not in props.split("dictionary_include")[1].split(",")[0]

    df = spark.createDataFrame(
        [(f"r{i % 2}", f"u{i}", float(i)) for i in range(8)],
        "region string, uid string, amount double",
    )
    cs.store.load("f", df)
    # the partition column landed as hive directories -> partition
    # pruning; and the declared rollup exists and routes
    import os

    seg0 = os.path.join(cs.store._table_dir("f"), "Fact", "Part0", "Segment_0")
    assert any(e.startswith("region=") for e in os.listdir(seg0)), os.listdir(seg0)
    assert [r["aggregate_table"] for r in cs.sql("SHOW AGGREGATE TABLES").collect()] == ["auto0"]
    out = cs.sql(
        "SELECT region, sum(amount) AS total FROM f GROUP BY region ORDER BY region"
    ).collect()
    assert [(r["region"], r["total"]) for r in out] == [("r0", 12.0), ("r1", 16.0)]
    # a partitioner column that is not a dimension is rejected loudly
    with pytest.raises(ValueError, match="must be dimensions"):
        cs.sql(
            "CREATE CUBE g DIMENSIONS (a string) MEASURES (v double) "
            "OPTIONS (PARTITIONER [COLUMNS = (nope), PARTITION_COUNT = 2])"
        )
