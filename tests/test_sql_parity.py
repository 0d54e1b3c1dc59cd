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


def test_hive_stored_by_verbatim_reference_statement(spark, tmp_path):
    """The reference's own Hive-syntax DDL runs verbatim — the exact
    statement from ColumnGroupDataTypesTestCase.scala:34, COLUMN_GROUPS
    included. The row-major layout is designed out (Parquet's columnar
    row groups subsume it) but the property is validated, recorded, and
    visible in DESCRIBE FORMATTED; results match the ungrouped table —
    exactly what the reference's test asserts too."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "create table colgrp (column1 string,column2 string,column3 string,"
        "column4 string,column5 string,column6 string,column7 string,"
        "column8 string,column9 string,column10 string,measure1 int,"
        "measure2 int,measure3 int,measure4 int) STORED BY "
        "'org.apache.carbondata.format' TBLPROPERTIES "
        '("COLUMN_GROUPS"="(column2,column3,column4),(column7,column8,column9)")'
    )
    assert "colgrp" in cs.store.tables()
    d = cs.store.describe("colgrp")
    assert d["properties"]["column_groups"] == (
        "(column2,column3,column4),(column7,column8,column9)"
    )
    # string cols are dimensions -> sort columns; int measures surface
    # as double (CarbonDatasourceRelation.scala:194-208 parity)
    assert d["sort_columns"] == [f"column{i}" for i in range(1, 11)]
    types = {f.name: f.dataType.simpleString() for f in cs.store.schema("colgrp").fields}
    assert types["measure1"] == "double"
    # the recorded property shows up in DESCRIBE FORMATTED
    rows = {r["col_name"]: r["data_type"] for r in cs.sql("DESC FORMATTED colgrp").collect()}
    assert "column_groups" in rows["properties"]
    # loads + queries behave identically to an ungrouped table
    df = spark.createDataFrame(
        [tuple(f"v{i}_{j}" for j in range(1, 11)) + (i, i, i, i) for i in range(4)],
        ", ".join([f"column{j} string" for j in range(1, 11)])
        + ", measure1 int, measure2 int, measure3 int, measure4 int",
    )
    cs.store.load("colgrp", df)
    assert cs.sql("SELECT count(*) AS n FROM colgrp").collect()[0]["n"] == 4


def test_hive_stored_by_dictionary_properties(spark, tmp_path):
    """DICTIONARY_INCLUDE promotes a numeric column to a dimension (it
    sorts, it keeps its integer type); DICTIONARY_EXCLUDE makes a string
    dimension no-dictionary (recorded, still sorts). Reference rule:
    CarbonSqlParser.scala:532-630."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE TABLE t1 (empno int, empname string, salary int) "
        "STORED BY 'org.apache.carbondata.format' "
        "TBLPROPERTIES ('DICTIONARY_INCLUDE'='empno', "
        "'DICTIONARY_EXCLUDE'='empname')"
    )
    d = cs.store.describe("t1")
    # empno promoted to dimension: sorts and keeps int; salary is a
    # measure: coerced to double by the int->double parity quirk.
    # Dimension order is FIELD order (the reference's LinkedHashSet fills
    # during one pass over the columns, CarbonSqlParser.scala:552-575)
    assert d["sort_columns"] == ["empno", "empname"]
    types = {f.name: f.dataType.simpleString() for f in cs.store.schema("t1").fields}
    assert types["empno"] == "int" and types["salary"] == "double"
    props = d["properties"]
    assert props["dictionary_exclude"] == "empname"
    assert "empname" not in props["dictionary_include"].split(",")
    assert "empno" in props["dictionary_include"].split(",")
    # unknown TBLPROPERTIES and unknown dictionary columns are loud
    with pytest.raises(ValueError, match="unsupported TBLPROPERTIES"):
        cs.sql(
            "CREATE TABLE t2 (a string) STORED BY "
            "'org.apache.carbondata.format' TBLPROPERTIES ('NOPE'='1')"
        )
    with pytest.raises(ValueError, match="not a column"):
        cs.sql(
            "CREATE TABLE t3 (a string) STORED BY "
            "'org.apache.carbondata.format' "
            "TBLPROPERTIES ('DICTIONARY_INCLUDE'='ghost')"
        )


def test_hive_stored_by_partitioned_and_handler_guard(spark, tmp_path):
    """Hive PARTITIONED BY columns are extra typed columns that become
    hive partition directories; PARTITIONCLASS/PARTITIONCOUNT are
    recorded. A non-carbon storage handler errors exactly like the
    reference ('Not a carbon format request', CarbonSqlParser.scala:405)."""
    import os

    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE TABLE psales (uid string, amount int) "
        "PARTITIONED BY (region string) "
        "STORED BY 'org.apache.carbondata.format' "
        "TBLPROPERTIES ('PARTITIONCLASS'='org.example.HashPartitioner', "
        "'PARTITIONCOUNT'='4')"
    )
    d = cs.store.describe("psales")
    assert d["properties"]["partitioner_class"] == "org.example.HashPartitioner"
    assert d["properties"]["partition_count"] == "4"
    assert "region" in cs.store.schema("psales").fieldNames()
    df = spark.createDataFrame(
        [(f"u{i}", i, f"r{i % 2}") for i in range(6)],
        "uid string, amount int, region string",
    )
    cs.store.load("psales", df)
    seg0 = os.path.join(cs.store._table_dir("psales"), "Fact", "Part0", "Segment_0")
    assert any(e.startswith("region=") for e in os.listdir(seg0)), os.listdir(seg0)
    with pytest.raises(ValueError, match="Not a carbon format request"):
        cs.sql("CREATE TABLE h (a string) STORED BY 'org.apache.hive.hcatalog'")


def test_column_groups_validation_is_loud(spark, tmp_path):
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    base = (
        "CREATE TABLE cg (a string, b string, m int) STORED BY "
        "'org.apache.carbondata.format' TBLPROPERTIES "
    )
    with pytest.raises(ValueError, match="not a column"):
        cs.sql(base + "('COLUMN_GROUPS'='(a,ghost)')")
    with pytest.raises(ValueError, match="is a measure"):
        cs.sql(base + "('COLUMN_GROUPS'='(a,m)')")
    with pytest.raises(ValueError, match="more than one group"):
        cs.sql(base + "('COLUMN_GROUPS'='(a,b),(b)')")
    with pytest.raises(ValueError, match="shaped"):
        cs.sql(base + "('COLUMN_GROUPS'='a,b')")


def test_create_cube_column_groups_rejected_with_pointer(spark, tmp_path):
    """COLUMN_GROUPS is not a CREATE CUBE option in the reference either
    (its options parser takes only AGGREGATION/PARTITIONER) — the error
    names the Hive-syntax form that does carry it, instead of a generic
    unrecognized-syntax failure."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    with pytest.raises(ValueError, match="STORED BY"):
        cs.sql(
            "CREATE CUBE c DIMENSIONS (a string, b string) MEASURES (v int) "
            "OPTIONS (COLUMN_GROUPS [(a,b)])"
        )


def test_update_where_keyword_inside_string_literal(cs):
    """ADVICE r11: the WHERE split is quote-aware — a literal containing
    ' where ' must not truncate the SET list or fabricate a predicate."""
    # unconditional update whose SET literal contains the keyword
    n = cs.sql("UPDATE sales SET city = 'x where y'").collect()[0]["updated_rows"]
    assert n == 36
    assert cs.sql("SELECT count(DISTINCT city) AS n FROM sales").collect()[0]["n"] == 1
    # literal keyword in SET plus a REAL predicate after it
    n = cs.sql(
        "UPDATE sales SET city = 'a where b' WHERE amount < 3"
    ).collect()[0]["updated_rows"]
    assert n == 9
    got = {
        (r["city"], r["n"])
        for r in cs.sql(
            "SELECT city, count(*) AS n FROM sales GROUP BY city"
        ).collect()
    }
    assert got == {("a where b", 9), ("x where y", 27)}
    # commas inside SET literals survive the assignment split too
    n = cs.sql("UPDATE sales SET city = 'p, q' WHERE amount >= 10").collect()[0][
        "updated_rows"
    ]
    assert n == 6
    assert (
        cs.sql("SELECT count(*) AS n FROM sales WHERE city = 'p, q'").collect()[0]["n"]
        == 6
    )


def test_drop_aggregate_table_ambiguity(spark, tmp_path):
    """ADVICE r11: the same auto-name on several facts must not drop an
    arbitrary one — unqualified is an error naming the candidates, and a
    fact qualifier disambiguates."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    for fact in ("f1", "f2"):
        cs.sql(
            f"CREATE CUBE {fact} DIMENSIONS (g string) MEASURES (v double)"
        )
        cs.store.load(
            fact,
            spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double"),
        )
        cs.sql(f"CREATE AGGREGATETABLE g, sum(v) FROM CUBE {fact}")
    with pytest.raises(ValueError, match="several cubes"):
        cs.sql("DROP AGGREGATE TABLE auto0")
    cs.sql("DROP AGGREGATE TABLE f1.auto0")
    from carbondata_spark.plans.agg_table import list_aggregate_tables

    assert list_aggregate_tables(cs.store, "f1") == []
    assert list_aggregate_tables(cs.store, "f2") == ["auto0"]
    # schema-like qualifier that is NOT a fact still hits the ambiguity
    # guard rather than silently picking one
    cs.sql("CREATE AGGREGATETABLE g, sum(v) FROM CUBE f1")
    with pytest.raises(ValueError, match="several cubes"):
        cs.sql("DROP AGGREGATE TABLE default.auto0")


def test_alter_cube_drop_add_defaults(cs):
    """ALTER CUBE verbatim (CarbonSqlParser.scala:731-776): DROP removes
    columns from reads of every segment; ADD DIMENSIONS/MEASURES with
    OPTIONS(DEFAULTS[...]) appends columns default-filled over old
    segments; added dims join dictionary_include (DESCRIBE annotates
    them); added int measures follow the cube's int->double quirk."""
    out = cs.sql(
        "ALTER CUBE sales ADD DIMENSIONS (channel string) "
        "MEASURES (qty int) OPTIONS (DEFAULTS [channel = 'legacy', qty = 0])"
    ).collect()
    assert {(r["action"], r["column"]) for r in out} == {
        ("added", "channel"),
        ("added", "qty"),
    }
    rows = {r["col_name"]: (r["data_type"], r["comment"])
            for r in cs.sql("DESCRIBE sales").collect()}
    assert rows["channel"] == ("string", "dimension")
    # int measure surfaced as double (the cube was created with the
    # reference coercion on)
    assert rows["qty"][0] == "double"
    got = cs.sql(
        "SELECT channel, count(*) AS n, sum(qty) AS q FROM sales GROUP BY channel"
    ).collect()
    assert [(r["channel"], r["n"], r["q"]) for r in got] == [("legacy", 36, 0.0)]

    out = cs.sql("ALTER CUBE default.sales DROP (channel)").collect()
    assert [(r["action"], r["column"]) for r in out] == [("dropped", "channel")]
    assert "channel" not in cs.store.schema("sales").fieldNames()

    # reference parity errors: empty ADD, star-schema WITH, stray DEFAULTS
    with pytest.raises(ValueError, match="empty ADD definition"):
        cs.sql("ALTER CUBE sales ADD OPTIONS (DEFAULTS [x = 1])")
    with pytest.raises(ValueError, match="not supported"):
        cs.sql(
            "ALTER CUBE sales ADD DIMENSIONS (city2 string) WITH city2 "
            "RELATION (FACT.city = city2) INCLUDE (city2)"
        )
    with pytest.raises(ValueError, match="without an ADD"):
        cs.sql("ALTER CUBE sales DROP (ts) OPTIONS (DEFAULTS [ghost = 1])")
    with pytest.raises(ValueError, match="not being added"):
        cs.sql(
            "ALTER CUBE sales ADD DIMENSIONS (a string) "
            "OPTIONS (DEFAULTS [b = 1])"
        )


def test_alter_cube_no_dictionary_and_aggregation(cs):
    """NO_DICTIONARY must name added string dimensions (validated; the
    global dictionary itself is designed out — Parquet dictionary-encodes
    per chunk automatically); AGGREGATION declares the next auto rollup
    exactly like CREATE AGGREGATETABLE."""
    cs.sql(
        "ALTER CUBE sales ADD DIMENSIONS (uid string) "
        "OPTIONS (NO_DICTIONARY(uid), DEFAULTS [uid = 'u0'], "
        "AGGREGATION [sum(amount), max(amount)])"
    )
    d = cs.store.describe("sales")
    assert "uid" in d["properties"]["dictionary_exclude"].split(",")
    assert "uid" not in d["properties"]["dictionary_include"].split(",")
    from carbondata_spark.plans.agg_table import list_aggregate_tables

    assert list_aggregate_tables(cs.store, "sales") == ["auto0"]
    # the declared rollup routes
    out = cs.sql(
        "SELECT city, sum(amount) AS total FROM sales GROUP BY city ORDER BY city"
    ).collect()
    assert [r["city"] for r in out] == ["c0", "c1", "c2"]
    with pytest.raises(ValueError, match="added dimensions"):
        cs.sql(
            "ALTER CUBE sales ADD DIMENSIONS (x string) "
            "OPTIONS (NO_DICTIONARY(city))"
        )
    with pytest.raises(ValueError, match="unrecognized"):
        cs.sql("ALTER CUBE sales ADD DIMENSIONS (y string) OPTIONS (NOPE(z))")


def test_hive_stored_by_partition_filter_is_directory_pruned(spark, tmp_path):
    """A Hive-syntax PARTITIONED BY table prunes at the directory level:
    the partition predicate lands in PartitionFilters (planning-time
    listing of matching hive directories), not DataFilters."""
    import re

    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE TABLE hp (uid string, amount int) PARTITIONED BY (region string) "
        "STORED BY 'org.apache.carbondata.format'"
    )
    cs.store.load(
        "hp",
        spark.createDataFrame(
            [(f"u{i}", i, f"r{i % 3}") for i in range(9)],
            "uid string, amount int, region string",
        ),
    )
    df = cs.store.table("hp").filter(F.col("region") == "r1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*region[^\]]*r1", plan), plan
    assert "DataFilters: []" in plan
    assert df.count() == 3


def test_no_dictionary_dims_sort_last_and_describe_as_dimensions(spark, tmp_path):
    """The reference splits dims into dictionary dimCols (the MDKey) and
    no-dictionary dims tracked separately (its own parser test,
    TestCarbonSqlParser.scala:59-84, pins dimCols=[col3,col4] with the
    DICTIONARY_EXCLUDE'd col2 on the no-dictionary side). Analogue here:
    NO_DICTIONARY/DICTIONARY_EXCLUDE dims sort AFTER the dictionary dims
    (high-cardinality suffix keeps long sorted runs for pruning) and
    DESCRIBE still annotates them as dimensions, never measures."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE CUBE c1 DIMENSIONS (a string, uid string, b string) "
        "MEASURES (v double) OPTIONS (NO_DICTIONARY (uid))"
    )
    assert cs.store.describe("c1")["sort_columns"] == ["a", "b", "uid"]
    rows = {r["col_name"]: r["comment"] for r in cs.sql("DESCRIBE c1").collect()}
    assert rows["uid"] == "dimension" and rows["v"] == "measure"
    # same rule through the Hive-syntax form (reference test shape:
    # col1 int msr, col2 excluded string, col3 string, col4 included int)
    cs.sql(
        "CREATE TABLE t4 (col1 int, col2 string, col3 string, col4 int) "
        "STORED BY 'org.apache.carbondata.format' TBLPROPERTIES "
        "('DICTIONARY_EXCLUDE'='col2', 'DICTIONARY_INCLUDE'='col4')"
    )
    assert cs.store.describe("t4")["sort_columns"] == ["col3", "col4", "col2"]
    rows = {r["col_name"]: r["comment"] for r in cs.sql("DESCRIBE t4").collect()}
    assert rows == {
        "col1": "measure",
        "col2": "dimension",
        "col3": "dimension",
        "col4": "dimension",
    }


def test_high_cardinality_no_dictionary_cube_verbatim(spark, tmp_path):
    """The HighCardinalityDataTypesTestCase CREATE statement runs
    verbatim (NO_DICTIONARY on integer AND string dims, space-separated
    OPTIONS clauses), and the no-dictionary columns answer the suite's
    query shapes (IN / NOT IN / = / projection with mixed columns)."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE CUBE NO_DICTIONARY_CARBON_6 DIMENSIONS (empno Integer, "
        "doj Timestamp, workgroupcategory Integer, empname String,"
        "workgroupcategoryname String, deptno Integer, deptname String, "
        "projectcode Integer, projectjoindate Timestamp, projectenddate "
        "Timestamp, designation String) MEASURES (attendance Integer,"
        "utilization Integer,salary Integer) "
        "OPTIONS (NO_DICTIONARY(empno,empname,designation) PARTITIONER "
        "[PARTITION_COUNT=1])"
    )
    d = cs.store.describe("NO_DICTIONARY_CARBON_6")
    assert d["properties"]["dictionary_exclude"] == "empno,empname,designation"
    # no-dictionary dims sort LAST (MDKey prefix analogue)
    assert d["sort_columns"][-3:] == ["empno", "empname", "designation"]
    rows = [
        (11 + i, "2016-01-01 00:00:00", 1, f"e{11 + i}", "cat", 1, "dept",
         100, "2016-01-01 00:00:00", "2016-06-01 00:00:00", "eng",
         float(20 + i), float(90), float(5000 + i))
        for i in range(7)  # empno 11..17
    ]
    schema = (
        "empno int, doj string, workgroupcategory int, empname string, "
        "workgroupcategoryname string, deptno int, deptname string, "
        "projectcode int, projectjoindate string, projectenddate string, "
        "designation string, attendance double, utilization double, "
        "salary double"
    )
    df = spark.createDataFrame(rows, schema)
    for c in ("doj", "projectjoindate", "projectenddate"):
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    cs.store.load("NO_DICTIONARY_CARBON_6", df)
    got = cs.sql(
        "select empno from NO_DICTIONARY_CARBON_6 where empno in(11,12,13)"
    ).collect()
    assert sorted(r["empno"] for r in got) == [11, 12, 13]
    got = cs.sql(
        "select empno from NO_DICTIONARY_CARBON_6 "
        "where empno not in(11,12,13,14,15,16)"
    ).collect()
    assert [r["empno"] for r in got] == [17]
    got = cs.sql(
        "select empno,empname,workgroupcategory from NO_DICTIONARY_CARBON_6 "
        "where empno=17"
    ).collect()
    assert [(r["empno"], r["empname"], r["workgroupcategory"]) for r in got] == [
        (17, "e17", 1)
    ]


def test_dictionary_exclude_on_numeric_is_ignored(spark, tmp_path):
    """The reference applies DICTIONARY_EXCLUDE only to string columns
    (extractDimColsAndNoDictionaryFields walks string/array/struct
    fields); excluding a numeric column is a no-op, never a
    dimension-annotation leak."""
    cs = CarbonSession(spark, CarbonStore(spark, str(tmp_path / "store")))
    cs.sql(
        "CREATE TABLE tnum (a string, m int) STORED BY "
        "'org.apache.carbondata.format' TBLPROPERTIES "
        "('DICTIONARY_EXCLUDE'='m')"
    )
    d = cs.store.describe("tnum")
    assert d["properties"].get("dictionary_exclude", "") == ""
    rows = {r["col_name"]: r["comment"] for r in cs.sql("DESCRIBE tnum").collect()}
    assert rows == {"a": "dimension", "m": "measure"}


def test_show_create_cube_rejected_loudly(cs):
    """The last unhandled reference start symbol (showCreateCube,
    CarbonSqlParser.scala:272-313) is designed out — the rejection must
    name the statement and point at the working alternatives, not fall
    through to a generic Spark parse error."""
    with pytest.raises(ValueError, match="SHOW CREATE CUBE.*DESCRIBE EXTENDED sales"):
        cs.sql("SHOW CREATE CUBE sales")
    with pytest.raises(ValueError, match="SHOW CREATE CUBE"):
        cs.sql("SHOW CREATE CUBE default.sales USING SOURCE_DDL")


def test_alter_cube_no_dictionary_case_insensitive(cs):
    # identifiers are case-insensitive in this dialect: NO_DICTIONARY
    # (Channel) must match ADD DIMENSIONS (channel string)
    cs.sql(
        "ALTER CUBE sales ADD DIMENSIONS (channel string) "
        "OPTIONS (NO_DICTIONARY(Channel), DEFAULTS [channel = 'web'])"
    )
    d = cs.store.describe("sales")
    assert "Channel" in d["properties"]["dictionary_exclude"].split(",")
    assert "channel" not in d["properties"]["dictionary_include"].split(",")


def test_alter_cube_no_dictionary_numeric_rejected(cs):
    # the documented contract: NO_DICTIONARY applies to string/complex
    # dimensions only (a numeric dimension has no dictionary to skip)
    with pytest.raises(ValueError, match="string/complex"):
        cs.sql(
            "ALTER CUBE sales ADD DIMENSIONS (rank int) "
            "OPTIONS (NO_DICTIONARY(rank))"
        )


def test_tblproperties_malformed_pair_rejected(cs, tmp_path):
    # an unquoted key must ERROR, not silently drop the property
    with pytest.raises(ValueError, match="malformed TBLPROPERTIES"):
        cs.sql(
            "CREATE TABLE tp1 (a string, b int) STORED BY "
            "'org.apache.carbondata.format' "
            "TBLPROPERTIES (COLUMN_GROUPS='(a,b)')"
        )
    # mismatched quote styles must ERROR too
    with pytest.raises(ValueError, match="malformed TBLPROPERTIES"):
        cs.sql(
            "CREATE TABLE tp2 (a string) STORED BY "
            "'org.apache.carbondata.format' TBLPROPERTIES ('k\"='v\")"
        )
    # well-formed pairs (including a comma inside the quoted value)
    # still parse, and unknown keys still hit the existing guard
    with pytest.raises(ValueError, match="unsupported TBLPROPERTIES"):
        cs.sql(
            "CREATE TABLE tp3 (a string) STORED BY "
            "'org.apache.carbondata.format' TBLPROPERTIES ('nope'='x,y')"
        )
    cs.sql(
        "CREATE TABLE tp4 (a string, b string) STORED BY "
        "'org.apache.carbondata.format' "
        "TBLPROPERTIES ('COLUMN_GROUPS'='(a,b)', 'DICTIONARY_INCLUDE'='a')"
    )
    assert "tp4" in cs.store.tables()
