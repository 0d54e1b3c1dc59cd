"""Reject-or-run sweep over the LOAD statement option surface.

CarbonSqlParser.scala:779-834 defines two LOAD forms with two option
spellings: the legacy ``LOAD DATA FACT FROM '...' INTO CUBE t
PARTITIONDATA(KEYWORD 'value', ...)`` (partitionOptions — exactly seven
keywords) and ``LOAD DATA INPATH '...' INTO TABLE t
OPTIONS('key'='value', ...)`` (loadOptions). This sweep enumerates every
documented option and pins an OBSERVABLE behavior for each — a load
option that parses but silently does nothing is data corruption, so
anything outside the supported set must raise, and malformed pairs must
raise rather than drop.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from carbondata_spark.query_defs._tmpdirs import mkdtemp


@pytest.fixture()
def cs(spark):
    from carbondata_spark.sql import CarbonSession
    from carbondata_spark.store import CarbonStore

    return CarbonSession(spark, CarbonStore(spark, mkdtemp(prefix="loadopts_")))


def _write(lines: list[str]) -> str:
    d = mkdtemp(prefix="loadopts_csv_")
    p = os.path.join(d, "data.csv")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def _mk(cs, name: str, cols: str = "id int, city string, amt double"):
    cs.sql(f"CREATE TABLE {name} ({cols}) STORED BY 'org.apache.carbondata.format'")


def _rows(cs, name: str):
    return {tuple(r) for r in cs.sql(f"select * from {name}").collect()}


# --- the seven partitionOptions keywords, keyword spelling ---------------


def test_delimiter(cs):
    path = _write(["id|city|amt", "1|x|2.5", "2|y|3.5"])
    _mk(cs, "t_delim")
    cs.sql(f"LOAD DATA FACT FROM '{path}' INTO CUBE t_delim PARTITIONDATA(DELIMITER '|')")
    assert _rows(cs, "t_delim") == {(1, "x", 2.5), (2, "y", 3.5)}


def test_quotechar(cs):
    # the delimiter inside a quoted field must survive
    path = _write(["id,city,amt", "1,~a,b~,2.5"])
    _mk(cs, "t_quote")
    cs.sql(f"LOAD DATA FACT FROM '{path}' INTO CUBE t_quote PARTITIONDATA(QUOTECHAR '~')")
    assert _rows(cs, "t_quote") == {(1, "a,b", 2.5)}


def test_escapechar(cs):
    # an escaped quote inside a quoted field stays literal
    path = _write(['id,city,amt', '1,"a\\"b",2.5'])
    _mk(cs, "t_esc")
    cs.sql(f"LOAD DATA FACT FROM '{path}' INTO CUBE t_esc PARTITIONDATA(ESCAPECHAR '\\')")
    assert _rows(cs, "t_esc") == {(1, 'a"b', 2.5)}


def test_fileheader_permuted_order(cs):
    # FILEHEADER names the CSV's physical order; it may permute the table
    # declaration order (AllDataTypesTestCaseAggregate.scala:50) — values
    # must land by NAME, not position
    path = _write(["x,2.5,1", "y,3.5,2"])
    _mk(cs, "t_fh")
    cs.sql(
        f"LOAD DATA FACT FROM '{path}' INTO CUBE t_fh"
        " PARTITIONDATA(FILEHEADER 'city,amt,id')"
    )
    assert _rows(cs, "t_fh") == {(1, "x", 2.5), (2, "y", 3.5)}


def test_fileheader_missing_table_column_is_null(cs):
    path = _write(["1,x", "2,y"])
    _mk(cs, "t_fh2")
    cs.sql(
        f"LOAD DATA FACT FROM '{path}' INTO CUBE t_fh2"
        " PARTITIONDATA(FILEHEADER 'id,city')"
    )
    assert _rows(cs, "t_fh2") == {(1, "x", None), (2, "y", None)}


def test_multiline(cs):
    # a quoted newline inside a field
    path = _write(['id,city,amt', '1,"a', 'b",2.5'])
    _mk(cs, "t_ml")
    cs.sql(
        f"LOAD DATA FACT FROM '{path}' INTO CUBE t_ml"
        " PARTITIONDATA(MULTILINE 'true')"
    )
    assert _rows(cs, "t_ml") == {(1, "a\nb", 2.5)}


def test_complex_delimiters(cs):
    # '$' between array elements, ':' between struct fields
    # (CarbonSqlParser.scala:95-96, complexdata.csv conventions)
    path = _write(["id,arr,st", "1,2$3$4,x:9"])
    cs.store.create_table(
        "t_cx",
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("arr", T.ArrayType(T.IntegerType())),
                T.StructField(
                    "st",
                    T.StructType(
                        [
                            T.StructField("name", T.StringType()),
                            T.StructField("n", T.IntegerType()),
                        ]
                    ),
                ),
            ]
        ),
    )
    cs.sql(
        f"LOAD DATA FACT FROM '{path}' INTO CUBE t_cx PARTITIONDATA("
        "COMPLEX_DELIMITER_LEVEL_1 '$', COMPLEX_DELIMITER_LEVEL_2 ':')"
    )
    [r] = cs.sql("select * from t_cx").collect()
    assert r["id"] == 1 and r["arr"] == [2, 3, 4]
    assert (r["st"]["name"], r["st"]["n"]) == ("x", 9)


# --- spelling equivalences ------------------------------------------------


def test_keyword_and_kv_spellings_equivalent(cs):
    path = _write(["id|city|amt", "1|x|2.5"])
    _mk(cs, "t_sp1")
    _mk(cs, "t_sp2")
    cs.sql(f"LOAD DATA FACT FROM '{path}' INTO CUBE t_sp1 PARTITIONDATA(DELIMITER '|')")
    cs.sql(f"LOAD DATA INPATH '{path}' INTO TABLE t_sp2 OPTIONS('DELIMITER'='|')")
    assert _rows(cs, "t_sp1") == _rows(cs, "t_sp2") == {(1, "x", 2.5)}


def test_options_and_partitiondata_keywords_interchangeable(cs):
    # loadData accepts (PARTITIONDATA | OPTIONS) for the same clause
    path = _write(["id|city|amt", "1|x|2.5"])
    _mk(cs, "t_sp3")
    cs.sql(f"LOAD DATA FACT FROM '{path}' INTO CUBE t_sp3 OPTIONS(DELIMITER '|')")
    assert _rows(cs, "t_sp3") == {(1, "x", 2.5)}


def test_option_keys_case_insensitive(cs):
    path = _write(["id|city|amt", "1|x|2.5"])
    _mk(cs, "t_ci")
    cs.sql(
        f"LOAD DATA INPATH '{path}' INTO TABLE t_ci"
        " OPTIONS('DeLiMiTeR'='|', 'MULTILINE'='FALSE')"
    )
    assert _rows(cs, "t_ci") == {(1, "x", 2.5)}


def test_fields_terminated_by_alias(cs):
    # the trailing FIELDS TERMINATED BY 'd' clause = DELIMITER
    path = _write(["id;city;amt", "1;x;2.5"])
    _mk(cs, "t_ft")
    cs.sql(
        f"LOAD DATA FACT FROM '{path}' INTO CUBE t_ft"
        " OPTIONS(QUOTECHAR '\"') FIELDS TERMINATED BY ';'"
    )
    assert _rows(cs, "t_ft") == {(1, "x", 2.5)}


# --- reject: never silently ignore --------------------------------------


def test_unknown_option_raises(cs):
    path = _write(["1,x,2.5"])
    _mk(cs, "t_rej1")
    with pytest.raises(ValueError, match="unknown LOAD option"):
        cs.sql(
            f"LOAD DATA INPATH '{path}' INTO TABLE t_rej1"
            " OPTIONS('ALL_DICTIONARY_PATH'='/tmp/x')"
        )


def test_malformed_option_pair_raises(cs):
    path = _write(["1,x,2.5"])
    _mk(cs, "t_rej2")
    with pytest.raises(ValueError, match="malformed option"):
        cs.sql(
            f"LOAD DATA INPATH '{path}' INTO TABLE t_rej2"
            " OPTIONS('DELIMITER'=',', bogus garbage)"
        )


def test_dimension_from_rejected_loudly(cs):
    path = _write(["1,x,2.5"])
    _mk(cs, "t_rej3")
    with pytest.raises(ValueError, match="DIMENSION FROM"):
        cs.sql(
            f"LOAD DATA FACT FROM '{path}' DIMENSION FROM d:'/tmp/d.csv'"
            " INTO CUBE t_rej3 PARTITIONDATA(DELIMITER ',')"
        )
