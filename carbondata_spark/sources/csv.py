"""CSV ingestion with the reference's LOAD DATA option surface.

Reference parity (SURVEY.md §2.10): `LOAD DATA ... OPTIONS(...)` accepts
DELIMITER, QUOTECHAR, ESCAPECHAR, FILEHEADER, MULTILINE,
COMPLEX_DELIMITER_LEVEL_1/2, and bad-record handling
(CarbonSqlParser.scala:779-834; bad records:
processing/.../csvbased/BadRecordslogger.java). The rebuild maps those
onto `spark.read.csv` options plus column expressions:

- FILEHEADER          → explicit column names when the file has no header
- DELIMITER/QUOTECHAR/ESCAPECHAR/MULTILINE → csv reader options
- COMPLEX_DELIMITER_LEVEL_1 ('$') / LEVEL_2 (':') → `split()` column
  expressions building ArrayType / StructType columns — no Python UDFs,
  so complex parsing stays in codegen at any scale
  (reference test data: integration/spark/src/test/resources/complexdata.csv)
- bad records         → PERMISSIVE mode + `_corrupt_record` capture
  (returned separately), or DROPMALFORMED / FAILFAST passthrough
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# the reference's documented control-character spellings for delimiter
# values (CarbonUtil.unescapeChar, core/.../CarbonUtil.java:1559-1576)
_CONTROL_SPELLINGS = {
    "\\001": "\x01",
    "\\t": "\t",
    "\\r": "\r",
    "\\b": "\b",
    "\\f": "\f",
    "\\n": "\n",
}


def unescape_delimiter(value: str) -> str:
    """DELIMITER spelling normalization: '\\t', '\\001', '\\r', '\\b',
    '\\f', '\\n' mean the control character (CarbonUtil.java:1559-1576);
    anything else passes through verbatim."""
    return _CONTROL_SPELLINGS.get(value, value)


def normalize_escapechar(value: str | None) -> str:
    """ESCAPECHAR value semantics (CSVFilePartitioner.getCustomParser,
    integration/.../CSVFilePartitioner.java:241-246): absent, empty or
    whitespace-only disables escaping entirely (the reference's default —
    a backslash in data stays literal); otherwise the FIRST character of
    the (spelling-normalized) value is the escape character. Spark's csv
    reader cannot unset its escape option, so 'disabled' maps to NUL,
    which never occurs in text data."""
    if value is None or not value.strip():
        return "\x00"
    return _CONTROL_SPELLINGS.get(value, value)[0]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    delimiter: str = ",",
    quotechar: str = '"',
    escapechar: str = "\\",
    fileheader: list[str] | None = None,
    multiline: bool = False,
    timestamp_format: str | None = None,  # carbon.timestamp.format parity
    bad_records_action: str = "capture",  # capture | drop | fail | permissive
    header_in_file: bool | None = None,
) -> DataFrame:
    """Read a CSV with the reference's option surface.

    With ``bad_records_action='capture'`` the result carries a
    ``_corrupt_record`` column: callers split good/bad with
    ``split_bad_records`` (the rebuild of BadRecordslogger).
    """
    mode = {
        "capture": "PERMISSIVE",
        "permissive": "PERMISSIVE",
        "drop": "DROPMALFORMED",
        "fail": "FAILFAST",
    }[bad_records_action]

    reader = (
        spark.read.option("delimiter", delimiter)
        .option("quote", quotechar)
        .option("escape", escapechar)
        .option("multiLine", multiline)
        .option("mode", mode)
    )
    if timestamp_format is not None:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        if bad_records_action == "capture" and CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
        reader = reader.schema(schema)
        # header_in_file decouples "skip a physical header line" from
        # "column names come from FILEHEADER": a caller that peeked the
        # file's own header to build a by-name read schema passes the
        # names as fileheader AND header_in_file=True.
        header = (fileheader is None) if header_in_file is None else header_in_file
        reader = reader.option("header", header)
        df = reader.csv(path)
    elif fileheader is not None:
        reader = reader.option("header", False).option("inferSchema", True)
        df = reader.csv(path).toDF(*fileheader)
    else:
        reader = reader.option("header", True).option("inferSchema", True)
        df = reader.csv(path)
    return df


def split_bad_records(
    df: DataFrame, staging_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(good_rows, bad_rows) from a capture-mode read. Bad rows keep the
    raw line for a bad-record log segment.

    Consistency without caching the load: PERMISSIVE-mode
    ``_corrupt_record`` is populated lazily from the scan, so filtering
    the raw read twice could observe two different parses (and a
    ``.cache()`` of the whole input is a cluster-wide disk spill at a
    100-TB load). Instead the parsed frame is written ONCE to a staging
    parquet location and both halves derive from the materialized data —
    one pass over the raw files, columnar staging reads after, and the
    good/bad split is consistent by construction. The staging write is
    the same work a store load would do anyway; callers that go on to
    ``store.load(good)`` pay one extra columnar copy, not a re-parse.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    import tempfile

    staging_dir = staging_dir or tempfile.mkdtemp(prefix="carbondata_badrecords_")
    df.write.mode("overwrite").parquet(staging_dir)
    mat = df.sparkSession.read.parquet(staging_dir)
    good = mat.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = mat.filter(F.col(CORRUPT_COL).isNotNull()).select(F.col(CORRUPT_COL).alias("raw_line"))
    return good, bad


# ---------------------------------------------------------------------------
# complex-type parsing: two-level delimiters ($ then :)
# ---------------------------------------------------------------------------


def parse_array(col: Column, elem_type: T.DataType, delim1: str = "$") -> Column:
    """'a$b$c' → array<elem_type> (COMPLEX_DELIMITER_LEVEL_1)."""
    parts = F.split(col, _re_escape(delim1))
    return F.transform(parts, lambda x: x.cast(elem_type))


def parse_struct(col: Column, struct: T.StructType, delim2: str = ":") -> Column:
    """'x:y:z' → struct (COMPLEX_DELIMITER_LEVEL_2, positional fields)."""
    parts = F.split(col, _re_escape(delim2))
    return F.struct(
        *[
            F.element_at(parts, i + 1).cast(fld.dataType).alias(fld.name)
            for i, fld in enumerate(struct.fields)
        ]
    )


def parse_array_of_struct(
    col: Column, struct: T.StructType, delim1: str = "$", delim2: str = ":"
) -> Column:
    """'a:1$b:2' → array<struct<...>> — the reference's nested shape
    (complexdata.csv: mobile struct inside MAC array etc.)."""
    outer = F.split(col, _re_escape(delim1))
    return F.transform(
        outer,
        lambda item: F.struct(
            *[
                F.element_at(F.split(item, _re_escape(delim2)), i + 1)
                .cast(fld.dataType)
                .alias(fld.name)
                for i, fld in enumerate(struct.fields)
            ]
        ),
    )


def with_complex_columns(
    df: DataFrame,
    complex_schema: dict[str, T.DataType],
    delim1: str = "$",
    delim2: str = ":",
) -> DataFrame:
    """Apply two-level delimiter parsing to the named string columns,
    replacing them with typed Array/Struct columns."""
    out = df
    for name, dtype in complex_schema.items():
        col = F.col(name)
        if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
            parsed = parse_array_of_struct(col, dtype.elementType, delim1, delim2)
        elif isinstance(dtype, T.ArrayType):
            parsed = parse_array(col, dtype.elementType, delim1)
        elif isinstance(dtype, T.StructType):
            parsed = parse_struct(col, dtype, delim2)
        else:
            raise ValueError(f"{name}: unsupported complex type {dtype}")
        out = out.withColumn(name, parsed)
    return out


def _re_escape(d: str) -> str:
    import re

    return re.escape(d)
