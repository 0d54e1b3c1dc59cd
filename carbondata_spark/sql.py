"""Carbon SQL front-end: management DDL router + Spark SQL passthrough.

Reference parity: CarbonContext.sql tries the Carbon DDL/DML grammar
first and falls back to HiveQL for everything else
(CarbonSqlParser.scala:161-177). Here the management grammar is a small
regex router over the CarbonStore API; SELECT and any unmatched statement
go straight to ``spark.sql`` after registering the store's tables as
views — so the full Spark SQL surface is the query language, exactly as
the reference delegates to HiveContext.

Supported statements (case-insensitive):

    CREATE TABLE <t> (<col> <type>, ...) [SORTED BY (c1, c2)]
    DROP TABLE <t>
    SHOW TABLES
    SHOW SEGMENTS FOR TABLE <t>            -- SHOW LOADS
    DELETE SEGMENTS <id,...> FROM TABLE <t>  -- DELETE LOAD
    DELETE SEGMENTS FROM TABLE <t> WHERE STARTTIME BEFORE '<ts>'
    CLEAN FILES FOR TABLE <t>
    ALTER TABLE <t> COMPACT                -- MERGE
    DESCRIBE [FORMATTED] <t>
    <anything else>                        -- spark.sql passthrough
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from carbondata_spark.store import CarbonStore

_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "numeric": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def _parse_type(s: str) -> T.DataType:
    s = s.strip().lower()
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array\s*<(.+)>", s)
    if m:
        return T.ArrayType(_parse_type(m.group(1)))
    if s in _TYPES:
        return _TYPES[s]
    raise ValueError(f"unsupported type: {s}")


class CarbonSession:
    """sql() entry point over a CarbonStore."""

    def __init__(self, spark: SparkSession, store: CarbonStore):
        self.spark = spark
        self.store = store

    def _rows(self, rows: list[dict], schema: str) -> DataFrame:
        return self.spark.createDataFrame([Row(**r) for r in rows], schema) if rows else (
            self.spark.createDataFrame([], schema)
        )

    def sql(self, text: str) -> DataFrame:
        s = " ".join(text.strip().rstrip(";").split())
        low = s.lower()

        m = re.fullmatch(r"show tables", low)
        if m:
            return self._rows(
                [{"table_name": t} for t in self.store.tables()], "table_name string"
            )

        m = re.fullmatch(r"show (?:segments|loads) for table (\w+)", low)
        if m:
            segs = self.store.show_segments(m.group(1))
            rows = [
                {
                    "segment_id": e["segment_id"],
                    "status": e["status"],
                    "rows": e["rows"],
                    "load_start": datetime.fromtimestamp(
                        e["load_start_ts"], tz=timezone.utc
                    ).isoformat(),
                }
                for e in segs
            ]
            return self._rows(rows, "segment_id long, status string, rows long, load_start string")

        m = re.fullmatch(r"delete segments ([\d,\s]+) from table (\w+)", low)
        if m:
            ids = [int(x) for x in m.group(1).replace(" ", "").split(",") if x]
            n = self.store.delete_segments(m.group(2), ids)
            return self._rows([{"deleted": n}], "deleted long")

        m = re.fullmatch(
            r"delete segments from table (\w+) where starttime before '([^']+)'", low
        )
        if m:
            ts = datetime.fromisoformat(m.group(2)).replace(tzinfo=timezone.utc).timestamp()
            n = self.store.delete_segments_by_date(m.group(1), ts)
            return self._rows([{"deleted": n}], "deleted long")

        m = re.fullmatch(r"show aggregate tables for table (\w+)", low)
        if m:
            from carbondata_spark.plans.agg_table import list_aggregate_tables

            return self._rows(
                [{"aggregate_table": n} for n in list_aggregate_tables(self.store, m.group(1))],
                "aggregate_table string",
            )

        m = re.fullmatch(r"drop aggregate table (\w+) on table (\w+)", low)
        if m:
            from carbondata_spark.plans.agg_table import drop_aggregate_table

            drop_aggregate_table(self.store, m.group(2), m.group(1))
            return self._rows([{"dropped": m.group(1)}], "dropped string")

        m = re.fullmatch(r"clean files for table (\w+)", low)
        if m:
            removed = self.store.clean_files(m.group(1))
            return self._rows([{"removed_segment": r} for r in removed], "removed_segment long")

        m = re.fullmatch(
            r"alter table (\w+) add columns \((.+?)\)(?: defaults \((.+?)\))?", low
        )
        if m:
            name, cols_s, defs_s = m.group(1), m.group(2), m.group(3)
            fields = []
            for part in _split_cols(cols_s):
                cname, ctype = part.strip().split(None, 1)
                fields.append(T.StructField(cname, _parse_type(ctype)))
            defaults = {}
            if defs_s:
                for pair in _split_cols(defs_s):
                    k, v = pair.split("=", 1)
                    defaults[k.strip()] = v.strip().strip("'\"")
            self.store.alter_add_columns(name, fields, defaults=defaults)
            return self._rows(
                [{"added": f.name} for f in fields], "added string"
            )

        m = re.fullmatch(r"alter table (\w+) drop columns \(([\w\s,]+)\)", low)
        if m:
            cols = [c.strip() for c in m.group(2).split(",")]
            self.store.alter_drop_columns(m.group(1), cols)
            return self._rows([{"dropped": c} for c in cols], "dropped string")

        m = re.fullmatch(r"alter table (\w+) compact", low)
        if m:
            new_id = self.store.compact(m.group(1))
            return self._rows(
                [{"new_segment": new_id if new_id is not None else -1}], "new_segment long"
            )

        m = re.fullmatch(r"describe (?:formatted )?(\w+)", low)
        if m:
            d = self.store.describe(m.group(1))
            return self._rows(
                [{"property": k, "value": str(v)} for k, v in d.items()],
                "property string, value string",
            )

        m = re.fullmatch(r"drop table (\w+)", low)
        if m:
            self.store.drop_table(m.group(1))
            return self._rows([{"dropped": m.group(1)}], "dropped string")

        m = re.fullmatch(
            r"create table (\w+) \((.+?)\)"
            r"(?: sorted by \(([\w\s,]+)\))?"
            r"(?: partitioned by \(([\w\s,]+)\))?",
            low,
        )
        if m:
            name, cols_s, sort_s, part_s = m.group(1), m.group(2), m.group(3), m.group(4)
            fields = []
            for part in _split_cols(cols_s):
                cname, ctype = part.strip().split(None, 1)
                fields.append(T.StructField(cname, _parse_type(ctype)))
            sort_cols = [c.strip() for c in sort_s.split(",")] if sort_s else None
            part_cols = [c.strip() for c in part_s.split(",")] if part_s else None
            self.store.create_table(
                name,
                T.StructType(fields),
                sort_columns=sort_cols,
                partition_columns=part_cols,
            )
            return self._rows([{"created": name}], "created string")

        # passthrough: register store tables as views, run Spark SQL
        for tname in self.store.tables():
            self.store.register_view(tname)
        return self.spark.sql(s)


def _split_cols(s: str) -> list[str]:
    """Split a column list on commas not inside <> or () (decimal(10,2),
    array<...>)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
