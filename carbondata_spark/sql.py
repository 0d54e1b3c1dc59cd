"""Carbon SQL front-end: management DDL router + Spark SQL passthrough.

Reference parity: CarbonContext.sql tries the Carbon DDL/DML grammar
first and falls back to HiveQL for everything else
(CarbonSqlParser.scala:161-177). Here the management grammar is a small
regex router over the CarbonStore API; SELECT and any unmatched statement
go straight to ``spark.sql`` after registering the store's tables as
views — so the full Spark SQL surface is the query language, exactly as
the reference delegates to HiveContext.

Matching is case-insensitive over the ORIGINAL statement text and all
identifiers/literals are extracted from the original (never a lowered
copy), so mixed-case table/column names and quoted default values
round-trip exactly; only keywords are case-folded.

Supported statements (case-insensitive keywords):

    CREATE TABLE <t> (<col> <type>, ...) [SORTED BY (c1, c2)]
    CREATE CUBE <t> DIMENSIONS (c type, ...) MEASURES (m type, ...)
        [OPTIONS ('k'='v', ...)]           -- CarbonSqlParser.scala:703-729
    DROP TABLE <t> / DROP CUBE <t> / SHOW CUBES
    SHOW TABLES
    SELECT ... FROM <t> AS OF TIMESTAMP '<iso>'   -- time-travel read
    SHOW SEGMENTS FOR TABLE <t>            -- SHOW LOADS
    DELETE SEGMENTS <id,...> FROM TABLE <t>  -- DELETE LOAD
    DELETE SEGMENTS FROM TABLE <t> WHERE STARTTIME BEFORE '<ts>'
    CLEAN FILES FOR TABLE <t>
    ALTER TABLE <t> COMPACT                -- MERGE
    ALTER TABLE <t> ADD|DROP COLUMNS (...)
    LOAD DATA INPATH '<path>' INTO TABLE <t> [OPTIONS('k'='v', ...)]
                    -- CarbonSqlParser.scala:779-834 option surface
    CREATE AGGREGATETABLE <name> FROM TABLE <fact>
        GROUP BY (d1, ...) AGGREGATES (sum(m1), ...)
                    -- CarbonSqlParser.scala:182-224
    SHOW AGGREGATE TABLES FOR TABLE <t> / DROP AGGREGATE TABLE ...
    DESCRIBE [FORMATTED] <t>
    <anything else>                        -- spark.sql passthrough; a
        simple ``SELECT dims, aggs FROM fact GROUP BY dims`` over a store
        table is transparently answered from a matching aggregate
        (rollup) table when one can derive every requested aggregate
        (SURVEY §7 M4 — the rewrite the reference's live planner lacked).
"""

from __future__ import annotations

import glob
import os
import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from carbondata_spark.store import SEGMENT_SUCCESS, CarbonStore

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
    # bare `decimal` (no precision) is legal in the reference's grammar
    # (FilterProcessor_FT.scala creates `ID decimal` dimensions); Hive's
    # default decimal precision applies.
    "decimal": T.DecimalType(10, 0),
}

_I = re.IGNORECASE


def _parse_type(s: str) -> T.DataType:
    """DDL type string → Spark type; keywords case-insensitive, struct
    field names case-preserving. Handles nesting: array<struct<...>>,
    struct<a:int, b:array<double>> (CarbonSqlParser.scala:905-933
    accepts the same surface)."""
    s = s.strip()
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s, _I)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array\s*<(.+)>", s, _I)
    if m:
        return T.ArrayType(_parse_type(m.group(1)))
    m = re.fullmatch(r"struct\s*<(.+)>", s, _I)
    if m:
        fields = []
        for part in _split_cols(m.group(1)):
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), _parse_type(ftype)))
        return T.StructType(fields)
    if s.lower() in _TYPES:
        return _TYPES[s.lower()]
    raise ValueError(f"unsupported type: {s}")


def _split_outside_quotes(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` occurrences that are not inside single quotes."""
    parts, buf, inq = [], [], False
    for ch in s:
        if ch == "'":
            inq = not inq
            buf.append(ch)
        elif ch == sep and not inq:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _parse_options(opts_s: str | None, strict: bool = False) -> dict[str, str]:
    """OPTIONS('k'='v', ...) and the legacy keyword spelling
    PARTITIONDATA(DELIMITER ',', QUOTECHAR '"', FILEHEADER 'a,b,...')
    (CarbonSqlParser.scala partitionOptions — bare keyword + quoted
    value) → {k_lower: v}. Values keep case and may contain commas
    (FILEHEADER), so items are split on commas outside quotes.
    ``strict`` rejects malformed items instead of dropping them (the
    LOAD statement forms, where a typo'd pair silently changing load
    behavior is worse than an error)."""
    if not opts_s:
        return {}
    out: dict[str, str] = {}
    for item in _split_outside_quotes(opts_s):
        m = (
            re.fullmatch(r"'([^']+)'\s*=\s*'([^']*)'", item)
            or re.fullmatch(r"(\w+)\s*=\s*'([^']*)'", item)
            or re.fullmatch(r"(\w+)\s+'([^']*)'", item)
        )
        if m:
            out[m.group(1).lower()] = m.group(2)
        elif strict:
            raise ValueError(
                f"malformed option {item!r}: expected KEY 'value' "
                "(CarbonSqlParser partitionOptions) or 'key'='value' "
                "(loadOptions)"
            )
    return out


# The full option surface of the LOAD statement forms: the reference's
# partitionOptions/loadOptions keywords (CarbonSqlParser.scala:822-834)
# plus this rebuild's documented extensions. Anything else raises —
# accepted-but-ignored load options are silent data corruption.
_LOAD_OPTION_KEYS = frozenset(
    {
        # CarbonSqlParser.scala:823-827 partitionOptions keywords
        "delimiter",
        "quotechar",
        "fileheader",
        "escapechar",
        "multiline",
        "complex_delimiter_level_1",
        "complex_delimiter_level_2",
        # rebuild extensions (documented in _load_data)
        "format",
        "timestamp_format",
        "bad_records_action",
    }
)


# compressed members keep the documented uniform-header assumption:
# Spark decompresses transparently on read, so a raw readline here would
# see gzip bytes and spuriously mismatch
_COMPRESSED_SUFFIXES = (
    ".gz", ".bz2", ".zst", ".lz4", ".deflate", ".snappy", ".xz", ".br",
)


def _local_load_members(path: str) -> list[str] | None:
    """The local plain-file members of a LOAD DATA input, for the
    per-file header validation — or None for a non-local URI (hdfs://,
    s3a://, ...) where a raw readline is impossible and the documented
    uniform-header assumption applies.

    Non-local is decided by URI SCHEME, not os.path.exists: a local path
    containing a Spark-supported glob ('/data/part-*.csv') fails
    exists() but is still local — expand it with glob.glob so glob
    loads get validated too, instead of a misleading 'non-local path'
    warning (r16 driver advice)."""
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path) and not path.startswith(
        "file:"
    ):
        return None
    local = re.sub(r"^file:(//)?", "", path)
    candidates = (
        glob.glob(os.path.join(local, "*"))
        if os.path.isdir(local)
        else glob.glob(local)  # plain file -> [file]; glob -> matches
    )
    return sorted(
        f
        for f in candidates
        if os.path.isfile(f)
        and not os.path.basename(f).startswith((".", "_"))
        and not f.lower().endswith(_COMPRESSED_SUFFIXES)
    )


class CarbonSession:
    """sql() entry point over a CarbonStore."""

    def __init__(
        self,
        spark: SparkSession,
        store: CarbonStore,
        properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.store = store
        # CarbonProperties analogue (core/.../CarbonProperties.java): the
        # reference's tests set global properties (e.g.
        # carbon.timestamp.format) before DDL/LOAD; here they are
        # session-scoped. Recognized: carbon.timestamp.format — the
        # default CSV timestamp parse format when a LOAD carries no
        # TIMESTAMP_FORMAT option.
        self.properties: dict[str, str] = dict(properties or {})
        self._asof_views: dict[str, set[str]] = {}  # table -> live as-of views

    def _rows(self, rows: list[dict], schema: str) -> DataFrame:
        return self.spark.createDataFrame([Row(**r) for r in rows], schema) if rows else (
            self.spark.createDataFrame([], schema)
        )

    def _resolve(self, name: str) -> str:
        """Store table names resolve case-insensitively, like the
        reference's Hive-backed catalog (its own sortexpr suite CREATEs
        alldatatypescubeSort then LOADs INTO alldatatypescubesort).
        Unknown names pass through so the store's own not-found error
        fires with the user's spelling."""
        return {t.lower(): t for t in self.store.tables()}.get(name.lower(), name)

    def sql(self, text: str) -> DataFrame:
        s = " ".join(text.strip().rstrip(";").split())

        if re.fullmatch(r"show tables", s, _I):
            return self._rows(
                [{"table_name": t} for t in self.store.tables()], "table_name string"
            )

        m = re.fullmatch(r"show (?:segments|loads) for table (\w+)", s, _I)
        if m:
            segs = self.store.show_segments(self._resolve(m.group(1)))
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

        # Reference-exact CUBE statement forms (CarbonSqlParser.scala:
        # showLoads:1096, deleteLoadsByID:1102, deleteLoadsByDate:1110,
        # cleanFiles:1120, dropCubeOrTable:856, showAggregateTables:836,
        # createAggregateTable:182, showCube/showAllCubes:842-854): a
        # reference user's statements run verbatim. The store is
        # single-namespace, so the optional `schema.` qualifier every
        # form allows is accepted and ignored, and IN <schema> filters
        # are no-ops over the one namespace.
        m = re.fullmatch(
            r"show loads for cube (?:\w+\.)?(\w+)(?: limit (\d+))?", s, _I
        )
        if m:
            segs = self.store.show_segments(self._resolve(m.group(1)))
            if m.group(2) is not None:
                # LIMIT n = the n most recent loads, newest first
                segs = sorted(segs, key=lambda e: -e["segment_id"])[: int(m.group(2))]
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

        m = re.fullmatch(r"delete load ([\d,\s]+) from cube (?:\w+\.)?(\w+)", s, _I)
        if m:
            ids = [int(x) for x in m.group(1).replace(" ", "").split(",") if x]
            n = self.store.delete_segments(self._resolve(m.group(2)), ids)
            return self._rows([{"deleted": n}], "deleted long")

        m = re.fullmatch(
            r"delete from cube (?:\w+\.)?(\w+) where (\w+) before '([^']+)'", s, _I
        )
        if m:
            table, field = self._resolve(m.group(1)), m.group(2)
            # the reference validates the field is a time dimension of the
            # cube before deleting whole loads by date
            # (CarbonSqlParser.scala:1110-1118); mirror that instead of
            # silently accepting a typo'd column
            schema_fields = {f.name.lower() for f in self.store.schema(table).fields}
            if field.lower() not in schema_fields and field.lower() != "starttime":
                raise ValueError(
                    f"DELETE FROM CUBE: {field} is not a column of {table} "
                    "(or the pseudo-column STARTTIME)"
                )
            ts = datetime.fromisoformat(m.group(3)).replace(tzinfo=timezone.utc).timestamp()
            n = self.store.delete_segments_by_date(table, ts)
            return self._rows([{"deleted": n}], "deleted long")

        m = re.fullmatch(r"clean files for cube (?:\w+\.)?(\w+)", s, _I)
        if m:
            removed = self.store.clean_files(self._resolve(m.group(1)))
            return self._rows([{"removed_segment": r} for r in removed], "removed_segment long")

        m = re.fullmatch(r"show create cube (?:\w+\.)?(\w+).*", s, _I)
        if m:
            # the LAST start symbol of the reference parser
            # (CarbonSqlParser.scala:175-177, showCreateCube:272-313):
            # it re-emits a CREATE CUBE definition synthesized from a
            # PRE-EXISTING Hive table definition — a legacy
            # create-from-hive migration path this engine designs out
            # (README §SQL surface). Reject loudly with the working
            # alternatives instead of falling through to a baffling
            # Spark parse error.
            raise ValueError(
                "SHOW CREATE CUBE is not supported: the reference form "
                "synthesizes a cube definition from a pre-existing Hive "
                "table (legacy migration path, designed out). Use "
                f"DESCRIBE EXTENDED {m.group(1)} for schema + properties "
                f"and SHOW SEGMENTS FOR TABLE {m.group(1)} for loads"
            )

        m = re.fullmatch(r"drop cube if exists (?:\w+\.)?(\w+)", s, _I)
        if m:
            name = self._resolve(m.group(1))
            if name in self.store.tables():
                self.store.drop_table(name)
                return self._rows([{"dropped": name}], "dropped string")
            return self._rows([], "dropped string")

        m = re.fullmatch(
            r"drop aggregate table (?:if exists )?(?:(\w+)\.)?(\w+)", s, _I
        )
        if m:
            from carbondata_spark.plans.agg_table import (
                drop_aggregate_table,
                list_aggregate_tables,
            )

            qual, name = m.group(1), m.group(2)
            if_exists = "if exists" in s.lower()
            # auto-named aggregates (auto0, auto1, ...) can exist on
            # several facts (ADVICE r11): a dotted qualifier that names a
            # store table disambiguates as fact.aggregate; any other
            # qualifier is the (single-namespace) schema and is ignored.
            facts = [
                f
                for f in self.store.tables()
                if name in list_aggregate_tables(self.store, f)
            ]
            if qual and qual in self.store.tables():
                facts = [f for f in facts if f == qual]
            if len(facts) > 1:
                raise ValueError(
                    f"aggregate table {name} exists on several cubes "
                    f"({', '.join(sorted(facts))}): qualify as "
                    f"<cube>.{name} to disambiguate"
                )
            if facts:
                drop_aggregate_table(self.store, facts[0], name)
                return self._rows([{"dropped": name}], "dropped string")
            if if_exists:
                return self._rows([], "dropped string")
            raise ValueError(f"aggregate table {name} not found on any cube")

        m = re.fullmatch(r"show aggregate tables(?: in \w+)?", s, _I)
        if m:
            from carbondata_spark.plans.agg_table import list_aggregate_tables

            rows = [
                {"fact_table": fact, "aggregate_table": n}
                for fact in self.store.tables()
                for n in list_aggregate_tables(self.store, fact)
            ]
            return self._rows(rows, "fact_table string, aggregate_table string")

        m = re.fullmatch(
            r"create aggregatetable (.+) from cube (?:\w+\.)?(\w+)", s, _I
        )
        if m:
            from carbondata_spark.plans.agg_table import (
                create_aggregate_table,
                list_aggregate_tables,
            )

            fact = m.group(2)
            group_cols: list[str] = []
            measures: dict[str, list[str]] = {}
            for item in _split_cols(m.group(1)):
                item = item.strip()
                fm = re.fullmatch(r"(\w+)\s*\(\s*(\w+)\s*\)", item)
                if fm:
                    measures.setdefault(fm.group(2), []).append(fm.group(1).lower())
                elif re.fullmatch(r"\w+", item):
                    group_cols.append(item)
                else:
                    raise ValueError(f"CREATE AGGREGATETABLE: cannot parse {item!r}")
            # the reference auto-names its aggregate tables; pick the
            # first free autoN on this fact
            existing = set(list_aggregate_tables(self.store, fact))
            i = 0
            while f"auto{i}" in existing:
                i += 1
            name = f"auto{i}"
            create_aggregate_table(self.store, fact, name, group_cols, measures)
            return self._rows([{"created": name}], "created string")

        m = re.fullmatch(r"show (?:all )?cubes(?: in \w+)?( detail)?", s, _I)
        if m and m.group(1):
            rows = []
            for t in self.store.tables():
                segs = self.store.show_segments(t)
                ok = [e for e in segs if e["status"] == SEGMENT_SUCCESS]
                rows.append(
                    {
                        "cube_name": t,
                        "valid_segments": len(ok),
                        "rows": sum(e["rows"] or 0 for e in ok),
                    }
                )
            return self._rows(rows, "cube_name string, valid_segments long, rows long")
        if m:
            return self._rows(
                [{"cube_name": t} for t in self.store.tables()], "cube_name string"
            )

        if re.fullmatch(r"show (?:schemas|databases)", s, _I):
            return self._rows([{"namespace": "default"}], "namespace string")
        if re.fullmatch(r"use \w+", s, _I):
            # single-namespace store: USE is accepted for script parity
            return self._rows([{"ok": True}], "ok boolean")

        m = re.fullmatch(r"delete segments ([\d,\s]+) from table (\w+)", s, _I)
        if m:
            ids = [int(x) for x in m.group(1).replace(" ", "").split(",") if x]
            n = self.store.delete_segments(self._resolve(m.group(2)), ids)
            return self._rows([{"deleted": n}], "deleted long")

        # Row-level IUD over store tables (copy-on-write segment rewrite,
        # store.delete_rows/update_rows). Ordering matters: the
        # load-retention form `DELETE FROM CUBE x WHERE f BEFORE 'd'`
        # matched above, so a WHERE reaching here is a row predicate.
        m = re.fullmatch(
            r"delete from (?:table |cube )?(?:\w+\.)?(\w+) where (.+)", s, _I
        )
        if m and self._resolve(m.group(1)) in self.store.tables():
            n = self.store.delete_rows(self._resolve(m.group(1)), m.group(2))
            return self._rows([{"deleted_rows": n}], "deleted_rows long")

        m = re.fullmatch(
            r"update (?:table |cube )?(?:\w+\.)?(\w+) set (.+)", s, _I
        )
        if m and self._resolve(m.group(1)) in self.store.tables():
            # the WHERE split must be quote-aware: UPDATE t SET
            # note = 'x where y' carries the keyword inside a literal
            # (ADVICE r11 — a lazy regex split produced a bogus parse)
            rest = m.group(2)
            wi = _find_keyword(rest, "where")
            set_s = rest[:wi].strip() if wi >= 0 else rest
            pred = rest[wi + len("where") :].strip() if wi >= 0 else "true"
            assignments: dict[str, str] = {}
            for item in _split_cols(set_s):
                if "=" not in item:
                    raise ValueError(f"UPDATE SET: cannot parse {item!r}")
                c, expr = item.split("=", 1)
                assignments[c.strip()] = expr.strip()
            n = self.store.update_rows(self._resolve(m.group(1)), pred, assignments)
            return self._rows([{"updated_rows": n}], "updated_rows long")

        # MERGE INTO (upsert, store.merge_rows — beyond the reference
        # era, like row-level IUD; the statement mirrors the modern SQL
        # standard's MERGE in the shapes merge_rows supports). USING
        # names a store table or a registered Spark view. ON is either a
        # bare key list `ON (k1, k2)` or a same-column equality chain
        # `ON t.k = s.k AND ...`. UPDATE SET supports `*` (all non-key
        # columns from the source) or `c = s.c` self-assignments;
        # computed updates need the merge_rows API. WHEN NOT MATCHED
        # THEN INSERT * appends unmatched source rows; omitting WHEN
        # MATCHED gives the insert-only (idempotent backfill) merge.
        m = re.fullmatch(
            r"merge into (?:\w+\.)?(\w+) using (?:\w+\.)?(\w+) on (.+?)"
            r"( when matched then update set (?:\*|.+?))?"
            r"( when not matched then insert \*)?",
            s,
            _I,
        )
        if m and self._resolve(m.group(1)) in self.store.tables():
            return self._merge_stmt(
                self._resolve(m.group(1)), m.group(2), m.group(3), m.group(4), m.group(5)
            )

        m = re.fullmatch(
            r"delete segments from table (\w+) where starttime before '([^']+)'", s, _I
        )
        if m:
            ts = datetime.fromisoformat(m.group(2)).replace(tzinfo=timezone.utc).timestamp()
            n = self.store.delete_segments_by_date(m.group(1), ts)
            return self._rows([{"deleted": n}], "deleted long")

        m = re.fullmatch(r"show aggregate tables for table (\w+)", s, _I)
        if m:
            from carbondata_spark.plans.agg_table import list_aggregate_tables

            return self._rows(
                [{"aggregate_table": n} for n in list_aggregate_tables(self.store, m.group(1))],
                "aggregate_table string",
            )

        m = re.fullmatch(r"drop aggregate table (\w+) on table (\w+)", s, _I)
        if m:
            from carbondata_spark.plans.agg_table import drop_aggregate_table

            drop_aggregate_table(self.store, m.group(2), m.group(1))
            return self._rows([{"dropped": m.group(1)}], "dropped string")

        m = re.fullmatch(
            r"create aggregatetable (\w+) from table (\w+)"
            r" group by \(([\w\s,]+)\) aggregates \((.+)\)",
            s,
            _I,
        )
        if m:
            from carbondata_spark.plans.agg_table import create_aggregate_table

            name, fact = m.group(1), m.group(2)
            group_cols = [c.strip() for c in m.group(3).split(",")]
            measures: dict[str, list[str]] = {}
            for fn, col in re.findall(r"(\w+)\s*\(\s*(\w+)\s*\)", m.group(4)):
                measures.setdefault(col, []).append(fn.lower())
            create_aggregate_table(self.store, fact, name, group_cols, measures)
            return self._rows([{"created": name}], "created string")

        m = re.fullmatch(
            r"load data (?:local )?inpath '([^']+)'( overwrite)? "
            r"into (?:table|cube) (?:\w+\.)?(\w+)"
            r"(?: options\s*\((.+)\))?",
            s,
            _I,
        )
        if m:
            # OVERWRITE atomically invalidates all prior segments in the
            # same manifest commit (loadDataNew,
            # CarbonSqlParser.scala:795-805 isOverwrite)
            seg_id = self._load_data(
                m.group(1),
                m.group(3),
                _parse_options(m.group(4), strict=True),
                mode="overwrite" if m.group(2) else "append",
            )
            return self._rows([{"segment_id": seg_id}], "segment_id long")

        # The legacy star-schema load (loadData,
        # CarbonSqlParser.scala:779-793): LOAD DATA FACT FROM 'path'
        # [OVERWRITE] INTO CUBE x [OPTIONS|PARTITIONDATA (...)] [FIELDS
        # TERMINATED BY 'd']. The flat-table model folds dimensions into
        # the fact (SURVEY.md §1), so DIMENSION FROM is rejected loudly
        # rather than half-loaded.
        if re.match(r"load data fact from", s, _I):
            if re.search(r" dimension from ", s, _I):
                raise ValueError(
                    "LOAD DATA ... DIMENSION FROM is not supported: the "
                    "flat-table model folds dimensions into the fact table "
                    "(load them as columns of the fact CSV instead)"
                )
            m = re.fullmatch(
                # FROM'path' with no space is the spelling the reference's
                # own test suite uses (AllDataTypesTestCaseAggregate.scala:50)
                r"load data fact from\s*'([^']+)'( overwrite)? into cube (?:\w+\.)?(\w+)"
                r"(?: (?:options|partitiondata)\s*\((.+?)\))?"
                r"(?: fields terminated by '([^']+)')?",
                s,
                _I,
            )
            if m:
                opts = _parse_options(m.group(4), strict=True)
                if m.group(5):
                    opts.setdefault("delimiter", m.group(5))
                seg_id = self._load_data(
                    m.group(1),
                    m.group(3),
                    opts,
                    mode="overwrite" if m.group(2) else "append",
                )
                return self._rows([{"segment_id": seg_id}], "segment_id long")

        m = re.fullmatch(r"clean files for table (\w+)", s, _I)
        if m:
            removed = self.store.clean_files(self._resolve(m.group(1)))
            return self._rows([{"removed_segment": r} for r in removed], "removed_segment long")

        # ALTER CUBE — the reference's restructure statement
        # (CarbonSqlParser.scala:731-776; clause grammar :226-250):
        # ALTER CUBE [s.]c [DROP (cols)] [ADD [DIMENSIONS (...)]
        # [MEASURES (...)] [WITH relations]] [OPTIONS (
        # [NO_DICTIONARY(...)] [AGGREGATION[...]] [DEFAULTS [c=v, ...]])].
        # WITH dimension relations are star-schema — rejected loudly,
        # same treatment as LOAD DATA ... DIMENSION FROM.
        m = re.fullmatch(
            r"alter cube (?:(\w+)\.)?(\w+)"
            r"(?: drop \(([^)]*)\))?"
            r"( add(?: dimensions \((.+?)\))?(?: measures \((.+?)\))?"
            r"( with .+?)?)?"
            r"(?: options \((.+)\))?",
            s,
            _I,
        )
        if (
            m
            and m.group(2) in self.store.tables()
            and (m.group(3) or m.group(4) or m.group(8))
        ):
            return self._alter_cube(
                cube=m.group(2),
                drop_s=m.group(3),
                has_add=bool(m.group(4)),
                dims_s=m.group(5),
                meas_s=m.group(6),
                with_s=m.group(7),
                opts_s=m.group(8),
            )

        m = re.fullmatch(
            r"alter table (\w+) add columns \((.+?)\)(?: defaults \((.+?)\))?", s, _I
        )
        if m:
            name, cols_s, defs_s = self._resolve(m.group(1)), m.group(2), m.group(3)
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

        m = re.fullmatch(r"alter table (\w+) drop columns \(([\w\s,]+)\)", s, _I)
        if m:
            cols = [c.strip() for c in m.group(2).split(",")]
            self.store.alter_drop_columns(self._resolve(m.group(1)), cols)
            return self._rows([{"dropped": c} for c in cols], "dropped string")

        m = re.fullmatch(r"alter table (\w+) compact", s, _I)
        if m:
            new_id = self.store.compact(self._resolve(m.group(1)))
            return self._rows(
                [{"new_segment": new_id if new_id is not None else -1}], "new_segment long"
            )

        # DESC is a full alias; plain DESCRIBE lists COLUMNS (the
        # reference routes it to Spark's DescribeCommand,
        # CarbonSqlParser.scala:1006-1021 — a Hive-style (col_name,
        # data_type, comment) listing, dims/measures annotated);
        # EXTENDED/FORMATTED appends the detailed-table-information
        # section (DescribeFormattedCommand) as (key, value) rows.
        m = re.fullmatch(
            r"(?:describe|desc)( formatted| extended)? (?:\w+\.)?(\w+)", s, _I
        )
        if m:
            table = self._resolve(m.group(2))
            d = self.store.describe(table)
            # a NO_DICTIONARY / DICTIONARY_EXCLUDE column is still a
            # DIMENSION — the reference tracks it as a no-dictionary dim,
            # not a measure (TestCarbonSqlParser.scala:59-84 pins the
            # split: dimCols vs noDictionary, both dimension-side)
            props_d = d.get("properties", {}) or {}
            dims = set(props_d.get("dictionary_include", "").split(","))
            dims |= {
                c for c in props_d.get("dictionary_exclude", "").split(",") if c
            }
            rows = [
                {
                    "col_name": f.name,
                    "data_type": f.dataType.simpleString(),
                    "comment": "dimension" if f.name in dims else "measure"
                    if dims != {""} else "",
                }
                for f in self.store.schema(table).fields
            ]
            if m.group(1):
                rows.append(
                    {"col_name": "# detailed table information", "data_type": "", "comment": ""}
                )
                rows += [
                    {"col_name": k, "data_type": str(v), "comment": ""}
                    for k, v in d.items()
                ]
            return self._rows(rows, "col_name string, data_type string, comment string")

        m = re.fullmatch(r"drop table (\w+)", s, _I)
        if m:
            self.store.drop_table(self._resolve(m.group(1)))
            return self._rows([{"dropped": m.group(1)}], "dropped string")

        # CREATE CUBE — the reference's primary DDL front door
        # (CarbonSqlParser.scala:703-729; model cubeSchema.scala:107-126):
        # an explicit dimension/measure split. Dimensions become the sort
        # columns (MDKey clustering analogue) and are recorded in
        # dictionary_include; integer MEASURES surface as double (the
        # reference's `case "int" => "double"` coercion,
        # CarbonDatasourceRelation.scala:194-208) via the existing
        # int_measures_as_double property hook.
        m = re.fullmatch(
            # `dimensions(`/`measures(` with no space before the paren is
            # how the reference's own tests spell it
            # (AllDataTypesTestCaseAggregate.scala:41)
            # MEASURES is optional in the reference grammar: its own
            # typed suites create measure-less cubes (sortexpr/
            # TimestampDataTypeTestCase.scala:36 `CREATE CUBE
            # timestamptypecube DIMENSIONS (...) OPTIONS (...)`).
            r"create cube (if not exists )?(?:\w+\.)?(\w+)"
            r" dimensions\s*\((.+?)\)(?: measures\s*\((.+?)\))?"
            r"(?: options\s*\((.+)\))?",
            s,
            _I,
        )
        if m:
            exists_ok = bool(m.group(1))
            name, dims_s = m.group(2), m.group(3)
            meas_s = m.group(4) or ""
            opts_s = m.group(5) or ""
            if exists_ok and name in self.store.tables():
                return self._rows([], "created string")
            fields, dim_names, meas_names = [], [], []
            dim_types: dict[str, T.DataType] = {}
            for part in _split_cols(dims_s):
                cname, ctype = part.strip().split(None, 1)
                fields.append(T.StructField(cname, _parse_type(ctype)))
                dim_names.append(cname)
                dim_types[cname] = fields[-1].dataType
            for part in _split_cols(meas_s) if meas_s else []:
                cname, ctype = part.strip().split(None, 1)
                fields.append(T.StructField(cname, _parse_type(ctype)))
                meas_names.append(cname)
            # The reference's structured OPTIONS clauses
            # (CarbonSqlParser.scala — noDictionaryDims:975,
            # aggregation:973, partitioner:983) carry bracketed payloads
            # the flat k=v option parser cannot hold: lift them out
            # first, parse the remainder as plain options.
            if re.search(r"\bcolumn_groups\b", opts_s, _I):
                # The reference carries COLUMN_GROUPS only as a
                # TBLPROPERTIES key of the Hive-syntax CREATE TABLE
                # (CarbonSqlParser.scala:461-490 reads it from
                # tableProperties; the CREATE CUBE options parser,
                # :283-311, accepts only AGGREGATION and PARTITIONER) —
                # reject loudly instead of failing as unrecognized syntax.
                raise ValueError(
                    "COLUMN_GROUPS is not a CREATE CUBE option: use the "
                    "Hive-syntax form CREATE TABLE ... STORED BY "
                    "'org.apache.carbondata.format' TBLPROPERTIES "
                    "('COLUMN_GROUPS'='(c1,c2),...'), where it is accepted "
                    "and recorded. The row-major physical layout itself is "
                    "subsumed by Parquet's columnar row-group encoding, so "
                    "query results are identical with or without it."
                )
            part_cols, agg_exprs = None, None
            props_extra: dict[str, str] = {}
            pm = re.search(r"partitioner\s*\[(.*?)\]", opts_s, _I)
            if pm:
                body = pm.group(1)
                cm = re.search(r"columns\s*=\s*\(([^)]*)\)", body, _I)
                if cm:
                    part_cols = [c.strip().strip("'\"") for c in cm.group(1).split(",")]
                    unknown = [c for c in part_cols if c not in dim_names]
                    if unknown:
                        raise ValueError(
                            f"PARTITIONER columns must be dimensions: {unknown}"
                        )
                km = re.search(r"class\s*=\s*'([^']*)'", body, _I)
                if km:
                    # recorded for round-tripping; hive partitioning on
                    # the columns IS the hash-partitioner analogue here
                    props_extra["partitioner_class"] = km.group(1)
                nm = re.search(r"partition_count\s*=\s*(\d+)", body, _I)
                if nm:
                    props_extra["partition_count"] = nm.group(1)
                opts_s = opts_s.replace(pm.group(0), "")
            dm = re.search(r"no_dictionary\s*\(([^)]*)\)", opts_s, _I)
            if dm:
                props_extra["dictionary_exclude"] = ",".join(
                    c.strip().strip("'\"") for c in dm.group(1).split(",")
                )
                opts_s = opts_s.replace(dm.group(0), "")
            am = re.search(r"aggregation\s*\[(.*?)\]", opts_s, _I)
            if am:
                agg_exprs = am.group(1)
                opts_s = opts_s.replace(am.group(0), "")
            props = _parse_options(opts_s.strip().strip(",") or None)
            props.update(props_extra)
            excluded = set(props.get("dictionary_exclude", "").split(","))
            props.setdefault(
                "dictionary_include",
                ",".join(c for c in dim_names if c not in excluded),
            )
            props.setdefault("int_measures_as_double", "true")
            self.store.create_table(
                name,
                T.StructType(fields),
                # a hive-partition column is constant within its
                # directory — sort on the remaining dims. MDKey analogue:
                # NO_DICTIONARY (high-cardinality) dims sort AFTER the
                # dictionary dims (TestCarbonSqlParser.scala:59-84 pins
                # the dimCols/noDictionary split) — low-cardinality dims
                # first keep long sorted runs for row-group pruning.
                # DECIMAL dims are excluded from the sort/zone-map set:
                # pyarrow cannot extract parquet column statistics for
                # fixed-length decimals, so a decimal sort column would
                # fail stats collection at load — the column stays fully
                # queryable, it just contributes no segment pruning
                # (matches the reference, whose MDKey covers dictionary
                # dimensions only).
                sort_columns=[
                    c
                    for c in dim_names
                    if c not in excluded
                    and c not in (part_cols or [])
                    and not isinstance(dim_types[c], T.DecimalType)
                ]
                + [
                    c
                    for c in dim_names
                    if c in excluded
                    and c not in (part_cols or [])
                    and not isinstance(dim_types[c], T.DecimalType)
                ],
                partition_columns=part_cols,
                properties=props,
            )
            if agg_exprs:
                # AGGREGATION [sum(x), ...] pre-declares the cube's
                # rollup: an aggregate table over all dimensions,
                # refreshed per load like any other (plans/agg_table)
                from carbondata_spark.plans.agg_table import create_aggregate_table

                measures: dict[str, list[str]] = {}
                for fn_, col_ in re.findall(r"(\w+)\s*\(\s*(\w+)\s*\)", agg_exprs):
                    measures.setdefault(col_, []).append(fn_.lower())
                create_aggregate_table(self.store, name, "auto0", dim_names, measures)
            return self._rows([{"created": name}], "created string")

        m = re.fullmatch(r"drop cube (\w+)", s, _I)
        if m:
            self.store.drop_table(self._resolve(m.group(1)))
            return self._rows([{"dropped": m.group(1)}], "dropped string")

        # Hive-syntax CREATE TABLE ... STORED BY — the form migrating
        # users actually have in scripts (CarbonSqlParser.scala:316-418
        # nodeToPlan/prepareTableModel; run verbatim by
        # ColumnGroupDataTypesTestCase.scala:34). Dimension/measure split
        # per the reference rule (extractDimColsAndNoDictionaryFields /
        # extractMsrColsFromFields, :532-630): string/array/struct
        # columns are dimensions (DICTIONARY_EXCLUDE'd ones become
        # no-dictionary dimensions), DICTIONARY_INCLUDE promotes numeric
        # columns to dimensions, everything else is a measure.
        m = re.fullmatch(
            r"create table (if not exists )?(?:(\w+)\.)?(\w+)\s*\((.+?)\)"
            r"(?: partitioned by \((.+?)\))?"
            r" stored by '([^']+)'"
            r"(?: tblproperties\s*\((.+)\))?",
            s,
            _I,
        )
        if m:
            return self._create_table_hive(
                exists_ok=bool(m.group(1)),
                name=m.group(3),
                cols_s=m.group(4),
                part_s=m.group(5),
                handler=m.group(6),
                props_s=m.group(7),
            )

        m = re.fullmatch(
            r"create table (\w+) \((.+?)\)"
            r"(?: sorted by \(([\w\s,]+)\))?"
            r"(?: partitioned by \(([\w\s,]+)\))?",
            s,
            _I,
        )
        if m:
            name, cols_s, sort_s, part_s = m.group(1), m.group(2), m.group(3), m.group(4)
            fields = []
            for part in _split_cols(cols_s):
                cname, ctype = part.strip().split(None, 1)
                fields.append(T.StructField(cname, _parse_type(ctype)))
            sort_cols = [c.strip() for c in sort_s.split(",")] if sort_s else None
            if sort_cols:
                # same decimal zone-map limitation as the CREATE CUBE path
                # (pyarrow cannot read parquet decimal statistics)
                types = {f.name.lower(): f.dataType for f in fields}
                dropped = [
                    c
                    for c in sort_cols
                    if isinstance(types.get(c.lower()), T.DecimalType)
                ]
                if dropped:
                    import warnings

                    warnings.warn(
                        f"SORTED BY: decimal column(s) {dropped} cannot "
                        "carry zone-map statistics and were dropped from "
                        "the sort key",
                        stacklevel=2,
                    )
                # an explicitly-empty remainder stays [] (user asked for
                # THIS clustering; do not silently fall back to the
                # default dims-sorted set by passing None)
                sort_cols = [c for c in sort_cols if c not in dropped]
            part_cols = [c.strip() for c in part_s.split(",")] if part_s else None
            self.store.create_table(
                name,
                T.StructType(fields),
                sort_columns=sort_cols,
                partition_columns=part_cols,
            )
            return self._rows([{"created": name}], "created string")

        # Rollup routing: a simple GROUP BY over a store fact table is
        # answered from a matching aggregate table when derivable.
        routed = self._try_rollup_route(s)
        if routed is not None:
            return routed

        # Time travel in SQL: `FROM <t> AS OF TIMESTAMP '<iso>'` registers
        # a view of the historical segment set (store.table(as_of_ts=...))
        # under a mangled name and rewrites the reference — the SELECT
        # surface for the manifest's invalidation timestamps.
        by_lower = {t.lower(): t for t in self.store.tables()}
        stmt_asof_views: set[str] = set()  # views THIS statement references

        def _asof_sub(m: re.Match) -> str:
            tname = by_lower[m.group(1).lower()]
            dt = datetime.fromisoformat(m.group(2))
            # honor an explicit offset; only ASSUME UTC for naive literals
            # (replace() on an aware datetime would silently discard the
            # offset and shift the historical view)
            dt = dt.replace(tzinfo=timezone.utc) if dt.tzinfo is None else dt
            ts = dt.timestamp()
            view = f"{tname}_asof_{int(ts * 1000)}"
            self.store.table(tname, as_of_ts=ts).createOrReplaceTempView(view)
            self._asof_views.setdefault(tname, set()).add(view)
            stmt_asof_views.add(view)
            return view

        s = re.sub(
            r"\b(\w+) as of timestamp '([^']+)'",
            lambda m: _asof_sub(m) if m.group(1).lower() in by_lower else m.group(0),
            s,
            flags=_I,
        )

        # passthrough: register ONLY the store tables the statement
        # references as views, then run Spark SQL. Building a view is
        # O(#segments) driver work (manifest read + per-segment scan
        # union), so registering every table on every sql() call would be
        # O(#tables × #segments) per statement; token matching keeps it
        # proportional to the statement. False positives (a table name in
        # a string literal) cost one extra view build, never correctness.
        tokens = {tok.lower() for tok in re.findall(r"[A-Za-z_]\w*", s)}
        for tname in self.store.tables():
            if tname.lower() in tokens:
                self.store.register_view(tname)
        df = self.spark.sql(s)
        # Bound catalog growth — a polling session issuing fresh
        # timestamps would otherwise accumulate an analyzed
        # union-of-segments plan per call, forever. Dropping is DEFERRED
        # until after spark.sql() so a statement referencing the same
        # table at two timestamps (snapshot diff) keeps both views live
        # through analysis; spark.sql analyzes eagerly, so the returned
        # DataFrame holds resolved relations and survives the drop.
        if stmt_asof_views:
            for views in self._asof_views.values():
                for v in views - stmt_asof_views:
                    self.spark.catalog.dropTempView(v)
                views &= stmt_asof_views
            self._asof_views = {t: v for t, v in self._asof_views.items() if v}
        return df

    # -- LOAD DATA ---------------------------------------------------------

    def _load_data(
        self, path: str, table: str, opts: dict[str, str], mode: str = "append"
    ) -> int:
        """LOAD DATA INPATH → one segment. Options (reference surface):
        DELIMITER, QUOTECHAR, ESCAPECHAR, FILEHEADER, MULTILINE,
        COMPLEX_DELIMITER_LEVEL_1/2, BAD_RECORDS_ACTION
        (fail|drop|capture), FORMAT (csv|parquet|json|orc),
        TIMESTAMP_FORMAT.

        Complex-typed columns (array/struct in the table schema) arrive in
        the CSV as two-level delimited strings ('$' between elements, ':'
        between struct fields — CarbonSqlParser.scala:95-96,
        complexdata.csv): the CSV reader cannot parse nested types, so
        those columns are read as strings and rebuilt with
        ``with_complex_columns`` (codegen split/cast, no Python)."""
        unknown = set(opts) - _LOAD_OPTION_KEYS
        if unknown:
            raise ValueError(
                f"unknown LOAD option(s) {sorted(unknown)}: supported are "
                f"{sorted(_LOAD_OPTION_KEYS)} (CarbonSqlParser.scala:822-834 "
                "keywords + documented extensions) — refusing to silently "
                "ignore a load-shaping option"
            )
        # Cube names resolve case-insensitively, like the reference's
        # Hive-backed catalog: its own sortexpr suite CREATEs
        # alldatatypescubeSort and LOADs INTO alldatatypescubesort
        # (AllDataTypesTestCaseSort.scala:36-37).
        table = {t.lower(): t for t in self.store.tables()}.get(table.lower(), table)
        fmt = opts.get("format", "csv").lower()
        if fmt == "parquet":
            df = self.spark.read.parquet(path)
        elif fmt == "json":
            from carbondata_spark.sources.formats import read_json

            df = read_json(self.spark, path, schema=self.store.schema(table))
        elif fmt == "orc":
            from carbondata_spark.sources.formats import read_orc

            df = read_orc(self.spark, path)
        else:
            from carbondata_spark.sources.csv import (
                normalize_escapechar,
                read_csv,
                split_bad_records,
                unescape_delimiter,
                with_complex_columns,
            )

            raw_delimiter = opts.get("delimiter", ",")
            delimiter = unescape_delimiter(raw_delimiter)
            # the reference rejects a field delimiter colliding with
            # either complex-type delimiter outright, comparing the RAW
            # option spellings (cubeSchema.scala:1881-1885) — DELIMITER
            # '\t' vs COMPLEX_DELIMITER_LEVEL_1 '\t' errors there even
            # though only the field delimiter is later unescaped. Match
            # that, and ALSO reject when the unescaped delimiter equals a
            # complex delimiter (differing spellings of the same byte
            # would corrupt the complex-column split downstream).
            cd1 = opts.get("complex_delimiter_level_1", "$")
            cd2 = opts.get("complex_delimiter_level_2", ":")
            if (
                raw_delimiter.lower() in (cd1.lower(), cd2.lower())
                or delimiter.lower() in (cd1.lower(), cd2.lower())
                or cd1.lower() == cd2.lower()
            ):
                raise ValueError(
                    "Field Delimiter & Complex types delimiter are same"
                )

            fileheader = None
            # FILEHEADER '' (the reference's FilterProcessor_FT spelling)
            # means "the file carries its own header", same as absent
            if opts.get("fileheader", "").strip():
                fileheader = [c.strip() for c in opts["fileheader"].split(",")]
            file_has_header = fileheader is None
            if file_has_header:
                # The file's own header maps to cube columns BY NAME, and
                # may carry more columns than the cube or a different
                # order (the reference's typed suites load the 14-column
                # data.csv into 3-column cubes, e.g. sortexpr/
                # TimestampDataTypeTestCase.scala). Peek the first line
                # and reuse the FILEHEADER by-name machinery below.
                import csv as _csv

                def _parse_header(line: str) -> list[str]:
                    return [
                        c.strip()
                        for c in next(
                            _csv.reader(
                                [line],
                                delimiter=delimiter,
                                quotechar=opts.get("quotechar", '"'),
                            )
                        )
                    ]

                first = self.spark.read.text(path).first()
                if first is None:
                    raise ValueError(f"LOAD DATA: empty input {path!r}")
                fileheader = _parse_header(first[0])
                # header=True below skips the first line of EVERY file,
                # but the peek above read ONE arbitrary file — a
                # directory mixing header orders would silently
                # mis-project all the others. Validate each local file's
                # first line against the peeked header (bounded: this is
                # a management-path load, and the check is a header-line
                # read per file, not a data scan); non-local URIs keep
                # the documented uniform-header assumption.
                members = _local_load_members(path)
                if members is None:
                    # non-local URI (hdfs://, s3a://, ...): the per-file
                    # validation below needs a local readline; keep the
                    # documented uniform-header assumption but say so —
                    # a directory mixing header orders would silently
                    # mis-project every non-peeked file.
                    import warnings

                    warnings.warn(
                        f"LOAD DATA from non-local path {path!r} with a "
                        "file-carried header: per-file header validation "
                        "is skipped; all files are assumed to share the "
                        "peeked header (pass FILEHEADER to be explicit)",
                        stacklevel=2,
                    )
                elif not members:
                    # LOCAL path but zero plain-file members: a mistyped
                    # path, a Spark-only glob Python's glob can't expand
                    # (e.g. '{a,b}.csv'), or a glob matching only
                    # directories — the per-file validation has nothing
                    # to check, which must be said, not silently skipped
                    # (r17 driver advice: this branch used to fall
                    # through with neither an error nor the non-local
                    # warning).
                    import warnings

                    warnings.warn(
                        f"LOAD DATA: local path {path!r} matched no plain "
                        "files for per-file header validation (mistyped "
                        "path, unsupported glob syntax, or directory-only "
                        "matches?); validation skipped — all files are "
                        "assumed to share the peeked header",
                        stacklevel=2,
                    )
                else:
                    # check every member (the peeked file compares equal
                    # to itself); cap keeps this a bounded check
                    for m in members[:64]:
                        with open(m, errors="replace") as fh:
                            line = fh.readline().rstrip("\r\n")
                        # ORDER matters: the projection below binds data
                        # lines positionally to the peeked-header schema
                        if line and _parse_header(line) != fileheader:
                            raise ValueError(
                                f"LOAD DATA: file {m!r} carries a header "
                                f"different from the peeked one "
                                f"({fileheader[:6]}...); multi-file "
                                "header-carrying loads must share one "
                                "header (or pass FILEHEADER explicitly)"
                            )
            schema = self.store.schema(table)
            if file_has_header:
                # A peeked header that matches NO cube column means the
                # file is headerless (its first DATA line was consumed as
                # a header) or belongs to a different table — the by-name
                # projection below would then emit every cube column as
                # NULL. Refuse loudly instead of loading a table of NULL
                # rows; the caller's options are FILEHEADER (headerless
                # files) or a file whose header names the cube's columns.
                cube_cols = {f.name.lower() for f in schema.fields}
                if not any(c.lower() in cube_cols for c in fileheader):
                    raise ValueError(
                        f"LOAD DATA: no column of the file header "
                        f"{fileheader[:6]}... matches table {table!r} "
                        f"({sorted(cube_cols)[:6]}...): pass FILEHEADER "
                        "for a headerless file, or check the input"
                    )
                # a PARTIALLY matching header (e.g. one renamed column)
                # loads NULL into every unmatched cube column — quiet
                # data loss if unintended; say which columns
                header_lc = {c.lower() for c in fileheader}
                absent = [
                    f.name for f in schema.fields if f.name.lower() not in header_lc
                ]
                if absent:
                    import warnings

                    warnings.warn(
                        f"LOAD DATA into {table!r}: cube column(s) "
                        f"{absent} are absent from the file header and "
                        "will load as NULL",
                        stacklevel=2,
                    )
            complex_cols = {
                f.name: f.dataType
                for f in schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.StructType))
            }
            if complex_cols:
                schema = T.StructType(
                    [
                        T.StructField(f.name, T.StringType() if f.name in complex_cols else f.dataType)
                        for f in schema.fields
                    ]
                )
            # FILEHEADER names the CSV's physical column ORDER, which the
            # reference lets differ from the table declaration order
            # (AllDataTypesTestCaseAggregate.scala:50 loads measures from
            # mid-file positions). Read with a schema in FILEHEADER order
            # (types resolved by case-insensitive name), then project back
            # to the table order; header-only columns are dropped, table
            # columns absent from the header become NULL.
            read_schema = schema
            if fileheader is not None:
                by_name = {f.name.lower(): f for f in schema.fields}
                read_schema = T.StructType(
                    [
                        T.StructField(
                            by_name[c.lower()].name if c.lower() in by_name else c,
                            by_name[c.lower()].dataType
                            if c.lower() in by_name
                            else T.StringType(),
                        )
                        for c in fileheader
                    ]
                )
            ts_format = opts.get("timestamp_format")
            if ts_format is None and "carbon.timestamp.format" in self.properties:
                # SimpleDateFormat (the reference's parser,
                # CarbonProperties default yyyy-MM-dd HH:mm:ss) leniently
                # accepts unpadded fields; java.time needs single-letter
                # patterns for that, so relax padded fields to match.
                ts_format = re.sub(
                    r"(MM|dd|HH|mm|ss)",
                    lambda m: m.group(1)[0],
                    self.properties["carbon.timestamp.format"],
                )
            # Bad TIMESTAMP values null the CELL, not the row: the
            # reference's direct-dictionary generator returns the null
            # surrogate on ParseException and keeps the row
            # (TimeStampDirectDictionaryGenerator.java:115-121), unlike a
            # bad MEASURE which rejects the whole row to the bad-records
            # log (CarbonCSVBasedSeqGenStep.java:1193). Read timestamp
            # columns as strings, then try_to_timestamp (null on
            # failure) — measures keep their types so a bad numeric
            # still makes the row malformed.
            ts_cols = [
                f.name
                for f in read_schema.fields
                if isinstance(f.dataType, T.TimestampType)
            ]
            if ts_cols:
                read_schema = T.StructType(
                    [
                        T.StructField(f.name, T.StringType())
                        if f.name in ts_cols
                        else f
                        for f in read_schema.fields
                    ]
                )
            df = read_csv(
                self.spark,
                path,
                schema=read_schema,
                delimiter=delimiter,
                quotechar=opts.get("quotechar", '"'),
                # reference default: NO escaping (escapechar "", i.e.
                # ignoreEscape — a backslash in data stays literal)
                escapechar=normalize_escapechar(opts.get("escapechar")),
                fileheader=fileheader,
                multiline=opts.get("multiline", "false").lower() == "true",
                timestamp_format=ts_format,
                bad_records_action=opts.get("bad_records_action", "drop"),
                header_in_file=file_has_header,
            )
            df, _bad = split_bad_records(df)
            for c in ts_cols:
                # coalesce mirrors Spark's own CSV fallback (pattern
                # first, then the general timestamp cast), so an ISO
                # value still parses when a format is configured
                df = df.withColumn(
                    c,
                    F.coalesce(
                        F.try_to_timestamp(F.col(c), F.lit(ts_format)),
                        F.try_to_timestamp(F.col(c)),
                    )
                    if ts_format is not None
                    else F.try_to_timestamp(F.col(c)),
                )
            if fileheader is not None:
                have = {f.name.lower() for f in read_schema.fields}
                df = df.select(
                    *[
                        F.col(f.name)
                        if f.name.lower() in have
                        else F.lit(None).cast(f.dataType).alias(f.name)
                        for f in schema.fields
                    ]
                )
            if complex_cols:
                df = with_complex_columns(
                    df,
                    complex_cols,
                    delim1=opts.get("complex_delimiter_level_1", "$"),
                    delim2=opts.get("complex_delimiter_level_2", ":"),
                )
        return self.store.load(table, df, mode=mode)

    # -- Hive-syntax CREATE TABLE ... STORED BY ------------------------------

    def _create_table_hive(
        self,
        exists_ok: bool,
        name: str,
        cols_s: str,
        part_s: str | None,
        handler: str,
        props_s: str | None,
    ) -> DataFrame:
        """CREATE TABLE ... STORED BY 'org.apache.carbondata.format'
        [TBLPROPERTIES (...)] — the reference's Hive-compatible DDL
        (CarbonSqlParser.scala:316-418).

        TBLPROPERTIES keys (quoted, case-insensitive):

        - DICTIONARY_INCLUDE / DICTIONARY_EXCLUDE (:541-546, :607-610) →
          the existing dictionary property plumbing; include promotes
          numeric columns to dimensions, exclude makes string dimensions
          no-dictionary.
        - COLUMN_GROUPS (:461-490) — "(c1,c2),(c3,c4)" row-major groups.
          ACCEPTED AND RECORDED (validated: members must be existing
          dimensions, no member in two groups) but physically designed
          out: Parquet has no row-major chunk, and its columnar row-group
          encoding subsumes the locality the feature bought on the
          reference's custom format. Query results are identical — the
          reference's own ColumnGroupDataTypesTestCase asserts colgrp
          matches the ungrouped table — so recording the intent (visible
          in DESCRIBE FORMATTED) is full functional parity.
        - PARTITIONCLASS / PARTITIONCOUNT (:500-510) → recorded as
          partitioner_class / partition_count, same as the CREATE CUBE
          PARTITIONER clause.

        Hive PARTITIONED BY columns are EXTRA typed columns
        (TOK_TABLEPARTCOLS, :380-390); they join the schema and become
        hive partition directories — the partitioner analogue.
        """
        if handler.strip().lower() != "org.apache.carbondata.format":
            # the reference sys.errors on any other storage handler
            # (CarbonSqlParser.scala:404-407 "Not a carbon format request")
            raise ValueError(
                f"Not a carbon format request: STORED BY {handler!r} — "
                "only 'org.apache.carbondata.format' routes through the "
                "carbon DDL"
            )
        if exists_ok and name in self.store.tables():
            return self._rows([], "created string")

        fields: list[T.StructField] = []
        for part in _split_cols(cols_s):
            cname, ctype = part.strip().split(None, 1)
            fields.append(T.StructField(cname, _parse_type(ctype)))
        part_cols: list[str] = []
        if part_s:
            for part in _split_cols(part_s):
                cname, ctype = part.strip().split(None, 1)
                fields.append(T.StructField(cname, _parse_type(ctype)))
                part_cols.append(cname)

        # quote-aware split + per-piece validation: a malformed pair
        # (unquoted key, stray text, mismatched quote styles) must reach
        # the unknown-keys guard as an ERROR, not be silently dropped —
        # TBLPROPERTIES (COLUMN_GROUPS='(a,b)') with an unquoted key
        # would otherwise create the table with the property ignored
        tbl_props: dict[str, str] = {}
        for piece in _split_cols(props_s or ""):
            if not piece.strip():
                continue
            pm = re.fullmatch(
                r"\s*'([^']+)'\s*=\s*'([^']*)'\s*", piece
            ) or re.fullmatch(r'\s*"([^"]+)"\s*=\s*"([^"]*)"\s*', piece)
            if not pm:
                raise ValueError(
                    f"malformed TBLPROPERTIES entry {piece.strip()!r}: "
                    "expected 'key'='value' (both sides quoted, matching "
                    "quote style)"
                )
            tbl_props[pm.group(1).lower()] = pm.group(2)
        known = {
            "column_groups",
            "dictionary_include",
            "dictionary_exclude",
            "partitionclass",
            "partitioncount",
        }
        unknown = sorted(set(tbl_props) - known)
        if unknown:
            raise ValueError(
                f"unsupported TBLPROPERTIES {unknown}: the reference reads "
                f"{sorted(known)} (CarbonSqlParser.scala:433-510)"
            )

        by_name = {f.name.lower(): f for f in fields}
        dict_include = [
            c.strip()
            for c in tbl_props.get("dictionary_include", "").split(",")
            if c.strip()
        ]
        dict_exclude = [
            c.strip()
            for c in tbl_props.get("dictionary_exclude", "").split(",")
            if c.strip()
        ]
        for c in dict_include + dict_exclude:
            if c.lower() not in by_name:
                raise ValueError(
                    f"DICTIONARY_INCLUDE/EXCLUDE column {c} is not a "
                    f"column of {name}"
                )

        def _stringish(f: T.StructField) -> bool:
            return isinstance(
                f.dataType, (T.StringType, T.ArrayType, T.StructType)
            )

        # the reference applies DICTIONARY_EXCLUDE only to string-typed
        # columns (extractDimColsAndNoDictionaryFields walks string/
        # array/struct fields only, :552-575); an exclude naming a
        # numeric column is ignored there — drop it here too so it never
        # mis-annotates a measure as a no-dictionary dimension
        dict_exclude = [
            c for c in dict_exclude if _stringish(by_name[c.lower()])
        ]

        excl = {c.lower() for c in dict_exclude}
        incl = {c.lower() for c in dict_include}
        dims = [
            f.name
            for f in fields
            if _stringish(f) or f.name.lower() in incl
        ]

        props: dict[str, str] = {
            "dictionary_include": ",".join(
                d for d in dims if d.lower() not in excl
            ),
            # reference quirk preserved for drop-in parity: integer
            # MEASURES surface as double (CarbonDatasourceRelation.scala:
            # 194-208) on every carbon DDL path, Hive-syntax included
            "int_measures_as_double": "true",
        }
        if dict_exclude:
            props["dictionary_exclude"] = ",".join(dict_exclude)
        if "partitionclass" in tbl_props:
            props["partitioner_class"] = tbl_props["partitionclass"]
        if "partitioncount" in tbl_props:
            props["partition_count"] = tbl_props["partitioncount"]

        if "column_groups" in tbl_props:
            groups = re.findall(r"\(([^)]+)\)", tbl_props["column_groups"])
            if not groups:
                raise ValueError(
                    "COLUMN_GROUPS must be '(c1,c2),(c3,c4)'-shaped "
                    f"(got {tbl_props['column_groups']!r})"
                )
            dims_l = {d.lower() for d in dims}
            seen: set[str] = set()
            for g in groups:
                for member in (x.strip() for x in g.split(",")):
                    if member.lower() not in by_name:
                        raise ValueError(
                            f"COLUMN_GROUPS member {member} is not a "
                            f"column of {name}"
                        )
                    if member.lower() not in dims_l:
                        raise ValueError(
                            f"COLUMN_GROUPS member {member} is a measure: "
                            "row groups apply to dimensions only"
                        )
                    if member.lower() in seen:
                        raise ValueError(
                            f"COLUMN_GROUPS member {member} appears in "
                            "more than one group"
                        )
                    seen.add(member.lower())
            props["column_groups"] = ",".join(
                "(" + ",".join(x.strip() for x in g.split(",")) + ")"
                for g in groups
            )

        # MDKey analogue: dictionary dimensions form the sort prefix, the
        # no-dictionary (high-cardinality) dims are appended AFTER them —
        # the reference's own parser test pins the split
        # (TestCarbonSqlParser.scala:59-84: dimCols=[col3,col4] with the
        # excluded col2 tracked separately). Clustering-wise this is also
        # the right 100 TB order: low-cardinality dims first give long
        # sorted runs; a high-cardinality prefix would destroy them.
        dict_dims = [d for d in dims if d.lower() not in excl]
        no_dict_dims = [d for d in dims if d.lower() in excl]
        # decimal dims excluded from the sort/zone-map set, like the
        # CREATE CUBE path (pyarrow cannot read parquet decimal stats)
        ftypes = {f.name: f.dataType for f in fields}
        self.store.create_table(
            name,
            T.StructType(fields),
            sort_columns=[
                d
                for d in dict_dims + no_dict_dims
                if d not in part_cols
                and not isinstance(ftypes.get(d), T.DecimalType)
            ],
            partition_columns=part_cols or None,
            properties=props,
        )
        return self._rows([{"created": name}], "created string")

    # -- ALTER CUBE ----------------------------------------------------------

    def _alter_cube(
        self,
        cube: str,
        drop_s: str | None,
        has_add: bool,
        dims_s: str | None,
        meas_s: str | None,
        with_s: str | None,
        opts_s: str | None,
    ) -> DataFrame:
        """ALTER CUBE (CarbonSqlParser.scala:731-776): DROP drops columns
        from reads of every segment; ADD DIMENSIONS/MEASURES appends
        columns visible over old segments with OPTIONS(DEFAULTS[...])
        values (the reference's restructure default-fill,
        RestructureUtil); added dimensions join dictionary_include so
        DESCRIBE keeps annotating them; added integer measures follow the
        table's int→double parity quirk. OPTIONS clauses: DEFAULTS
        [col=val, ...] must name added columns; NO_DICTIONARY(...) must
        name added string dimensions — accepted and validated, with no
        physical effect to record: the global dictionary is designed out,
        Parquet dictionary-encodes per column chunk automatically;
        AGGREGATION [agg(col), ...] declares the next auto-named rollup
        over the cube's dimensions, same as CREATE AGGREGATETABLE."""
        cube = self._resolve(cube)
        if with_s:
            raise ValueError(
                "ALTER CUBE ... WITH dimension relations is not supported: "
                "the flat-table model folds dimensions into the fact table "
                "(add them as plain columns instead)"
            )
        if has_add and not (dims_s or meas_s):
            # mirror the reference's loud empty-ADD error (:745-747)
            raise ValueError(
                "empty ADD definition found. Please provide the "
                "dimensions/measures to be added."
            )

        opts_s = opts_s or ""
        no_dict: list[str] = []
        dm = re.search(r"no_dictionary\s*\(([^)]*)\)", opts_s, _I)
        if dm:
            no_dict = [c.strip().strip("'\"") for c in dm.group(1).split(",") if c.strip()]
            opts_s = opts_s.replace(dm.group(0), "")
        agg_exprs: str | None = None
        am = re.search(r"aggregation\s*\[(.*?)\]", opts_s, _I)
        if am:
            agg_exprs = am.group(1)
            opts_s = opts_s.replace(am.group(0), "")
        defaults: dict[str, str] = {}
        fm = re.search(r"defaults\s*\[(.*?)\]", opts_s, _I)
        if fm:
            for pair in _split_cols(fm.group(1)):
                if "=" not in pair:
                    raise ValueError(f"DEFAULTS: cannot parse {pair!r}")
                k, v = pair.split("=", 1)
                defaults[k.strip()] = v.strip().strip("'\"")
            opts_s = opts_s.replace(fm.group(0), "")
        if opts_s.strip(" ,"):
            raise ValueError(
                f"ALTER CUBE OPTIONS: unrecognized {opts_s.strip(' ,')!r} "
                "(expected NO_DICTIONARY(...), AGGREGATION[...], "
                "DEFAULTS [col=val, ...])"
            )

        actions: list[dict[str, str]] = []
        if drop_s:
            cols = [c.strip().strip("'\"") for c in drop_s.split(",") if c.strip()]
            self.store.alter_drop_columns(cube, cols)
            actions += [{"action": "dropped", "column": c} for c in cols]

        add_dims: list[T.StructField] = []
        add_meas: list[T.StructField] = []
        if dims_s:
            for part in _split_cols(dims_s):
                cname, ctype = part.strip().split(None, 1)
                add_dims.append(T.StructField(cname, _parse_type(ctype)))
        if meas_s:
            props = self.store.describe(cube).get("properties", {}) or {}
            coerce = props.get("int_measures_as_double", "false").lower() == "true"
            for part in _split_cols(meas_s):
                cname, ctype = part.strip().split(None, 1)
                dt = _parse_type(ctype)
                if coerce and isinstance(
                    dt, (T.IntegerType, T.LongType, T.ShortType)
                ):
                    dt = T.DoubleType()
                add_meas.append(T.StructField(cname, dt))
        if add_dims or add_meas:
            added = {f.name for f in add_dims + add_meas}
            unknown = sorted(set(defaults) - added)
            if unknown:
                raise ValueError(
                    f"DEFAULTS for columns not being added: {unknown}"
                )
            # case-insensitive like every other identifier in this
            # dialect (NO_DICTIONARY(Channel) must match ADD DIMENSIONS
            # (channel string)), and only string/complex dimensions may
            # skip the dictionary — the same rule the CREATE CUBE path
            # states (a numeric dimension has no dictionary to skip)
            dims_by_lower = {f.name.lower(): f for f in add_dims}
            bad_nd = sorted(c for c in no_dict if c.lower() not in dims_by_lower)
            if bad_nd:
                raise ValueError(
                    f"NO_DICTIONARY columns must be added dimensions: {bad_nd}"
                )
            bad_type = sorted(
                c
                for c in no_dict
                if not isinstance(
                    dims_by_lower[c.lower()].dataType,
                    (T.StringType, T.ArrayType, T.StructType),
                )
            )
            if bad_type:
                raise ValueError(
                    "NO_DICTIONARY applies only to string/complex "
                    f"dimensions: {bad_type}"
                )
            self.store.alter_add_columns(cube, add_dims + add_meas, defaults=defaults)
            if add_dims:
                # keep DESCRIBE's dimension annotation + future sort
                # behavior consistent: added dims join dictionary_include
                from carbondata_spark.lock import file_lock

                excl = {c.lower() for c in no_dict}
                with file_lock(self.store._schema_path(cube)):
                    meta = self.store._read_schema(cube)
                    tprops = meta.setdefault("properties", {})
                    cur = [
                        c
                        for c in tprops.get("dictionary_include", "").split(",")
                        if c
                    ]
                    tprops["dictionary_include"] = ",".join(
                        cur
                        + [
                            f.name
                            for f in add_dims
                            if f.name not in cur and f.name.lower() not in excl
                        ]
                    )
                    if no_dict:
                        cur_ex = [
                            c
                            for c in tprops.get("dictionary_exclude", "").split(",")
                            if c
                        ]
                        tprops["dictionary_exclude"] = ",".join(
                            cur_ex + [c for c in no_dict if c not in cur_ex]
                        )
                    self.store._write_schema(cube, meta)
            actions += [
                {"action": "added", "column": f.name} for f in add_dims + add_meas
            ]
        elif defaults or no_dict:
            raise ValueError(
                "DEFAULTS/NO_DICTIONARY given without an ADD definition"
            )

        if agg_exprs:
            from carbondata_spark.plans.agg_table import (
                create_aggregate_table,
                list_aggregate_tables,
            )

            props = self.store.describe(cube).get("properties", {}) or {}
            dims = [
                c for c in props.get("dictionary_include", "").split(",") if c
            ]
            if not dims:
                raise ValueError(
                    "ALTER CUBE AGGREGATION: cube has no recorded "
                    "dimensions to group the rollup by"
                )
            measures: dict[str, list[str]] = {}
            for fn_, col_ in re.findall(r"(\w+)\s*\(\s*(\w+)\s*\)", agg_exprs):
                measures.setdefault(col_, []).append(fn_.lower())
            existing = set(list_aggregate_tables(self.store, cube))
            i = 0
            while f"auto{i}" in existing:
                i += 1
            create_aggregate_table(self.store, cube, f"auto{i}", dims, measures)
            actions.append({"action": "aggregation", "column": f"auto{i}"})

        return self._rows(actions, "action string, column string")

    def _merge_stmt(
        self,
        table: str,
        source_name: str,
        on_s: str,
        matched_s: str | None,
        notmatched_s: str | None,
    ) -> DataFrame:
        """MERGE INTO route → store.merge_rows (see the router comment
        for the supported grammar). Identifiers resolve case-
        insensitively like the rest of the dialect."""
        if source_name in self.store.tables():
            src = self.store.table(source_name)
        else:
            try:
                src = self.spark.table(source_name)
            except Exception as exc:
                raise ValueError(
                    f"MERGE USING {source_name}: not a store table or a "
                    "registered Spark view"
                ) from exc
        by_lower = {f.name.lower(): f.name for f in self.store.schema(table).fields}

        def resolve(name: str, what: str) -> str:
            actual = by_lower.get(name.lower())
            if actual is None:
                raise ValueError(f"MERGE {what}: {name} is not a column of {table}")
            return actual

        on_s = on_s.strip()
        keys: list[str] = []
        lm = re.fullmatch(r"\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)", on_s)
        if lm:
            keys = [resolve(c.strip(), "ON") for c in lm.group(1).split(",")]
        else:
            for part in re.split(r"\s+and\s+", on_s, flags=_I):
                pm = re.fullmatch(
                    r"\(?\s*(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)\s*\)?",
                    part.strip(),
                )
                if not pm or pm.group(1).lower() != pm.group(2).lower():
                    raise ValueError(
                        f"MERGE ON: unsupported condition {part.strip()!r} — "
                        "use a key list ON (k1, k2) or same-column "
                        "equalities t.k = s.k [AND ...]"
                    )
                keys.append(resolve(pm.group(1), "ON"))
        if matched_s is None and notmatched_s is None:
            raise ValueError(
                "MERGE needs WHEN MATCHED THEN UPDATE SET and/or "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        update_cols: list[str] | None
        if matched_s is None:
            update_cols = []  # insert-only merge
        else:
            set_s = re.sub(
                r"^\s*when matched then update set\s*", "", matched_s, flags=_I
            ).strip()
            if set_s == "*":
                update_cols = None
            else:
                update_cols = []
                for item in _split_cols(set_s):
                    am = re.fullmatch(
                        r"\s*(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)\s*", item
                    )
                    if not am or am.group(1).lower() != am.group(2).lower():
                        raise ValueError(
                            "MERGE UPDATE SET: unsupported assignment "
                            f"{item.strip()!r} — only c = s.c self-"
                            "assignments or SET *; computed updates need "
                            "the store.merge_rows API"
                        )
                    update_cols.append(resolve(am.group(1), "UPDATE SET"))
        res = self.store.merge_rows(
            table, src, keys, update_cols=update_cols, insert=notmatched_s is not None
        )
        return self._rows([res], "updated long, inserted long")

    # -- rollup routing ----------------------------------------------------

    def _try_rollup_route(self, s: str) -> DataFrame | None:
        """Answer ``SELECT <dims|aggs> FROM <fact> [WHERE <dim preds>]
        GROUP BY <dims>`` from a matching aggregate table
        (plans/agg_table.rewrite_aggregate algebra). Returns None when the
        statement is not that shape, the table has no rollups, or an
        aggregate is not derivable — the caller then falls through to the
        normal Spark SQL passthrough, so routing is always
        semantics-preserving.

        WHERE routing rule: every column the predicate references must be
        a dimension of the chosen rollup (filter cols join the required
        dim set for ``choose_rollup``); the summary is filtered BEFORE
        combining partials, which is sound because a predicate on group
        columns selects whole groups — it never splits a partial. A
        predicate touching a measure (or anything not a fact column)
        disqualifies routing."""
        m = re.fullmatch(
            r"select (.+?) from (\w+)(?: where (.+))? group by ([\w\s,]+)", s, _I
        )
        if not m:
            return None
        fact, where_s = m.group(2), m.group(3)
        if fact not in self.store.tables():
            return None
        from carbondata_spark.plans.agg_table import choose_rollup

        group_cols = [c.strip() for c in m.group(4).split(",")]
        filter_cols: set[str] = set()
        if where_s:
            # identifiers = word tokens outside string literals that are
            # not predicate keywords; ALL must be fact columns (else an
            # expression we cannot reason about -> no routing)
            no_lit = re.sub(r"'[^']*'", "''", where_s)
            kw = {"and", "or", "not", "in", "like", "between", "is", "null",
                  "true", "false", "escape"}
            idents = {
                tok for tok in re.findall(r"[A-Za-z_]\w*", no_lit) if tok.lower() not in kw
            }
            fact_cols = set(self.store.schema(fact).fieldNames())
            if not idents <= fact_cols:
                return None
            filter_cols = idents
        items = [i.strip() for i in _split_cols(m.group(1))]
        measures: dict[str, list[str]] = {}
        out_cols: list[tuple[str, str | None, str]] = []  # (fn|dim|count_star, col, alias)
        for it in items:
            mm = re.fullmatch(r"(\w+)\s*\(\s*(\*|\w+)\s*\)(?:\s+as\s+(\w+))?", it, _I)
            if mm:
                fn, col, alias = mm.group(1).lower(), mm.group(2), mm.group(3)
                if fn == "count" and col == "*":
                    out_cols.append(("count_star", None, alias or "count_star"))
                    continue
                if fn not in ("sum", "count", "min", "max", "avg"):
                    return None
                measures.setdefault(col, []).append(fn)
                out_cols.append((fn, col, alias or f"{fn}_{col}"))
            elif re.fullmatch(r"\w+", it) and it in group_cols:
                out_cols.append(("dim", it, it))
            else:
                return None
        chosen = choose_rollup(
            self.store, fact, [*group_cols, *sorted(filter_cols - set(group_cols))], measures
        )
        if chosen is None:
            return None
        summary = self.store.table(f"{fact}_agg_{chosen}")
        if where_s:
            summary = summary.filter(F.expr(where_s))
        aggs = []
        for kind, col, alias in out_cols:
            if kind == "dim":
                continue
            if kind == "count_star":
                aggs.append(F.sum("count_all").alias(alias))
            elif kind == "sum":
                aggs.append(F.sum(f"sum_{col}").alias(alias))
            elif kind == "count":
                aggs.append(F.sum(f"count_{col}").alias(alias))
            elif kind == "min":
                aggs.append(F.min(f"min_{col}").alias(alias))
            elif kind == "max":
                aggs.append(F.max(f"max_{col}").alias(alias))
            elif kind == "avg":
                aggs.append((F.sum(f"sum_{col}") / F.sum(f"count_{col}")).alias(alias))
        res = summary.groupBy(*group_cols).agg(*aggs)
        return res.select(*[F.col(alias) for _, _, alias in out_cols])


def _split_cols(s: str) -> list[str]:
    """Split a column list on commas not inside <> or () (decimal(10,2),
    array<...>) and not inside string literals (UPDATE ... SET
    c = 'a, b', ...)."""
    out, depth, cur = [], 0, []
    quote: str | None = None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0 and quote is None:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _find_keyword(s: str, kw: str) -> int:
    """Index of the first whole-word ``kw`` outside single/double-quoted
    string literals (case-insensitive), or -1. A quote escaped by
    doubling ('') toggles the state twice and lands back inside the
    literal, so no special case is needed."""
    pat = re.compile(rf"\b{kw}\b", _I)
    quote: str | None = None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif pat.match(s, i):
            return i
    return -1
