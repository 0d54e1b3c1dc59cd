"""CarbonStore — the segment/manifest table lifecycle over Parquet.

This is the rebuild of the reference's core non-query machinery
(SURVEY.md §1.1, §2.10):

- table ("cube") with a dimension/measure split and sort columns
  (CREATE CUBE, CarbonSqlParser.scala:703-729)
- segment = one incremental load, a folder of files + a status entry
  (SegmentInfo, format/src/main/thrift/carbondata.thrift:31-34;
  table_status.thrift)
- SHOW LOADS / DELETE LOAD ids / DELETE ... BEFORE date (retention) /
  CLEAN FILES / compaction (cubeSchema.scala:1678-2523,
  CarbonMergerRDD.scala:31-234)
- schema evolution: ALTER add/drop columns with defaults, reconciled at
  read (schema.thrift:220-233 SchemaEvolutionEntry; RestructureUtil.java:128)

Layout on disk (mirrors the reference's store layout shape):

    <store>/<table>/
        schema.json              # current schema + properties + evolution log
        tablestatus.json         # manifest: [{segment_id, status, rows, ...}]
        Fact/Part0/Segment_<id>/ # parquet files of one load

Scale design: queries read only the manifest (driver-side, O(#segments))
then hand Spark an explicit list of valid segment directories — Spark
plans splits/locality from there exactly as for any parquet dataset, and
row-group min/max pruning works because loads are sorted on
``sort_columns`` within partitions (the Spark-native equivalent of the
reference's MDKey clustering + blocklet B-tree, SURVEY §1.5). Manifest
commits are lock + atomic-rename, safe for concurrent loaders.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from carbondata_spark.lock import file_lock

SEGMENT_SUCCESS = "Success"
SEGMENT_DELETED = "Marked for Delete"
SEGMENT_COMPACTED = "Compacted"
SEGMENT_IN_PROGRESS = "Load In Progress"


class TableNotFoundError(Exception):
    pass


@dataclass
class SegmentEntry:
    segment_id: int
    status: str
    rows: int
    load_start_ts: float
    load_end_ts: float
    columns: list[str] = field(default_factory=list)
    # per-sort-column {col: [min, max]} (JSON-encoded values) — the
    # manifest-level zone map used for segment pruning (the rebuild of the
    # reference's driver-side B-tree block pruning,
    # CarbonInputFormat.java:177-201)
    stats: dict[str, list] = field(default_factory=dict)
    # per-bloom-column {col: {"m", "k", "bits"}} — manifest bloom filters
    # for POINT-lookup segment pruning on high-cardinality columns whose
    # values interleave across segments (zone maps can't prune those; the
    # reference used its in-blocklet inverted index for this access path).
    # Opt-in via the table property ``bloom_columns``; see bloom.py.
    blooms: dict[str, dict] = field(default_factory=dict)
    # provenance tag, e.g. {"stream": query_name, "epoch": epoch_id} —
    # lets streaming replays detect an already-committed micro-batch
    # (exactly-once table contents across foreachBatch retries)
    origin: dict[str, Any] = field(default_factory=dict)
    # wall-clock of the commit that took this segment OUT of the live set
    # (delete/compact/overwrite). Drives time-travel reads: at as_of
    # between load_end_ts and invalidated_ts the segment was live. None
    # while live. Physical files persist until clean_files, exactly the
    # reference's deferred-removal design — so as-of views stay readable
    # until maintenance runs.
    invalidated_ts: float | None = None

    def to_json(self) -> dict[str, Any]:
        return {
            "segment_id": self.segment_id,
            "status": self.status,
            "rows": self.rows,
            "load_start_ts": self.load_start_ts,
            "load_end_ts": self.load_end_ts,
            "columns": self.columns,
            "stats": self.stats,
            "blooms": self.blooms,
            "origin": self.origin,
            "invalidated_ts": self.invalidated_ts,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "SegmentEntry":
        return SegmentEntry(
            segment_id=d["segment_id"],
            status=d["status"],
            rows=d["rows"],
            load_start_ts=d["load_start_ts"],
            load_end_ts=d["load_end_ts"],
            columns=d.get("columns", []),
            stats=d.get("stats", {}),
            blooms=d.get("blooms", {}),
            origin=d.get("origin", {}),
            invalidated_ts=d.get("invalidated_ts"),
        )


def _merge_origins(origins: list[dict[str, Any]]) -> dict[str, Any]:
    """Provenance for a segment that MERGES others (compaction).

    Losing the tags is not cosmetic: a rollup summary segment's
    ``fact_segments`` list is what refresh_aggregate_table and the
    routing staleness guard read — an untagged merged segment made the
    next refresh re-append full partials on top of the merged rows
    (double counting) while coverage LOOKED current. So:

    * ``fact_segments`` union — but only when EVERY input carries the
      tag; a partial union would under-state coverage, and the missing
      key makes agg_table's unsound-tag fallback rebuild instead.
    * every other distinct origin (streaming {stream, epoch} tags) is
      preserved under ``merged_origins`` (flattened across repeated
      compactions) so ``has_committed_origin`` keeps answering replay
      probes after auto_compact folded the micro-batch segments.
    """
    merged: dict[str, Any] = {}
    tagged = [o for o in origins if "fact_segments" in (o or {})]
    if origins and len(tagged) == len(origins):
        merged["fact_segments"] = sorted(
            {s for o in tagged for s in o["fact_segments"]}
        )
    prior: list[dict[str, Any]] = []
    seen: set[str] = set()
    for o in origins:
        o = o or {}
        # compacted_from is DIRECT-input provenance (this merge's inputs
        # are recorded fresh by compact(); a prior merge's input list is
        # meaningless on the new segment) — strip it like merged_origins
        # rather than letting it masquerade as a replay-probe origin.
        base = {
            k: v for k, v in o.items() if k not in ("merged_origins", "compacted_from")
        }
        for cand in ([base] if base and "fact_segments" not in base else []) + list(
            o.get("merged_origins", [])
        ):
            key = json.dumps(cand, sort_keys=True, default=str)
            if key not in seen:
                seen.add(key)
                prior.append(cand)
    if prior:
        merged["merged_origins"] = prior
    return merged


_PRUNE_IDENT = r"`?([A-Za-z_][A-Za-z0-9_]*)`?"
_PRUNE_LIT = r"(-?\d+(?:\.\d+)?|'(?:[^']|'')*')"
_PRUNE_CMP = re.compile(rf"^{_PRUNE_IDENT}\s*(=|<=|>=|<|>)\s*{_PRUNE_LIT}$")
_PRUNE_CMP_REV = re.compile(rf"^{_PRUNE_LIT}\s*(=|<=|>=|<|>)\s*{_PRUNE_IDENT}$")
_PRUNE_IN = re.compile(
    rf"^{_PRUNE_IDENT}\s+[Ii][Nn]\s*\((\s*{_PRUNE_LIT}(?:\s*,\s*{_PRUNE_LIT})*\s*)\)$"
)
_PRUNE_LIT_RE = re.compile(_PRUNE_LIT)
_PRUNE_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}


def _prune_lit_val(tok: str):
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    return float(tok) if "." in tok else int(tok)


def _sql_prunable_conjuncts(sql: str) -> list[tuple[str, str, list]]:
    """Extract zone-map-checkable conjuncts from a SQL predicate string:
    [(column_token, op, values)] with op in {'=','<','<=','>','>=','in'}
    and values Python literals.

    SOUNDNESS RULES (a pruned segment must PROVABLY contain no matching
    row): only TOP-LEVEL ``AND`` conjuncts are split (quote- and paren-
    aware), and the whole extraction bails to [] if a top-level ``OR``
    appears — per-conjunct exclusion is unsound under disjunction. A
    conjunct that doesn't match the simple ``col <op> literal`` /
    ``col IN (literals)`` shapes (functions, column-to-column compares,
    NOT, nested boolean) contributes NOTHING — it can never cause a
    prune. NULL semantics are safe for the shapes we do parse: a
    comparison conjunct is satisfied only by non-NULL values, exactly
    the population footer min/max describes.
    """
    s = sql.strip()
    frags: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0 and (c.isalpha() or c == "_"):
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            w = s[i:j]
            if w.upper() == "AND":
                frags.append("".join(buf))
                buf = []
            elif w.upper() == "OR":
                return []  # top-level disjunction: no sound pruning
            else:
                buf.append(w)
            i = j
            continue
        buf.append(c)
        i += 1
    frags.append("".join(buf))

    def strip_parens(t: str) -> str:
        t = t.strip()
        while t.startswith("(") and t.endswith(")"):
            depth = 0
            for k, ch in enumerate(t):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and k != len(t) - 1:
                        return t  # parens don't enclose the whole frag
            t = t[1:-1].strip()
        return t

    out: list[tuple[str, str, list]] = []
    for frag in frags:
        frag = strip_parens(frag)
        m = _PRUNE_CMP.match(frag)
        if m:
            out.append((m.group(1), m.group(2), [_prune_lit_val(m.group(3))]))
            continue
        m = _PRUNE_CMP_REV.match(frag)
        if m:  # literal <op> col: flip the operator
            out.append(
                (m.group(3), _PRUNE_FLIP[m.group(2)], [_prune_lit_val(m.group(1))])
            )
            continue
        m = _PRUNE_IN.match(frag)
        if m:
            vals = [
                _prune_lit_val(t.group(0))
                for t in _PRUNE_LIT_RE.finditer(m.group(2))
            ]
            out.append((m.group(1), "in", vals))
    return out


# (store_path, table) -> (session, (schema stamp, status stamp), frame):
# the full-table resolution cache of CarbonStore.table() — see its
# docstring. One entry per table (latest stamp wins), plan-only.
# Bounded: each entry pins a JVM-side logical plan, and a long-lived
# process touching many throwaway stores (the test suite) would
# otherwise accumulate dead entries — evict insertion-oldest past the
# cap (dicts preserve insertion order; re-inserting on refresh is fine).
_RESOLVED_TABLES: dict[
    tuple[str, str], tuple[SparkSession, tuple, DataFrame]
] = {}
_RESOLVED_TABLES_CAP = 256


def _file_stamp(path: str) -> tuple[int, int, int]:
    st = os.stat(path)
    return (st.st_ino, st.st_mtime_ns, st.st_size)


def _atomic_write_json(path: str, payload: Any) -> None:
    tmp = f"{path}.tmp.{os.getpid()}.{time.monotonic_ns()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class CarbonStore:
    """Managed table store: create/load/read/segment lifecycle."""

    def __init__(self, spark: SparkSession, store_path: str):
        self.spark = spark
        self.store_path = store_path
        os.makedirs(store_path, exist_ok=True)

    # -- paths ------------------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.store_path, table)

    def _schema_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "schema.json")

    def _status_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "tablestatus.json")

    def _segment_dir(self, table: str, segment_id: int) -> str:
        return os.path.join(self._table_dir(table), "Fact", "Part0", f"Segment_{segment_id}")

    # -- metadata ---------------------------------------------------------

    def _read_schema(self, table: str) -> dict[str, Any]:
        try:
            with open(self._schema_path(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise TableNotFoundError(table) from None

    def _write_schema(self, table: str, meta: dict[str, Any]) -> None:
        _atomic_write_json(self._schema_path(table), meta)

    def _read_status(self, table: str) -> list[SegmentEntry]:
        try:
            with open(self._status_path(table)) as f:
                return [SegmentEntry.from_json(d) for d in json.load(f)]
        except FileNotFoundError:
            return []

    def _write_status(self, table: str, entries: list[SegmentEntry]) -> None:
        _atomic_write_json(self._status_path(table), [e.to_json() for e in entries])

    @staticmethod
    def _is_zorder(meta: dict[str, Any]) -> bool:
        """``clustering='zorder'`` table property (CREATE CUBE OPTIONS)
        switches load/compaction clustering from lexicographic sort to
        Morton interleaving of the sort columns (zorder.py)."""
        return (
            str(meta.get("properties", {}).get("clustering", "")).lower() == "zorder"
        )

    # -- DDL --------------------------------------------------------------

    def create_table(
        self,
        table: str,
        schema: T.StructType,
        sort_columns: list[str] | None = None,
        partition_columns: list[str] | None = None,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
    ) -> None:
        """CREATE CUBE equivalent.

        ``sort_columns`` defaults to the dimension columns (string /
        timestamp typed), mirroring the reference's dims-are-sorted rule
        (CarbonSqlParser.scala:532-546): data is clustered on them at load
        so parquet row-group stats prune like the blocklet B-tree.

        ``partition_columns`` become hive-style directory partitions inside
        every segment (the reference's PARTITIONER clause,
        CarbonSqlParser.scala:983-991) — Catalyst partition pruning then
        skips whole directories before any footer is read.
        """
        tdir = self._table_dir(table)
        if os.path.exists(self._schema_path(table)):
            if if_not_exists:
                return
            raise ValueError(f"table {table} already exists")
        os.makedirs(tdir, exist_ok=True)
        properties = properties or {}
        clustering = str(properties.get("clustering", "sorted")).lower()
        if clustering not in ("sorted", "zorder"):
            raise ValueError(
                f"unknown clustering {clustering!r}: expected 'sorted' or 'zorder'"
            )
        schema = self.apply_reference_coercions(schema, properties)
        if sort_columns is None:
            # dims are sorted by default; DICTIONARY_INCLUDE promotes
            # numeric columns to dimensions (CarbonSqlParser.scala:541-546)
            dict_include = [
                c.strip() for c in properties.get("dictionary_include", "").split(",") if c.strip()
            ]
            sort_columns = [
                f.name
                for f in schema.fields
                if isinstance(f.dataType, (T.StringType, T.TimestampType))
                or f.name in dict_include
            ]
        for pc in partition_columns or []:
            if pc not in schema.fieldNames():
                raise ValueError(f"partition column {pc} not in schema")
        # bloom_columns must exist (a typo would silently never compute a
        # filter) and must not be float/double: IEEE -0.0 == 0.0 compares
        # equal but hashes differently, so a float bloom could produce a
        # FALSE NEGATIVE — a dropped row, not just a missed prune.
        field_types = {f.name: f.dataType for f in schema.fields}
        for bc in [
            c.strip()
            for c in properties.get("bloom_columns", "").split(",")
            if c.strip()
        ]:
            if bc not in field_types:
                raise ValueError(f"bloom column {bc} not in schema")
            if isinstance(field_types[bc], (T.FloatType, T.DoubleType)):
                raise ValueError(
                    f"bloom column {bc} is floating-point: -0.0/0.0 "
                    "hash-equality divergence could drop rows — use an "
                    "integral, string, decimal, or date/timestamp key"
                )
        meta = {
            "name": table,
            "schema": json.loads(schema.json()),
            "sort_columns": sort_columns,
            "partition_columns": partition_columns or [],
            "properties": properties or {},
            "evolution": [],  # SchemaEvolutionEntry log (schema.thrift:220-233)
            "created_ts": time.time(),
        }
        self._write_schema(table, meta)
        self._write_status(table, [])

    def drop_table(self, table: str) -> None:
        self._read_schema(table)  # raise if missing
        shutil.rmtree(self._table_dir(table), ignore_errors=True)

    def tables(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.store_path)):
            if os.path.exists(self._schema_path(name)):
                out.append(name)
        return out

    def describe(self, table: str) -> dict[str, Any]:
        meta = self._read_schema(table)
        segs = self._read_status(table)
        out = {
            "name": table,
            "schema": T.StructType.fromJson(meta["schema"]).simpleString(),
            "sort_columns": meta["sort_columns"],
            "properties": meta["properties"],
            "segments": len([s for s in segs if s.status == SEGMENT_SUCCESS]),
            "total_rows": sum(s.rows for s in segs if s.status == SEGMENT_SUCCESS),
            "evolution_entries": len(meta["evolution"]),
        }
        live = [s for s in segs if s.status == SEGMENT_SUCCESS]
        # segments written before an ALTER DROP may still carry blooms
        # for the dropped column; health is reported only for columns in
        # the CURRENT schema
        fields = {f.name for f in T.StructType.fromJson(meta["schema"]).fields}
        bloom_cols = sorted({c for s in live for c in s.blooms if c in fields})
        if bloom_cols:
            import base64 as _b64

            # fill ratio = set bits / m: the filter's health metric — a
            # fill near 1.0 means the segment outgrew its sizing and the
            # bloom prunes (almost) nothing; ~0.5 is the design point
            health: dict[str, dict] = {}
            for c in bloom_cols:
                fills = []
                for s in live:
                    b = s.blooms.get(c)
                    if not b:
                        continue
                    bits = _b64.b64decode(b["bits"])
                    ones = sum(bin(x).count("1") for x in bits)
                    fills.append(ones / b["m"])
                health[c] = {
                    "segments_with_bloom": len(fills),
                    "max_fill": round(max(fills), 4) if fills else None,
                }
            out["bloom_health"] = health
        return out

    def schema(self, table: str) -> T.StructType:
        return T.StructType.fromJson(self._read_schema(table)["schema"])

    # -- load (LOAD DATA) -------------------------------------------------

    def load(
        self,
        table: str,
        df: DataFrame,
        mode: str = "append",
        partitions: int | None = None,
        refresh_aggregates: bool = True,
        origin: dict[str, Any] | None = None,
    ) -> int:
        """One incremental load → one new segment (LoadCube,
        cubeSchema.scala:1792-1968).

        The data is repartitioned then sorted within partitions on the
        table's sort columns before the parquet write — Spark's external
        sort replaces the reference's Kettle sort + MDKey clustering
        (SortDataRows.java, MDKeyGenStep.java) and produces row groups
        whose min/max statistics enable scan pruning at read.

        ``mode='overwrite'`` marks all prior segments deleted in the same
        manifest commit that registers the new one.

        ``refresh_aggregates`` reloads this table's aggregate (rollup)
        tables after the commit, mirroring the reference's per-load agg
        reload (CarbonDataLoadRDD.scala:306-345).
        """
        meta = self._read_schema(table)
        target = T.StructType.fromJson(meta["schema"])
        df = self._conform(df, target)

        sort_cols = [c for c in meta["sort_columns"] if c in df.columns]
        part_cols = meta.get("partition_columns", [])
        sort_cols = [c for c in sort_cols if c not in part_cols]
        start = time.time()
        # Reserve the segment id with an in-progress entry so concurrent
        # loaders never collide on a directory (the reference's
        # "Load In Progress" table_status state). Readers ignore it.
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            seg_id = max((e.segment_id for e in entries), default=-1) + 1
            entries.append(
                SegmentEntry(
                    segment_id=seg_id,
                    status=SEGMENT_IN_PROGRESS,
                    rows=0,
                    load_start_ts=start,
                    load_end_ts=0.0,
                    columns=[f.name for f in target.fields],
                    origin=origin or {},
                )
            )
            self._write_status(table, entries)
        # Write data outside the lock (long-running), commit manifest after.
        seg_dir = self._segment_dir(table, seg_id)
        writer = df
        if sort_cols and self._is_zorder(meta):
            # Morton-interleaved clustering instead of lexicographic:
            # every sort column gets row-group min/max locality, not just
            # the leading one (the reference's MDKey concatenation shares
            # lexicographic's trailing-column blindness — zorder.py).
            from carbondata_spark.zorder import cluster_writer

            writer = cluster_writer(writer, sort_cols, partitions, prefix_cols=part_cols)
        else:
            if partitions:
                # hive partition columns LEAD the range key: each value
                # then occupies a contiguous run of tasks, so partitionBy
                # emits ~row-share files per directory, not `partitions`
                keys = [*part_cols, *sort_cols]
                if keys:
                    writer = writer.repartitionByRange(partitions, *keys)
                else:
                    writer = writer.repartition(partitions)
            if sort_cols:
                writer = writer.sortWithinPartitions(*part_cols, *sort_cols)
        w = writer.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(seg_dir)
        rows = self.spark.read.parquet(seg_dir).count()  # footer-only count
        stats = self._collect_segment_stats(seg_dir, sort_cols)
        blooms = self._collect_segment_blooms(seg_dir, meta)

        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            # one timestamp for the whole commit: an overwrite's
            # invalidations and the new segment's activation are the same
            # instant, so time-travel reads see an atomic swap, never an
            # empty in-between window
            commit_ts = time.time()
            if mode == "overwrite":
                for e in entries:
                    if e.status == SEGMENT_SUCCESS:
                        e.status = SEGMENT_DELETED
                        e.invalidated_ts = commit_ts
            for e in entries:
                if e.segment_id == seg_id:
                    e.status = SEGMENT_SUCCESS
                    e.rows = rows
                    e.load_end_ts = commit_ts
                    e.stats = stats
                    e.blooms = blooms
            self._write_status(table, entries)

        if refresh_aggregates:
            from carbondata_spark.plans.agg_table import (
                AggregateTable,
                list_aggregate_tables,
                refresh_aggregate_table,
            )

            for name in list_aggregate_tables(self, table):
                refresh_aggregate_table(AggregateTable(self, table, name))
        return seg_id

    def _segment_rows_from_footers(
        self, seg_dir: str, metas: dict[str, Any] | None = None
    ) -> int:
        """Exact row count of a just-written segment from parquet footers
        — metadata only, no Spark job. Replaces the post-write
        ``spark.read.parquet(dir).count()`` read-back in compact() and the
        IUD rewrite (one fewer job per rewritten segment; at 100 TB the
        footer walk is the same bounded metadata pass the zone-map
        collection already does). Pass ``metas`` (a ``_footer_metadata``
        result) to reuse footers already read — promotion and compact need
        rows AND stats from the same segment, and reading every footer
        twice doubled the driver's metadata I/O."""
        if metas is None:
            metas = self._footer_metadata(seg_dir)
        return sum(md.num_rows for md in metas.values())

    @staticmethod
    def _footer_metadata(seg_dir: str) -> dict[str, Any]:
        """{file -> parquet FileMetaData} for every parquet file under a
        segment dir (see ``_footer_metadata_many`` for the pooling)."""
        return CarbonStore._footer_metadata_many({0: seg_dir})[0]

    @staticmethod
    def _footer_metadata_many(
        seg_dirs: dict[int, str]
    ) -> dict[int, dict[str, Any]]:
        """{segment id -> {file -> parquet FileMetaData}} for MANY segment
        dirs through ONE flat thread pool. Footer reads are tiny I/O-bound
        requests (pyarrow releases the GIL); the r16 scaling matrix showed
        a super-linear 16→32-segment step in broad-UPDATE wall time partly
        because the promotion loop walked each new segment's footers
        SERIALLY (one pool per segment — useless when a segment holds 1-2
        files), so the driver metadata pass grew O(#affected × footer
        latency). Flattening every (segment, file) pair into one pool
        bounded by the host core count makes it O(total files / pool
        width) — the shape that holds when a 100-TB MERGE promotes
        hundreds of rewrite segments against an object store."""
        import glob as _glob
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        pairs = [
            (sid, f)
            for sid, d in seg_dirs.items()
            for f in sorted(
                _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
            )
        ]
        out: dict[int, dict[str, Any]] = {sid: {} for sid in seg_dirs}
        if not pairs:
            return out
        if len(pairs) == 1:
            sid, f = pairs[0]
            out[sid][f] = pq.ParquetFile(f).metadata
            return out
        workers = min(os.cpu_count() or 16, len(pairs), 64)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            for (sid, f), md in zip(
                pairs, ex.map(lambda p: pq.ParquetFile(p[1]).metadata, pairs)
            ):
                out[sid][f] = md
        return out

    def _collect_segment_stats(
        self, seg_dir: str, cols: list[str], metas: dict[str, Any] | None = None
    ) -> dict[str, list]:
        """Per-segment [min, max] for the sort columns, from parquet row-
        group footers (metadata only, no data read) — the manifest zone map
        that lets ``scan`` prune whole segments the way the reference's
        driver B-tree prunes blocks (CarbonInputFormat.java:177-201).

        Timestamps/dates normalize to '%Y-%m-%d %H:%M:%S'-style strings so
        bound comparisons are plain lexicographic; numbers stay numeric.
        JSON-unfriendly or statless columns are skipped (never pruned on).
        """
        import datetime

        if not cols:
            return {}

        def norm(v):
            if isinstance(v, (datetime.datetime, datetime.date)):
                return v.strftime("%Y-%m-%d %H:%M:%S")
            if isinstance(v, bytes):
                v = v.decode("utf-8", "replace")
            if isinstance(v, (int, float, str)):
                return v
            return None

        acc: dict[str, list] = {}
        unknown: set[str] = set()
        if metas is None:
            metas = self._footer_metadata(seg_dir)
        for md in metas.values():
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for c in cols:
                if c not in idx or c in unknown:
                    continue
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    mn = norm(st.min) if st is not None and st.has_min_max else None
                    mx = norm(st.max) if st is not None and st.has_min_max else None
                    if mn is None or mx is None:
                        unknown.add(c)  # never prune on a col with gaps
                        break
                    if c not in acc:
                        acc[c] = [mn, mx]
                    else:
                        acc[c] = [min(acc[c][0], mn), max(acc[c][1], mx)]
        return {c: v for c, v in acc.items() if c not in unknown}

    def _collect_segment_blooms(self, seg_dir: str, meta: dict) -> dict[str, dict]:
        """Manifest bloom filters for the table's ``bloom_columns``
        property, computed over the just-written segment (a column-pruned
        parquet read — bounded metadata, like the zone-map footers; see
        bloom.py for the hash-parity and saturation design)."""
        from carbondata_spark.bloom import compute_segment_blooms

        cols = [
            c.strip()
            for c in meta.get("properties", {}).get("bloom_columns", "").split(",")
            if c.strip()
        ]
        if not cols:
            return {}
        df = self.spark.read.parquet(seg_dir)
        return compute_segment_blooms(df, cols)

    def scan(
        self,
        table: str,
        column: str | None = None,
        ge: Any = None,
        le: Any = None,
        eq: Any = None,
        isin: list | None = None,
        as_of_ts: float | None = None,
    ) -> DataFrame:
        """Segment-pruned scan: skip whole segments whose manifest
        [min,max] for ``column`` cannot intersect [ge, le], then apply the
        residual filter. Equivalent results to ``table().filter(...)``;
        at scale the pruned segments are never even listed.

        ``eq`` / ``isin`` are POINT lookups: each candidate segment is
        tested against its manifest zone map AND (when the table declares
        ``bloom_columns``) its bloom filter — so a needle-in-haystack key
        on a column whose values interleave across segments (where every
        segment's [min,max] spans the whole domain) still prunes to the
        segment(s) that may contain it. Bloom misses are probabilistic
        only toward keeping a segment (false positives read extra data);
        a pruned segment provably lacks the value, so results always
        equal ``table().filter(col.isin(...))``.

        ``as_of_ts`` composes pruning with time travel: the candidate set
        is the historical segment set at that instant.
        """
        if eq is not None and isin is not None:
            raise ValueError("pass eq or isin, not both")
        if eq is not None:
            isin = [eq]
        if isin is not None and (ge is not None or le is not None):
            raise ValueError("point lookup (eq/isin) excludes range bounds (ge/le)")
        if column is None:
            if isin is not None or ge is not None or le is not None:
                # silently returning the unfiltered table here would hand
                # a caller expecting a point lookup the WHOLE table —
                # wrong results, not just wasted IO; mirror the guards
                # above and fail loudly instead
                raise ValueError("eq/isin/ge/le require column=")
            return self.table(table, as_of_ts=as_of_ts)
        if isin is not None:
            return self._point_scan(table, column, list(isin), as_of_ts)

        def norm_bound(v):
            import datetime

            if isinstance(v, (datetime.datetime, datetime.date)):
                return v.strftime("%Y-%m-%d %H:%M:%S")
            return v

        ge_n, le_n = norm_bound(ge), norm_bound(le)
        if as_of_ts is not None:
            # table()'s as-of selection (shared helper — single definition
            # of the time-travel predicate) is the candidate set, then
            # zone-map prune within it
            candidates = self._asof_segments(table, as_of_ts)
        else:
            candidates = self.valid_segments(table)
        keep: list[int] = []
        for e in candidates:
            rng = e.stats.get(column)
            if rng is None:
                keep.append(e.segment_id)  # unknown stats: cannot prune
                continue
            mn, mx = rng
            if ge_n is not None and mx < ge_n:
                continue
            if le_n is not None and mn > le_n:
                continue
            keep.append(e.segment_id)
        df = self.table(table, segment_ids=keep, as_of_ts=as_of_ts)
        if ge is not None:
            df = df.filter(F.col(column) >= F.lit(ge))
        if le is not None:
            df = df.filter(F.col(column) <= F.lit(le))
        return df

    def _point_scan(
        self,
        table: str,
        column: str,
        values: list,
        as_of_ts: float | None,
    ) -> DataFrame:
        """scan()'s eq/isin path: zone-map + bloom segment pruning, then
        the residual isin filter (which Catalyst pushes into the
        surviving parquet scans as an In filter)."""
        from carbondata_spark.bloom import might_contain, probe_positions

        def norm_bound(v):
            import datetime

            if isinstance(v, (datetime.datetime, datetime.date)):
                return v.strftime("%Y-%m-%d %H:%M:%S")
            return v

        meta = self._read_schema(table)
        dtype = next(
            (
                f.dataType
                for f in T.StructType.fromJson(meta["schema"]).fields
                if f.name == column
            ),
            None,
        )
        if as_of_ts is not None:
            candidates = self._asof_segments(table, as_of_ts)
        else:
            candidates = self.valid_segments(table)
        norm_vals = [norm_bound(v) for v in values]
        # probe positions are per (m, k) geometry; segments loaded at the
        # same cardinality share one geometry, so this is usually ONE tiny
        # local Spark job, cached across segments
        pos_cache: dict[tuple[int, int], list[list[int]]] = {}
        keep: list[int] = []
        for e in candidates:
            rng = e.stats.get(column)
            if rng is not None:
                mn, mx = rng
                if not any(mn <= v <= mx for v in norm_vals):
                    continue  # zone map: every probe value outside [min,max]
            bloom = e.blooms.get(column)
            if bloom is not None and dtype is not None:
                geom = (bloom["m"], bloom["k"])
                if geom not in pos_cache:
                    pos_cache[geom] = probe_positions(
                        self.spark, column, dtype, values, bloom["m"], bloom["k"]
                    )
                if not any(
                    might_contain(bloom, ps) for ps in pos_cache[geom]
                ):
                    continue  # bloom: no probe value can be in this segment
            keep.append(e.segment_id)
        df = self.table(table, segment_ids=keep, as_of_ts=as_of_ts)
        return df.filter(F.col(column).isin(values))

    def _conform(self, df: DataFrame, target: T.StructType) -> DataFrame:
        """Project/cast a DataFrame to the table schema (load-side of the
        reference's RestructureUtil)."""
        cols = []
        for fld in target.fields:
            if fld.name in df.columns:
                cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        return df.select(*cols)

    @staticmethod
    def apply_reference_coercions(schema: T.StructType, properties: dict[str, str]) -> T.StructType:
        """Optional reference semantic quirk: integer MEASURES surface as
        double (`CarbonDatasourceRelation.scala:194-208`, the
        `case "int" => "double"` coercion). Off by default — modern Spark
        users expect exact integer types — but available for drop-in
        parity via table property ``int_measures_as_double=true``.
        Measures = numeric columns not listed in ``dictionary_include``
        (CarbonSqlParser.scala:541-546).
        """
        if properties.get("int_measures_as_double", "false").lower() != "true":
            return schema
        dims = {
            c.strip()
            for c in properties.get("dictionary_include", "").split(",")
            if c.strip()
        }
        fields = []
        for fld in schema.fields:
            if fld.name not in dims and isinstance(
                fld.dataType, (T.IntegerType, T.LongType, T.ShortType)
            ):
                fields.append(T.StructField(fld.name, T.DoubleType(), fld.nullable))
            else:
                fields.append(fld)
        return T.StructType(fields)

    # -- read -------------------------------------------------------------

    def valid_segments(self, table: str) -> list[SegmentEntry]:
        return [e for e in self._read_status(table) if e.status == SEGMENT_SUCCESS]

    def has_committed_origin(self, table: str, origin: dict[str, Any]) -> bool:
        """True if a Success segment with this provenance tag exists —
        the streaming replay-detection probe (see SegmentEntry.origin).
        A compacted segment answers for every origin it merged
        (``merged_origins``): auto_compact after streaming ingest must
        not reopen the exactly-once window for a foreachBatch retry of
        an epoch whose original segment was just folded away."""
        for e in self._read_status(table):
            if e.status != SEGMENT_SUCCESS:
                continue
            if e.origin == origin or origin in e.origin.get("merged_origins", []):
                return True
        return False

    def _asof_segments(
        self, table: str, as_of_ts: float, meta: dict | None = None
    ) -> list[SegmentEntry]:
        """The historical segment set live at ``as_of_ts`` — the SINGLE
        definition of the time-travel predicate, shared by ``table()`` and
        ``scan()`` (previously duplicated inline; the copies could drift).

        A segment is in the view iff it was committed by the instant
        (not in-progress, promoted to live, ``load_end_ts <= as_of``) and
        not yet invalidated by a later delete/compact/overwrite
        (``invalidated_ts`` absent or after the instant). Raises when the
        view predates the clean_files history floor or needs a segment
        whose files clean_files already removed.
        """
        meta = self._read_schema(table) if meta is None else meta
        created = meta.get("created_ts")
        if created is not None and as_of_ts < created:
            # distinct from "table empty at that instant": the table did
            # not EXIST — fail loud (history-floor precedent) rather than
            # return an empty frame that reads as "no data then"
            raise ValueError(
                f"time-travel view of {table}@{as_of_ts} predates table "
                f"creation ({created})"
            )
        floor = meta.get("history_floor_ts")
        if floor is not None and as_of_ts < floor:
            raise ValueError(
                f"time-travel view of {table}@{as_of_ts} predates the "
                f"history floor {floor}: clean_files removed segments "
                "that view needs"
            )
        segs = []
        for e in self._read_status(table):
            committed = (
                e.status != SEGMENT_IN_PROGRESS
                and e.load_end_ts > 0.0  # 0.0 = never promoted to live
                and e.load_end_ts <= as_of_ts
            )
            live_then = e.invalidated_ts is None or e.invalidated_ts > as_of_ts
            if committed and live_then:
                if not os.path.isdir(self._segment_dir(table, e.segment_id)):
                    raise ValueError(
                        f"time-travel view of {table}@{as_of_ts} needs segment "
                        f"{e.segment_id}, already removed by clean_files"
                    )
                segs.append(e)
        return segs

    def table(
        self,
        table: str,
        segment_ids: list[int] | None = None,
        as_of_ts: float | None = None,
        _tag_col: str | None = None,
    ) -> DataFrame:
        """DataFrame = union of valid segments (optionally a subset),
        aligned to current schema.

        Segments written before an ALTER carry their own column list; they
        are aligned by name with defaults filled (RestructureUtil.java:128
        / RestructureFilterExecuterImpl semantics) so old and new segments
        union cleanly.

        ``as_of_ts``: time-travel read — the segment set as it was live at
        that wall-clock instant (committed by then, not yet invalidated by
        a later delete/compact/overwrite). Works because physical removal
        is deferred to ``clean_files`` (the reference's deferred-delete
        design); a cleaned segment needed by the view raises.

        ``_tag_col`` (internal): append an int column carrying each row's
        segment id, derived from ``_metadata.file_path`` — so a MULTI-
        segment read stays ONE scan per column-group while remaining
        per-segment attributable (the IUD detection job's shape).

        The default full-table read (no segment subset, no as-of, no
        tag) caches its manifest -> segment-paths -> parquet-relation
        resolution per (store, table): spark.read.parquet re-lists and
        re-infers footer schemas on every call (~70 ms driver time per
        segment group, measured), pure overhead on repeated reads.
        Every manifest commit atomically replaces tablestatus.json (and
        ALTER replaces schema.json), so the (inode, mtime_ns, size)
        stamps of both files identify the resolution exactly — any
        load/compact/IUD/ALTER from this or another process yields a
        new stamp and the next call re-resolves. Results always
        recompute from the parquet bytes; only plan metadata is cached.
        """
        if segment_ids is None and as_of_ts is None and _tag_col is None:
            try:
                stamp = (
                    _file_stamp(self._schema_path(table)),
                    _file_stamp(self._status_path(table)),
                )
            except OSError:
                stamp = None
            if stamp is not None:
                key = (self.store_path, table)
                hit = _RESOLVED_TABLES.get(key)
                if hit is not None and hit[0] is self.spark and hit[1] == stamp:
                    return hit[2]
                out = self._resolve_table(table)
                _RESOLVED_TABLES.pop(key, None)
                while len(_RESOLVED_TABLES) >= _RESOLVED_TABLES_CAP:
                    _RESOLVED_TABLES.pop(next(iter(_RESOLVED_TABLES)))
                _RESOLVED_TABLES[key] = (self.spark, stamp, out)
                return out
        return self._resolve_table(table, segment_ids, as_of_ts, _tag_col)

    def _resolve_table(
        self,
        table: str,
        segment_ids: list[int] | None = None,
        as_of_ts: float | None = None,
        _tag_col: str | None = None,
    ) -> DataFrame:
        meta = self._read_schema(table)
        target = T.StructType.fromJson(meta["schema"])
        defaults: dict[str, Any] = {}
        for ev in meta["evolution"]:
            defaults.update(ev.get("defaults", {}))
        if as_of_ts is not None:
            segs = self._asof_segments(table, as_of_ts, meta=meta)
        else:
            segs = self.valid_segments(table)
        if segment_ids is not None:
            segs = [e for e in segs if e.segment_id in segment_ids]
        if not segs:
            if _tag_col is not None:
                target = T.StructType(
                    [*target.fields, T.StructField(_tag_col, T.IntegerType())]
                )
            return self.spark.createDataFrame([], target)

        current_cols = [f.name for f in target.fields]
        groups: dict[tuple[str, ...], list[int]] = {}
        for e in segs:
            key = tuple(e.columns or current_cols)
            groups.setdefault(key, []).append(e.segment_id)

        part_cols = meta.get("partition_columns", [])
        parts: list[DataFrame] = []
        for cols, seg_ids in groups.items():
            paths = [self._segment_dir(table, sid) for sid in seg_ids]
            if part_cols:
                # hive-style partition discovery is rooted per segment dir:
                # read each segment separately and union (filters still
                # push into every scan, so pruning is unaffected). The tag
                # is a per-read LITERAL here — the segment id is known at
                # plan time, and `_metadata` does not resolve through the
                # Union a multi-segment read becomes (r15: a multi-
                # candidate tagged detection on a partitioned table hit
                # exactly that)
                raws = [self.spark.read.parquet(p) for p in paths]
                if _tag_col is not None:
                    raws = [
                        r.withColumn(_tag_col, F.lit(sid).cast("int"))
                        for r, sid in zip(raws, seg_ids)
                    ]
                raw = raws[0]
                for r in raws[1:]:
                    raw = raw.unionByName(r)
            else:
                raw = self.spark.read.parquet(*paths)
                if _tag_col is not None:
                    raw = raw.withColumn(
                        _tag_col,
                        F.regexp_extract(
                            F.col("_metadata.file_path"),
                            r"/Fact/Part0/Segment_(\d+)/",
                            1,
                        ).cast("int"),
                    )
            raw_types = {f.name: f.dataType for f in raw.schema.fields}
            sel = []
            for fld in target.fields:
                if fld.name in raw.columns:
                    # cast only on a real type change: casting a nested
                    # type to itself with different nullability flags is
                    # rejected by Spark (DATATYPE_MISMATCH), and
                    # no-op casts would defeat parquet column pruning
                    if raw_types[fld.name].simpleString() == fld.dataType.simpleString():
                        sel.append(F.col(fld.name))
                    else:
                        sel.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
                else:
                    default = defaults.get(fld.name)
                    sel.append(F.lit(default).cast(fld.dataType).alias(fld.name))
            if _tag_col is not None:
                sel.append(F.col(_tag_col))
            parts.append(raw.select(*sel))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def register_view(self, table: str, view_name: str | None = None) -> None:
        self.table(table).createOrReplaceTempView(view_name or table)

    # -- segment lifecycle ------------------------------------------------

    def show_segments(self, table: str) -> list[dict[str, Any]]:
        """SHOW LOADS (CarbonSqlParser.scala:1102-1124)."""
        return [e.to_json() for e in self._read_status(table)]

    def delete_segments(self, table: str, segment_ids: list[int]) -> int:
        """DELETE LOAD id,... — metadata-only status flip
        (cubeSchema.scala:1678-1736)."""
        flipped = 0
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            for e in entries:
                if e.segment_id in segment_ids and e.status == SEGMENT_SUCCESS:
                    e.status = SEGMENT_DELETED
                    e.invalidated_ts = time.time()
                    flipped += 1
            self._write_status(table, entries)
        return flipped

    def delete_segments_by_date(self, table: str, before_ts: float) -> int:
        """Retention: DELETE FROM CUBE WHERE <date> BEFORE 'ts' — drops whole
        segments loaded before the cutoff (CarbonDeleteLoadByDateRDD,
        cubeSchema.scala:2400-2523)."""
        flipped = 0
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            for e in entries:
                if e.status == SEGMENT_SUCCESS and e.load_start_ts < before_ts:
                    e.status = SEGMENT_DELETED
                    e.invalidated_ts = time.time()
                    flipped += 1
            self._write_status(table, entries)
        return flipped

    def clean_files(self, table: str, stale_in_progress_s: float = 86400.0) -> list[int]:
        """CLEAN FILES — physically remove deleted/compacted segment dirs
        (cubeSchema.scala:2457). Also GCs 'Load In Progress' entries older
        than ``stale_in_progress_s`` (crashed loads — the manifest, not
        the filesystem, defines table contents, so orphan dirs are safe to
        drop)."""
        removed = []
        floor = 0.0
        now = time.time()
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            keep = []
            for e in entries:
                stale = (
                    e.status == SEGMENT_IN_PROGRESS
                    and now - e.load_start_ts > stale_in_progress_s
                )
                if e.status in (SEGMENT_DELETED, SEGMENT_COMPACTED) or stale:
                    shutil.rmtree(self._segment_dir(table, e.segment_id), ignore_errors=True)
                    removed.append(e.segment_id)
                    if not stale:
                        floor = max(floor, e.invalidated_ts or now)
                else:
                    keep.append(e)
            self._write_status(table, keep)
            # GC orphaned rewrite staging dirs (a mutation killed between
            # its staging write and the dir promotions leaves
            # `.rewrite_staging_<id>` behind — the finally-cleanup never
            # ran). Age-gated by the same grace as stale in-progress
            # entries; a LIVE mutation holds reserved in-progress entries
            # younger than that, so its staging is never touched.
            part_dir = os.path.join(self._table_dir(table), "Fact", "Part0")
            if os.path.isdir(part_dir):
                for name in os.listdir(part_dir):
                    p = os.path.join(part_dir, name)
                    if (
                        name.startswith(".rewrite_staging_")
                        and now - os.path.getmtime(p) > stale_in_progress_s
                    ):
                        shutil.rmtree(p, ignore_errors=True)
        if floor:
            # advance the time-travel history floor: views older than the
            # newest invalidation we just physically removed are no longer
            # reconstructible and must raise rather than silently shrink
            with file_lock(self._schema_path(table)):
                meta = self._read_schema(table)
                meta["history_floor_ts"] = max(meta.get("history_floor_ts", 0.0), floor)
                self._write_schema(table, meta)
        return removed

    def auto_compact(
        self,
        table: str,
        minor_threshold: int = 4,
        major_size_rows: int = 10_000_000,
    ) -> int | None:
        """Compaction policy (reference minor/major merge semantics):
        compact when ≥ ``minor_threshold`` small valid segments exist
        ('minor'); segments already larger than ``major_size_rows`` are
        left alone — they are re-merged only by an explicit ``compact``
        ('major'). Call after streaming ingest or frequent small loads.
        """
        segs = [e for e in self.valid_segments(table) if e.rows < major_size_rows]
        if len(segs) < minor_threshold:
            return None
        return self.compact(table, segment_ids=[e.segment_id for e in segs])

    def _write_clustered(self, df, meta: dict, seg_dir: str, n_parts: int) -> None:
        """The shared segment write shape of compact() and the row-rewrite
        path: global range-sort (or z-order) across the data restores the
        clustering interleaved inputs destroyed. Hive partition columns
        lead the range key — each value stays contiguous across tasks, so
        the partitionBy write emits ~row-share files per directory instead
        of up to n_parts (the one-file-per-bucket layout
        build_ivf_index's compaction path relies on)."""
        part_cols = meta.get("partition_columns", [])
        sort_cols = [c for c in meta["sort_columns"] if c not in part_cols]
        writer = df
        if sort_cols and self._is_zorder(meta):
            from carbondata_spark.zorder import cluster_writer

            writer = cluster_writer(writer, sort_cols, n_parts, prefix_cols=part_cols)
        elif sort_cols or part_cols:
            keys = [*part_cols, *sort_cols]
            writer = writer.repartitionByRange(n_parts, *keys).sortWithinPartitions(*keys)
        w = writer.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(seg_dir)

    def _write_rewrites(
        self,
        table: str,
        out: DataFrame,
        rw_col: str,
        new_ids: list[int],
        meta: dict,
        total_rows: int,
        optional_ids: set[int] | None = None,
    ) -> dict[int, tuple[int, dict, dict]]:
        """Write EVERY rewrite segment of a row-level mutation in ONE
        distributed Spark job (the reference's restructure/merge paths are
        likewise single distributed jobs — CarbonMergerRDD.scala:31-234;
        this replaces the former per-affected-segment serial write loop:
        O(#affected) driver-blocking jobs -> 1, the last such loop left).

        ``out`` carries ``rw_col`` — each row's TARGET rewrite segment id.
        The target id LEADS the range key, so each rewrite segment's rows
        occupy a contiguous run of tasks and stay internally sort- (or
        z-order-) clustered — per-segment zone-map locality is preserved
        exactly as the old one-write-per-segment shape produced. The job
        writes once with ``partitionBy(rw_col)`` into a staging directory;
        each ``rw_col=<id>`` child is then promoted to its segment dir (a
        driver-side metadata rename, the same commit idiom as an HDFS
        output-committer move). Row counts/zone maps come from parquet
        footers — no read-back jobs. Bloom collection (opt-in tables only)
        remains per-segment: two bounded jobs per new segment.

        ``optional_ids``: targets ALLOWED to come out empty (e.g. a MERGE
        insert segment when every source row matched) — they are skipped
        instead of treated as lost data, and omitted from the result.
        """
        part_cols = meta.get("partition_columns", [])
        sort_cols = [c for c in meta["sort_columns"] if c not in part_cols]
        n_parts = max(len(new_ids), total_rows // 4_000_000)
        # Materialize the rewrite frame before the ranged write: the
        # RangePartitioner's bounds sampler executes the child plan once
        # and the shuffle map tasks execute it AGAIN — for a rewrite the
        # child is the full target-join transform, so the join ran twice
        # per mutation. persist(MEMORY_AND_DISK) stores the output once
        # and both passes read it back; measured -0.2s on the sf0.1 MERGE
        # cycle, and at scale it replaces a second full scan+join of the
        # affected segments with a local read. persist (r19; was
        # localCheckpoint) because (a) the blocks are released
        # deterministically in the finally below instead of lingering
        # until the driver GCs the RDD reference, and (b) it is a cache
        # boundary the MERGE path's observe() detection metrics can fire
        # under exactly once (a checkpointed plan swallows CollectMetrics
        # entirely — the write's plan is just the LogicalRDD). A block
        # lost to executor death recomputes its partition (pre-r18
        # semantics; sources are deterministic) instead of failing the
        # job; either way nothing commits until the swap.
        from pyspark import StorageLevel

        cached = out.persist(StorageLevel.MEMORY_AND_DISK)
        writer = cached
        if sort_cols and self._is_zorder(meta):
            from carbondata_spark.zorder import ZVAL_COL, with_zvalue

            keys = [rw_col, *part_cols, ZVAL_COL]
            writer = (
                with_zvalue(writer, sort_cols)
                .repartitionByRange(n_parts, *keys)
                .sortWithinPartitions(*keys)
                .drop(ZVAL_COL)
            )
        else:
            keys = [rw_col, *part_cols, *sort_cols]
            writer = writer.repartitionByRange(n_parts, *keys).sortWithinPartitions(
                *keys
            )
        staging = os.path.join(
            self._table_dir(table), "Fact", "Part0", f".rewrite_staging_{min(new_ids)}"
        )
        try:
            writer.write.mode("overwrite").partitionBy(
                rw_col, *part_cols
            ).parquet(staging)
            seg_dirs: dict[int, str] = {}
            for new_id in sorted(new_ids):
                src = os.path.join(staging, f"{rw_col}={new_id}")
                if not os.path.isdir(src):
                    if optional_ids and new_id in optional_ids:
                        continue  # declared-optional target, legally empty
                    # a rewrite target with zero surviving rows is
                    # impossible by construction (full deletes never
                    # reserve a target; updates/merges preserve rows) —
                    # reaching here means the write itself lost data
                    raise RuntimeError(
                        f"rewrite write produced no rows for segment "
                        f"{new_id} of {table}; aborting before commit"
                    )
                seg_dir = self._segment_dir(table, new_id)
                if os.path.isdir(seg_dir):
                    shutil.rmtree(seg_dir)
                os.makedirs(os.path.dirname(seg_dir), exist_ok=True)
                os.rename(src, seg_dir)
                seg_dirs[new_id] = seg_dir
            # rows + zone maps for ALL promoted segments from ONE flat
            # footer pool (each footer read once, segments in parallel) —
            # the serial per-segment walk here was the O(N) driver
            # metadata term behind the r16 16→32 wall-time step
            metas_by_seg = self._footer_metadata_many(seg_dirs)
            results: dict[int, tuple[int, dict, dict]] = {
                new_id: (
                    self._segment_rows_from_footers(d, metas_by_seg[new_id]),
                    self._collect_segment_stats(
                        d, sort_cols, metas_by_seg[new_id]
                    ),
                    {},
                )
                for new_id, d in seg_dirs.items()
            }
            # blooms (opt-in tables) for ALL new segments in TWO jobs,
            # not two per segment: one tagged union of the promoted
            # segment dirs through the grouped collector
            bloom_cols = [
                c.strip()
                for c in meta.get("properties", {})
                .get("bloom_columns", "")
                .split(",")
                if c.strip()
            ]
            if bloom_cols:
                from carbondata_spark.bloom import compute_segment_blooms_grouped

                # explicit schema: a schema-inference job per segment dir
                # would reintroduce the O(#affected) job growth this path
                # exists to remove (pinned in tests/test_iud_scale.py)
                read_schema = T.StructType.fromJson(meta["schema"])
                tagged = None
                for new_id in sorted(results):
                    r = self.spark.read.schema(read_schema).parquet(
                        self._segment_dir(table, new_id)
                    ).withColumn(rw_col, F.lit(new_id).cast("int"))
                    tagged = r if tagged is None else tagged.unionByName(r)
                by_seg = compute_segment_blooms_grouped(tagged, rw_col, bloom_cols)
                results = {
                    nid: (rows, stats, by_seg.get(nid, {}))
                    for nid, (rows, stats, _b) in results.items()
                }
            return results
        finally:
            cached.unpersist()
            shutil.rmtree(staging, ignore_errors=True)

    def compact(
        self,
        table: str,
        partitions: int | None = None,
        segment_ids: list[int] | None = None,
    ) -> int | None:
        """MERGE CUBE — merge valid segments (all, or the given subset)
        into one new sorted segment (CarbonMergerRDD.scala:31-234). Old
        segments flip to 'Compacted' in the same manifest commit; physical
        removal is deferred to clean_files, so concurrent readers of the
        old manifest stay valid.
        """
        meta = self._read_schema(table)
        segs = self.valid_segments(table)
        if segment_ids is not None:
            segs = [e for e in segs if e.segment_id in segment_ids]
        if len(segs) <= 1:
            return None
        sort_cols = meta["sort_columns"]
        merged = self.table(table, segment_ids=[e.segment_id for e in segs])
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            new_id = max(e.segment_id for e in entries) + 1
            entries.append(
                SegmentEntry(
                    segment_id=new_id,
                    status=SEGMENT_IN_PROGRESS,
                    rows=0,
                    load_start_ts=time.time(),
                    load_end_ts=0.0,
                    columns=[f.name for f in T.StructType.fromJson(meta["schema"]).fields],
                    origin={
                        **_merge_origins([e.origin for e in segs]),
                        # direct-input provenance: lets an incremental
                        # consumer (operators/segment_feed.py) prove a
                        # merged segment re-materializes only rows it
                        # already delivered, and skip it exactly
                        "compacted_from": sorted(e.segment_id for e in segs),
                    },
                )
            )
            self._write_status(table, entries)
        seg_dir = self._segment_dir(table, new_id)
        part_cols = meta.get("partition_columns", [])
        sort_cols = [c for c in sort_cols if c not in part_cols]
        n_parts = partitions or max(1, sum(e.rows for e in segs) // 4_000_000)
        self._write_clustered(merged, meta, seg_dir, n_parts)
        footer_metas = self._footer_metadata(seg_dir)
        rows = self._segment_rows_from_footers(seg_dir, footer_metas)
        # The merged segment is freshly range-sorted: recompute its zone
        # map and blooms so compaction IMPROVES prunability instead of
        # silently losing it (a statless segment is kept by every scan).
        merged_stats = self._collect_segment_stats(seg_dir, sort_cols, footer_metas)
        merged_blooms = self._collect_segment_blooms(seg_dir, meta)
        old_ids = {e.segment_id for e in segs}
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            # Abort if any source segment changed state while we merged
            # (concurrent overwrite/DELETE LOAD flipped it to 'Marked for
            # Delete'): promoting the merged segment would resurrect rows
            # the concurrent operation removed. The merged dir becomes an
            # orphan that clean_files GCs.
            live = {e.segment_id for e in entries if e.status == SEGMENT_SUCCESS}
            if not old_ids <= live:
                for e in entries:
                    if e.segment_id == new_id:
                        e.status = SEGMENT_DELETED
                        # stamp the abort so as-of reads never consider a
                        # segment that was NEVER live (load_end_ts stays
                        # 0.0, belt-and-braces with the as-of filter)
                        e.invalidated_ts = time.time()
                self._write_status(table, entries)
                return None
            # ONE timestamp for the whole swap: the compacted inputs leave
            # the live set at the same instant the merged segment enters
            # it, so no as_of value can observe a window with neither side
            commit_ts = time.time()
            for e in entries:
                if e.segment_id in old_ids and e.status == SEGMENT_SUCCESS:
                    e.status = SEGMENT_COMPACTED
                    e.invalidated_ts = commit_ts
                if e.segment_id == new_id:
                    e.status = SEGMENT_SUCCESS
                    e.rows = rows
                    e.load_end_ts = commit_ts
                    e.stats = merged_stats
                    e.blooms = merged_blooms
            self._write_status(table, entries)
        return new_id

    # -- row-level DELETE / UPDATE (copy-on-write rewrite) -----------------

    def delete_rows(self, table: str, predicate) -> int:
        """Row-level DELETE: every valid segment containing matching rows
        is rewritten WITHOUT them (copy-on-write); untouched segments are
        never rewritten, and provably-unaffected ones (manifest zone-map/
        bloom pre-prune) are never read at all — match detection is ONE
        Spark job over a segment-id-tagged union of the surviving
        candidates (see ``_mutate_rows``). Returns rows deleted.

        ``predicate``: a Column or a SQL expression string; rows where it
        evaluates TRUE are deleted (NULL keeps the row, like SQL DELETE).

        The reference era predates row-level IUD (its DELETEs are
        whole-load: cubeSchema.scala:1678-1736); later Apache CarbonData
        added exactly this copy-on-write shape, and a 100 TB corpus needs
        it (e.g. targeted takedown/PII deletes). The manifest swap is
        compact()'s: provisional segments written first, then ONE commit
        flips every affected source to 'Compacted' and every rewrite to
        'Success' at the same timestamp — concurrent readers see the old
        row set or the new one, never a torn mix, and a concurrent
        segment-state change aborts the whole rewrite (orphans GC'd by
        clean_files).
        """
        return self._mutate_rows(table, predicate, None)

    def update_rows(self, table: str, predicate, assignments: dict) -> int:
        """Row-level UPDATE ... SET: matching rows get ``assignments``
        ({column: Column|SQL-expression-string}) applied; all segment
        rewrite/commit semantics as ``delete_rows``. Returns rows updated.
        Assignment columns must exist in the schema (raises otherwise —
        UPDATE never widens the schema; use alter_add_columns)."""
        if not assignments:
            raise ValueError("update_rows requires at least one assignment")
        fields = {f.name for f in self.schema(table).fields}
        unknown = [c for c in assignments if c not in fields]
        if unknown:
            raise ValueError(f"UPDATE SET on unknown columns: {unknown}")
        return self._mutate_rows(table, predicate, assignments)

    def _prune_mutation_candidates(
        self, sources: list[SegmentEntry], predicate, meta: dict
    ) -> list[SegmentEntry]:
        """Zone-map + bloom pre-prune for row-level DELETE/UPDATE: drop
        source segments that PROVABLY contain no row matching the
        predicate, using only manifest metadata (no file listing, no
        Spark job — the same stats ``scan()`` prunes with). A targeted
        one-key mutation on a sorted/bloomed column touches the segments
        holding that key, not the whole table. Conservative everywhere:
        non-string predicates, unparseable conjuncts, statless columns,
        and type mismatches all KEEP the segment."""
        if not isinstance(predicate, str):
            return sources
        conjs = _sql_prunable_conjuncts(predicate)
        if not conjs:
            return sources
        import datetime

        from carbondata_spark.bloom import might_contain, probe_positions

        schema = T.StructType.fromJson(meta["schema"])
        by_lower = {f.name.lower(): f for f in schema.fields}
        _DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
        _TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}$")

        def stats_vals(field, vals):
            """Literals normalized to the manifest-stats domain for
            ``field`` (None -> this conjunct can't be trusted against
            this column's stats)."""
            dt = field.dataType
            if isinstance(dt, T.TimestampType):
                # LTZ: literal interpretation depends on the session
                # timezone — pruning against naive stats strings is
                # unsound under a hostile-TZ session
                return None
            if isinstance(dt, (T.DateType, T.TimestampNTZType)):
                out = []
                for v in vals:
                    if not isinstance(v, str):
                        return None
                    if _DATE_RE.match(v):
                        # SQL casts a bare date literal to midnight; the
                        # stats strings carry the full time part
                        out.append(v + " 00:00:00")
                    elif _TS_RE.match(v):
                        if isinstance(dt, T.DateType):
                            # Spark's string->DATE cast truncates the
                            # time part, so the comparison sees midnight
                            out.append(v[:10] + " 00:00:00")
                        else:
                            out.append(v.replace("T", " "))
                    else:
                        return None  # fractional seconds/other formats
                return out
            if isinstance(dt, T.StringType):
                return vals if all(isinstance(v, str) for v in vals) else None
            if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
                return vals
            return None

        def bloomable(field, vals) -> bool:
            dt = field.dataType
            if isinstance(dt, T.StringType):
                return all(isinstance(v, str) for v in vals)
            if isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                return all(
                    isinstance(v, int) and not isinstance(v, bool) for v in vals
                )
            return False

        pos_cache: dict[tuple, list] = {}
        kept: list[SegmentEntry] = []
        for e in sources:
            keep = True
            for colt, op, vals in conjs:
                fld = by_lower.get(colt.lower())
                if fld is None:
                    continue
                rng = e.stats.get(fld.name)
                if rng is not None:
                    sv = stats_vals(fld, vals)
                    if sv is not None:
                        mn, mx = rng
                        try:
                            if op in ("=", "in"):
                                keep = any(mn <= v <= mx for v in sv)
                            elif op == "<":
                                keep = mn < sv[0]
                            elif op == "<=":
                                keep = mn <= sv[0]
                            elif op == ">":
                                keep = mx > sv[0]
                            elif op == ">=":
                                keep = mx >= sv[0]
                        except TypeError:
                            keep = True  # stats/literal domains disagree
                        if not keep:
                            break
                if op in ("=", "in") and bloomable(fld, vals):
                    bloom = e.blooms.get(fld.name)
                    if bloom is not None:
                        geom = (bloom["m"], bloom["k"])
                        key = (fld.name, geom, tuple(vals))
                        if key not in pos_cache:
                            pos_cache[key] = probe_positions(
                                self.spark, fld.name, fld.dataType, list(vals), *geom
                            )
                        if not any(
                            might_contain(bloom, ps) for ps in pos_cache[key]
                        ):
                            keep = False
                            break
            if keep:
                kept.append(e)
        return kept

    def _mutate_rows(self, table: str, predicate, assignments: dict | None) -> int:
        """Copy-on-write row mutation, shaped for scale (r13 rewrite):

        phase 0  manifest zone-map/bloom pre-prune of candidate segments
                 (metadata only — a targeted DELETE never lists, let
                 alone reads, provably-unaffected segments);
        phase 1  ONE detection job over a segment-id-tagged union of the
                 candidates (``table(_tag_col=...)`` — one scan per
                 column-group, predicate pushed into parquet), yielding
                 per-segment match counts — this replaces the former
                 per-segment serial ``filter(pred).count()`` loop (N
                 driver-blocking jobs -> 1);
        phase 2  ALL provisional rewrite ids reserved in ONE manifest
                 lock round-trip (was one per segment);
        phase 3  ONE more tagged scan of the affected segments feeds ONE
                 distributed write of every rewrite segment
                 (``_write_rewrites``: target id leads the range key,
                 ``partitionBy`` fans the job out per target, staging
                 dirs promote by rename) — this was the last remaining
                 per-segment serial loop until r15; new-segment row
                 counts come from parquet footers (no read-back job);
        phase 4  ONE all-or-nothing manifest swap (compact()'s
                 discipline), unchanged.
        """
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        pred = pred.cast("boolean")
        meta = self._read_schema(table)
        sources = self.valid_segments(table)
        if not sources:
            return 0
        candidates = self._prune_mutation_candidates(sources, predicate, meta)
        if not candidates:
            return 0
        current_cols = [
            f.name for f in T.StructType.fromJson(meta["schema"]).fields
        ]
        tag = "_cd_seg"
        while tag in current_cols:
            tag = f"_{tag}"
        tagged = self.table(
            table, segment_ids=[e.segment_id for e in candidates], _tag_col=tag
        )
        counts = {
            row[0]: row[1]
            for row in tagged.filter(pred)
            .groupBy(tag)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        by_id = {e.segment_id: e for e in candidates}
        affected = [
            (by_id[sid], int(n)) for sid, n in sorted(counts.items()) if n > 0
        ]
        if not affected:
            return 0
        total = sum(n for _, n in affected)
        # full-delete sources need no replacement segment at all
        replacing = [
            (e, n)
            for e, n in affected
            if not (assignments is None and n == e.rows)
        ]
        new_ids: dict[int, int] = {}
        if replacing:
            with file_lock(self._status_path(table)):
                entries = self._read_status(table)
                next_id = max(x.segment_id for x in entries) + 1
                for e, _n in replacing:
                    new_ids[e.segment_id] = next_id
                    entries.append(
                        SegmentEntry(
                            segment_id=next_id,
                            status=SEGMENT_IN_PROGRESS,
                            rows=0,
                            load_start_ts=time.time(),
                            load_end_ts=0.0,
                            columns=list(current_cols),
                            origin={
                                "rewrite_of": e.segment_id,
                                "op": "delete" if assignments is None else "update",
                            },
                        )
                    )
                    next_id += 1
                self._write_status(table, entries)
        rewrites: list[tuple[int, int | None, int, dict, dict, int]] = []
        for e, n in affected:
            if e.segment_id not in new_ids:
                # every row deleted: no replacement segment at all
                rewrites.append((e.segment_id, None, 0, {}, {}, n))
        if replacing:
            # phase 3: ONE tagged scan of every replacing segment, the
            # shared transform, then ONE distributed write of every
            # rewrite segment (_write_rewrites) — no per-segment loop
            rw = "_cd_rw"
            while rw in current_cols or rw == tag:
                rw = f"_{rw}"
            rep_df = self.table(
                table,
                segment_ids=[e.segment_id for e, _n in replacing],
                _tag_col=tag,
            )
            if assignments is None:
                out = rep_df.filter(~F.coalesce(pred, F.lit(False)))
            else:
                out = rep_df.select(
                    *[
                        F.when(
                            F.coalesce(pred, F.lit(False)),
                            F.expr(expr) if isinstance(expr, str) else expr,
                        )
                        .otherwise(F.col(c))
                        .cast(rep_df.schema[c].dataType)
                        .alias(c)
                        if c in assignments
                        else F.col(c)
                        for c, expr in [
                            (f.name, assignments.get(f.name))
                            for f in rep_df.schema.fields
                        ]
                    ]
                )
            id_map = F.create_map(
                *[F.lit(v) for kv in new_ids.items() for v in kv]
            )
            out = out.withColumn(
                rw, F.element_at(id_map, F.col(tag)).cast("int")
            ).drop(tag)
            by_rewrite = self._write_rewrites(
                table,
                out,
                rw,
                list(new_ids.values()),
                meta,
                total_rows=sum(e.rows for e, _n in replacing),
            )
            for e, n in replacing:
                new_id = new_ids[e.segment_id]
                rows, stats, blooms = by_rewrite[new_id]
                rewrites.append((e.segment_id, new_id, rows, stats, blooms, n))
        # phase 4: ONE all-or-nothing swap (compact()'s discipline)
        old_ids = {old for old, *_ in rewrites}
        new_ids = {new for _, new, *_ in rewrites if new is not None}
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            live = {x.segment_id for x in entries if x.status == SEGMENT_SUCCESS}
            if not old_ids <= live:
                # a concurrent operation changed a source segment's state:
                # promoting the rewrites would resurrect or double-apply
                # rows — abort everything, the dirs become clean_files prey
                abort_ts = time.time()
                for x in entries:
                    if x.segment_id in new_ids:
                        x.status = SEGMENT_DELETED
                        x.invalidated_ts = abort_ts
                self._write_status(table, entries)
                raise RuntimeError(
                    f"row rewrite aborted: segments {sorted(old_ids - live)} "
                    "changed state concurrently; no rows were modified"
                )
            by_new = {new: (rows, stats, blooms) for _, new, rows, stats, blooms, _ in rewrites}
            commit_ts = time.time()
            for x in entries:
                if x.segment_id in old_ids:
                    x.status = SEGMENT_COMPACTED
                    x.invalidated_ts = commit_ts
                if x.segment_id in by_new:
                    rows, stats, blooms = by_new[x.segment_id]
                    x.status = SEGMENT_SUCCESS
                    x.rows = rows
                    x.load_end_ts = commit_ts
                    x.stats = stats
                    x.blooms = blooms
            self._write_status(table, entries)
        return total

    # -- MERGE INTO (upsert) -----------------------------------------------

    def _zone_hit_conditions(
        self, segs: list[SegmentEntry], keys: list[str], target: T.StructType
    ) -> dict[int, Any] | None:
        """Per-segment row-granular zone-map predicates over a MERGE
        source: segment ``sid`` maps to a boolean Column that is true for
        a source row iff EVERY key column falls inside the segment's
        manifest [min, max] — a necessary condition for that row to match
        any row of the segment, so ``count(when(cond, 1)) == 0`` proves
        the segment holds no source key (strictly tighter than comparing
        the source's global [min, max]: a segment sitting in a gap of the
        source key distribution is pruned too).

        Comparisons mirror ``_collect_segment_stats``'s normalization
        exactly: numeric bounds compare natively (integral/float columns
        only — decimals are statless in the manifest), string bounds
        compare binary-lexicographically, timestamp/date bounds compare
        via ``date_format`` in the same second-truncated string space the
        footers were normalized into. A key whose bounds or type cannot
        be compared faithfully contributes no condition (never prunes);
        a segment with no usable key maps to None (unconditional
        candidate). Returns None when there are no segments or more than
        256 (bounding the stats-aggregate expression count — callers fall
        back to the coarse overlap prune).
        """
        if not segs or len(segs) > 256:
            return None
        by_name = {f.name: f.dataType for f in target.fields}
        out: dict[int, Any] = {}
        for e in segs:
            conds = []
            for k in keys:
                rng = (e.stats or {}).get(k)
                if not isinstance(rng, (list, tuple)) or len(rng) != 2:
                    continue
                mn, mx = rng
                if mn is None or mx is None:
                    continue
                dt = by_name.get(k)
                c = F.col(k)
                num = (int, float)
                if (
                    isinstance(mn, num)
                    and isinstance(mx, num)
                    and not isinstance(mn, bool)
                    and not isinstance(mx, bool)
                    and isinstance(
                        dt,
                        (
                            T.ByteType,
                            T.ShortType,
                            T.IntegerType,
                            T.LongType,
                            T.FloatType,
                            T.DoubleType,
                        ),
                    )
                ):
                    conds.append((c >= F.lit(mn)) & (c <= F.lit(mx)))
                elif isinstance(mn, str) and isinstance(mx, str):
                    if isinstance(dt, T.StringType):
                        conds.append((c >= F.lit(mn)) & (c <= F.lit(mx)))
                    elif isinstance(
                        dt, (T.TimestampType, T.TimestampNTZType, T.DateType)
                    ):
                        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
                        conds.append((s >= F.lit(mn)) & (s <= F.lit(mx)))
            if not conds:
                out[e.segment_id] = None
            else:
                cond = conds[0]
                for extra in conds[1:]:
                    cond = cond & extra
                out[e.segment_id] = cond
        return out

    def merge_rows(
        self,
        table: str,
        source: DataFrame,
        keys: str | list[str],
        update_cols: list[str] | None = None,
        insert: bool = True,
    ) -> dict[str, int]:
        """MERGE INTO (upsert): rows of ``source`` whose ``keys`` match a
        target row UPDATE it (``update_cols``, default all non-key
        columns); unmatched source rows are INSERTED as a new segment
        (``insert=False`` ignores them — update-only CDC). Returns
        ``{"updated": n, "inserted": m}``. ``update_cols=[]`` is the
        INSERT-ONLY merge (WHEN NOT MATCHED only): matched rows stay
        untouched, no segment is rewritten, and only the genuinely-new
        rows are appended (idempotent backfill).

        The reference era predates MERGE (like row-level IUD); later
        Apache CarbonData added exactly this CDC shape, and a 100 TB
        training corpus needs it (late corrections, metadata backfills,
        dedup-survivor upserts). Scale shape, reusing the r13 IUD
        machinery end-to-end:

        1. ONE bounded job over the source computes totals, the
           key-uniqueness guard (duplicate source keys are an ambiguous
           update and raise), per-key [min,max], and per-segment
           row-granular zone-map hit counts — a segment no source row's
           keys fall inside provably holds no match and is pruned;
        2. the candidate segments are rewritten in ONE distributed job,
           joined against the source a single time, into ONE rewrite
           segment PER candidate (``_write_rewrites``: the target id
           leads the range key, so each rewrite stays internally sorted
           with fresh zone maps/blooms and per-segment locality — a
           merge touching N segments never degenerates into one global
           sort over their union); match detection rides the same job as
           ``observe()`` metrics (matched-row count + the set of
           segments holding >=1 match), and unmatched source rows ride
           the same write as the insert segment (anti-join against the
           CANDIDATE segments' keys only — sound because pruning proved
           no other segment holds any source key);
        3. ONE all-or-nothing manifest swap commits the rewrites of the
           segments the metrics proved matched (a candidate without
           matches keeps its original; its no-op rewrite never goes
           live) plus the insert segment, and retires the affected
           sources at a single timestamp.

        Feed semantics (operators/segment_feed.py): the merged rewrite
        carries ``origin["rewrite_of"]`` so an append-feed skips it; the
        insert segment is a normal append and delivers — a downstream
        consumer sees exactly the genuinely-new rows.

        Source rows with a NULL in any key column never match (SQL
        equality) and are inserted when ``insert=True``.
        """
        meta = self._read_schema(table)
        target = T.StructType.fromJson(meta["schema"])
        tcols = [f.name for f in target.fields]
        keys = [keys] if isinstance(keys, str) else list(keys)
        missing = [k for k in keys if k not in tcols]
        if missing:
            raise ValueError(f"MERGE keys not in {table}'s schema: {missing}")
        if update_cols is None:
            update_cols = [c for c in tcols if c not in keys]
        bad = [c for c in update_cols if c not in tcols or c in keys]
        if bad:
            raise ValueError(
                f"MERGE update columns must be non-key table columns: {bad}"
            )
        # update_cols=[] is the INSERT-ONLY merge (WHEN NOT MATCHED only):
        # matched rows stay untouched, so no segment is rewritten and no
        # detection job runs — unmatched rows are anti-joined against the
        # zone-map CANDIDATES directly (sound: non-candidates provably
        # hold no source key).
        insert_only = not update_cols
        if insert_only and not insert:
            raise ValueError(
                "MERGE with update_cols=[] and insert=False does nothing"
            )
        if insert:
            miss_src = [c for c in tcols if c not in source.columns]
            if miss_src:
                raise ValueError(
                    "MERGE with insert=True needs the full table schema "
                    f"in the source; missing: {miss_src}"
                )
            src = self._conform(source, target)
        else:
            needed = [c for c in tcols if c in set(keys) | set(update_cols)]
            miss_src = [c for c in needed if c not in source.columns]
            if miss_src:
                raise ValueError(f"MERGE source missing columns: {miss_src}")
            src = source.select(
                *[F.col(c).cast(target[c].dataType).alias(c) for c in needed]
            )

        # ONE bounded job: totals, key uniqueness, per-key [min,max], and
        # per-segment row-granular zone-map hit counts ("does ANY source
        # row fall inside this segment's key ranges") — the candidate
        # prune, riding the same single pass over the source. Match
        # detection itself no longer runs as its own job: it rides the
        # rewrite write via observe() below (r19; guide §2.4 — one action
        # fewer per MERGE, and the candidates' key columns are no longer
        # scanned separately). The trade: a candidate whose zone maps
        # overlap the source but which holds no actual match is now
        # rewritten and discarded at the swap instead of being filtered
        # by a key-column detection scan; the row-granular prune (vs the
        # r18 whole-source-range overlap) is what keeps that set small.
        key_notnull = F.lit(True)
        for k in keys:
            key_notnull = key_notnull & F.col(k).isNotNull()
        aggs = [
            F.count(F.lit(1)).alias("_n"),
            F.count(F.when(key_notnull, 1)).alias("_nn"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("_nd"),
        ]
        for k in keys:
            aggs += [F.min(k).alias(f"_mn_{k}"), F.max(k).alias(f"_mx_{k}")]
        # 0-row segments hold no matches and no keys: never candidates
        # (a 0-row rewrite target would also trip _write_rewrites'
        # lost-data guard, since the left join emits nothing for it)
        segs = [e for e in self.valid_segments(table) if e.rows > 0]
        hit_conds = self._zone_hit_conditions(segs, keys, target)
        if hit_conds is not None:
            for sid, cond in hit_conds.items():
                if cond is not None:
                    aggs.append(F.count(F.when(cond, 1)).alias(f"_hit_{sid}"))
        stat = src.agg(*aggs).collect()[0]
        if stat["_n"] == 0:
            return {"updated": 0, "inserted": 0}
        if stat["_nd"] < stat["_nn"]:
            raise ValueError(
                "MERGE source has duplicate keys "
                f"({stat['_nn']} keyed rows, {stat['_nd']} distinct): "
                "ambiguous update — dedup the source first"
            )

        if hit_conds is not None:
            candidates = [
                e
                for e in segs
                if hit_conds[e.segment_id] is None
                or int(stat[f"_hit_{e.segment_id}"]) > 0
            ]
        else:
            # >256 segments: coarse whole-source-range overlap prune
            # (bounds from the same stats job; expression count in the
            # aggregate stays constant)
            def norm_bound(v):
                import datetime

                if isinstance(v, (datetime.datetime, datetime.date)):
                    return v.strftime("%Y-%m-%d %H:%M:%S")
                return v

            candidates = []
            for e in segs:
                keep = True
                for k in keys:
                    rng = e.stats.get(k)
                    if rng is None:
                        continue
                    smn, smx = norm_bound(stat[f"_mn_{k}"]), norm_bound(
                        stat[f"_mx_{k}"]
                    )
                    if smn is None:
                        continue  # all-null source key: no match possible here
                    try:
                        if smx < rng[0] or smn > rng[1]:
                            keep = False  # disjoint on this key: no match
                            break
                    except TypeError:
                        continue
                    except IndexError:
                        continue
                if keep:
                    candidates.append(e)

        updated_total = 0
        affected: list[SegmentEntry] = []
        rewrite_targets = [] if insert_only else candidates
        tag = "_cd_seg"
        while tag in tcols:
            tag = f"_{tag}"
        tagged = None
        if rewrite_targets:
            tagged = self.table(
                table, segment_ids=[e.segment_id for e in candidates], _tag_col=tag
            )
        if not candidates and not insert:
            return {"updated": 0, "inserted": 0}

        # reserve ALL provisional segments in one manifest round-trip:
        # one rewrite target PER candidate source segment (per-segment
        # zone-map locality — a merge touching N segments must not
        # collapse into one global sort over their union) + the insert.
        # A candidate the write's observe() metrics prove unmatched never
        # goes live: its reserved entry is marked deleted at the swap and
        # its original segment stays.
        start = time.time()
        rewrite_ids: dict[int, int] = {}
        insert_id: int | None = None
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            next_id = max((x.segment_id for x in entries), default=-1) + 1
            for e in rewrite_targets:
                rewrite_ids[e.segment_id] = next_id
                entries.append(
                    SegmentEntry(
                        segment_id=next_id,
                        status=SEGMENT_IN_PROGRESS,
                        rows=0,
                        load_start_ts=start,
                        load_end_ts=0.0,
                        columns=list(tcols),
                        origin={
                            "rewrite_of": e.segment_id,
                            "op": "merge",
                        },
                    )
                )
                next_id += 1
            if insert:
                insert_id = next_id
                entries.append(
                    SegmentEntry(
                        segment_id=insert_id,
                        status=SEGMENT_IN_PROGRESS,
                        rows=0,
                        load_start_ts=start,
                        load_end_ts=0.0,
                        columns=list(tcols),
                        origin={"op": "merge_insert"},
                    )
                )
            self._write_status(table, entries)

        part_cols = meta.get("partition_columns", [])
        sort_cols = [c for c in meta["sort_columns"] if c not in part_cols]
        by_new: dict[int, tuple[int, dict, dict]] = {}
        inserted = 0
        if rewrite_targets:
            rw = "_cd_rw"
            while rw in tcols or rw == tag:
                rw = f"_{rw}"
            t_frame = tagged
            t = t_frame.alias("t")
            s = src.withColumn("_cd_m", F.lit(True)).alias("s")
            cond = F.lit(True)
            for k in keys:
                cond = cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
            matched = F.col("s._cd_m").isNotNull()
            sel = []
            for f in target.fields:
                if f.name in update_cols:
                    sel.append(
                        F.when(matched, F.col(f"s.{f.name}"))
                        .otherwise(F.col(f"t.{f.name}"))
                        .cast(f.dataType)
                        .alias(f.name)
                    )
                else:
                    sel.append(F.col(f"t.{f.name}").alias(f.name))
            id_map = F.create_map(
                *[F.lit(v) for kv in rewrite_ids.items() for v in kv]
            )
            # Match detection rides the write (r19): observe() collects
            # the matched-row count and the set of segments holding >=1
            # match while the rewrite frame is materialized into
            # _write_rewrites' cache — the r18 detection job (a key-column
            # semi-join scan of the candidates + its own action) is gone.
            # The metrics fire exactly once: the persist boundary sits
            # ABOVE the CollectMetrics node, so the range-bounds sampler
            # materializes it once and the shuffle map tasks read blocks.
            from pyspark.sql import Observation

            mt = "_cd_mt"
            while mt in tcols or mt in (tag, rw):
                mt = f"_{mt}"
            obs = Observation()
            out = (
                t.join(s, cond, "left")
                .select(*sel, F.col(f"t.{tag}").alias(tag), matched.alias(mt))
                .observe(
                    obs,
                    F.count(F.when(F.col(mt), 1)).alias("_updated"),
                    F.collect_set(F.when(F.col(mt), F.col(tag))).alias(
                        "_affected"
                    ),
                )
                .withColumn(rw, F.element_at(id_map, F.col(tag)).cast("int"))
                .drop(tag, mt)
            )
            write_ids = list(rewrite_ids.values())
            total_for_parts = sum(e.rows for e in rewrite_targets)
            if insert:
                # Fuse the insert segment into the SAME distributed write:
                # the unmatched source rows (anti-join against the affected
                # segments' keys — sound because pruning + detection proved
                # no other segment holds any source key) ride the ranged
                # write under rw = insert_id. This removes the separate
                # insert write job AND its extra key scan of the affected
                # segments, without disturbing the broadcast shape of
                # either join (a full-outer fusion would have forced a
                # key-shuffle of the target payload).
                ins_rows = (
                    src.join(t_frame.select(*keys), keys, "left_anti")
                    .select(*tcols)
                    .withColumn(rw, F.lit(insert_id).cast("int"))
                )
                out = out.unionByName(ins_rows)
                write_ids.append(insert_id)
                total_for_parts += int(stat["_n"])
            by_new.update(
                self._write_rewrites(
                    table,
                    out,
                    rw,
                    write_ids,
                    meta,
                    total_rows=total_for_parts,
                    optional_ids={insert_id} if insert else None,
                )
            )
            if insert and insert_id in by_new:
                inserted = by_new[insert_id][0]
            # detection metrics fired during the write's cache
            # materialization; get() is non-blocking here
            m = obs.get
            updated_total = int(m["_updated"] or 0)
            hit_ids = {int(x) for x in (m["_affected"] or [])}
            affected = [e for e in rewrite_targets if e.segment_id in hit_ids]
        elif insert:
            # No rewrite job to fuse with (insert-only merge, or no source
            # key matched anywhere): standalone clustered insert write.
            anti_ids = [e.segment_id for e in candidates] if insert_only else []
            cached_ins = None
            if anti_ids:
                aff_keys = self.table(table, segment_ids=anti_ids).select(*keys)
                # persist the anti-join before the ranged write: the
                # range-bounds sampler and the shuffle map tasks would
                # otherwise compute it twice (the same double-execution
                # _write_rewrites' persist removes for rewrites)
                from pyspark import StorageLevel

                cached_ins = src.join(aff_keys, keys, "left_anti").persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                ins_df = cached_ins
            else:
                ins_df = src
            seg_dir = self._segment_dir(table, insert_id)
            n_parts = max(1, int(stat["_n"]) // 4_000_000)
            try:
                self._write_clustered(ins_df, meta, seg_dir, n_parts)
            finally:
                if cached_ins is not None:
                    cached_ins.unpersist()
            ins_metas = self._footer_metadata(seg_dir)
            inserted = self._segment_rows_from_footers(seg_dir, ins_metas)
            if inserted:
                by_new[insert_id] = (
                    inserted,
                    self._collect_segment_stats(seg_dir, sort_cols, ins_metas),
                    self._collect_segment_blooms(seg_dir, meta),
                )

        # ONE all-or-nothing swap (compact()'s discipline). Only segments
        # the detection metrics proved matched are retired; a candidate
        # without matches keeps its original segment and its no-op
        # rewrite is marked deleted (clean_files prey), so the committed
        # state is row-identical to the r18 detect-then-rewrite shape.
        old_ids = {e.segment_id for e in affected}
        committed = {rewrite_ids[e.segment_id] for e in affected}
        if insert_id is not None:
            committed.add(insert_id)
        new_ids = set(rewrite_ids.values()) | (
            {insert_id} if insert_id is not None else set()
        )
        with file_lock(self._status_path(table)):
            entries = self._read_status(table)
            live = {x.segment_id for x in entries if x.status == SEGMENT_SUCCESS}
            if not old_ids <= live:
                abort_ts = time.time()
                for x in entries:
                    if x.segment_id in new_ids:
                        x.status = SEGMENT_DELETED
                        x.invalidated_ts = abort_ts
                self._write_status(table, entries)
                raise RuntimeError(
                    f"MERGE aborted: segments {sorted(old_ids - live)} "
                    "changed state concurrently; no rows were modified"
                )
            commit_ts = time.time()
            for x in entries:
                if x.segment_id in old_ids:
                    x.status = SEGMENT_COMPACTED
                    x.invalidated_ts = commit_ts
                if x.segment_id in new_ids:
                    if x.segment_id in committed and x.segment_id in by_new:
                        rows, stats, blooms = by_new[x.segment_id]
                        x.status = SEGMENT_SUCCESS
                        x.rows = rows
                        x.load_end_ts = commit_ts
                        x.stats = stats
                        x.blooms = blooms
                    else:
                        # empty insert (every source row matched) or a
                        # candidate's no-op rewrite (zone maps overlapped
                        # but no row matched): the reserved entry never
                        # goes live
                        x.status = SEGMENT_DELETED
                        x.invalidated_ts = commit_ts
            self._write_status(table, entries)
        return {"updated": updated_total, "inserted": inserted}

    # -- schema evolution (ALTER CUBE) ------------------------------------

    def alter_add_columns(
        self, table: str, new_fields: list[T.StructField], defaults: dict[str, Any] | None = None
    ) -> None:
        """ALTER CUBE ADD — new columns visible over old segments with the
        given defaults (CarbonSqlParser.scala:731-776)."""
        with file_lock(self._schema_path(table)):
            meta = self._read_schema(table)
            schema = T.StructType.fromJson(meta["schema"])
            existing = {f.name for f in schema.fields}
            for fld in new_fields:
                if fld.name in existing:
                    raise ValueError(f"column {fld.name} already exists")
                schema = schema.add(fld)
            meta["schema"] = json.loads(schema.json())
            meta["evolution"].append(
                {
                    "ts": time.time(),
                    "added": [f.name for f in new_fields],
                    "removed": [],
                    "defaults": defaults or {},
                }
            )
            self._write_schema(table, meta)

    def alter_drop_columns(self, table: str, names: list[str]) -> None:
        """ALTER CUBE DROP — columns disappear from reads of all segments."""
        with file_lock(self._schema_path(table)):
            meta = self._read_schema(table)
            schema = T.StructType.fromJson(meta["schema"])
            missing = set(names) - {f.name for f in schema.fields}
            if missing:
                raise ValueError(f"no such columns: {sorted(missing)}")
            kept = [f for f in schema.fields if f.name not in names]
            meta["schema"] = json.loads(T.StructType(kept).json())
            meta["sort_columns"] = [c for c in meta["sort_columns"] if c not in names]
            bloom_cols = [
                c.strip()
                for c in meta.get("properties", {}).get("bloom_columns", "").split(",")
                if c.strip() and c.strip() not in names
            ]
            if meta.get("properties", {}).get("bloom_columns"):
                meta["properties"]["bloom_columns"] = ",".join(bloom_cols)
            meta["evolution"].append(
                {"ts": time.time(), "added": [], "removed": list(names), "defaults": {}}
            )
            self._write_schema(table, meta)
