"""Per-segment bloom filters: point-lookup segment pruning for the store.

Zone maps (`store._collect_segment_stats`) prune RANGE predicates on the
clustered sort columns, but are blind to point lookups on
high-cardinality columns whose values interleave across segments — the
[min, max] of every segment spans the whole domain, so nothing prunes.
The reference served exactly this access path with its inverted index
inside blocklets (`/root/reference/core/src/main/java/org/carbondata/
core/datastorage/store/columnar/ColumnWithIntIndex.java`, used by the
filter evaluators in `org/carbondata/query/filter/executer/`); the
rebuild's analogue is a manifest-level bloom per (segment, column):
``scan(table, column=c, eq=v)`` tests v against each segment's bloom and
skips segments that provably don't contain it — a needle-in-haystack
query on a 100-TB table then reads only the segments the key could be
in, without any global sort or index table.

Design constraints, in order:

* **Hash parity by construction.** The load side sets bits with
  JVM-side ``xxhash64`` expressions; a Python reimplementation would
  have to reproduce 64-bit overflow + pmod semantics bit-for-bit.
  Instead the PROBE evaluates the SAME Spark expressions on a tiny
  literal DataFrame (one row per probe value) — load and probe can
  never diverge because they share the expression builder
  (`_position_exprs`).
* **Bounded driver state.** The bitset is built from
  ``collect_set(position)`` — its size is min(k·ndv, m) ≤ m bits
  (2^23 max = 1 MiB), INDEPENDENT of row count: the same bounded-
  metadata class as the parquet footer min/max the zone maps read.
  This module is the documented `.collect()` allowlist entry in
  tests/test_antipatterns.py.
* **Honest saturation.** m is sized from a measured
  approx_count_distinct (~10 bits/distinct ≈ 1% FPR at k=7). When a
  segment's cardinality would need more than MAX_BITS, NO bloom is
  stored — the segment is simply never pruned (correct, just not
  faster), rather than storing a saturated filter that prunes nothing
  while looking like it could.
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

K_HASHES = 7
BITS_PER_DISTINCT = 10  # ~1% false-positive rate at k=7
MIN_BITS = 1 << 10
MAX_BITS = 1 << 23  # 1 MiB bitset per (segment, column) cap


def _position_exprs(col: str, m, k: int = K_HASHES):
    """The k bit positions of a value, as Spark Column expressions —
    Kirsch-Mitzenmacher double hashing over two independent xxhash64
    streams (the second salted with the column name). Shared verbatim by
    the load-side bit setter, the probe, AND the grouped multi-segment
    collector, so the JVM's 64-bit wrapping arithmetic is the single
    source of truth. ``m`` may be an int literal or a Column (the grouped
    collector maps each row's segment tag to that segment's bitset size —
    same modular math either way)."""
    m_col = F.lit(m) if isinstance(m, int) else m
    h1 = F.pmod(F.xxhash64(F.col(col)), m_col)
    h2 = F.pmod(F.xxhash64(F.col(col), F.lit(col)), m_col)
    # each hash is reduced mod m BEFORE the linear combination, so the
    # largest intermediate is (k-1)*m + m <= 2^26 — no 64-bit overflow
    # under ANSI arithmetic, and the combination is exact modular math
    # rather than relying on JVM wrapping
    return [F.pmod(h1 + F.lit(i) * h2, m_col).cast("int") for i in range(k)]


def _size_bits(ndv: int) -> int | None:
    """Bitset size for a measured distinct count, or None when even
    MAX_BITS would saturate (no bloom is better than a lying bloom)."""
    need = max(1, ndv) * BITS_PER_DISTINCT
    if need > MAX_BITS:
        return None
    m = MIN_BITS
    while m < need:
        m <<= 1
    return m


def compute_segment_blooms(df: DataFrame, cols: list[str]) -> dict[str, dict]:
    """{col: {"m": bits, "k": hashes, "bits": base64 bitset}} for the
    bloom columns present in ``df`` (one segment's data).

    Two distributed jobs regardless of column count: an
    approx_count_distinct probe to size each bitset, then one union of
    per-column position frames aggregated by ``collect_set`` — the
    partial aggregation state is capped at m positions per column per
    task, so the shuffle and the driver result are both bounded by the
    bitset size, never by the row count.
    """
    present = [c for c in cols if c in df.columns]
    if not present:
        return {}
    ndv = df.agg(
        *[F.approx_count_distinct(c).alias(c) for c in present]
    ).collect()[0]
    sized = [(c, _size_bits(ndv[c])) for c in present]
    sized = [(c, m) for c, m in sized if m is not None]
    if not sized:
        return {}
    frames = [
        df.where(F.col(c).isNotNull()).select(
            F.lit(c).alias("col"),
            F.explode(F.array(*_position_exprs(c, m))).alias("pos"),
        )
        for c, m in sized
    ]
    union = frames[0]
    for f in frames[1:]:
        union = union.unionAll(f)
    rows = union.groupBy("col").agg(F.collect_set("pos").alias("ps")).collect()
    positions = {r["col"]: r["ps"] for r in rows}
    out: dict[str, dict] = {}
    for c, m in sized:
        ba = bytearray(m // 8)
        for p in positions.get(c, []):
            ba[p >> 3] |= 1 << (p & 7)
        out[c] = {
            "m": m,
            "k": K_HASHES,
            "bits": base64.b64encode(bytes(ba)).decode("ascii"),
        }
    return out


def compute_segment_blooms_grouped(
    df: DataFrame, tag_col: str, cols: list[str]
) -> dict[int, dict[str, dict]]:
    """Per-(segment, column) blooms for a TAGGED multi-segment frame —
    the batch companion of ``compute_segment_blooms`` for the r15
    single-job rewrite writer (store._write_rewrites): a broad UPDATE or
    MERGE on a bloom table produces many new segments at once, and
    collecting their filters one segment at a time would be the last
    O(#affected) job loop on that path.

    TWO distributed jobs total regardless of segment count: one grouped
    approx_count_distinct sizes every (segment, column) bitset, then one
    union of per-column position frames — each row's positions computed
    with ITS segment's bitset size via a tag→m map column through the
    SAME ``_position_exprs`` builder the probe uses (hash parity by
    construction) — aggregated by (segment, column) ``collect_set``.
    Driver state stays bounded by Σ min(k·ndv, m) bits, the same
    metadata class as the single-segment path; a (segment, column)
    whose cardinality would saturate MAX_BITS stores no bloom, exactly
    like the single-segment sizing rule."""
    present = [c for c in cols if c in df.columns]
    if not present:
        return {}
    ndv_rows = df.groupBy(tag_col).agg(
        *[F.approx_count_distinct(c).alias(c) for c in present]
    ).collect()
    out: dict[int, dict[str, dict]] = {int(r[tag_col]): {} for r in ndv_rows}
    m_by: dict[int, dict[str, int]] = {}
    for r in ndv_rows:
        ms = {c: m for c in present if (m := _size_bits(r[c])) is not None}
        if ms:
            m_by[int(r[tag_col])] = ms
    if not m_by:
        return out
    frames = []
    for c in present:
        pairs = [x for t, ms in m_by.items() if c in ms for x in (t, ms[c])]
        if not pairs:
            continue
        m_col = F.element_at(
            F.create_map(*[F.lit(v) for v in pairs]), F.col(tag_col)
        )
        frames.append(
            df.where(F.col(c).isNotNull() & m_col.isNotNull()).select(
                F.col(tag_col).cast("int").alias("_tag"),
                F.lit(c).alias("col"),
                F.explode(F.array(*_position_exprs(c, m_col))).alias("pos"),
            )
        )
    union = frames[0]
    for f in frames[1:]:
        union = union.unionAll(f)
    rows = union.groupBy("_tag", "col").agg(
        F.collect_set("pos").alias("ps")
    ).collect()
    positions = {(int(r["_tag"]), r["col"]): r["ps"] for r in rows}
    # iterate m_by, not the collected rows: a (segment, column) whose
    # surviving rows are all NULL (e.g. after UPDATE ... SET c = NULL)
    # contributes no position rows but must still store the all-zero
    # bitset — bit-identical to the single-segment path's
    # positions.get(c, []) default — so point probes on that column keep
    # pruning the segment instead of always reading it
    for t, ms in m_by.items():
        for c, m in ms.items():
            ba = bytearray(m // 8)
            for p in positions.get((t, c), []):
                ba[p >> 3] |= 1 << (p & 7)
            out[t][c] = {
                "m": m,
                "k": K_HASHES,
                "bits": base64.b64encode(bytes(ba)).decode("ascii"),
            }
    return out


# (col, dtype, values, m, k) -> positions. Probe positions are a pure
# function of the lookup literals and the filter geometry — they never
# depend on table data or session state — so repeated point lookups
# (a serving loop, the bench's repeated passes) skip the probe job's
# ~0.1 s local-DataFrame overhead after the first call.
_PROBE_CACHE: dict[tuple, list[list[int]]] = {}


def probe_positions(
    spark: SparkSession,
    col: str,
    dtype: T.DataType,
    values: list,
    m: int,
    k: int = K_HASHES,
) -> list[list[int]]:
    """The k bit positions of each probe value for an m-bit filter,
    computed by the SAME Spark expressions the load side used (a one-row-
    per-value local DataFrame — a driver-side metadata job, no cluster
    data touched). ``k`` comes from the manifest entry, so filters written
    under an older K_HASHES keep probing correctly."""
    key = (col, dtype.simpleString(), tuple(values), m, k)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    schema = T.StructType([T.StructField(col, dtype)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    rows = df.select(F.array(*_position_exprs(col, m, k)).alias("ps")).collect()
    out = [list(r["ps"]) for r in rows]
    if len(_PROBE_CACHE) < 4096:  # bounded; positions are tiny
        _PROBE_CACHE[key] = out
    return out


def might_contain(bloom: dict, positions: list[int]) -> bool:
    """Bit test against a manifest bloom entry. True = the value MAY be
    in the segment (read it); False = provably absent (prune it)."""
    bits = base64.b64decode(bloom["bits"])
    return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)
