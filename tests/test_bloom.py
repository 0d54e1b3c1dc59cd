"""Manifest bloom filters: point-lookup segment pruning (bloom.py +
store.scan(eq/isin)).

The scenario zone maps cannot serve: segments split by a key RESIDUE, so
every segment's [min, max] spans the whole key domain — range pruning
keeps everything, but the bloom proves which segment(s) a key can live
in. The reference covered this access path with its in-blocklet inverted
index; here it's manifest metadata, no index table, no extra shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def bloom_store(spark, tmp_path_factory, sf_dir):
    """orders loaded as 4 residue-split segments with a bloom on
    o_orderkey: each key lives in exactly one segment, but every
    segment's zone map spans the whole key range."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.store import CarbonStore

    path = str(tmp_path_factory.mktemp("bloomstore"))
    store = CarbonStore(spark, path)
    orders = load_table(spark, sf_dir, "orders")
    store.create_table(
        "orders_r",
        orders.schema,
        properties={"bloom_columns": "o_orderkey"},
    )
    for r in range(4):
        store.load("orders_r", orders.filter(F.col("o_orderkey") % 4 == r))
    return store, orders


def test_blooms_recorded_per_segment(bloom_store):
    store, _ = bloom_store
    for e in store.valid_segments("orders_r"):
        b = e.blooms.get("o_orderkey")
        assert b is not None and b["m"] >= 1 << 10 and b["k"] >= 1
        assert b["bits"]  # non-empty bitset


def test_point_scan_prunes_to_one_segment(bloom_store):
    """eq on a single key must read (at most, modulo deterministic FPs)
    one residue segment's files — and exactly match the unpruned
    filter."""
    store, orders = bloom_store
    key = 7  # residue 3
    pruned = store.scan("orders_r", column="o_orderkey", eq=key)
    expected = orders.filter(F.col("o_orderkey") == key)
    assert pruned.count() == expected.count() == 1
    files = pruned.inputFiles()
    segs = {f.split("/Segment_")[1].split("/")[0] for f in files}
    # 4 segments hold ~disjoint key sets; the bloom keeps the true one
    # plus at most rare false positives — never all four (zone maps alone
    # would keep all four)
    assert len(segs) < 4
    assert "3" in segs  # the segment that actually holds key 7


def test_point_scan_isin_multi_residue(bloom_store):
    store, orders = bloom_store
    keys = [1, 6]  # residues 1 and 2
    pruned = store.scan("orders_r", column="o_orderkey", isin=keys)
    expected = orders.filter(F.col("o_orderkey").isin(keys))
    assert sorted(r.o_orderkey for r in pruned.select("o_orderkey").collect()) == sorted(
        r.o_orderkey for r in expected.select("o_orderkey").collect()
    )
    segs = {f.split("/Segment_")[1].split("/")[0] for f in pruned.inputFiles()}
    assert {"1", "2"} <= segs and len(segs) < 4


def test_point_scan_no_false_negatives_exhaustive(bloom_store):
    """Every 97th key across the whole domain: the pruned scan must find
    exactly the rows the raw filter finds — a bloom may only ever KEEP
    extra segments, never drop a true one."""
    store, orders = bloom_store
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    keys = list(range(0, int(hi) + 1, 97))
    pruned_n = store.scan("orders_r", column="o_orderkey", isin=keys).count()
    expected_n = orders.filter(F.col("o_orderkey").isin(keys)).count()
    assert pruned_n == expected_n


def test_point_scan_residual_filter_pushed(bloom_store):
    """The residual In filter must reach the surviving parquet scan."""
    store, _ = bloom_store
    df = store.scan("orders_r", column="o_orderkey", isin=[1, 6])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In(o_orderkey" in plan, plan


def test_string_column_bloom_and_eq(spark, tmp_path, sf_dir):
    """Blooms work on string keys (hash parity via the shared Spark
    exprs), through scan(eq=...)."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.store import CarbonStore

    store = CarbonStore(spark, str(tmp_path / "s"))
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "ckey", F.concat(F.lit("C#"), F.col("c_custkey"))
    )
    store.create_table("cust", cust.schema, properties={"bloom_columns": "ckey"})
    store.load("cust", cust.filter(F.col("c_custkey") % 2 == 0))
    store.load("cust", cust.filter(F.col("c_custkey") % 2 == 1))
    got = store.scan("cust", column="ckey", eq="C#41")
    assert got.count() == 1
    segs = {f.split("/Segment_")[1].split("/")[0] for f in got.inputFiles()}
    assert segs == {"1"}  # odd custkeys live in segment 1


def test_compaction_recomputes_stats_and_blooms(spark, tmp_path, sf_dir):
    """compact() must leave the merged segment with a fresh zone map AND
    fresh blooms — a statless merged segment would silently stop pruning
    forever after."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.store import CarbonStore

    store = CarbonStore(spark, str(tmp_path / "c"))
    orders = load_table(spark, sf_dir, "orders")
    store.create_table(
        "o", orders.schema, properties={"bloom_columns": "o_orderkey"}
    )
    store.load("o", orders.filter(F.col("o_orderkey") % 2 == 0))
    store.load("o", orders.filter(F.col("o_orderkey") % 2 == 1))
    store.compact("o")
    segs = store.valid_segments("o")
    assert len(segs) == 1
    merged = segs[0]
    assert merged.blooms.get("o_orderkey"), "compaction dropped the bloom"
    assert merged.stats, "compaction dropped the zone map"
    # the merged bloom still answers point lookups with zero misses
    n = store.scan("o", column="o_orderkey", eq=5).count()
    assert n == orders.filter(F.col("o_orderkey") == 5).count() == 1


def test_saturation_stores_no_bloom(spark):
    """A column whose cardinality would blow past MAX_BITS stores NO
    bloom (the segment is kept by every probe — correct, just not
    pruned) rather than a saturated filter."""
    from carbondata_spark import bloom as B

    assert B._size_bits(10) == B.MIN_BITS
    assert B._size_bits((B.MAX_BITS // B.BITS_PER_DISTINCT) + 1) is None


def test_bloom_rejects_mixed_point_and_range(bloom_store):
    store, _ = bloom_store
    with pytest.raises(ValueError):
        store.scan("orders_r", column="o_orderkey", eq=1, isin=[2])
    with pytest.raises(ValueError):
        store.scan("orders_r", column="o_orderkey", eq=1, ge=0)


def test_point_scan_composes_with_time_travel(bloom_store):
    """eq pruning over the historical segment set: keys loaded after the
    as-of instant are invisible."""
    store, orders = bloom_store
    segs = sorted(store.valid_segments("orders_r"), key=lambda e: e.segment_id)
    ts_after_two = segs[1].load_end_ts + 1e-4
    # key 7 (residue 3) was loaded in segment 3 — AFTER the as-of instant
    n = store.scan(
        "orders_r", column="o_orderkey", eq=7, as_of_ts=ts_after_two
    ).count()
    assert n == 0
    # key 4 (residue 0) was already live
    n = store.scan(
        "orders_r", column="o_orderkey", eq=4, as_of_ts=ts_after_two
    ).count()
    assert n == 1


def test_streaming_segments_get_blooms(spark, tmp_path, sf_dir):
    """stream_load commits micro-batches through store.load, so a table
    that declares bloom_columns gets a bloom per STREAMED segment too —
    point lookups prune streaming ingest exactly like batch loads."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.store import CarbonStore
    from carbondata_spark.streaming.ingest import stream_load

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    sample = load_table(spark, sf_dir, "orders").limit(500)
    sample.filter(F.col("o_orderkey") % 2 == 0).write.parquet(str(src_dir / "f0"))
    sample.filter(F.col("o_orderkey") % 2 == 1).write.parquet(str(src_dir / "f1"))

    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table(
        "orders_live",
        sample.schema,
        sort_columns=["o_orderdate"],
        properties={"bloom_columns": "o_orderkey"},
    )
    stream = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    q = stream_load(store, "orders_live", stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    segs = store.valid_segments("orders_live")
    assert segs and all(e.blooms.get("o_orderkey") for e in segs)
    key = int(sample.agg(F.min("o_orderkey")).first()[0])
    got = store.scan("orders_live", column="o_orderkey", eq=key)
    assert got.count() == 1
    if len(segs) > 1:  # availableNow may fuse both files into one batch
        read = {f.split("/Segment_")[1].split("/")[0] for f in got.inputFiles()}
        assert len(read) < len(segs)


def test_create_table_validates_bloom_columns(spark, tmp_path):
    """Typo'd bloom columns fail at CREATE (a silent no-op filter would
    look like pruning while never pruning); float/double keys are refused
    outright — IEEE -0.0 == 0.0 compares equal but hashes differently, so
    a float bloom could FALSE-NEGATIVE a real row."""
    from carbondata_spark.store import CarbonStore

    store = CarbonStore(spark, str(tmp_path / "v"))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    with pytest.raises(ValueError, match="not in schema"):
        store.create_table("a", schema, properties={"bloom_columns": "nope"})
    with pytest.raises(ValueError, match="floating-point"):
        store.create_table("b", schema, properties={"bloom_columns": "score"})
    store.create_table("c", schema, properties={"bloom_columns": "id"})  # ok


def test_describe_reports_bloom_health(bloom_store):
    """describe() surfaces per-column bloom health (max fill ratio across
    segments) — the observable that says whether the filters are still
    selective or have outgrown their sizing."""
    store, _ = bloom_store
    d = store.describe("orders_r")
    h = d["bloom_health"]["o_orderkey"]
    assert h["segments_with_bloom"] == 4
    # sized at ~10 bits/distinct: fill stays well under saturation
    assert 0 < h["max_fill"] < 0.6


def test_scan_predicates_without_column_raise(bloom_store):
    """scan(eq=...) / scan(isin=[...]) / scan(ge=...) with column=None
    used to pass validation and silently return the WHOLE table —
    wrong results for a caller expecting a point lookup. Mirrors the
    eq+isin / eq+range guards. (ADVICE r9.)"""
    store, _ = bloom_store
    for kwargs in ({"eq": 1}, {"isin": [1, 2]}, {"ge": 0}, {"le": 10}):
        with pytest.raises(ValueError, match="require column"):
            store.scan("orders_r", **kwargs)
    # a bare scan with no predicate is still the whole-table read
    assert store.scan("orders_r").count() == store.table("orders_r").count()


def test_bloom_health_drops_with_dropped_column(spark, tmp_path, sf_dir):
    """ALTER DROP leaves old segments' bloom entries on disk (segments
    are immutable), but describe() must not report health for a column
    that no longer exists in the schema. (ADVICE r9.)"""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.store import CarbonStore

    store = CarbonStore(spark, str(tmp_path))
    orders = load_table(spark, sf_dir, "orders")
    store.create_table(
        "o_drop", orders.schema, properties={"bloom_columns": "o_orderkey,o_custkey"}
    )
    store.load("o_drop", orders.limit(500))
    assert set(store.describe("o_drop")["bloom_health"]) == {"o_orderkey", "o_custkey"}
    store.alter_drop_columns("o_drop", ["o_custkey"])
    d = store.describe("o_drop")
    assert set(d["bloom_health"]) == {"o_orderkey"}
    assert "o_custkey" not in d["schema"]
