"""Z-order clustering: order-key correctness, Morton interleave shape,
store round-trip, and the actual point — multi-column pruning power that
lexicographic sort cannot give (reference MDKey analogue, zorder.py)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_string_order_key_preserves_lexicographic_order(spark):
    from carbondata_spark.zorder import _order_key

    vals = ["", "a", "ab", "abc", "abd", "b", "ba", "zz", "Z", "0", "~", "éclair", "z"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", _order_key(F.col("s"), T.StringType()).alias("k")).collect()
    keys = {r.s: r.k for r in rows}
    ordered = sorted(vals, key=lambda s: s.encode("utf-8"))
    got = [keys[s] for s in ordered]
    assert got == sorted(got), list(zip(ordered, got))


def test_single_column_zvalue_is_monotonic(spark):
    from carbondata_spark.zorder import ZVAL_COL, with_zvalue

    df = spark.range(0, 1000).withColumn("v", (F.col("id") * 7).cast("double"))
    rows = with_zvalue(df, ["v"]).orderBy("v").select(ZVAL_COL).collect()
    zs = [r[0] for r in rows]
    assert zs == sorted(zs)
    assert zs[0] >= 0 and zs[-1] >= 0


def test_zvalue_nulls_and_constant_columns(spark):
    from carbondata_spark.zorder import ZVAL_COL, with_zvalue

    df = spark.createDataFrame(
        [(None, 1.0), (2.0, 1.0), (3.0, 1.0)], "a double, b double"
    )
    rows = with_zvalue(df, ["a", "b"]).collect()
    # constant b contributes bucket 0 everywhere; null a buckets lowest
    zvals = {r.a: r[ZVAL_COL] for r in rows}
    assert zvals[None] == 0
    assert all(v is not None and v >= 0 for v in zvals.values())


def test_zorder_store_round_trip(spark):
    from carbondata_spark.store import CarbonStore

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 83).cast("int").alias("a"),
        (F.col("id") % 97).cast("int").alias("b"),
        F.concat(F.lit("row"), F.col("id")).alias("tag"),
    )
    with tempfile.TemporaryDirectory() as path:
        store = CarbonStore(spark, path)
        store.create_table(
            "zt", df.schema, sort_columns=["a", "b"],
            properties={"clustering": "zorder"},
        )
        store.load("zt", df.filter(F.col("k") < 2500), partitions=2)
        store.load("zt", df.filter(F.col("k") >= 2500), partitions=2)
        back = store.table("zt")
        assert back.count() == 5000
        assert back.select(F.sum("k")).first()[0] == df.select(F.sum("k")).first()[0]
        # compaction preserves rows under z-clustering too
        store.compact("zt", partitions=4)
        after = store.table("zt")
        assert after.count() == 5000
        assert sorted(r.k for r in after.filter(F.col("b") == 5).collect()) == sorted(
            r.k for r in df.filter(F.col("b") == 5).collect()
        )


def test_with_zvalue_rejects_reserved_column_name(spark):
    from carbondata_spark.zorder import with_zvalue

    df = spark.createDataFrame([(1.0, 2)], "a double, _zval int")
    with pytest.raises(ValueError, match="_zval"):
        with_zvalue(df, ["a"])


def test_create_table_rejects_unknown_clustering(spark):
    from carbondata_spark.store import CarbonStore

    with tempfile.TemporaryDirectory() as path:
        store = CarbonStore(spark, path)
        with pytest.raises(ValueError, match="clustering"):
            store.create_table(
                "bad",
                T.StructType([T.StructField("x", T.IntegerType())]),
                properties={"clustering": "hilbert"},
            )


def test_zorder_composes_with_time_travel_across_compaction(spark):
    """r5 verdict #7: time travel x z-order in one table. An as_of read
    of a Morton-clustered table must reconstruct each historical segment
    set exactly — including the pre-compaction view after compaction has
    replaced the z-ordered segments — and the zone-map-pruned scan()
    composes with as_of on the same z-ordered data."""
    import time

    from carbondata_spark.store import CarbonStore

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("int").alias("a"),
        ((F.col("id") * 7) % 64).cast("int").alias("b"),
    )
    with tempfile.TemporaryDirectory() as path:
        store = CarbonStore(spark, path)
        store.create_table(
            "ztt", df.schema, sort_columns=["a", "b"],
            properties={"clustering": "zorder"},
        )
        store.load("ztt", df.filter(F.col("k") < 2000), partitions=2)
        time.sleep(0.02)
        t_after_load0 = time.time()
        time.sleep(0.02)
        store.load("ztt", df.filter(F.col("k") >= 2000), partitions=2)
        time.sleep(0.02)
        t_before_compact = time.time()
        time.sleep(0.02)
        store.compact("ztt", partitions=4)  # re-runs Morton clustering

        # live view: compacted, complete
        assert store.table("ztt").count() == 4000
        # historical views survive the compaction of z-ordered segments
        assert store.table("ztt", as_of_ts=t_after_load0).count() == 2000
        assert (
            store.table("ztt", as_of_ts=t_after_load0)
            .select(F.sum("k")).first()[0]
            == df.filter(F.col("k") < 2000).select(F.sum("k")).first()[0]
        )
        assert store.table("ztt", as_of_ts=t_before_compact).count() == 4000
        # pruned scan x as_of on the z-ordered table: results equal the
        # unpruned historical filter
        got = sorted(
            r.k for r in store.scan(
                "ztt", column="b", ge=0, le=5, as_of_ts=t_after_load0
            ).collect()
        )
        want = sorted(
            r.k
            for r in df.filter((F.col("k") < 2000) & (F.col("b") <= 5)).collect()
        )
        assert got == want


def _files_overlapping_b(seg_dirs: list[str], lo: int, hi: int) -> tuple[int, int]:
    """(overlapping, total) parquet files whose row-group min/max on
    column b intersect [lo, hi) — what a pruning reader skips by."""
    import pyarrow.parquet as pq

    total = overlapping = 0
    for seg in seg_dirs:
        for name in os.listdir(seg):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(seg, name)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "b" and col.statistics is not None:
                        mins.append(col.statistics.min)
                        maxs.append(col.statistics.max)
            if not mins:
                continue
            total += 1
            if min(mins) < hi and max(maxs) >= lo:
                overlapping += 1
    return overlapping, total


def test_zorder_prunes_trailing_column_where_lexicographic_cannot(spark):
    """The reason this feature exists: cluster a 256x256 (a, b) grid on
    [a, b] both ways, 16 files each. Lexicographic range-partitioning
    splits on leading a, so EVERY file spans the full b domain and a
    b-only predicate prunes nothing. Morton interleaving gives files
    square-ish (a, b) tiles, so b < 16 touches only the tiles whose
    b-extent starts at 0 — a small fraction of the files."""
    from carbondata_spark.store import CarbonStore

    grid = (
        spark.range(0, 256 * 256)
        .select(
            (F.col("id") / 256).cast("int").alias("a"),
            (F.col("id") % 256).cast("int").alias("b"),
        )
        .repartition(8)  # destroy incidental input ordering
    )
    with tempfile.TemporaryDirectory() as path:
        store = CarbonStore(spark, path)
        for name, props in [("lex", {}), ("zee", {"clustering": "zorder"})]:
            store.create_table(
                name, grid.schema, sort_columns=["a", "b"], properties=props
            )
            store.load(name, grid, partitions=16)
        seg = lambda name: [
            os.path.join(path, name, "Fact", "Part0", "Segment_0")
        ]
        lex_hit, lex_total = _files_overlapping_b(seg("lex"), 0, 16)
        z_hit, z_total = _files_overlapping_b(seg("zee"), 0, 16)
        assert lex_total == 16 and z_total == 16
        # lexicographic: b spans the whole domain in every range chunk
        assert lex_hit == lex_total
        # morton: only the low-b tiles can match
        assert z_hit <= z_total // 2, (z_hit, z_total)
