"""Incremental segment feed (operators/segment_feed.py): checkpoint the
manifest clock, read only newer segments; IUD rewrites are excluded from
the append feed; the compaction re-delivery limit is pinned as the
documented behavior it is."""

from __future__ import annotations

import pytest

from carbondata_spark.operators.segment_feed import (
    changes_since,
    manifest_clock,
    new_segments,
)
from carbondata_spark.store import CarbonStore


@pytest.fixture()
def store(spark, tmp_path):
    st = CarbonStore(spark, str(tmp_path / "store"))
    st.create_table(
        "t",
        spark.createDataFrame([], "id long, grp string, v double").schema,
        sort_columns=["id"],
    )
    st.load("t", spark.createDataFrame(
        [(i, "a", float(i)) for i in range(5)], "id long, grp string, v double"))
    return st


def test_feed_delivers_only_new_segments(store, spark):
    ckpt = manifest_clock(store, "t")
    assert new_segments(store, "t", ckpt) == []
    assert changes_since(store, "t", ckpt).count() == 0  # cheap no-op poll
    store.load("t", spark.createDataFrame(
        [(i, "b", float(i)) for i in range(5, 8)], "id long, grp string, v double"))
    assert new_segments(store, "t", ckpt) == [1]
    got = changes_since(store, "t", ckpt)
    assert sorted(r.id for r in got.collect()) == [5, 6, 7]
    # draining advances the clock; the next poll is empty again
    ckpt2 = manifest_clock(store, "t")
    assert new_segments(store, "t", ckpt2) == []
    # from zero, everything delivers (first-run semantics)
    assert changes_since(store, "t", 0.0).count() == 8


def test_feed_excludes_iud_rewrites(store, spark):
    store.load("t", spark.createDataFrame(
        [(i, "b", float(i)) for i in range(5, 8)], "id long, grp string, v double"))
    ckpt = manifest_clock(store, "t")
    # a row-level DELETE rewrites segment 0 copy-on-write: rows the
    # consumer already saw must NOT re-deliver
    store.delete_rows("t", "id = 2")
    assert new_segments(store, "t", ckpt) == []
    assert changes_since(store, "t", ckpt).count() == 0
    # IUD-aware consumers can opt into the rewrite stream
    ids = new_segments(store, "t", ckpt, include_rewrites=True)
    assert len(ids) == 1
    got = changes_since(store, "t", ckpt, include_rewrites=True)
    assert sorted(r.id for r in got.collect()) == [0, 1, 3, 4]  # seg 0 minus id=2
    # a genuinely new load after the rewrite still delivers
    store.load("t", spark.createDataFrame(
        [(10, "c", 1.0)], "id long, grp string, v double"))
    got = changes_since(store, "t", ckpt)
    assert sorted(r.id for r in got.collect()) == [10]


def test_feed_compaction_redelivery_is_the_documented_limit(store, spark):
    store.load("t", spark.createDataFrame(
        [(i, "b", float(i)) for i in range(5, 8)], "id long, grp string, v double"))
    ckpt = manifest_clock(store, "t")
    store.compact("t")
    # the merged segment's origin carries no input provenance yet, so it
    # re-delivers — the module docstring documents this and the store's
    # compacted_from tag is the planned fix. This test pins the CURRENT
    # contract so the fix flips it consciously.
    ids = new_segments(store, "t", ckpt)
    assert len(ids) == 1
    assert changes_since(store, "t", ckpt).count() == 8


def test_feed_is_segment_scoped_scan(store, spark):
    """The steady-state read must scan ONLY the new segment's directory —
    the plan's file listing is the new segment, not the table."""
    ckpt = manifest_clock(store, "t")
    store.load("t", spark.createDataFrame(
        [(100, "z", 0.0)], "id long, grp string, v double"))
    df = changes_since(store, "t", ckpt)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryFileIndex(1 paths)" in plan, plan
    files = df.inputFiles()
    assert files and all("Segment_1" in f for f in files), files


def test_feed_tails_streaming_ingest(spark, tmp_path, sf_dir):
    """The batch side of the streaming story: stream_load commits
    micro-batch segments; a downstream consumer tails them with
    changes_since — checkpoint, ingest more, read exactly the delta."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.streaming.ingest import stream_load

    sample = load_table(spark, sf_dir, "orders").limit(200)
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    sample.filter("o_orderkey % 2 = 0").write.parquet(str(src_dir / "f0"))

    st = CarbonStore(spark, str(tmp_path / "store"))
    st.create_table("live", sample.schema, sort_columns=["o_orderkey"])
    stream = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    stream_load(st, "live", stream, str(tmp_path / "ckpt1")).awaitTermination(120)
    n_first = st.table("live").count()
    assert n_first == sample.filter("o_orderkey % 2 = 0").count()
    ckpt = manifest_clock(st, "live")

    # second wave of files, new streaming run (availableNow semantics)
    sample.filter("o_orderkey % 2 = 1").write.parquet(str(src_dir / "f1"))
    stream2 = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    stream_load(st, "live", stream2, str(tmp_path / "ckpt1")).awaitTermination(120)

    delta = changes_since(st, "live", ckpt)
    assert delta.count() == sample.filter("o_orderkey % 2 = 1").count()
    assert delta.filter("o_orderkey % 2 = 0").count() == 0
