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


def test_feed_skips_compaction_of_already_delivered_segments(store, spark):
    store.load("t", spark.createDataFrame(
        [(i, "b", float(i)) for i in range(5, 8)], "id long, grp string, v double"))
    ckpt = manifest_clock(store, "t")
    store.compact("t")
    # r13: compact() records compacted_from provenance, and the feed
    # proves every input was committed before the checkpoint — the
    # merged segment re-materializes only drained rows, so it must NOT
    # re-deliver (closing the r12 documented limit).
    assert new_segments(store, "t", ckpt) == []
    assert changes_since(store, "t", ckpt).count() == 0
    # a genuinely new load after the compaction still delivers
    store.load("t", spark.createDataFrame(
        [(100, "c", 0.0)], "id long, grp string, v double"))
    got = changes_since(store, "t", ckpt)
    assert sorted(r.id for r in got.collect()) == [100]


def test_feed_mixed_input_compaction_delivers_whole(store, spark):
    """A merge with ANY post-checkpoint input delivers whole (its new
    rows are inseparable from the merged files) — the documented
    at-least-once corner."""
    ckpt = manifest_clock(store, "t")  # only load #0 drained
    store.load("t", spark.createDataFrame(
        [(i, "b", float(i)) for i in range(5, 8)], "id long, grp string, v double"))
    store.compact("t")  # merges drained seg 0 + undrained seg 1
    ids = new_segments(store, "t", ckpt)
    assert len(ids) == 1
    assert changes_since(store, "t", ckpt).count() == 8  # re-delivers seg 0 rows


def test_feed_purged_provenance_falls_back_to_delivery(store, spark):
    """clean_files removes Compacted manifest entries; without the
    input's commit timestamp the already-delivered proof is gone and the
    feed must deliver (at-least-once, never silent loss)."""
    store.load("t", spark.createDataFrame(
        [(i, "b", float(i)) for i in range(5, 8)], "id long, grp string, v double"))
    ckpt = manifest_clock(store, "t")
    store.compact("t")
    store.clean_files("t")  # purges the Compacted input entries
    ids = new_segments(store, "t", ckpt)
    assert len(ids) == 1
    assert changes_since(store, "t", ckpt).count() == 8


def test_manifest_clock_is_commit_time_not_start_time(store, spark):
    """The clock and the feed filter use load_end_ts (stamped at commit
    under the status lock). A load that STARTS before a checkpoint but
    COMMITS after must still deliver — load_start_ts ordering would
    silently lose it."""
    entries = store.show_segments("t")
    assert all(e["load_end_ts"] >= e["load_start_ts"] for e in entries)
    clock = manifest_clock(store, "t")
    assert clock == max(e["load_end_ts"] for e in entries)
    # checkpoint strictly between start and commit of a simulated
    # straggler: feed keyed on commit time delivers it
    ckpt = entries[0]["load_start_ts"] - 1e-6
    assert new_segments(store, "t", ckpt) == [0]


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
