"""Round-17 pins: reader-side crash consistency.

r16 pinned WRITER-side recovery (promotion crash, merge insert-phase
crash): the table stays readable at its pre-mutation state and
clean_files GCs the debris. These pins extend the guarantee to
CONCURRENT READERS: a time-travel view and a segment-feed cursor taken
BEFORE a rewrite that crashes (and is then GC'd) must keep resolving
against the pre-mutation manifest — the crash and its cleanup must be
invisible to them. Reference analogue: the load-failure cleanup in
CarbonDataRDDFactory.scala:527-558 deletes only the failed load's own
artifacts and never invalidates concurrent readers of committed
segments.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from carbondata_spark.operators.segment_feed import (
    changes_since,
    manifest_clock,
    new_segments,
)
from carbondata_spark.store import CarbonStore


def _build_store(spark, root, n_segs: int, rows_per_seg: int = 60):
    store = CarbonStore(spark, str(root))
    df = spark.range(0, rows_per_seg * n_segs).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    store.create_table("t", df.schema, sort_columns=["k"])
    for i in range(n_segs):
        store.load(
            "t",
            df.filter(
                (F.col("k") >= i * rows_per_seg)
                & (F.col("k") < (i + 1) * rows_per_seg)
            ),
        )
    return store


def _crash_mid_promotion(spark, store, monkey_target_mod):
    """Run a broad UPDATE that crashes after the 2nd rewrite-dir
    promotion, leaving promoted orphans + the staging dir on disk and the
    manifest un-swapped (the r16 writer-crash recipe, reused verbatim so
    the reader pins exercise the identical debris state)."""
    real_rename = os.rename
    real_rmtree = monkey_target_mod.shutil.rmtree
    promoted: list[str] = []

    def crashing_rename(src, dst, *a, **kw):
        if ".rewrite_staging_" in str(src):
            if len(promoted) >= 2:
                raise OSError(28, "injected crash after 2nd promotion")
            promoted.append(dst)
        return real_rename(src, dst, *a, **kw)

    def crash_rmtree(path, *a, **kw):
        if ".rewrite_staging_" in str(path):
            return None  # finally-cleanup never runs in a real crash
        return real_rmtree(path, *a, **kw)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(os, "rename", crashing_rename)
        mp.setattr(monkey_target_mod.shutil, "rmtree", crash_rmtree)
        with pytest.raises(OSError, match="injected crash"):
            store.update_rows("t", "v % 120 = 0", {"v": "-1"})
    return promoted


def test_footer_metadata_many_parity_with_per_segment(spark, tmp_path):
    """The flat cross-segment footer pool (r17, _footer_metadata_many)
    must return byte-identical metadata to the per-segment path for
    every (segment, file): row counts, zone-map stats, and the empty-dir
    edge all agree — the promotion loop's manifest entries depend on
    it."""
    store = _build_store(spark, tmp_path, n_segs=3)
    seg_dirs = {
        e.segment_id: store._segment_dir("t", e.segment_id)
        for e in store.valid_segments("t")
    }
    seg_dirs[99] = str(tmp_path / "empty_dir")  # no parquet files
    os.makedirs(seg_dirs[99], exist_ok=True)
    many = CarbonStore._footer_metadata_many(seg_dirs)
    assert many[99] == {}
    for sid, d in seg_dirs.items():
        single = store._footer_metadata(d)
        assert sorted(many[sid]) == sorted(single)
        for f in single:
            assert many[sid][f].num_rows == single[f].num_rows
        assert store._segment_rows_from_footers(d, many[sid]) == (
            store._segment_rows_from_footers(d)
        )
        assert store._collect_segment_stats(d, ["k"], many[sid]) == (
            store._collect_segment_stats(d, ["k"])
        )


def test_time_travel_view_survives_crashed_then_gcd_rewrite(spark, tmp_path):
    """A time-travel view taken before a rewrite that crashes mid-
    promotion — held open as a live DataFrame AND re-resolved fresh after
    clean_files GCs the debris — must keep reading the pre-mutation rows:
    the crash never advances the manifest, and GC removes only the failed
    rewrite's own artifacts, never a committed segment a view can need."""
    import carbondata_spark.store as store_mod

    store = _build_store(spark, tmp_path, n_segs=4)
    t0 = time.time()
    before_rows = {tuple(r) for r in store.table("t").collect()}
    # the "held-open reader": a time-travel frame CONSTRUCTED pre-crash
    held_open = store.table("t", as_of_ts=t0)

    _crash_mid_promotion(spark, store, store_mod)

    # crash visible to neither the held-open frame nor a fresh resolve
    assert {tuple(r) for r in held_open.collect()} == before_rows
    assert {
        tuple(r) for r in store.table("t", as_of_ts=t0).collect()
    } == before_rows

    time.sleep(0.1)
    store.clean_files("t", stale_in_progress_s=0.05)

    # GC'd the debris — and the view still resolves (clean_files may only
    # remove segments no committed manifest state references)
    assert {tuple(r) for r in held_open.collect()} == before_rows
    assert {
        tuple(r) for r in store.table("t", as_of_ts=t0).collect()
    } == before_rows

    # and the view keeps working across the SUCCESSFUL retry: post-update
    # current reads see the mutation, the t0 view still does not
    assert store.update_rows("t", "v % 120 = 0", {"v": "-1"}) == 4
    assert store.table("t").filter("v = -1").count() == 4
    assert {
        tuple(r) for r in store.table("t", as_of_ts=t0).collect()
    } == before_rows


def test_feed_cursor_unaffected_by_crashed_rewrite(spark, tmp_path):
    """A changes_since cursor taken mid-history must deliver exactly the
    post-cursor loads across a crashed-then-GC'd rewrite: the crash's
    reserved In-Progress entries (load_end_ts 0) never enter the feed,
    the manifest clock never moves, and clean_files changes neither."""
    import carbondata_spark.store as store_mod

    store = _build_store(spark, tmp_path, n_segs=2)
    cursor = manifest_clock(store, "t")
    # one post-cursor load: the feed's expected delivery
    extra = spark.range(1000, 1060).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    store.load("t", extra)
    expected = {tuple(r) for r in extra.collect()}
    assert {tuple(r) for r in changes_since(store, "t", cursor).collect()} == expected
    clock_before = manifest_clock(store, "t")

    _crash_mid_promotion(spark, store, store_mod)

    # the crashed rewrite is invisible to the feed: same ids, same rows,
    # clock unmoved (reserved entries are not SUCCESS and never stamped)
    assert manifest_clock(store, "t") == clock_before
    assert new_segments(store, "t", cursor) == [2]
    assert {tuple(r) for r in changes_since(store, "t", cursor).collect()} == expected

    time.sleep(0.1)
    store.clean_files("t", stale_in_progress_s=0.05)

    assert manifest_clock(store, "t") == clock_before
    assert new_segments(store, "t", cursor) == [2]
    assert {tuple(r) for r in changes_since(store, "t", cursor).collect()} == expected

    # the successful retry rewrites every segment (incl. post-cursor
    # segment 2, whose rows the cursor already drained above): the
    # default feed excludes IUD rewrites — re-materialized rows are not
    # NEW rows — so it goes quiet, while include_rewrites=True surfaces
    # the rewritten data for CDC consumers that want the updates
    assert store.update_rows("t", "v % 120 = 0", {"v": "-1"}) == 3
    assert new_segments(store, "t", cursor) == []
    assert changes_since(store, "t", cursor).count() == 0
    cdc_ids = new_segments(store, "t", cursor, include_rewrites=True)
    assert len(cdc_ids) == 3
    cdc = changes_since(store, "t", cursor, include_rewrites=True)
    assert cdc.filter("v = -1").count() == 3
