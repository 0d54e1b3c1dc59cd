"""Round-19 optimization pins: catalog stamp invalidation, memo bounds,
MERGE row-granular zone-map pruning + observe-detection commit shape."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# catalog stat stamp: in-place member rewrite must invalidate (ADVICE r18)
# ---------------------------------------------------------------------------


def test_catalog_stamp_detects_inplace_member_rewrite(spark):
    from carbondata_spark.catalog import _stat_stamp, load_table

    tmp = tempfile.mkdtemp(prefix="cat_stamp_")
    try:
        ddir = os.path.join(tmp, "documents.parquet")
        os.makedirs(ddir)
        member = os.path.join(ddir, "part-0.parquet")
        pq.write_table(pa.table({"x": [1, 2]}), member)
        stamp0 = _stat_stamp(ddir)
        df0 = load_table(spark, tmp, "documents")
        assert df0.count() == 2 and "y" not in df0.columns

        # rewrite the member IN PLACE: same filename, same directory —
        # the directory's own inode/mtime/size do not change, so the r18
        # dir-only stamp would serve the stale 2-row, y-less plan
        alt = os.path.join(tmp, "alt.parquet")
        pq.write_table(pa.table({"x": [1, 2, 3], "y": [10, 20, 30]}), alt)
        shutil.copyfile(alt, member)

        assert _stat_stamp(ddir) != stamp0, "in-place rewrite must change stamp"
        df1 = load_table(spark, tmp, "documents")
        assert df1.count() == 3 and "y" in df1.columns
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_catalog_missing_table_error_names_the_source(spark):
    from carbondata_spark.catalog import load_table

    with pytest.raises(FileNotFoundError, match="no such table source"):
        load_table(spark, "/nonexistent_sf_dir", "documents")


# ---------------------------------------------------------------------------
# memo bounds (VERDICT r18 "What's wrong" #1)
# ---------------------------------------------------------------------------


def test_npart_memo_bounded(spark):
    import carbondata_spark.functions as fn

    saved = dict(fn._NPART_MEMO)
    try:
        fn._NPART_MEMO.clear()
        fn._NPART_MEMO.update(
            {("fake_app", i): 1 for i in range(fn._NPART_MEMO_MAX)}
        )
        fn.ensure_parallelism(spark.range(10))
        assert len(fn._NPART_MEMO) <= fn._NPART_MEMO_MAX
        # the oldest fake entry was evicted, the fresh one is present
        assert ("fake_app", 0) not in fn._NPART_MEMO
    finally:
        fn._NPART_MEMO.clear()
        fn._NPART_MEMO.update(saved)


def test_catalog_cache_bounded():
    import carbondata_spark.catalog as cat

    saved = dict(cat._LOADED)
    try:
        cat._LOADED.clear()
        cat._LOADED.update(
            {("sf", f"t{i}"): (None, (), None) for i in range(cat._LOADED_MAX + 40)}
        )
        # the insert path itself enforces the bound; simulate it
        while len(cat._LOADED) >= cat._LOADED_MAX:
            cat._LOADED.pop(next(iter(cat._LOADED)))
        assert len(cat._LOADED) < cat._LOADED_MAX
    finally:
        cat._LOADED.clear()
        cat._LOADED.update(saved)


# ---------------------------------------------------------------------------
# self-expiring optimization-round declaration (r18 ADVICE medium item)
# ---------------------------------------------------------------------------


def test_round_mode_declaration_self_expires(tmp_path):
    import json

    from carbondata_spark import ledger as L

    p = tmp_path / "driver_round_mode.json"
    # matching round -> suspended
    p.write_text(json.dumps({"round": 19, "mode": "optimization"}))
    assert L.round_mode_status(str(p), active_round=19)[0] == "suspended"
    # any other round -> expired (hard-fail in consumers), never a bypass
    assert L.round_mode_status(str(p), active_round=20)[0] == "expired"
    assert L.round_mode_status(str(p), active_round=18)[0] == "expired"
    # non-optimization or missing -> absent (gates armed)
    p.write_text(json.dumps({"round": 19, "mode": "build"}))
    assert L.round_mode_status(str(p), active_round=19)[0] == "absent"
    assert L.round_mode_status(str(tmp_path / "nope.json"), 19)[0] == "absent"
    # malformed round -> expired, not a crash and not a bypass
    p.write_text(json.dumps({"round": "nineteen", "mode": "optimization"}))
    assert L.round_mode_status(str(p), active_round=19)[0] == "expired"


def test_active_round_tracks_bench_artifacts():
    from carbondata_spark import ledger as L

    # the repo's own artifacts: active round == latest BENCH_rN + 1, and
    # the committed declaration matches it (suspended, not expired)
    state, _mode, active = L.round_mode_status()
    assert active == L.latest_completed_round() + 1
    assert state == "suspended", (
        "driver_round_mode.json must name the active round; if this fails "
        "the declaration went stale — delete or update it"
    )


# ---------------------------------------------------------------------------
# MERGE r19 shape: row-granular zone pruning + observe-detection commit
# ---------------------------------------------------------------------------


@pytest.fixture()
def three_segment_store(spark):
    from carbondata_spark.store import CarbonStore

    tmp = tempfile.mkdtemp(prefix="merge_r19_")
    st = CarbonStore(spark, tmp)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    st.create_table("t", schema, sort_columns=["k"])
    # three key-disjoint segments: A [0,98] evens, B [200,299], C [400,499]
    rows_a = [(i, f"a{i}") for i in range(0, 100, 2)]
    rows_b = [(i, f"b{i}") for i in range(200, 300)]
    rows_c = [(i, f"c{i}") for i in range(400, 500)]
    for rows in (rows_a, rows_b, rows_c):
        st.load("t", spark.createDataFrame(rows, schema))
    yield st
    shutil.rmtree(tmp, ignore_errors=True)


def _statuses(st):
    return {
        e.segment_id: (e.status, e.origin.get("rewrite_of"))
        for e in st._read_status("t")
    }


def test_merge_row_granular_prune_skips_gap_segment(spark, three_segment_store):
    """Source keys {50, 450} straddle segment B's [200,299] range globally
    but no source row falls inside it: B must be pruned (not rewritten),
    while A and C are updated. The r18 whole-source-range overlap prune
    would have made B a candidate."""
    st = three_segment_store
    src = spark.createDataFrame([(50, "upd50"), (450, "upd450")], "k long, v string")
    res = st.merge_rows("t", src, keys="k")
    assert res == {"updated": 2, "inserted": 0}
    stat = _statuses(st)
    rewritten_of = {
        ro for _sid, (s, ro) in stat.items() if s == "Success" and ro is not None
    }
    assert rewritten_of == {0, 2}, f"B (segment 1) must not be rewritten: {stat}"
    assert stat[1][0] == "Success"  # B's original is still live
    got = {r["k"]: r["v"] for r in st.table("t").filter(F.col("k").isin(50, 450, 250)).collect()}
    assert got == {50: "upd50", 450: "upd450", 250: "b250"}


def test_merge_unmatched_candidate_discards_noop_rewrite(spark, three_segment_store):
    """Source key 51 falls inside segment A's [0,98] zone range but A holds
    only even keys: A is a candidate, its no-op rewrite must be discarded
    at the swap (original stays live), and the row inserts."""
    st = three_segment_store
    before = _statuses(st)
    live_before = {sid for sid, (s, _) in before.items() if s == "Success"}
    src = spark.createDataFrame([(51, "new51")], "k long, v string")
    res = st.merge_rows("t", src, keys="k")
    assert res == {"updated": 0, "inserted": 1}
    stat = _statuses(st)
    # every original segment is still live; the candidate's no-op rewrite
    # entry exists but is deleted; exactly one new insert segment is live
    assert all(stat[sid][0] == "Success" for sid in live_before), stat
    deleted_rewrites = [
        sid for sid, (s, ro) in stat.items() if s == "Marked for Delete" and ro == 0
    ]
    assert deleted_rewrites, f"expected A's no-op rewrite marked deleted: {stat}"
    assert st.table("t").filter(F.col("k") == 51).count() == 1
    assert st.table("t").count() == sum(1 for _ in range(0, 100, 2)) + 200 + 1


def test_merge_update_only_no_match_leaves_table_untouched(spark, three_segment_store):
    """insert=False with a source that hits zone ranges but matches no row:
    every rewrite is discarded, nothing changes."""
    st = three_segment_store
    n0 = st.table("t").count()
    src = spark.createDataFrame([(51, "x"), (451, "y")], "k long, v string")
    # 51 is in A's range (odd -> no match); 451 IS in C and exists? C holds
    # all of 400-499, so 451 matches. Use 350 (in no range) and 51 instead.
    src = spark.createDataFrame([(51, "x"), (350, "y")], "k long, v string")
    res = st.merge_rows("t", src, keys="k", insert=False)
    assert res == {"updated": 0, "inserted": 0}
    assert st.table("t").count() == n0
    stat = _statuses(st)
    assert all(s != "Compacted" for s, _ in stat.values()), stat
