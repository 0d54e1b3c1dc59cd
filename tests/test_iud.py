"""Row-level DELETE/UPDATE (store.delete_rows/update_rows): copy-on-write
segment rewrites with compact()'s all-or-nothing manifest swap. The
reference era predates row-level IUD (its deletes are whole-load); later
Apache CarbonData added this exact shape — and a 100 TB corpus needs it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carbondata_spark.store import SEGMENT_SUCCESS, CarbonStore


@pytest.fixture()
def store(spark, tmp_path):
    st = CarbonStore(spark, str(tmp_path / "store"))
    st.create_table(
        "t",
        spark.createDataFrame([], "id long, grp string, v double").schema,
        sort_columns=["id"],
    )
    # segment 0: ids 0..9 grp a/b; segment 1: ids 10..19 grp b/c
    st.load("t", spark.createDataFrame(
        [(i, "a" if i < 5 else "b", float(i)) for i in range(10)],
        "id long, grp string, v double"))
    st.load("t", spark.createDataFrame(
        [(i, "b" if i < 15 else "c", float(i)) for i in range(10, 20)],
        "id long, grp string, v double"))
    return st


def _live(st):
    return {e.segment_id for e in st.valid_segments("t")}


def test_delete_rows_rewrites_only_affected_segments(store):
    # grp='a' lives only in segment 0: segment 1 must survive UNTOUCHED
    n = store.delete_rows("t", "grp = 'a'")
    assert n == 5
    assert store.table("t").count() == 15
    assert store.table("t").filter("grp = 'a'").count() == 0
    live = _live(store)
    assert 1 in live and 0 not in live  # seg 1 kept as-is, seg 0 replaced
    rewrite = [e for e in store.valid_segments("t") if e.segment_id not in (0, 1)]
    assert len(rewrite) == 1 and rewrite[0].origin == {"rewrite_of": 0, "op": "delete"}
    assert rewrite[0].rows == 5
    # the rewritten segment's zone map was recomputed (pruning survives)
    assert rewrite[0].stats.get("id") is not None


def test_delete_all_rows_of_a_segment_leaves_no_replacement(store):
    n = store.delete_rows("t", "id < 10")
    assert n == 10
    live = _live(store)
    assert live == {1}  # segment 0 invalidated outright, nothing written
    assert store.table("t").count() == 10


def test_delete_null_predicate_keeps_rows(store, spark):
    store.load("t", spark.createDataFrame(
        [(100, None, 1.0)], "id long, grp string, v double"))
    n = store.delete_rows("t", "grp = 'zzz'")  # NULL grp -> predicate NULL
    assert n == 0
    assert store.table("t").filter("id = 100").count() == 1


def test_update_rows_applies_assignments_and_keeps_types(store):
    n = store.update_rows("t", "grp = 'b'", {"v": "v * 10", "grp": "'B'"})
    assert n == 10
    out = store.table("t")
    assert out.count() == 20  # UPDATE never changes cardinality
    got = {r["id"]: (r["grp"], r["v"]) for r in out.collect()}
    for i in range(5, 15):
        assert got[i] == ("B", i * 10.0)
    for i in list(range(5)) + list(range(15, 20)):
        assert got[i][0] in ("a", "c") and got[i][1] == float(i)
    assert dict(out.dtypes)["v"] == "double"  # cast back to the column type
    with pytest.raises(ValueError, match="unknown columns"):
        store.update_rows("t", "true", {"nope": "1"})
    with pytest.raises(ValueError, match="at least one"):
        store.update_rows("t", "true", {})


def test_time_travel_sees_pre_delete_rows(store):
    import time

    time.sleep(0.02)
    before = time.time()
    time.sleep(0.02)
    store.delete_rows("t", "id >= 15")
    assert store.table("t").count() == 15
    assert store.table("t", as_of_ts=before).count() == 20  # history intact


def test_concurrent_state_change_aborts_whole_rewrite(store, monkeypatch):
    """If a source segment's state changes while the rewrite is being
    written (simulated: a DELETE LOAD lands mid-write), the swap must
    abort ALL provisional segments and modify nothing."""
    real = CarbonStore._write_rewrites
    fired = {"done": False}

    def racy(self, table, out, rw_col, new_ids, meta, total_rows):
        got = real(self, table, out, rw_col, new_ids, meta, total_rows)
        if not fired["done"]:
            fired["done"] = True
            # concurrent whole-load delete of a segment whose rewrite
            # was JUST written: promoting it would resurrect its rows
            self.delete_segments("t", [0])
        return got

    monkeypatch.setattr(CarbonStore, "_write_rewrites", racy)
    with pytest.raises(RuntimeError, match="aborted"):
        store.delete_rows("t", "id % 2 = 0")  # touches BOTH segments
    monkeypatch.setattr(CarbonStore, "_write_rewrites", real)
    # nothing beyond the concurrent delete itself: segment 1 untouched,
    # its even ids still present (the row-delete did NOT half-apply)
    assert store.table("t").count() == 10
    assert store.table("t").filter("id % 2 = 0").count() == 5
    # the provisional rewrite segments are dead, clean_files can GC them
    store.clean_files("t", stale_in_progress_s=0.0)
    assert _live(store) == {1}


def test_sql_delete_and_update(store, spark):
    from carbondata_spark.sql import CarbonSession

    cs = CarbonSession(spark, store)
    n = cs.sql("DELETE FROM t WHERE grp = 'c'").collect()[0]["deleted_rows"]
    assert n == 5
    assert cs.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 15
    n = cs.sql("UPDATE t SET v = v + 1000 WHERE id < 2").collect()[0]["updated_rows"]
    assert n == 2
    got = {r["id"]: r["v"] for r in cs.sql("SELECT id, v FROM t WHERE id < 3").collect()}
    assert got == {0: 1000.0, 1: 1001.0, 2: 2.0}
    # UPDATE without WHERE touches every row
    n = cs.sql("UPDATE t SET v = 0").collect()[0]["updated_rows"]
    assert n == 15
    assert cs.sql("SELECT sum(v) AS s FROM t").collect()[0]["s"] == 0.0
    # the BEFORE form still routes to whole-load retention, not rows:
    # its result schema is the segment count and it drops entire loads
    import time

    cutoff = time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(time.time() + 60))
    res = cs.sql(f"DELETE FROM CUBE t WHERE grp BEFORE '{cutoff}'")
    assert res.columns == ["deleted"]  # retention schema, not deleted_rows
    assert cs.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 0
