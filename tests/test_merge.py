"""MERGE INTO (store.merge_rows): upsert semantics, zone-map candidate
pruning, single-swap atomicity side-effects, and feed interaction
(rewrite excluded, inserts delivered)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carbondata_spark.store import CarbonStore


@pytest.fixture()
def store(spark, tmp_path):
    st = CarbonStore(spark, str(tmp_path / "m"))
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("v"),
        F.lit("base").alias("tag"),
    )
    st.create_table("t", df.schema, sort_columns=["k"])
    st.load("t", df.filter("k < 100"))
    st.load("t", df.filter("k >= 100"))
    return st


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, tag string")


def test_merge_upsert_basic(store, spark):
    res = store.merge_rows(
        "t",
        _src(spark, [(5, 555.0, "upd"), (150, 1555.0, "upd"), (900, 9.0, "new")]),
        keys="k",
    )
    assert res == {"updated": 2, "inserted": 1}
    tbl = store.table("t")
    assert tbl.count() == 201
    got = {r["k"]: (r["v"], r["tag"]) for r in tbl.filter("k in (5,150,900,6)").collect()}
    assert got[5] == (555.0, "upd")
    assert got[150] == (1555.0, "upd")
    assert got[900] == (9.0, "new")
    assert got[6] == (60.0, "base")  # untouched neighbor


def test_merge_prunes_unaffected_segment(store, spark):
    # keys confined to segment 0's range: segment 1 must survive as-is
    res = store.merge_rows("t", _src(spark, [(7, 7.0, "u")]), keys="k")
    assert res == {"updated": 1, "inserted": 0}
    segs = {s["segment_id"]: s for s in store.show_segments("t")}
    rewrites = [
        s for s in segs.values() if "rewrite_of" in (s["origin"] or {})
    ]
    assert len(rewrites) == 1
    assert rewrites[0]["origin"]["rewrite_of"] == 0
    assert segs[1]["status"] == "Success"  # never touched
    # the empty reserved insert segment never went live
    ins = [s for s in segs.values() if s["origin"].get("op") == "merge_insert"]
    assert all(s["status"] != "Success" for s in ins)


def test_merge_update_subset_columns(store, spark):
    store.merge_rows(
        "t",
        _src(spark, [(3, 999.0, "IGNORED")]),
        keys="k",
        update_cols=["v"],
    )
    row = store.table("t").filter("k = 3").collect()[0]
    assert row["v"] == 999.0
    assert row["tag"] == "base"  # not in update_cols


def test_merge_update_only_mode_ignores_unmatched(store, spark):
    res = store.merge_rows(
        "t",
        spark.createDataFrame([(4, 44.0), (5000, 1.0)], "k long, v double"),
        keys="k",
        update_cols=["v"],
        insert=False,
    )
    assert res == {"updated": 1, "inserted": 0}
    assert store.table("t").count() == 200
    assert store.table("t").filter("k = 4").collect()[0]["v"] == 44.0


def test_merge_duplicate_source_keys_raise(store, spark):
    with pytest.raises(ValueError, match="duplicate keys"):
        store.merge_rows(
            "t", _src(spark, [(1, 1.0, "a"), (1, 2.0, "b")]), keys="k"
        )


def test_merge_empty_source_is_noop(store, spark):
    before = store.show_segments("t")
    res = store.merge_rows("t", _src(spark, []), keys="k")
    assert res == {"updated": 0, "inserted": 0}
    assert store.show_segments("t") == before


def test_merge_null_key_rows_insert(store, spark):
    res = store.merge_rows(
        "t", _src(spark, [(None, 0.5, "nullkey")]), keys="k"
    )
    assert res == {"updated": 0, "inserted": 1}
    assert store.table("t").filter("k IS NULL").count() == 1


def test_merge_feed_delivers_only_inserts(store, spark):
    from carbondata_spark.operators.segment_feed import changes_since, manifest_clock

    ckpt = manifest_clock(store, "t")
    store.merge_rows(
        "t", _src(spark, [(5, 5.5, "u"), (700, 7.0, "new")]), keys="k"
    )
    got = changes_since(store, "t", ckpt)
    assert [r["k"] for r in got.collect()] == [700]


def test_merge_composite_keys(store, spark):
    # composite-key path on the existing table: (k, tag) as the key
    res = store.merge_rows(
        "t",
        _src(spark, [(9, 90909.0, "base"), (9, 1.0, "other")]),
        keys=["k", "tag"],
        update_cols=["v"],
    )
    assert res == {"updated": 1, "inserted": 1}
    rows = {r["tag"]: r["v"] for r in store.table("t").filter("k = 9").collect()}
    assert rows == {"base": 90909.0, "other": 1.0}


def test_merge_insert_only_mode(store, spark):
    """update_cols=[] = WHEN NOT MATCHED only: no rewrite, no detection
    job, matched rows untouched, only new rows appended (idempotent
    backfill)."""
    segs_before = {
        s["segment_id"]: s["status"] for s in store.show_segments("t")
    }
    res = store.merge_rows(
        "t",
        _src(spark, [(5, 99999.0, "IGNORED"), (800, 8.0, "new")]),
        keys="k",
        update_cols=[],
    )
    assert res == {"updated": 0, "inserted": 1}
    # matched row untouched, no segment rewritten
    assert store.table("t").filter("k = 5").collect()[0]["v"] == 50.0
    for sid, st_ in segs_before.items():
        assert (
            next(s for s in store.show_segments("t") if s["segment_id"] == sid)[
                "status"
            ]
            == st_
        )
    # idempotent: re-running the same backfill inserts nothing
    res2 = store.merge_rows(
        "t",
        _src(spark, [(5, 99999.0, "IGNORED"), (800, 8.0, "new")]),
        keys="k",
        update_cols=[],
    )
    assert res2 == {"updated": 0, "inserted": 0}
    with pytest.raises(ValueError, match="does nothing"):
        store.merge_rows("t", _src(spark, [(1, 1.0, "x")]), keys="k",
                         update_cols=[], insert=False)


def test_merge_sql_front_door(store, spark):
    from carbondata_spark.sql import CarbonSession

    ses = CarbonSession(spark, store)
    _src(spark, [(5, 5555.0, "sqlu"), (600, 6.0, "sqlnew")]) \
        .createOrReplaceTempView("updates_v")
    out = ses.sql(
        "MERGE INTO t USING updates_v ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()
    assert out[0]["updated"] == 1 and out[0]["inserted"] == 1
    got = {r["k"]: r["tag"] for r in store.table("t").filter("k in (5,600)").collect()}
    assert got == {5: "sqlu", 600: "sqlnew"}
    # subset-assignment + key-list form + insert-only form
    _src(spark, [(6, 666.0, "IGNORED"), (700, 7.0, "io")]) \
        .createOrReplaceTempView("updates_v2")
    out = ses.sql(
        "MERGE INTO t USING updates_v2 ON (k) "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    ).collect()
    assert out[0]["updated"] == 1 and out[0]["inserted"] == 0
    row6 = store.table("t").filter("k = 6").collect()[0]
    assert row6["v"] == 666.0 and row6["tag"] == "base"
    out = ses.sql(
        "MERGE INTO t USING updates_v2 ON (k) "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()
    assert out[0] == {"updated": 0, "inserted": 1} or (
        out[0]["updated"] == 0 and out[0]["inserted"] == 1
    )
    # unsupported shapes fail loudly
    with pytest.raises(ValueError, match="unsupported condition"):
        ses.sql(
            "MERGE INTO t USING updates_v2 ON t.k > s.k "
            "WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(ValueError, match="unsupported assignment"):
        ses.sql(
            "MERGE INTO t USING updates_v2 ON (k) "
            "WHEN MATCHED THEN UPDATE SET v = s.v + 1"
        )
