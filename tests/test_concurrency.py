"""Concurrent manifest-commit safety (reference: ZK/HDFS/local locks,
core/.../locks/ — rebuilt as file lock + atomic rename)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import types as T

from carbondata_spark.store import CarbonStore

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
)


def test_concurrent_loads_commit_all_segments(spark, tmp_path):
    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table("t", SCHEMA)
    df = spark.createDataFrame([(i, float(i)) for i in range(200)], SCHEMA)

    def load(_):
        return store.load("t", df)

    with ThreadPoolExecutor(max_workers=4) as pool:
        ids = list(pool.map(load, range(4)))

    # every load got a distinct segment id and every one is in the manifest
    assert sorted(ids) == [0, 1, 2, 3]
    segs = store.show_segments("t")
    assert sorted(e["segment_id"] for e in segs) == [0, 1, 2, 3]
    assert all(e["status"] == "Success" and e["rows"] == 200 for e in segs)
    assert store.table("t").count() == 800


def test_concurrent_load_and_delete(spark, tmp_path):
    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table("t", SCHEMA)
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], SCHEMA)
    s0 = store.load("t", df)

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_load = pool.submit(store.load, "t", df)
        f_del = pool.submit(store.delete_segments, "t", [s0])
        new_id = f_load.result()
        deleted = f_del.result()

    assert deleted == 1 and new_id == 1
    statuses = {e["segment_id"]: e["status"] for e in store.show_segments("t")}
    assert statuses == {0: "Marked for Delete", 1: "Success"}
    assert store.table("t").count() == 100
