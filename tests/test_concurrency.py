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


def test_stale_lock_from_dead_process_is_broken(tmp_path):
    import subprocess

    from carbondata_spark.lock import file_lock

    target = str(tmp_path / "status.json")
    # a pid that existed and is now certainly dead
    p = subprocess.Popen(["sleep", "0.01"])
    p.wait()
    with open(target + ".lock", "w") as f:
        f.write(str(p.pid))
    # must break the dead holder's lock and acquire well within timeout
    with file_lock(target, timeout_s=5.0):
        pass


def test_live_lock_is_respected(tmp_path):
    import os

    import pytest

    from carbondata_spark.lock import LockTimeout, file_lock

    target = str(tmp_path / "status.json")
    with open(target + ".lock", "w") as f:
        f.write(str(os.getpid()))  # ourselves: alive
    with pytest.raises(LockTimeout):
        with file_lock(target, timeout_s=0.3, stale_s=300.0):
            pass
    os.remove(target + ".lock")


def test_compact_aborts_when_source_segment_invalidated(spark, tmp_path):
    """A concurrent DELETE LOAD between compaction's merge and its final
    manifest commit must abort the compaction (else the merged segment
    resurrects the deleted rows)."""

    class RacingStore(CarbonStore):
        def table(self, table, segment_ids=None):
            # compact() materializes the merged frame via table(...,
            # segment_ids) — fire the concurrent delete exactly there.
            if segment_ids is not None and not getattr(self, "_fired", False):
                self._fired = True
                self.delete_segments(table, [segment_ids[0]])
            return super().table(table, segment_ids=segment_ids)

    store = RacingStore(spark, str(tmp_path / "store"))
    store.create_table("t", SCHEMA)
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], SCHEMA)
    s0 = store.load("t", df)
    store.load("t", df)

    assert store.compact("t") is None  # aborted
    statuses = {e["segment_id"]: e["status"] for e in store.show_segments("t")}
    assert statuses[s0] == "Marked for Delete"
    assert statuses[1] == "Success"
    # the half-born merged segment must not be Success
    assert all(v != "Success" for k, v in statuses.items() if k > 1)
    assert store.table("t").count() == 50  # deleted rows stayed deleted
