"""Partitioned store tables: hive-style layout + Catalyst partition
pruning (reference PARTITIONER clause, CarbonSqlParser.scala:983-991)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from carbondata_spark.store import CarbonStore


def test_partitioned_load_layout_and_pruning(spark, tmp_path, sf_dir):
    from carbondata_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(20000)
    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table(
        "li",
        li.schema,
        sort_columns=["l_shipdate"],
        partition_columns=["l_returnflag"],
    )
    store.load("li", li)
    store.load("li", li)

    # hive-style dirs per partition value inside each segment
    dirs = glob.glob(str(tmp_path / "store/li/Fact/Part0/Segment_0/l_returnflag=*"))
    assert sorted(d.rsplit("=", 1)[1] for d in dirs) == ["A", "N", "R"]

    out = store.table("li")
    assert out.count() == 40000
    # counts preserved through the partitioned roundtrip
    want = {r["l_returnflag"]: 2 * r["n"] for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    got = {r["l_returnflag"]: r["n"] for r in out.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    assert got == want

    # a partition filter must prune directories, not just rows
    q = out.filter(F.col("l_returnflag") == "R")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert q.count() == want["R"]

    # compaction preserves the partitioned layout
    store.compact("li")
    dirs3 = glob.glob(str(tmp_path / "store/li/Fact/Part0/Segment_2/l_returnflag=*"))
    assert len(dirs3) == 3
    assert store.table("li").count() == 40000
