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


def test_compact_emits_few_files_per_partition_dir(spark, tmp_path):
    """ADVICE r8: compacting a hive-partitioned table used to
    range-partition on the non-partition sort columns only, scattering
    every partition value across all n_parts tasks — each bucket
    directory then collected up to n_parts files, defeating the
    one-file-per-bucket layout build_ivf_index relies on. The partition
    columns now LEAD the range key: each value stays contiguous, so the
    whole compacted segment holds at most n_cids + n_parts - 1 files."""
    import random

    from pyspark.sql import types as T

    n_cids, n_parts = 8, 4
    schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType()),
            T.StructField("vid", T.LongType()),
        ]
    )
    rnd = random.Random(7)
    rows = [(rnd.randrange(n_cids), i) for i in range(4000)]
    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table(
        "assign", schema, sort_columns=["vid"], partition_columns=["cid"]
    )
    # deliberately scattered input: every task holds every cid
    df = spark.createDataFrame(rows, schema).repartition(8)
    store.load("assign", df.filter(F.col("vid") < 2000))
    store.load("assign", df.filter(F.col("vid") >= 2000))
    seg_id = store.compact("assign", partitions=n_parts)

    files = glob.glob(
        str(tmp_path / f"store/assign/Fact/Part0/Segment_{seg_id}/cid=*/*.parquet")
    )
    per_dir: dict[str, int] = {}
    for p in files:
        d = p.rsplit("/", 2)[1]
        per_dir[d] = per_dir.get(d, 0) + 1
    assert len(per_dir) == n_cids
    assert len(files) <= n_cids + n_parts - 1, per_dir
    # rows survive the merge and stay queryable per partition
    assert store.table("assign").count() == 4000
    assert store.table("assign").filter(F.col("cid") == 3).count() == sum(
        1 for c, _ in rows if c == 3
    )
