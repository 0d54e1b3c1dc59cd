"""Bucketed co-located joins: the shuffle-free fact-fact join path.

Broadcast handles the small side (every dim join in query_defs) and AQE
handles skew, but a recurring BIG x BIG equi-join at 100 TB wants both
sides pre-bucketed on the join key so the join is a zipped per-bucket
merge with ZERO Exchange — the Spark-native analogue of co-located
placement. These tests pin that the plan actually elides the shuffle
(bucket pruning included), because a bucketed table that silently falls
back to shuffle is indistinguishable from an unbucketed one in results
and 100x different at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, tmp_path, sf_dir):
    from carbondata_spark.catalog import load_table

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    # the auto-bucketed-scan rule turns bucketed reads OFF for plans it
    # judges not to need the distribution (filter-only scans, and join
    # shapes it misjudges under AQE) — pin it on; a production session
    # would do the same for a bucketed-layout warehouse
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem")).saveAsTable("b_lineitem"))
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, warehouse_tables, sf_dir):
    """orders ⋈ lineitem on the order key, both bucketed 8 ways on it:
    the sort-merge join must read buckets pairwise — no Exchange on
    either side — and produce the same aggregate as the shuffle plan."""
    from carbondata_spark.catalog import load_table

    b_orders, b_li = warehouse_tables
    # the test corpus is broadcast-sized; disable broadcast so the plan
    # exercises the BIG x BIG path this layout exists for
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    joined = (
        b_orders.join(b_li, b_orders.o_orderkey == b_li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    try:
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    assert "SortMergeJoin" in plan, plan[:600]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    # ground truth via the plain shuffle plan over raw parquet
    want = {
        (r.o_orderstatus, r.n, float(r.qty))
        for r in load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    got = {(r.o_orderstatus, r.n, float(r.qty)) for r in joined.collect()}
    assert got == want


def test_bucket_pruning_on_key_filter(spark, warehouse_tables):
    """An equality filter on the bucket key scans ~1/8 of the buckets:
    the scan node advertises the selected-bucket count."""
    b_orders, _ = warehouse_tables
    key = b_orders.select(F.min("o_orderkey")).first()[0]
    q = b_orders.filter(F.col("o_orderkey") == key)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:800]
    assert q.count() >= 1
