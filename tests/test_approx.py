"""Accuracy tests for approximate aggregates.

q_approx_distinct now carries its own exact columns + in-bound booleans
(driver-checkable); this test independently recomputes the exact values
and asserts the query's booleans are true AND its exact columns agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.queries import registry


def test_approx_distinct_accuracy(spark, sf_dir):
    from carbondata_spark.catalog import load_table

    out = {
        r["l_returnflag"]: r
        for r in registry()["q_approx_distinct"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for k, n_exact in exact.items():
        row = out[k]
        assert row["exact_orders"] == n_exact
        assert row["count_within_5pct"] is True, f"{k}: HLL outside 5% bound"
        assert row["median_within_2pct"] is True, f"{k}: KLL outside 2% bound"
