"""Accuracy tests for approximate aggregates (no cross-engine oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.queries import registry


def test_approx_distinct_accuracy(spark, sf_dir):
    from carbondata_spark.catalog import load_table

    out = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_median"])
        for r in registry()["q_approx_distinct"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["n"], r["med"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("med"),
        )
        .collect()
    }
    for k, (n_exact, med_exact) in exact.items():
        n_approx, med_approx = out[k]
        assert abs(n_approx - n_exact) / n_exact < 0.10, f"{k}: HLL error too large ({n_approx} vs {n_exact})"
        assert abs(med_approx - med_exact) / med_exact < 0.10, f"{k}: KLL error too large ({med_approx} vs {med_exact})"
