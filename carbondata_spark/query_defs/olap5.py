"""OLAP widening, round 3: the two TPC-H query shapes still absent from
the registry — Q2 (minimum-cost supplier: correlated MIN subquery inside
a region-filtered multi-join) and Q9 (product-type profit: 5-way join
with derived-column aggregation by nation and year). With these, every
one of the reference's TPC-H-family query shapes
(allqueries/AllDataTypesTestCaseAggregate.scala:52-130 breadth) has a
registered, oracle-checked counterpart: q01-q22 complete.

Both are adapted to the testdata schema (no partsupp table): the
part-supplier relation is DERIVED from lineitem — unit cost is
min(l_extendedprice / l_quantity) per (partkey, suppkey) — and Q9's
supply cost is a retail-price fraction. Same adaptation convention as
q11/q20 (olap4.py).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from carbondata_spark.functions import dround, dsum
from carbondata_spark.queries import register, t


@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT partkey, suppkey, cost, s_acctbal, s_name, n_name
      FROM supply
      JOIN supplier ON s_suppkey = suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           round(cost, 4) AS cost
    FROM eu JOIN part ON p_partkey = partkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      AND cost = (SELECT min(cost) FROM eu e2 WHERE e2.partkey = eu.partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (correlated MIN subquery in a region-filtered "
    "multi-join): for LARGE parts of size 10-20, the EUROPE supplier(s) "
    "whose derived unit cost equals the per-part minimum among EUROPE "
    "suppliers. Adapted: the part-supplier relation is derived from "
    "lineitem (no partsupp) — cost = min(l_extendedprice/l_quantity) "
    "per (partkey, suppkey). Scale plan: the size/type filter reduces "
    "part ~36x, and the survivors are BROADCAST to prune lineitem "
    "BEFORE the (partkey, suppkey) aggregate — the correlated min then "
    "runs over only the surviving parts' supply rows (partkey-keyed "
    "window, high-cardinality key, no fact-table reshuffle after the "
    "first agg); nation/region are broadcast; final order+limit is a "
    "TakeOrderedAndProject with a total tiebreak (s_name, p_partkey "
    "unique per row).",
)
def q02(spark, sf_dir):
    part = (
        t(spark, sf_dir, "part")
        .filter(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
        )
        .select("p_partkey", "p_name")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supply = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        supply.join(supp, supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    min_cost = F.min("cost").over(W.partitionBy("l_partkey"))
    best = eu.withColumn("_min", min_cost).filter(F.col("cost") == F.col("_min"))
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            dround(F.col("cost"), 4).alias("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q09_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(round(sum(CAST(amount AS DECIMAL(30,6))), 2) AS DOUBLE)
             AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (profit by nation and year over a 5-way join "
    "with a derived measure): amount = revenue minus supply cost, "
    "grouped by the supplier's nation and the order year. Adapted: "
    "supply cost = 0.6 * p_retailprice * l_quantity (no partsupp). "
    "Scale plan: the p_name LIKE filter shrinks part before its "
    "broadcast into the lineitem scan (partkey pruning at the fact "
    "table); supplier joins on suppkey and orders on orderkey are left "
    "to AQE (both sides grow with the fact table); nation is broadcast; "
    "the exact decimal sum (dsum) makes the grouped profit drift-free "
    "across engines. year() over TIMESTAMP_NTZ is timezone-independent.",
)
def q09(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), 2).alias("sum_profit"))
    )
