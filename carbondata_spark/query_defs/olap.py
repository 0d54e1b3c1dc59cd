"""OLAP query surface: scans, filters, aggregations, joins, sorts, top-k,
set operations, window functions, scalar expressions.

Reference parity map (SURVEY.md §2): the reference pushes projection /
filters / partial aggregation / sort / limit into its scan
(CarbonOperators.scala:232-376) and delegates joins, windows, set-ops,
HAVING and scalar functions to Spark. Here the whole surface is declared
through the DataFrame API and Catalyst does the pushdown — `.explain`
shows PushedFilters/ReadSchema on the parquet scans.

Each query doubles as a correctness probe (DuckDB oracle) and, when
``headline=True``, a bench workload.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from carbondata_spark.queries import r2, register, t

from carbondata_spark.functions import davg, dround, dsum

# ---------------------------------------------------------------------------
# Aggregation family (reference: CarbonAggregate / MeasureAggregator,
# SURVEY §2.4 — rebuilt as groupBy().agg() → HashAggregateExec)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(30,6))), 2) AS DOUBLE)      AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))), 2) AS DOUBLE)
             AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(l_quantity), 2)
             AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / count(l_extendedprice), 2)
             AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / count(l_discount), 2)
             AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    doc="TPC-H Q1 pricing summary: full-scan groupBy + 8 aggregates, read "
    "through the CarbonStore segment-union scan path (fact_store.py — "
    "CarbonQueryRDD parity: reference queries never read raw files).",
)
def q01(spark, sf_dir):
    from carbondata_spark.fact_store import fact_table
    from carbondata_spark.functions import exact_money_summary

    li = fact_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Exact decimal accumulation — at sf0.1 these group sums reach ~1e9,
    # where double partial-agg order drift (~1e-4) exceeds the distance to
    # a half-cent boundary (margin_audit: drift 0.286 vs margin 0.0018 in
    # scaled units); TPC-H itself types these DECIMAL. The two-phase form
    # keeps the hot path on long micro-units (decimal accumulators bench
    # 2x slower on this 7-aggregate full scan).
    return exact_money_summary(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": F.col("l_quantity"),
            "sum_base_price": F.col("l_extendedprice"),
            "sum_disc_price": disc_price,
            "sum_charge": disc_price * (1 + F.col("l_tax")),
        },
        avgs={
            "avg_qty": F.col("l_quantity"),
            "avg_price": F.col("l_extendedprice"),
            "avg_disc": F.col("l_discount"),
        },
        count_alias="count_order",
    )


@register(
    "q06_revenue_forecast",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    headline=True,
    doc="TPC-H Q6: selective multi-predicate filter + single agg (pushdown "
    "probe), read through the CarbonStore segment-union scan path.",
)
def q06(spark, sf_dir):
    from carbondata_spark.fact_store import fact_table

    li = fact_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
        )
    )


@register(
    "q_count_star",
    oracle="SELECT count(*) AS n FROM lineitem",
    doc="Metadata-only count(*) — parquet footer counts "
    "(reference CarbonInputFormat.getRowCount, CarbonInputFormat.java:208-225).",
)
def q_count_star(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)                 AS n_supp,
           CAST(sum(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_ln,
           count(*)                                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct aggregations (reference DistinctCountAggregator / "
    "SumDistinctDoubleAggregator, core/.../aggregator/impl).",
)
def q_agg_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.sum_distinct(F.col("l_linenumber").cast("long")).alias("sum_distinct_ln"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_minmax",
    oracle="""
    SELECT o_orderstatus,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_order
    FROM orders GROUP BY o_orderstatus
    """,
    doc="min/max over measures and timestamps (reference MaxAggregator/MinAggregator).",
)
def q_minmax(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            r2(F.min("o_totalprice")).alias("min_price"),
            r2(F.max("o_totalprice")).alias("max_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        )
    )


@register(
    "q_having",
    oracle="""
    SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 15000
    """,
    doc="GROUP BY + HAVING (reference delegates HAVING to Spark, SURVEY §2.4).",
)
def q_having(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), F.sum("l_quantity").alias("_tq"))
        .filter(F.col("_tq") > 15000)
        .select("l_suppkey", "n_items", r2(F.col("_tq")).alias("total_qty"))
    )


@register(
    "q_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (reference: HiveQL-delegated, SURVEY §2.4).",
)
def q_rollup(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_extendedprice")).alias("total"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total",
            "n",
        )
    )


@register(
    "q_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets.",
)
def q_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# Join family (reference: FilterPushJoin broadcast join, CarbonJoins.scala:31-93;
# everything else Spark-delegated — rebuilt as broadcast()/join())
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3 shape: 3-way join, filters each side, top-10 by revenue "
    "(customer join left to AQE — broadcast only if it measures small; "
    "deterministic tiebreak on l_orderkey).",
)
def q03(spark, sf_dir):
    from carbondata_spark.fact_store import fact_table

    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = fact_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = fact_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE)
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    headline=True,
    doc="TPC-H Q5 shape: 6-way star join; only the BOUNDED dims (nation, "
    "region) are hint-broadcast — customer/supplier grow with the fact "
    "table, so their join strategy is left to AQE.",
)
def q05(spark, sf_dir):
    from carbondata_spark.fact_store import fact_table

    cust = t(spark, sf_dir, "customer")
    orders = fact_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = fact_table(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking, top-20.",
)
def q10(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", r2(F.col("c_acctbal")).alias("acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT count(*) AS n_customers_with_urgent
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    doc="Left-semi join / IN-subquery (reference FilterPushJoin semantics: "
    "small side distilled to an IN filter, CarbonJoins.scala:31-93).",
)
def q_join_semi(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_customers_with_urgent"))
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT count(*) AS n_customers_no_orders
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Left-anti join / NOT IN (orders.o_custkey has no NULLs so anti == NOT IN).",
)
def q_join_anti(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT n_name, count(o_orderkey) AS n_orders
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    LEFT JOIN orders   ON o_custkey = c_custkey
    GROUP BY n_name
    """,
    doc="Left-outer join chain preserving empty nations (Spark-delegated in reference).",
)
def q_join_outer(spark, sf_dir):
    nat = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        nat.join(cust, cust.c_nationkey == nat.n_nationkey, "left")
        .join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("n_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Projection / filter family (reference §2.2 — Catalyst pushdown rebuilt)
# ---------------------------------------------------------------------------


@register(
    "q_filter_in",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
      AND c_mktsegment NOT IN ('HOUSEHOLD', 'FURNITURE')
      AND c_acctbal > 5000
    """,
    doc="IN + NOT IN + range filter with projection in one pushed "
    "conjunction (reference IncludeFilterExecuterImpl + "
    "ExcludeFilterExecuterImpl; registry rationalization r5 folded the "
    "former q_filter_not_in in — the NOT IN removes HOUSEHOLD rows the "
    "IN admitted, so the exclusion genuinely flips rows, and In/"
    "Not(In)/GreaterThan all reach PushedFilters).",
)
def q_filter_in(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD")
            & ~F.col("c_mktsegment").isin("HOUSEHOLD", "FURNITURE")
            & (F.col("c_acctbal") > 5000)
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%green%'
    """,
    doc="LIKE predicates (reference evaluates via SparkUnknownExpression row-level; "
    "here Catalyst StartsWith/Contains push to parquet).",
)
def q_filter_like(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PROMO%") & F.col("p_name").like("%green%"))
        .select("p_partkey", "p_name")
    )


@register(
    "q_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
    FROM lineitem WHERE l_orderkey < 100
    """,
    doc="Detail (projection) query with computed column — reference 'detail query' path.",
)
def q_projection(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            r2(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
                "charged"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k family (reference §2.6)
# ---------------------------------------------------------------------------


@register(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="Global top-k → TakeOrderedAndProject (reference limit+sort pushdown, "
    "CarbonOperators.scala:321-362).",
)
def q_topk_orders(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", r2(F.col("o_totalprice")).alias("totalprice"))
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    headline=True,
    doc="Top-k per group via window row_number (reference legacy TopCount, "
    "TopCount.java — rebuilt as Window).",
)
def q_topk_per_group(spark, sf_dir):
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", r2(F.col("c_acctbal")).alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# Set operations (reference §2.7 — Spark-delegated)
# ---------------------------------------------------------------------------


@register(
    "q_set_ops",
    oracle="""
    SELECT 'u' AS op, k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
    )
    UNION ALL
    SELECT DISTINCT 'i' AS op, o_custkey AS k FROM orders
    WHERE o_orderstatus = 'F'
      AND o_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'e' AS op, c_custkey AS k FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'a' AS op, o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'a' AS op, o_orderkey AS k FROM orders WHERE o_totalprice > 400000
    """,
    doc="Whole set-operation surface in one tagged result (registry "
    "rationalization r5, formerly q_set_union / q_set_intersect / "
    "q_set_except / q_union_all): 'u' = UNION distinct across two "
    "tables, 'i' = INTERSECT (customers with both F and O orders), "
    "'e' = EXCEPT (customers without orders — q_join_anti by another "
    "operator), 'a' = duplicate-preserving UNION ALL (an urgent AND "
    "expensive order appears twice; branch concatenation, no dedup "
    "exchange). The DuckDB oracle expresses INTERSECT/EXCEPT as semi/"
    "anti subqueries precisely so the two engines compute the same "
    "semantics through DIFFERENT plans.",
)
def q_set_ops(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    neg_cust = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("k")
    )
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    union_d = f_cust.union(neg_cust).distinct()
    intersect = f_cust.intersect(o_cust)
    except_ = (
        customer.select(F.col("c_custkey").alias("k"))
        .exceptAll(orders.select(F.col("o_custkey").alias("k")))
        .distinct()
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("k")
    )
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "k")  # noqa: E731
    return (
        tag(union_d, "u")
        .unionByName(tag(intersect, "i"))
        .unionByName(tag(except_, "e"))
        .unionByName(tag(urgent.unionByName(big), "a"))
    )


# ---------------------------------------------------------------------------
# Window functions (reference §2.5: none in carbon layer, Spark-delegated)
# ---------------------------------------------------------------------------


@register(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           coalesce(CAST(date_diff('day',
                     lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                     CAST(o_orderdate AS DATE)) AS INT), -1) AS gap_days
    FROM orders WHERE o_custkey < 100
    """,
    doc="Running sum + rank + lag windows over the same partition "
    "(registry rationalization r5: the former q_window_lag's lag() "
    "semantics fold in as the inter-order gap; the timestamp-typed lag "
    "over events stays pinned by q_sessionize).",
)
def q_window_running(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w_ord = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_rank = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate").cast("date")).over(w_ord),
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        r2(F.sum("o_totalprice").over(w_run)).alias("running_spend"),
        F.rank().over(w_rank).alias("price_rank"),
        F.coalesce(gap, F.lit(-1)).alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# Scalar expression surface (reference §2.8: all Spark-evaluated)
# ---------------------------------------------------------------------------


@register(
    "q_scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS uname,
           substr(c_name, 1, 8)                   AS prefix8,
           length(c_name)                         AS name_len,
           concat(c_mktsegment, ':', c_name)      AS tagged,
           replace(lower(c_mktsegment), 'e', '_') AS replaced,
           translate(c_name, '#', '-')            AS dashed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           reverse(c_name)                        AS rev_name,
           split_part(c_name, '#', 2)             AS after_hash,
           repeat(substr(c_name, 1, 2), 2)        AS doubled,
           CAST(levenshtein(c_name, 'Customer#1') AS INT) AS lev_to_one,
           CAST(ascii(substr(c_name, 1, 1)) AS INT) AS first_ascii
    FROM customer WHERE c_custkey <= 50
    """,
    doc="String scalar surface (upper/substr/length/concat/replace/"
    "translate/lpad/reverse/split_part/repeat/levenshtein/ascii) — the "
    "former q_scalar_string2 merged in (registry rationalization r5).",
)
def q_scalar_string(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            F.upper("c_name").alias("uname"),
            F.substring("c_name", 1, 8).alias("prefix8"),
            F.length("c_name").alias("name_len"),
            F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
            F.replace(F.lower("c_mktsegment"), F.lit("e"), F.lit("_")).alias("replaced"),
            F.translate("c_name", "#", "-").alias("dashed"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
            F.reverse("c_name").alias("rev_name"),
            F.split_part("c_name", F.lit("#"), F.lit(2)).alias("after_hash"),
            F.repeat(F.substring("c_name", 1, 2), 2).alias("doubled"),
            F.levenshtein("c_name", F.lit("Customer#1")).alias("lev_to_one"),
            F.ascii(F.substring("c_name", 1, 1)).alias("first_ascii"),
        )
    )


@register(
    "q_scalar_datetime",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)      AS yr,
           CAST(month(o_orderdate) AS INT)     AS mo,
           CAST(quarter(o_orderdate) AS INT)   AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2, 3, 4, 5, 6
    """,
    doc="Datetime extraction surface grouped to the derived calendar "
    "tuple: year/month/quarter/dayofweek (Spark 1=Sunday vs DuckDB "
    "0=Sunday, aligned in the oracle)/last_day/datediff + exact decimal "
    "totals — the former q_scalar_datetime2 merged in (registry "
    "rationalization r5).",
)
def q_scalar_datetime(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("days_since"),
        )
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


@register(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY 1
    """,
    doc="CASE WHEN bucketing + aggregate.",
)
def q_case_when(spark, sf_dir):
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        t(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), r2(F.avg("o_totalprice")).alias("avg_price"))
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="JSON field extraction from string column (events.props).",
)
def q_json_extract(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )
