"""Quickstart: the reference's own first-example flow
(examples/src/main/scala/org/carbondata/examples/CarbonExample.scala:61-79
— create cube → load CSV → SQL query) re-expressed on this engine, then
the capabilities the reference era didn't have.

Run:  python examples/quickstart.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from carbondata_spark import CarbonStore, get_spark
from carbondata_spark.sql import CarbonSession


def main() -> None:
    spark = get_spark(app_name="quickstart")
    store = CarbonStore(spark, tempfile.mkdtemp(prefix="carbon_quickstart_"))
    cs = CarbonSession(spark, store)

    # -- CREATE + LOAD (CSV with header, like the reference example) -----
    csv = tempfile.NamedTemporaryFile(suffix=".csv", mode="w", delete=False)
    csv.write("id,name,city,age\n")
    for i in range(1, 21):
        csv.write(f"{i},person{i},{'shenzhen' if i % 2 else 'france'},{20 + i}\n")
    csv.close()

    # the reference example's own statements, verbatim: CREATE CUBE with
    # dimension/measure split, then the legacy fact load INTO CUBE
    cs.sql(
        "CREATE CUBE t3 DIMENSIONS (id int, name string, city string) "
        "MEASURES (age int)"
    )
    cs.sql(f"LOAD DATA FACT FROM '{csv.name}' INTO CUBE t3")

    # -- the reference's example query ------------------------------------
    print("== SELECT city, count(age) ... GROUP BY city")
    cs.sql(
        "SELECT city, count(age) AS n FROM t3 "
        "WHERE city IN ('shenzhen','france') GROUP BY city"
    ).show()

    # -- segment lifecycle, reference statement forms ----------------------
    cs.sql(f"LOAD DATA INPATH '{csv.name}' INTO CUBE t3")  # second load
    print("== SHOW LOADS FOR CUBE (LIMIT shows the most recent)")
    cs.sql("SHOW LOADS FOR CUBE t3 LIMIT 2").show(truncate=False)
    print("== DESCRIBE (columns, dimension/measure annotated)")
    cs.sql("DESC t3").show(truncate=False)
    cs.sql("ALTER TABLE t3 COMPACT").show()
    cs.sql("CLEAN FILES FOR CUBE t3").show()

    # -- schema evolution --------------------------------------------------
    store.alter_add_columns(
        "t3", [T.StructField("country", T.StringType())], defaults={"country": "cn"}
    )
    print("== after ALTER ADD country (default fills old segments)")
    store.table("t3").groupBy("country").count().show()

    # -- beyond the reference: training-data pipeline ops -----------------
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 5} jumps over the lazy dog") for i in range(100)],
        "doc_id long, text string",
    )
    from carbondata_spark.operators.dedup import dedup_exact, minhash_lsh_pairs

    print("== exact dedup keeps", dedup_exact(docs).count(), "of", docs.count(), "docs")
    print("== minhash-LSH near-dup pairs:", minhash_lsh_pairs(docs, threshold=0.8).count())

    from carbondata_spark.operators.text import with_quality_score

    with_quality_score(docs).select("doc_id", "quality_score").show(3)

    # -- z-order clustering: multi-column pruning -------------------------
    cs.sql(
        "CREATE CUBE zdemo DIMENSIONS (region string, dev string)"
        " MEASURES (amount double) OPTIONS('clustering'='zorder')"
    )
    grid = spark.range(0, 1000).select(
        F.concat(F.lit("r"), (F.col("id") % 8).cast("string")).alias("region"),
        F.concat(F.lit("d"), (F.col("id") % 11).cast("string")).alias("dev"),
        (F.col("id") * 1.5).alias("amount"),
    )
    store.load("zdemo", grid, partitions=4)
    print("== z-ordered cube, filter on the TRAILING sort column")
    cs.sql("SELECT dev, round(sum(amount), 1) AS total FROM zdemo"
           " WHERE dev = 'd3' GROUP BY dev").show()

    # -- distributed exact ranking (no single-partition sort) -------------
    from carbondata_spark.operators.ranking import with_global_ntile

    print("== corpus quartiles by text length, distributed ntile")
    with_global_ntile(
        docs.withColumn("n_chars", F.length("text")),
        ["n_chars", "doc_id"], 4, bucket_col="quartile",
    ).groupBy("quartile").count().orderBy("quartile").show()

    spark.stop()


if __name__ == "__main__":
    main()
