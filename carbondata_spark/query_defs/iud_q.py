"""Row-level DELETE/UPDATE under the driver's DuckDB differential gate.

Round 11 landed copy-on-write row-level IUD (store.delete_rows /
update_rows: affected segments rewritten, manifest swapped atomically —
store.py:1053-1190) with local tests only (tests/test_iud.py). This row
puts the full path in front of the hard signal: customer is loaded INTO
a store table as TWO segments, mutated through the SQL front door
(``DELETE FROM`` + multi-assignment ``UPDATE ... SET ... WHERE``), and
the surviving rows must match DuckDB applying the same mutations as
SELECT-time CASE/WHERE rewrites over the ORIGINAL parquet. A rewrite
that drops, duplicates, or fails to transform a single row — or touches
a segment the predicate doesn't reach — changes the hash.

The reference era predates row-level IUD (its deletes are whole-load,
SURVEY.md §2.10); later Apache CarbonData added exactly this shape, and
a 100 TB training corpus needs it (takedowns, PII redaction).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from carbondata_spark.queries import r2, register, t

# (sf_dir, app_id) -> store path; the store is built and mutated ONCE
# per process+session, then read by every subsequent call.
_BUILT: dict[tuple[str, str], str] = {}


def _iud_store(spark: SparkSession, sf_dir: str):
    from carbondata_spark.query_defs._tmpdirs import mkdtemp
    from carbondata_spark.sql import CarbonSession
    from carbondata_spark.store import CarbonStore

    key = (sf_dir, spark.sparkContext.applicationId)
    if key not in _BUILT:
        path = mkdtemp(prefix="carbondata_iudq_")
        store = CarbonStore(spark, path)
        cust = t(spark, sf_dir, "customer")
        store.create_table("cust", cust.schema, sort_columns=["c_custkey"])
        # two segments so the mutation predicates cross segment bounds:
        # the copy-on-write rewrite must touch both, and only where hit
        store.load("cust", cust.filter(F.col("c_custkey") % 2 == 0))
        store.load("cust", cust.filter(F.col("c_custkey") % 2 == 1))
        ses = CarbonSession(spark, store)
        ses.sql("DELETE FROM cust WHERE c_acctbal < 0")
        ses.sql(
            "UPDATE cust SET c_name = 'redacted', "
            "c_acctbal = c_acctbal + 100.0 "
            "WHERE c_mktsegment = 'BUILDING'"
        )
        _BUILT[key] = path
    return CarbonStore(spark, _BUILT[key])


@register(
    "q_store_iud",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           round(CASE WHEN c_mktsegment = 'BUILDING'
                      THEN c_acctbal + 100.0 ELSE c_acctbal END, 2) AS acctbal,
           CASE WHEN c_mktsegment = 'BUILDING'
                THEN 'redacted' ELSE c_name END AS name
    FROM customer
    WHERE c_acctbal >= 0
    """,
    doc="Row-level IUD end-to-end: customer loaded as 2 store segments, "
    "then DELETE FROM ... WHERE c_acctbal < 0 and a multi-assignment "
    "UPDATE (string constant + arithmetic expression) on the BUILDING "
    "segment-crossing predicate, both through the SQL front door; the "
    "surviving table must equal DuckDB's CASE/WHERE rewrite of the "
    "original parquet. Exercises copy-on-write rewrite provenance, "
    "zone-map recomputation on rewritten segments, and the atomic "
    "manifest swap.",
)
def q_store_iud(spark, sf_dir):
    store = _iud_store(spark, sf_dir)
    return store.table("cust").select(
        "c_custkey",
        "c_mktsegment",
        r2(F.col("c_acctbal")).alias("acctbal"),
        F.col("c_name").alias("name"),
    )
