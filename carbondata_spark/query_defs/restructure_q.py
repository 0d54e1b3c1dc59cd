"""ALTER CUBE restructure driver row — STAGED in r17, registers r18.

Upgrades the one SURVEY §2.10 item whose correctness column still reads
"local" (VERDICT r16: "ALTER CUBE restructure — yes — local") to a full
driver-oracle row: the reference's restructure statement driven through
the SQL front door end-to-end, with the post-restructure scan checked
against a closed-form DuckDB oracle.

Staged unregistered for the same reason as media_rle_q (see that
module's docstring): r17's driver prefix is fully committed to the
bloom+sql blast's 39-row debt declaration; r18's absorption round flips
this row on with a one-line query_defs/__init__ import that sits in no
existing closure. Until then the exact registered form is verified in a
fresh interpreter by tests/test_restructure_q.py.

Reference provenance: ALTER CUBE grammar CarbonSqlParser.scala:731-776;
restructure default-fill over pre-ALTER segments RestructureUtil.java:128;
dropped columns removed from reads of every segment (the reference's
restructure path rewrites the schema, not the data).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from carbondata_spark.queries import register, t  # noqa: F401  (t unused; parity w/ siblings)
from carbondata_spark.query_defs._tmpdirs import mkdtemp

_BUILT: dict[tuple, str] = {}


@register(
    "q_alter_cube_restructure",
    oracle="""
    WITH both_loads AS (
      SELECT c_mktsegment, c_custkey, -1 AS c_nationkey FROM customer
      UNION ALL
      SELECT c_mktsegment, c_custkey, c_nationkey FROM customer
    )
    SELECT c_mktsegment,
           count(*) AS cnt,
           sum(CAST(c_custkey AS DOUBLE)) AS sum_cust,
           sum(CAST(c_nationkey AS DOUBLE)) AS sum_nation
    FROM both_loads
    GROUP BY c_mktsegment
    """,
    doc="ALTER CUBE restructure through the SQL front door "
    "(CarbonSqlParser.scala:731-776): CREATE CUBE over customer dims/"
    "measures, LOAD segment 0, then ONE restructure statement that both "
    "DROPs a measure (c_acctbal — removed from reads of every segment) "
    "and ADDs a measure with a declared default (c_nationkey, "
    "DEFAULTS [c_nationkey=-1] — RestructureUtil.java:128 fill for the "
    "pre-ALTER segment), then LOAD segment 1 carrying REAL c_nationkey "
    "values from the same parquet. The aggregate over the union scan "
    "sees every customer twice: once with the default (-1), once with "
    "the real nation key — the oracle rebuilds exactly that union from "
    "raw parquet, so a misfilled default, a leaked dropped column, or a "
    "post-ALTER load that misprojects breaks the hash. Integer-valued "
    "double sums are order-independent-exact (|sum| << 2^53), so no "
    "rounding is needed.",
)
def q_alter_cube_restructure(spark: SparkSession, sf_dir: str):
    from carbondata_spark.catalog import table_path
    from carbondata_spark.sql import CarbonSession
    from carbondata_spark.store import CarbonStore

    key = (sf_dir, spark.sparkContext.applicationId, "alter_cube")
    if key not in _BUILT:
        base = mkdtemp(prefix="carbondata_altercube_")
        cs = CarbonSession(spark, CarbonStore(spark, base))
        cs.sql(
            "CREATE CUBE cust_cube"
            " DIMENSIONS (c_mktsegment string)"
            " MEASURES (c_acctbal double, c_custkey bigint)"
        )
        load = (
            f"LOAD DATA INPATH '{table_path(sf_dir, 'customer')}'"
            " INTO TABLE cust_cube OPTIONS('format'='parquet')"
        )
        cs.sql(load)  # segment 0: pre-restructure schema
        cs.sql(
            "ALTER CUBE cust_cube DROP (c_acctbal)"
            " ADD MEASURES (c_nationkey bigint)"
            " OPTIONS (DEFAULTS [c_nationkey=-1])"
        )
        cs.sql(load)  # segment 1: carries real c_nationkey values
        _BUILT[key] = base
    cs = CarbonSession(spark, CarbonStore(spark, _BUILT[key]))
    return cs.sql(
        "SELECT c_mktsegment,"
        " count(*) AS cnt,"
        " sum(c_custkey) AS sum_cust,"
        " sum(c_nationkey) AS sum_nation"
        " FROM cust_cube GROUP BY c_mktsegment"
    )
