"""Local differential-test harness: Spark result vs DuckDB oracle.

Mirrors the driver's check (CORRECTNESS_r{N}.json): row count, column
names, and an order-insensitive value comparison. Used by tests/ to gate
every registered query before the driver ever sees it — the rebuild's
analogue of the reference's cross-engine differential protocol
(PerfTest.scala:95-102 asserts identical results across parquet/orc/carbon
before timing).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from carbondata_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            # collapse -0.0/0.0 and represent with enough digits
            if v == 0:
                return "0"
            # repr(float) = shortest round-trip string — FULL double
            # precision, matching the driver's value hash. The previous
            # %.6g (6 significant digits) let a last-ulp divergence pass
            # locally and fail the driver (r3: q_complex_sql_load). float()
            # first: numpy>=2 reprs scalars as "np.float64(x)".
            return repr(float(v))
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        if pd.isna(v):
            return "∅"
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@dataclass
class DiffResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> DiffResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return DiffResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return DiffResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}",
        )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if a.equals(b):
        return DiffResult(name, True, len(spark_pdf), len(oracle_pdf))
    # find first differing cell for the report
    neq = (a != b)
    rows = neq.any(axis=1)
    idx = rows[rows].index[:3]
    frags = []
    for i in idx:
        cols = neq.columns[neq.loc[i]]
        for c in cols[:3]:
            frags.append(f"row{i} col={c}: spark={a.loc[i, c]!r} oracle={b.loc[i, c]!r}")
    return DiffResult(name, False, len(spark_pdf), len(oracle_pdf), "; ".join(frags))


def run_query_diff(spark, con: duckdb.DuckDBPyConnection, sf_dir: str, name: str) -> DiffResult:
    from carbondata_spark.queries import registry

    q = registry()[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        ok = len(spark_pdf) >= 0
        return DiffResult(name, ok, len(spark_pdf), -1, "rows-only check (no oracle)")
    oracle_pdf = con.execute(q.oracle).fetchdf()
    return compare(name, spark_pdf, oracle_pdf)
