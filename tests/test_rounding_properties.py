"""Property tests for the cross-engine determinism primitives the whole
oracle scheme leans on: ``functions.dround`` must round ANY double
exactly like DuckDB's round(double, n), and the micro-unit decimal path
must agree with a direct decimal cast for money-valued inputs."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _duck_round(vals: list[float], n: int) -> list[float]:
    con = duckdb.connect()
    out = [
        con.execute(f"SELECT round(CAST(? AS DOUBLE), {n})", [v]).fetchone()[0]
        for v in vals
    ]
    con.close()
    return out


@pytest.mark.parametrize("n", [1, 2, 4])
def test_dround_matches_duckdb_on_adversarial_values(spark, n):
    """Exact .5-boundary values, negatives, tiny and large magnitudes —
    the cases where Spark's native F.round (HALF_UP on the decimal
    expansion) diverges from DuckDB (half-away on the scaled binary)."""
    from pyspark.sql import functions as F

    from carbondata_spark.functions import dround

    vals = [
        0.05, -0.05, 0.15, -0.15, 0.25, 1.005, -1.005, 2.675, -2.675,
        0.86875, 123456789.985, -123456789.985, 1e-9, -1e-9, 0.5, -0.5,
        3.14159265, 12.3456785, 99999999.995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.r for r in df.select(dround(F.col("v"), n).alias("r")).orderBy("v").collect()
    ]
    want = _duck_round(sorted(vals), n)
    assert got == want, list(zip(sorted(vals), got, want))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_dround_matches_duckdb_on_random_doubles(spark, values):
    from pyspark.sql import functions as F

    from carbondata_spark.functions import dround

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v double")
    got = {
        r.i: r.r for r in df.select("i", dround(F.col("v"), 2).alias("r")).collect()
    }
    want = _duck_round(values, 2)
    for i, w in enumerate(want):
        assert got[i] == w, (values[i], got[i], w)
