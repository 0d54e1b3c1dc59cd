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


# Money domain: <=6 decimal digits AND per-row |v| <= 1e9 — inside the
# documented _to_micros exactness bound (~2.25e9, functions/__init__.py).
# A first draft generated up to 1e12 and hypothesis immediately found
# 576460752305.0: at that magnitude the double PRODUCT v*1e6 no longer
# identifies the micro-unit integer (ulp 128), so the bound is real and
# per-row, not an implementation detail.
money = st.builds(
    lambda units, scale: units / (10.0**scale),
    st.integers(min_value=-(10**15), max_value=10**15),
    st.integers(min_value=6, max_value=6),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(money, min_size=1, max_size=30))
def test_micro_sum_equals_decimal_cast_sum(spark, values):
    """_micro_sum's truncation-based micro-unit conversion (_to_micros:
    trunc(scaled ± 0.5), no per-row BigDecimal) must land on the exact
    integer a direct DECIMAL(30,6) cast produces for any <=6-decimal
    money value — positive, negative, and zero — so the decimal sums are
    bit-identical."""
    from pyspark.sql import functions as F

    from carbondata_spark.functions import MONEY_DEC, _micro_sum

    df = spark.createDataFrame([(v,) for v in values], "v double")
    row = df.select(
        _micro_sum(F.col("v")).alias("micro"),
        F.sum(F.col("v").cast(MONEY_DEC)).cast("decimal(38,6)").alias("direct"),
    ).collect()[0]
    assert row.micro == row.direct, (values, row.micro, row.direct)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]), money), min_size=1, max_size=40))
def test_exact_money_summary_equals_single_phase_decimal(spark, rows):
    """The two-phase long-micro-unit plan must be bit-identical to the
    single-phase decimal form for every group, sum and avg alias."""
    from pyspark.sql import functions as F

    from carbondata_spark.functions import MONEY_DEC, dround, exact_money_summary

    df = spark.createDataFrame(rows, "g string, v double").repartition(4)
    got = {
        r.g: (r.s, r.a, r.c)
        for r in exact_money_summary(
            df, ["g"], sums={"s": F.col("v")}, avgs={"a": F.col("v")},
            count_alias="c",
        ).collect()
    }
    want = {
        r.g: (r.s, r.a, r.c)
        for r in df.groupBy("g")
        .agg(
            F.round(F.sum(F.col("v").cast(MONEY_DEC)), 2).cast("double").alias("s"),
            dround(
                F.sum(F.col("v").cast(MONEY_DEC)).cast("double") / F.count("v"), 2
            ).alias("a"),
            F.count("*").alias("c"),
        )
        .collect()
    }
    assert got == want


def test_exact_money_summary_bulk_soak(spark):
    """Vectorized complement to the hypothesis cases: 100k seeded money
    values across 200 groups (full ±1e9 domain, all 6-decimal scales,
    negatives), two-phase vs single-phase decimal, every group
    bit-identical — one Spark job instead of per-example jobs, so the
    suite affords vastly more coverage of the flagship money path."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from carbondata_spark.functions import MONEY_DEC, dround, exact_money_summary

    rng = np.random.default_rng(7)
    n = 100_000
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 200, n),
            "v": rng.integers(-(10**15), 10**15, n) / 1e6,
        }
    )
    df = spark.createDataFrame(pdf).repartition(16)
    two = exact_money_summary(
        df, ["g"], sums={"s": F.col("v")}, avgs={"a": F.col("v")}, count_alias="c"
    )
    one = df.groupBy("g").agg(
        F.round(F.sum(F.col("v").cast(MONEY_DEC)), 2).cast("double").alias("s"),
        dround(
            F.sum(F.col("v").cast(MONEY_DEC)).cast("double") / F.count("v"), 2
        ).alias("a"),
        F.count("*").alias("c"),
    )
    a = {r.g: (r.s, r.a, r.c) for r in two.collect()}
    b = {r.g: (r.s, r.a, r.c) for r in one.collect()}
    assert a == b


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


def test_q01_single_decimal_bench_form_bit_identical_to_registry(spark, sf_dir):
    """The bench aux candidate `_q01_single_decimal_form` (one exchange,
    decimal(20,0) micro-unit accumulators — the scale-SAFE single-agg
    form; a long-only single aggregate would overflow its final merge at
    ~4e11 rows/group) must be bit-identical to the registry's two-phase
    q01 on real data, so the paired bench premium compares equal answers."""
    import bench
    from carbondata_spark.queries import registry

    key = ("l_returnflag", "l_linestatus")
    got = {
        tuple(r[k] for k in key): r.asDict()
        for r in bench._q01_single_decimal_form(spark, sf_dir).collect()
    }
    want = {
        tuple(r[k] for k in key): r.asDict()
        for r in registry()["q01_pricing_summary"].fn(spark, sf_dir).collect()
    }
    assert got == want
