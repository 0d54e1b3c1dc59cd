"""Property-based pins for the int8 IVF-ADC quantization
(operators/ivf_adc.py): for arbitrary small vectors the Spark
expressions must equal a pure-Python replay of the documented
semantics — scale = max|x|/127 (0 for the zero vector), half-up codes
floor(x/scale + 0.5) in [-127, 127], dequantized value code*scale with
per-element error bounded by scale/2. Same style as
test_round10_properties.py: hypothesis drives the inputs, Spark is
compared against an independent reimplementation, not against itself."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# exact-ish doubles spanning sign/magnitude, plus hard corners: exact
# halves land ON the rounding boundary where half-up vs banker's differ
component = st.one_of(
    st.floats(
        min_value=-1e3,
        max_value=1e3,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    st.sampled_from([0.0, 1.0, -1.0, 0.5, -0.5, 127.0, -127.0]),
)
vector = st.lists(component, min_size=1, max_size=6)
vectors = st.lists(vector, min_size=1, max_size=4)


def _replay(v: list[float]) -> tuple[float, list[int], list[float]]:
    scale = max(abs(x) for x in v) / 127.0
    if scale == 0.0:
        return 0.0, [0] * len(v), [0.0] * len(v)
    codes = [int(math.floor(x / scale + 0.5)) for x in v]
    return scale, codes, [c * scale for c in codes]


@settings(max_examples=15, deadline=None)
@given(vectors)
def test_quantization_matches_python_replay(spark, vecs):
    from carbondata_spark.operators.ivf_adc import dequantize, int8_codes, int8_scale

    # pad to a rectangle: Spark rows in one frame, per-row arrays vary fine
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id",
            int8_scale(F.col("embedding")).alias("scale"),
            int8_codes(F.col("embedding"), int8_scale(F.col("embedding"))).alias(
                "code"
            ),
        )
        .withColumn("dv", dequantize(F.col("code"), F.col("scale")))
        .collect()
    }
    for i, v in enumerate(vecs):
        scale, codes, deq = _replay(v)
        r = out[i]
        assert r["scale"] == scale, (v, r["scale"], scale)
        assert r["code"] == codes, (v, r["code"], codes)
        assert r["dv"] == deq, (v, r["dv"], deq)
        # the contract the codes must keep regardless of replay detail:
        assert all(-127 <= c <= 127 for c in r["code"]), (v, r["code"])
        for x, d in zip(v, r["dv"]):
            # + one denormal ulp of absolute slack: for max|x| below
            # ~127 * 5e-324 the scale itself underflows to exactly 0.0
            # (hypothesis found vecs=[[5e-324]]), codes degenerate to 0
            # and the representation error is |x| <= one denormal — far
            # below any embedding-space epsilon but above scale/2 == 0
            assert abs(x - d) <= scale / 2 + 1e-12 * abs(x) + 2**-1074, (
                v, x, d, scale,
            )


@settings(max_examples=10, deadline=None)
@given(vectors)
def test_dequantize_equals_pq_roundtrip_for_arbitrary_vectors(spark, vecs):
    """Bit-identity between the stored-codes path (int8_codes ->
    dequantize) and pq.dequantized_int8's inline round-trip — the
    invariant that makes probe-all IVF-ADC search row-identical to
    adc_topk, pinned here on arbitrary inputs rather than just the
    test corpus."""
    from carbondata_spark.operators.ivf_adc import dequantize, int8_codes, int8_scale
    from carbondata_spark.operators.pq import dequantized_int8

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    rows = (
        df.select(
            "vec_id",
            dequantize(
                int8_codes(F.col("embedding"), int8_scale(F.col("embedding"))),
                int8_scale(F.col("embedding")),
            ).alias("via_codes"),
            dequantized_int8(F.col("embedding")).alias("via_pq"),
        )
        .collect()
    )
    for r in rows:
        assert r["via_codes"] == r["via_pq"], (vecs[r["vec_id"]], r)
