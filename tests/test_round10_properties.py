"""Property-based pins for the round-10 operators: for arbitrary tiny
corpora the Spark results must equal a pure-Python replay of the
documented semantics (the same style as test_rounding_properties.py —
hypothesis drives the inputs, Spark is compared against an independent
reimplementation, not against itself)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

word = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)


def _trigrams(text: str) -> list[str]:
    w = text.split()
    return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]


@settings(max_examples=12, deadline=None)
@given(corpus)
def test_ngram_topk_matches_python_recount(spark, texts):
    from carbondata_spark.operators.corpus import ngram_topk

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.ngram: (r.n_occurrences, r.n_docs)
        for r in ngram_topk(df, n=3, k=1000).collect()
    }
    occ: Counter = Counter()
    docs: dict[str, set] = {}
    for i, t in enumerate(texts):
        for g in _trigrams(t):
            occ[g] += 1
            docs.setdefault(g, set()).add(i)
    want = {g: (c, len(docs[g])) for g, c in occ.items()}
    assert got == want, (texts, got, want)


@settings(max_examples=12, deadline=None)
@given(corpus)
def test_common_span_report_matches_python_replay(spark, texts):
    from carbondata_spark.operators.corpus import common_span_report

    min_df = 2
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in common_span_report(df, n=3, min_df=min_df).collect()}
    span_sets = {i: set(_trigrams(t)) for i, t in enumerate(texts)}
    dfreq: Counter = Counter(g for s in span_sets.values() for g in s)
    assert set(got) == set(span_sets)  # every doc present, even span-less
    for i, spans in span_sets.items():
        n_common = sum(1 for g in spans if dfreq[g] >= min_df)
        assert got[i].n_spans == len(spans)
        assert got[i].n_common == n_common
        want_frac = 0.0 if not spans else round(n_common / len(spans), 4)
        assert abs(got[i].dup_frac - want_frac) < 1e-9
        assert 0.0 <= got[i].dup_frac <= 1.0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "fr", "zh"]), st.integers(1, 50)),
        min_size=1,
        max_size=8,
    )
)
def test_temperature_weights_match_sqrt_formula(spark, rows):
    from carbondata_spark.operators.sampling import temperature_mix_weights

    data = [(i, lang, "w " * n) for i, (lang, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, lang string, text string")
    from pyspark.sql import functions as F

    out = {
        r.domain: r
        for r in temperature_mix_weights(
            df.select("doc_id", "lang", F.trim("text").alias("text"))
        ).collect()
    }
    totals: Counter = Counter()
    for lang, n in rows:
        totals[lang] += n
    z = sum(math.sqrt(v) for v in totals.values())
    grand = sum(totals.values())
    assert set(out) == set(totals)
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-4
    for lang, n in totals.items():
        w = math.sqrt(n) / z
        assert abs(out[lang].weight - round(w, 6)) < 1e-9, (rows, lang)
        assert abs(out[lang].oversample - round(w * grand / n, 4)) < 1e-9


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=6
    )
)
def test_dequantize_error_bounded_by_half_scale(spark, vec):
    from pyspark.sql import functions as F

    from carbondata_spark.operators.pq import dequantized_int8

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    row = df.select(
        F.col("embedding").cast("array<double>").alias("x"),
        dequantized_int8(F.col("embedding")).alias("d"),
    ).collect()[0]
    scale = max(abs(v) for v in row.x) / 127.0
    assert len(row.d) == len(row.x)
    for x, d in zip(row.x, row.d):
        # reconstruction error of symmetric half-up quantization
        assert abs(x - d) <= scale / 2 + 1e-12, (vec, scale, x, d)
