"""ADC-style similarity search over a scalar-quantized corpus.

``adc_topk`` is the search-side counterpart of
``embeddings.quantize_int8``: the corpus is held as int8 codes + one
float scale per vector (4x smaller than float32 — the memory term that
dominates a 100 TB embedding store), queries stay full-precision, and
each candidate is scored against the DEQUANTIZED corpus vector —
asymmetric distance computation, the same trade IVF-PQ serving stacks
make (query precision is free; corpus precision is what you pay
storage for).

The quantization arithmetic is bit-reproducible on purpose: code_i =
floor(x_i / scale + 0.5) with scale = max|x| / 127 (explicit half-up —
``round()`` half-mode differs across engines), dequant = code_i *
scale, every term a double. The DuckDB oracle replays the identical
expressions, so the driver's value-hash compare works on the rounded
cosines.

Plan shape: quantize+dequantize are map-side higher-order array
expressions (whole-stage codegen, zero UDFs, zero shuffles); scoring is
the same broadcast-queries nested-loop + per-query window top-k as
``similarity.cosine_topk`` — corpus never shuffles, so the plan is a
single scan at any corpus size. In production the codes would be
materialized by the store and this operator would read them instead of
re-deriving; re-deriving here keeps the operator self-contained without
changing the plan shape that matters (scan + broadcast + window).

Reference: no vector surface in the reference (scalar measures only,
cubeSchema.scala); extends the ANN family of SURVEY.md §6 alongside
``similarity.cosine_topk`` (exact) and ``ivf_index`` (pruned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from carbondata_spark.functions import dround, ensure_parallelism
from carbondata_spark.operators.embeddings import INT8_MAX
from carbondata_spark.operators.hof import let_once
from carbondata_spark.operators.similarity import cosine


def dequantized_int8(vec_col: Column) -> Column:
    """The int8-quantize/dequantize round-trip of a float vector, as one
    codegen'd expression: what the corpus vector looks like after living
    in the 4x-compressed store. Zero vectors round-trip to zero."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    return let_once(
        F.array_max(F.transform(v, F.abs)) / F.lit(float(INT8_MAX)),
        lambda sc: F.when(
            sc == 0.0, F.transform(v, lambda x: F.lit(0.0))
        ).otherwise(
            F.transform(v, lambda x: F.floor(x / sc + F.lit(0.5)) * sc)
        ),
    )


def adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` neighbors per full-precision query over the
    int8-quantized corpus (self-matches excluded).

    Columns: (query_id, neighbor_id, cosine rounded to 6, rank INT).
    Ties broken by neighbor id, as in ``cosine_topk`` — the exact
    operator this one trades a little recall against for 4x less corpus
    memory; tests pin the rank agreement on the test corpus.

    Contract (same as ``cosine_topk``): ``queries`` must be SMALL — it
    is unconditionally broadcast so the corpus never shuffles; a
    million-query batch belongs on the IVF path
    (``search_ivf_index(probe_join="shuffle")``), not here.
    """
    from carbondata_spark.operators.similarity import _as_double, _dot, _norm

    # norms hoisted per side (one interpreted HOF pass per row instead of
    # per pair — bit-identical doubles, see similarity.cosine_topk)
    q = _as_double(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec",
    ).withColumn("_qn", _norm(F.col("qvec")))
    c = _as_double(
        ensure_parallelism(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                dequantized_int8(F.col(vec_col)).alias("dvec"),
            )
        ),
        "dvec",
    ).withColumn("_cn", _norm(F.col("dvec")))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        dround(
            _dot(F.col("qvec"), F.col("dvec")) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("cos").alias("cosine"),
            F.col("rn").alias("rank"),
        )
    )
