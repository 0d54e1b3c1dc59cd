"""Embedding-column lifecycle operators: quantization and hygiene.

An ANN corpus at 100 TB is dominated by the embedding column; the two
operators here are the standard preconditions of serving it:

- ``quantize_int8`` — symmetric per-vector int8 quantization (the 4×
  memory cut every large-scale vector store applies before indexing),
  reported as per-vector scale + reconstruction error so a pipeline can
  gate ingestion on quantization loss.
- ``embedding_hygiene`` — corpus-level sanity report (non-finite
  elements, zero-norm vectors, dimension drift, norm distribution):
  the cheap full-scan check run before building an index, because a
  single NaN vector poisons cosine top-k ordering downstream.

Everything is built-in higher-order array expressions
(transform/aggregate/exists) — whole-stage codegen, zero UDFs, zero
shuffles for the per-vector form and one map-combined aggregate for the
report. Arithmetic sticks to order-preserving double ops folded in
array order, so a SQL oracle (DuckDB list_transform/list_aggregate over
the same float32 values) reproduces every number bit-for-bit before
rounding.

The reference has no vector surface (its measures are scalar,
cubeSchema.scala dimension/measure split); these operators extend the
training-data-pipeline family the rebuild adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carbondata_spark.functions import dround

INT8_MAX = 127


def _as_double(vec_col: str) -> Column:
    # float32 parquet values widen exactly to double on both engines
    return F.col(vec_col).cast("array<double>")


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization error report, one row per vector:
    (id, scale, max_err, mean_err), errors rounded to 6 places.

    scale = max|x| / 127; code_i = floor(x_i/scale + 0.5) (explicit
    half-up — ``round()`` half-mode differs across engines);
    err_i = |x_i - code_i * scale|. A zero vector gets scale 0 and zero
    error (all codes 0). Map-side only: no shuffle, no UDF; at 100 TB
    this runs at scan speed and the codes themselves (not materialized
    here) would be written next to the index, 4× smaller than float32.
    """
    v = _as_double(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(float(INT8_MAX))
    err = F.when(F.col("_scale") == 0.0, F.array_repeat(F.lit(0.0), F.size(v))).otherwise(
        F.transform(
            v,
            lambda x: F.abs(
                x - F.floor(x / F.col("_scale") + F.lit(0.5)) * F.col("_scale")
            ),
        )
    )
    return (
        df.withColumn("_scale", scale)
        .withColumn("_err", err)
        .select(
            F.col(id_col).alias("vec_id"),
            dround(F.col("_scale"), 6).alias("scale"),
            dround(F.array_max("_err"), 6).alias("max_err"),
            dround(
                F.aggregate("_err", F.lit(0.0), lambda acc, x: acc + x)
                / F.size("_err"),
                6,
            ).alias("mean_err"),
        )
    )


def embedding_hygiene(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One-row corpus report: n_vectors, n_nonfinite (any NaN/±Inf
    element), n_zero_norm, dim_lo/dim_hi (dimension drift guard), and
    the L2-norm distribution (min/mean/max, rounded to 4).

    One map-combined aggregate over the scan — the norm fold runs in
    array order on both engines, so the sums match the oracle exactly
    before rounding. Run this before ``build_ivf_index``: cosine against
    a NaN vector is NaN, which sorts unpredictably in top-k."""
    v = _as_double(vec_col)
    bad = F.exists(v, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))))
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    per_vec = df.select(
        F.col(id_col).alias("vec_id"),
        F.size(v).alias("_dim"),
        bad.alias("_bad"),
        # a non-finite element would poison the norm stats of the WHOLE
        # report row; norms are computed only over finite vectors
        F.when(bad, F.lit(None)).otherwise(F.sqrt(sq)).alias("_norm"),
    )
    return per_vec.agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("_bad").cast("int")).alias("n_nonfinite"),
        F.sum((F.col("_norm") == 0.0).cast("int")).alias("n_zero_norm"),
        F.min("_dim").alias("dim_lo"),
        F.max("_dim").alias("dim_hi"),
        dround(F.min("_norm"), 4).alias("norm_min"),
        dround(F.avg("_norm"), 4).alias("norm_mean"),
        dround(F.max("_norm"), 4).alias("norm_max"),
    )
