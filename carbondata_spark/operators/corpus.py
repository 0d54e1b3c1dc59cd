"""Corpus-level n-gram statistics: frequent-span reports for dataset
hygiene.

Two operators a pretraining-data pipeline runs over the whole corpus
(as opposed to the per-document ops in ``operators/text.py`` and the
pairwise ops in ``operators/dedup.py``):

- ``ngram_topk`` — the most frequent word n-grams by TOTAL occurrence
  count (not document frequency — that is ``text.vocab_topk``'s axis).
  The standard input to benchmark-decontamination review and template/
  boilerplate discovery: a handful of n-grams covering a large share of
  the token mass is the signature of scraped boilerplate.
- ``common_span_report`` — per-document fraction of distinct n-gram
  spans that are corpus-common (document frequency >= ``min_df``): the
  Gopher/RefinedWeb-style "duplicated text fraction" quality signal.
  Documents made mostly of spans that recur across many other documents
  are boilerplate/template pages; the fraction feeds the same
  filter-or-downweight decision as ``text.quality_score``.

Scale shape (100 TB): both are explode -> hash-aggregate pipelines with
map-side partial aggregation; no pairwise joins anywhere. The join in
``common_span_report`` is (exploded spans) x (common-span set) — the
common set (df >= min_df) is orders of magnitude smaller than the
shingle universe, so AQE picks a broadcast join at any realistic
``min_df``; the explode itself reuses ``dedup.shingles_df``'s
bind-once/short-doc guards. Reference: the reference has no corpus
statistics surface (its aggregates are per-query, SURVEY.md §2.4);
these extend the training-data-pipeline family (SURVEY.md §6 /
BASELINE.json north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from carbondata_spark.functions import dround
from carbondata_spark.operators.dedup import shingles_df


def ngram_topk(
    df: DataFrame,
    n: int = 3,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` word ``n``-grams by total occurrence count.

    Columns: (ngram, n_occurrences BIGINT, n_docs BIGINT), ordered by
    count desc then ngram asc (deterministic tie-break). One explode,
    one partially-aggregated shuffle of (ngram -> count, distinct-doc
    count via count(distinct)), then TakeOrderedAndProject for the
    top-k — no full sort of the ngram universe.
    """
    occ = shingles_df(df, id_col=id_col, text_col=text_col, n=n, distinct=False)
    return (
        occ.groupBy("s")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("s"))
        .limit(k)
        .select(F.col("s").alias("ngram"), "n_occurrences", "n_docs")
    )


def common_span_report(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document corpus-common span fraction.

    For each document: the set of DISTINCT word ``n``-gram spans, and
    the fraction of them whose corpus document-frequency is at least
    ``min_df`` (i.e. the span also occurs in ``min_df - 1`` other
    documents or more). Columns: (doc_id, n_spans INT, n_common INT,
    dup_frac DOUBLE rounded to 4). Documents shorter than ``n`` words
    surface with n_spans = 0 and dup_frac = 0.0 rather than vanishing
    into the explode.

    dup_frac is a single exact division of two ints, so the value is
    bit-identical across engines before rounding. The common-span join
    keys on the span string AFTER the df >= min_df filter collapsed the
    right side, keeping the broadcast path open at scale (module doc).
    """
    spans = shingles_df(df, id_col=id_col, text_col=text_col, n=n, distinct=True)
    span_df = spans.groupBy("s").agg(F.count("*").alias("df"))
    common = span_df.filter(F.col("df") >= min_df).select("s")
    per_doc = (
        spans.join(common.withColumn("_c", F.lit(1)), on="s", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_common"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce(F.col("n_common"), F.lit(0)).cast("int").alias("n_common"),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(
                dround(F.col("n_common").cast("double") / F.col("n_spans"), 4)
            )
            .alias("dup_frac"),
        )
    )
