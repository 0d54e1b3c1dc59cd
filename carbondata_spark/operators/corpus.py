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
- ``remove_common_spans`` — the TRANSFORM the report motivates: rewrite
  each document with every occurrence of a corpus-common span scrubbed
  (all n tokens of each covered window dropped, survivors rejoined in
  order). The span-scrubbing analogue of exact-substring dedup
  ("Deduplicating Training Data Makes Language Models Better",
  Lee et al. 2022): instead of deleting whole near-dup documents, the
  repeated boilerplate inside otherwise-unique documents is removed.

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
from carbondata_spark.operators.dedup import shingles_df, words_col


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


def remove_common_spans(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scrub corpus-common ``n``-gram spans out of every document.

    A span is common when its document frequency (documents containing
    it at least once) is >= ``min_df`` — the same commonness rule as
    ``common_span_report``. EVERY occurrence of a common span in a
    document covers its ``n`` token positions; covered tokens are
    dropped and the survivors rejoined with single spaces in original
    order. Overlapping common spans union their covered positions.

    Columns: (doc_id, text = scrubbed text STRING, n_tokens INT = the
    original whitespace token count, n_removed INT). Documents shorter
    than ``n`` words (no spans) and fully-scrubbed documents both
    surface — the latter with text = '' — so a downstream
    filter(n_removed/n_tokens < cut) sees every input row.

    Scale shape: token and span streams are explodes of the same corpus
    (no pairwise join); the commonness join collapses the right side
    with df >= min_df first, keeping broadcast open (module doc); the
    covered-position union and the final reassembly are hash aggregates
    keyed by doc (+position), each with map-side partial aggregation.
    The reassembly's per-document collect_list is bounded by document
    length — the same per-doc bound every tokenizer in
    ``operators/text.py`` already lives with.
    """
    from carbondata_spark.functions import ensure_parallelism
    from carbondata_spark.operators.hof import let_once

    df = ensure_parallelism(df)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words_col(text_col).alias("w"),
    ).select(
        "doc_id",
        "w",
        F.when(
            (F.size("w") == 1) & (F.element_at("w", 1) == ""), F.lit(0)
        )
        .otherwise(F.size("w"))
        .alias("n_tokens"),
    )

    # every span occurrence with its start position (0-based): index i
    # covers tokens [i, i+n-1]. Same bind-once/short-doc guards as
    # shingles_df, but positions are kept for coverage.
    grams = base.select(
        "doc_id",
        F.posexplode(
            let_once(
                F.col("w"),
                lambda w: F.when(
                    F.size(w) < n, F.array().cast("array<string>")
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(0), F.size(w) - n),
                        # n element_at + concat_ws: no per-span array
                        # allocation (see dedup.shingles_df), identical
                        # span strings
                        lambda i: F.concat_ws(
                            " ", *[F.element_at(w, i + 1 + off) for off in range(n)]
                        ),
                    )
                ),
            )
        ).alias("start", "s"),
    )

    # corpus-common span set: distinct per doc -> document frequency
    common = (
        shingles_df(df, id_col=id_col, text_col=text_col, n=n, distinct=True)
        .groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("s")
    )

    # union of covered token positions per document
    covered = (
        grams.join(common, on="s")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )

    tokens = base.filter(F.col("n_tokens") > 0).select(
        "doc_id", F.posexplode("w").alias("pos", "word")
    )
    kept = tokens.join(covered, on=["doc_id", "pos"], how="left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )
