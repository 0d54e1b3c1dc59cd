"""Okapi BM25 ranked retrieval over a document corpus.

The classic lexical relevance score (Robertson & Spärck Jones; the
default ranker in Lucene/Elasticsearch since 2015) — the piece a
training-data pipeline uses for query-targeted corpus mining ("pull the
top-k documents about X"), quality-weighted sampling, and as the lexical
leg of hybrid (BM25 + embedding) retrieval next to operators/similarity.
The reference has no IR layer (its text story stops at LIKE filters);
this is a beyond-reference capability built purely from built-in
expressions — no UDF anywhere.

score(D, Q) = Σ_{t ∈ Q} idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))      (the
              non-negative "+1" variant Lucene uses)

Tokenization is the repo-wide whitespace spelling (operators/text._words
= split(trim(lower(text)), '\\s+')), so the DuckDB oracle reproduces it
verbatim with string_split_regex — the same parity contract p_text_tfidf
established.

Scale shape (100 TB), exactly two corpus passes and two real exchanges:

- Pass 1 (one-row result): N, avgdl, AND df(t) for every query term as
  a conditional aggregate over array_contains(tokens, t) — |Q| counters
  riding the same scan that computes avgdl. This deliberately avoids
  the two tempting alternatives: deriving df from the tf frame forks
  the plan and RE-RUNS the scan+explode+aggregate subtree (Spark does
  not reuse the exchange across an aggregate fork — measured), and a
  count window over partitionBy(term) funnels each term's whole
  posting list through ONE task (|Q| is small, so the term key is
  low-cardinality — the opposite of the tfidf2 situation where the
  word key is the high-cardinality whole vocabulary).
- Pass 2: document length |D| is size() of the token ARRAY — a per-row
  expression, never an aggregate — and the explode is filtered to the
  query terms BEFORE the (doc, term) tf aggregate, so only matching
  pairs ever shuffle. idf(t) arrives via the broadcast 1-row stats and
  an element_at(map) lookup; the per-document sum is the second
  exchange; the global top-k is orderBy+limit (TakeOrderedAndProject).

The conditional-aggregate df is the right trade up to |Q| of a few
hundred terms (the stats row carries one counter per term); past that,
switch the df side to the broadcast-join form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from carbondata_spark.functions import dround
from carbondata_spark.operators.text import _words


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query_terms``.

    Returns (doc_id, score, rank); documents matching none of the terms
    are absent. Scores are rounded to 4 decimals BEFORE ranking so the
    (score DESC, doc_id) tie-break is reproducible across engines.
    Duplicate query terms are collapsed (BM25 scores the term SET), and
    terms are lowercased to match the lowercased document tokens — a
    verbatim 'Vector' would otherwise silently score nothing.
    """
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    toks = df.select(
        F.col(id_col).alias("doc_id"), _words(F.lower(F.col(text_col))).alias("ts")
    )
    # Pass 1 — one row: N, avgdl, and df(t) per query term.
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("ts")).alias("avgdl"),
        *[
            F.sum(F.array_contains("ts", t).cast("long")).alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    dfc_of_w = F.element_at(
        F.create_map(
            *[c for i, t in enumerate(terms) for c in (F.lit(t), F.col(f"_df_{i}"))]
        ),
        F.col("w"),
    )
    # Pass 2 — only (doc, term ∈ Q) rows reach the tf exchange.
    matches = (
        toks.select("doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("w"))
        .filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfc") + F.lit(0.5)) / (F.col("dfc") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matches.crossJoin(F.broadcast(stats))
        .withColumn("dfc", dfc_of_w)
        .groupBy("doc_id")
        .agg(dround(F.sum(idf * tf_norm), 4).alias("score"))
    )
    top = scored.orderBy(F.desc("score"), "doc_id").limit(k)
    # rank over the ≤k surviving rows only. The literal partition key
    # keeps semantics identical (one partition either way) but silences
    # the WindowExec no-partition warning — sweep logs showing it should
    # always mean a REAL unbounded window somewhere.
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy(F.desc("score"), "doc_id"))
        .cast("int"),
    )
