"""Equivalence + plan pins for the staged tfidf optimization
(operators/tfidf2.py). The swap into text.tfidf_top_terms happens next
round; these tests make it a proven drop-in before the budget window
opens."""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.catalog import load_table
from carbondata_spark.operators.text import tfidf_top_terms
from carbondata_spark.operators.tfidf2 import tfidf_top_terms_v2


def test_v2_is_row_identical_to_current(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(400)
    a = tfidf_top_terms(docs).orderBy("doc_id", "rank").collect()
    b = tfidf_top_terms_v2(docs).orderBy("doc_id", "rank").collect()
    assert a == b
    assert len(a) > 0


def test_v2_edge_docs_match(spark):
    # empty text, single word, all-same-word, ties on tfidf
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "solo"),
            (3, "rep rep rep rep"),
            (4, "alpha beta gamma"),
            (5, "beta alpha gamma"),
        ],
        "doc_id long, text string",
    )
    a = tfidf_top_terms(docs).orderBy("doc_id", "rank").collect()
    b = tfidf_top_terms_v2(docs).orderBy("doc_id", "rank").collect()
    assert a == b


def test_v2_plan_has_no_join_and_no_dfreq_aggregate(spark, sf_dir):
    """The point of v2: df(w) comes from a count window sharing the word
    exchange — no join, and exactly TWO hash aggregates (tf and the
    final per-doc top-k), not three."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    plan = tfidf_top_terms_v2(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate(keys=") <= 4, plan  # 2 aggs x partial+final
    # the window carries no sort order: no global/partition sort appears
    # beyond the window's own partitioning requirement
    assert "WindowExec" in plan or "Window" in plan, plan
