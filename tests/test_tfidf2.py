"""Equivalence + plan pins for the v2 TF-IDF plan (operators/tfidf2.py),
which is LIVE behind the p_text_tfidf headline query since round 13.
text.tfidf_top_terms (v1) is kept as the independent row-identity oracle
here: the two implementations must stay bit-identical."""

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
    # empty text, single word, all-same-word, ties on tfidf. The empty
    # doc also pins the n_docs contract: doc 1 contributes no tf rows
    # but MUST count toward N (n_docs comes from the input frame, not
    # the tf frame).
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


def test_v2_plan_shape(spark, sf_dir):
    """The point of v2: df(w) comes from a count window sharing the word
    exchange — no shuffle/hash join on the word key (the ONLY join is
    the 1-row broadcast nested-loop bringing in n_docs), and exactly TWO
    hash aggregates on the scored path (tf and the per-doc top-k) plus
    the 1-row n_docs count — not a third dfreq aggregate keyed on w."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    plan = tfidf_top_terms_v2(docs)._jdf.queryExecution().executedPlan().toString()
    for join in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    # keyed aggregates: tf (partial+final) and top-k (partial+final);
    # the n_docs count is key-less (keys=[]) so it's excluded here.
    import re

    keyed = re.findall(r"HashAggregate\(keys=\[[^\]]", plan)
    assert len(keyed) <= 4, plan
    assert "HashAggregate(keys=[w" not in plan, plan  # no dfreq agg
    # the n_docs subtree prunes every column: pure footer/metadata count
    assert "ReadSchema: struct<>" in plan, plan
    # the window carries no sort order: no global/partition sort appears
    # beyond the window's own partitioning requirement
    assert "WindowExec" in plan or "Window" in plan, plan


def test_v2_is_one_lazy_job_no_eager_count(spark):
    """Constructing the v2 frame must run NO Spark job (the former
    n_docs = df.count() was an eager extra pass; it is now a broadcast
    one-row aggregate inside the single job)."""
    from tests._jobcount import count_jobs

    with count_jobs(spark) as c:
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
        )
        out = tfidf_top_terms_v2(docs)
    assert c.n == 0, "building the v2 frame triggered a Spark job"
    assert out.count() > 0
