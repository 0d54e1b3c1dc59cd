"""Physical-plan pins for the round-14 operators — the plan shapes that
matter at 100 TB, in the house style of tests/test_plans.py."""

from __future__ import annotations

import re

from carbondata_spark.queries import registry


def plan_of(spark, sf_dir, name: str) -> str:
    df = registry()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _final(plan: str) -> str:
    """AdaptiveSparkPlan's toString prints final+initial trees; keep the
    final one so structural counts aren't doubled."""
    cut = plan.find("+- == Initial Plan ==")
    return plan if cut < 0 else plan[:cut]


def test_bm25_only_query_term_postings_shuffle(spark, sf_dir):
    """The explode is filtered to the literal query-term IN-list BEFORE
    the tf aggregate's exchange — the whole corpus vocabulary must never
    shuffle — and the corpus passes are exactly two FileScans (matches +
    one-row stats; df(t) rides the stats pass, no third scan)."""
    plan = _final(plan_of(spark, sf_dir, "p_bm25_topk"))
    assert plan.count("FileScan") == 2, plan
    # the term filter appears as a scan-level data filter (pushed before
    # any exchange); explode output is filtered on the IN-list
    assert "vector" in plan and "merge" in plan
    assert "CartesianProduct" not in plan
    # the one-row stats side arrives broadcast, never shuffled at scale
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bm25_topk_no_global_sort(spark, sf_dir):
    plan = _final(plan_of(spark, sf_dir, "p_bm25_topk"))
    assert "TakeOrderedAndProject" in plan, plan


def test_dup_weight_single_exchange_digest_only(spark, sf_dir):
    """dup_weight shuffles ONCE, on the md5 digest — and the window
    input projects to (id, digest) so document payloads never cross the
    wire (text is consumed scan-side computing the digest)."""
    plan = _final(plan_of(spark, sf_dir, "p_dup_weight"))
    assert plan.count("Exchange") == 1, plan
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert "_h" in ex[0], ex


def test_snapshot_diff_joins_digests_not_payloads(spark, sf_dir):
    """The full-outer join's shuffled rows carry (key, 32-byte digest),
    never the text payload: every Exchange line must mention the digest
    columns and not the raw text column."""
    plan = _final(plan_of(spark, sf_dir, "p_snapshot_diff"))
    exchanges = [ln for ln in plan.splitlines() if re.search(r"\bExchange\b", ln)]
    assert exchanges, plan
    for ln in exchanges:
        assert "text#" not in ln, ln
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_cost_lives_in_the_legs(spark, sf_dir):
    """The fusion itself adds no scan: the plan's FileScans belong to
    the two legs (bm25: 2, cosine: 1 corpus + 1 broadcast query side),
    and the final ranking window runs on the ≤topk fused rows after a
    TakeOrderedAndProject, not a global sort."""
    plan = _final(plan_of(spark, sf_dir, "p_hybrid_rrf"))
    assert plan.count("FileScan") <= 5, plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
