"""remove_common_spans (operators/corpus.py): corpus-common n-gram
occurrences scrubbed from every document — examples for the edges, a
hypothesis property pin against a pure-Python replay for the rest."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _replay(texts: list[str], n: int, min_df: int) -> dict[int, tuple[str, int, int]]:
    toks = {i: t.split() for i, t in enumerate(texts)}
    span_sets = {
        i: {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
        for i, w in toks.items()
    }
    dfreq: Counter = Counter(g for s in span_sets.values() for g in s)
    common = {g for g, c in dfreq.items() if c >= min_df}
    out = {}
    for i, w in toks.items():
        covered: set[int] = set()
        for j in range(max(0, len(w) - n + 1)):
            if " ".join(w[j : j + n]) in common:
                covered.update(range(j, j + n))
        kept = [w[p] for p in range(len(w)) if p not in covered]
        out[i] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


def _run(spark, texts, n, min_df):
    from carbondata_spark.operators.corpus import remove_common_spans

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_common_spans(df, n=n, min_df=min_df).collect()
    }


def test_boilerplate_scrubbed_unique_text_kept(spark):
    texts = [
        "cookie banner accept all unique alpha story",
        "cookie banner accept all unique beta story",
        "cookie banner accept all gamma tale here",
        "totally original document with no repeats",
    ]
    got = _run(spark, texts, n=4, min_df=3)
    # "cookie banner accept all" occurs in 3 docs -> scrubbed everywhere;
    # the unique tails survive in order
    assert got[0] == ("unique alpha story", 7, 4)
    assert got[1] == ("unique beta story", 7, 4)
    assert got[2] == ("gamma tale here", 7, 4)
    assert got[3] == ("totally original document with no repeats", 6, 0)


def test_overlapping_spans_union_coverage(spark):
    # "a b c d" in all docs at n=3: spans "a b c" and "b c d" are both
    # common and overlap -> all four tokens covered, not 6 removals
    texts = ["a b c d x", "a b c d y", "a b c d z"]
    got = _run(spark, texts, n=3, min_df=3)
    assert got[0] == ("x", 5, 4)
    assert got[1] == ("y", 5, 4)
    assert got[2] == ("z", 5, 4)


def test_short_empty_and_fully_scrubbed_docs_survive(spark):
    texts = ["a b c", "a b c", "a b c", "xy", ""]
    got = _run(spark, texts, n=3, min_df=3)
    assert got[0] == ("", 3, 3)  # fully scrubbed, still present
    assert got[3] == ("xy", 1, 0)  # shorter than n: untouched
    assert got[4] == ("", 0, 0)  # empty doc: zero tokens, zero removed


word = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)


@settings(max_examples=12, deadline=None)
@given(corpus, st.integers(min_value=1, max_value=3), st.integers(min_value=2, max_value=3))
def test_scrub_matches_python_replay(spark, texts, n, min_df):
    got = _run(spark, texts, n=n, min_df=min_df)
    want = _replay(texts, n, min_df)
    assert got == want, (texts, n, min_df, got, want)


def test_scrub_plan_has_no_pairwise_join(spark, sf_dir):
    """Scale pin: the scrub over the real documents table must stay an
    explode -> aggregate -> keyed-join pipeline — no CartesianProduct or
    BroadcastNestedLoopJoin anywhere in the physical plan."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.operators.corpus import remove_common_spans

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        remove_common_spans(docs, n=3, min_df=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
