"""Unit tests for the round-14 operators: BM25 ranked retrieval,
duplicate-aware weighting, snapshot diffing. (The streaming merge-upsert
composition is exercised end-to-end by the q_stream_merge_upsert
registry row in tests/test_correctness.py.)"""

from __future__ import annotations

import math

import pytest


@pytest.fixture()
def tiny_docs(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "d d d b")],
        "doc_id long, text string",
    )


def test_bm25_hand_computed(spark, tiny_docs):
    from carbondata_spark.operators.bm25 import bm25_topk

    rows = {
        r["doc_id"]: r
        for r in bm25_topk(tiny_docs, ["a", "b"], k=10).collect()
    }
    # N=3, avgdl=3, df(a)=df(b)=2 -> idf = ln(1 + 1.5/2.5) = ln(1.6)
    idf = math.log(1.6)

    def tfn(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    expected = {
        1: idf * (tfn(2, 3) + tfn(1, 3)),
        2: idf * tfn(1, 2),
        3: idf * tfn(1, 4),
    }
    assert set(rows) == {1, 2, 3}
    for doc_id, want in expected.items():
        assert rows[doc_id]["score"] == pytest.approx(round(want, 4), abs=1e-4)
    # ranking: doc1 (both terms, short) > doc2 > doc3
    assert [rows[i]["rank"] for i in (1, 2, 3)] == [1, 2, 3]


def test_bm25_excludes_nonmatching_and_caps_k(spark, tiny_docs):
    from carbondata_spark.operators.bm25 import bm25_topk

    out = bm25_topk(tiny_docs, ["c"], k=1).collect()
    assert [r["doc_id"] for r in out] == [2]  # only doc2 contains 'c'
    with pytest.raises(ValueError):
        bm25_topk(tiny_docs, [])


def test_bm25_terms_match_case_insensitively(spark, tiny_docs):
    """Documents are tokenized lowercased; a verbatim 'C' query term
    must match the same postings as 'c', not silently score nothing."""
    from carbondata_spark.operators.bm25 import bm25_topk

    lower = bm25_topk(tiny_docs, ["c"], k=5).collect()
    upper = bm25_topk(tiny_docs, ["C"], k=5).collect()
    assert [tuple(r) for r in upper] == [tuple(r) for r in lower] and lower


def test_dup_weight(spark):
    from carbondata_spark.operators.weighting import dup_weight

    df = spark.createDataFrame(
        [(1, "x"), (2, "  x  "), (3, "y"), (4, "X")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_weight(df).collect()}
    # lower+trim: 1, 2, 4 collapse; every row kept, weights sum to the
    # number of DISTINCT texts.
    assert [got[i]["dup_count"] for i in (1, 2, 3, 4)] == [3, 3, 1, 3]
    assert got[3]["weight"] == 1.0
    assert got[1]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert sum(r["weight"] for r in got.values()) == pytest.approx(2.0, abs=1e-5)


def test_rrf_fuse_hand_computed(spark):
    from carbondata_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    vec = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse({"lex": lex, "vec": vec}).collect()}
    # doc 3: in both legs -> 1/63 + 1/61; doc 1: lex only -> 1/61
    assert got[3]["rrf"] == pytest.approx(round(1 / 63 + 1 / 61, 6), abs=1e-6)
    assert got[1]["rrf"] == pytest.approx(round(1 / 61, 6), abs=1e-6)
    # absent leg surfaces as rank 0, not NULL
    assert got[1]["vec_rank"] == 0 and got[4]["lex_rank"] == 0
    # fused ordering: 3 (both legs) first, then 1 (1/61); 2 and 4 tie at
    # 1/62 and break on doc_id
    assert [d for d, r in sorted(got.items(), key=lambda x: x[1]["rank"])] == [
        3, 1, 2, 4,
    ]
    with pytest.raises(ValueError):
        rrf_fuse({})


def test_snapshot_diff_statuses(spark):
    from carbondata_spark.operators.diffing import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (5, "e", 50)],
        "k long, text string, n long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (4, "d", 40)],
        "k long, text string, n long",
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, "k").collect()}
    # NULL -> value is a change (the coalesce sentinel, not a skip)
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "added",
        5: "removed",
    }
    # restricting compare_cols to an equal column flips 2 and 3 back
    got_n = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, "k", compare_cols=["n"]).collect()
    }
    assert got_n[2] == "unchanged" and got_n[3] == "unchanged"
    with pytest.raises(ValueError):
        snapshot_diff(old.select("k"), new.select("k"), "k")


def test_snapshot_diff_separator_values_do_not_alias(spark):
    """Values containing a would-be digest separator must not alias
    across column boundaries (JSON-struct hashing is injective)."""
    from carbondata_spark.operators.diffing import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x\x01y", "z"), (2, "a", None)], "k long, s string, t string"
    )
    new = spark.createDataFrame(
        [(1, "x", "y\x01z"), (2, "a", "\x00null")], "k long, s string, t string"
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "changed", 2: "changed"}


def test_dup_weight_mass_conservation(spark):
    """Invariant: weights sum to the number of DISTINCT normalized
    texts (each duplicate group contributes exactly one unit of
    training mass), for an arbitrary duplication pattern."""
    from pyspark.sql import functions as F

    from carbondata_spark.operators.weighting import dup_weight

    df = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") % 17).cast("string")).alias("text"),
    )
    out = dup_weight(df)
    assert out.count() == 60  # keep-everything: no row dropped
    total = out.agg(F.sum("weight")).collect()[0][0]
    assert total == pytest.approx(17.0, abs=1e-4)


def test_rrf_leg_order_invariance(spark):
    """RRF is a commutative sum: permuting the legs dict must produce
    identical (id, rrf, rank) rows."""
    from carbondata_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rank int")
    vec = spark.createDataFrame([(i + 3, i) for i in range(1, 8)], "doc_id long, rank int")
    a = rrf_fuse({"lex": lex, "vec": vec}).select("doc_id", "rrf", "rank").collect()
    b = rrf_fuse({"vec": vec, "lex": lex}).select("doc_id", "rrf", "rank").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_snapshot_diff_identity(spark, sf_dir):
    """diff(x, x) is all-unchanged over real data — no false positives
    from the digest encoding (NULLs, unicode, long text)."""
    from carbondata_spark.operators.diffing import snapshot_diff
    from carbondata_spark.queries import t as load

    docs = load(spark, sf_dir, "documents")
    out = snapshot_diff(docs, docs, "doc_id")
    assert out.filter("status <> 'unchanged'").count() == 0
    assert out.count() == docs.count()


def test_stream_merge_epoch_replay_is_idempotent(spark, sf_dir):
    """streaming/upsert.py's crash contract: a micro-batch that dies
    AFTER the merge commits but BEFORE the checkpoint advances replays
    as an upsert of the SAME per-key values — table contents must be
    unchanged (last-write-wins, like Delta/Hudi streaming MERGE)."""
    from pyspark.sql import functions as F

    from carbondata_spark.query_defs.pipeline7 import _profiles_store, per_user_agg

    store = _profiles_store(spark, sf_dir)
    before = sorted(
        tuple(r) for r in store.table("profiles").collect()
    )
    # simulate the replayed epoch: re-merge one cohort's aggregate batch
    from carbondata_spark.queries import t as load

    events = load(spark, sf_dir, "events")
    replay = per_user_agg(events.filter(F.col("user_id") % 3 == 1))
    store.merge_rows("profiles", replay, keys="user_id",
                     update_cols=["total_value", "n_events", "last_ts"])
    after = sorted(tuple(r) for r in store.table("profiles").collect())
    assert after == before
