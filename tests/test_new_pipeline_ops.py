"""Round-9 operator additions: embedding quantization/hygiene
(operators/embeddings.py), winnowing fingerprints (operators/winnow.py),
cross-corpus incremental dedup (operators/incremental.py). Edge cases
the sf-corpus oracle rows cannot reach: zero/NaN vectors, sub-k-gram
documents, the winnowing shared-run guarantee, and the asymmetry
contract of the incremental dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _no_exchange(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def test_quantize_int8_values_and_edges(spark):
    from carbondata_spark.operators.embeddings import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, zero error
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    # scale = 1/127; every element is an exact multiple of 0.25 but NOT
    # of 1/127, so errors are small and strictly positive
    assert rows[1].scale == round(1.0 / 127, 6)
    assert 0 < rows[1].max_err <= rows[1].scale / 2 + 1e-9
    assert 0 <= rows[1].mean_err <= rows[1].max_err
    assert rows[2].scale == 0.0 and rows[2].max_err == 0.0 and rows[2].mean_err == 0.0
    # reconstruction identity on an exactly-representable vector
    df2 = spark.createDataFrame(
        [(3, [127.0, -127.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r3 = quantize_int8(df2).collect()[0]
    assert r3.scale == 1.0 and r3.max_err == 0.0  # codes reproduce exactly
    # map-side only: no shuffle in the per-vector form
    assert _no_exchange(quantize_int8(df))


def test_embedding_hygiene_flags_bad_vectors(spark):
    from carbondata_spark.operators.embeddings import embedding_hygiene

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),                  # norm 5
            (2, [0.0, 0.0]),                  # zero norm
            (3, [float("nan"), 1.0]),         # non-finite
            (4, [float("inf"), 1.0]),         # non-finite
            (5, [1.0, 0.0, 0.0]),             # dimension drift, norm 1
        ],
        "vec_id long, embedding array<float>",
    )
    r = embedding_hygiene(df).collect()[0]
    assert r.n_vectors == 5
    assert r.n_nonfinite == 2
    assert r.n_zero_norm == 1
    assert (r.dim_lo, r.dim_hi) == (2, 3)
    # non-finite vectors are EXCLUDED from the norm stats
    assert r.norm_min == 0.0 and r.norm_max == 5.0
    assert r.norm_mean == round((5.0 + 0.0 + 1.0) / 3, 2)


def test_winnow_short_document_edges(spark):
    from carbondata_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "one two"),                   # < k words: no k-gram
            (2, "one two three"),             # exactly one k-gram
            (3, "a b c d e"),                 # 3 grams < window=4: one window
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in winnow_fingerprints(df, k=3, window=4).collect()}
    assert rows[1].n_fingerprints == 0 and rows[1].fp_min is None and rows[1].fp_sum == 0
    assert rows[2].n_fingerprints == 1 and rows[2].fp_min == rows[2].fp_sum
    assert rows[3].n_fingerprints == 1  # single all-grams window, min of 3 hashes
    assert _no_exchange(winnow_fingerprints(df))


def test_winnow_shared_run_guarantee(spark):
    """The winnowing contract: two documents sharing a run of at least
    k + window - 1 = 6 tokens share at least one fingerprint, however
    different the surrounding text is."""
    from carbondata_spark.operators.winnow import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    df = spark.createDataFrame(
        [
            (1, f"totally unrelated prefix words here {shared} and a suffix"),
            (2, f"{shared} completely different continuation tokens now"),
            (3, "no overlap with anything else at all in this document"),
        ],
        "doc_id long, text string",
    )
    # recompute the fingerprint SETS (the operator reports summaries; the
    # guarantee is about set intersection) via the same expressions
    out = winnow_fingerprints(df, k=3, window=4)
    sums = {r.doc_id: (r.n_fingerprints, r.fp_min, r.fp_sum) for r in out.collect()}
    # doc3 shares nothing: its min fingerprint differs from both others'
    # (md5 collisions at 32 bits are ~2^-32 on this corpus)
    w = (
        df.select("doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("w"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.size("w") - F.lit(2)),
                lambda j: F.conv(
                    F.substring(F.md5(F.array_join(F.slice("w", j, 3), " ")), 1, 8),
                    16,
                    10,
                ).cast("long"),
            ).alias("h"),
        )
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size("h") - F.lit(3), F.lit(1))),
                    lambda j: F.array_min(F.slice("h", j, 4)),
                )
            ).alias("f"),
        )
    )
    fps = {r.doc_id: set(r.f) for r in w.collect()}
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # and the operator's summaries agree with the recomputed sets
    for d in (1, 2, 3):
        assert sums[d] == (len(fps[d]), min(fps[d]), sum(fps[d]))


def test_cross_corpus_dedup_asymmetry_and_election(spark):
    """Candidates cross the new/reference boundary ONLY: identical NEW
    docs never pair with each other, matches elect the highest-jaccard
    reference (ties to the smallest ref id)."""
    from carbondata_spark.operators.incremental import cross_corpus_near_dups

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (0, base),                         # ref
            (1, base + " extra"),              # ref, slightly different
            (2, "completely unrelated reference text with nothing shared"),  # ref
            (10, base),                        # new: exact dup of ref 0
            (11, base),                        # new: identical to new 10
            (12, "totally novel document that matches no reference at all"),
        ],
        "doc_id long, text string",
    )
    out = cross_corpus_near_dups(
        df, is_reference=F.col("doc_id") < 10, threshold=0.5
    )
    rows = {r.doc_id: r for r in out.collect()}
    # both identical new docs match ref 0 (exact jaccard 1.0 beats ref 1)
    assert set(rows) == {10, 11}
    for d in (10, 11):
        assert rows[d].ref_id == 0 and rows[d].jaccard == 1.0
    # the novel new doc is absent; new x new identity produced no row
    assert 12 not in rows


def test_cross_corpus_tie_breaks_to_smallest_ref(spark):
    from carbondata_spark.operators.incremental import cross_corpus_near_dups

    txt = "shared shingle stream one two three four five six seven"
    df = spark.createDataFrame(
        [(5, txt), (7, txt), (20, txt)], "doc_id long, text string"
    )
    out = cross_corpus_near_dups(df, is_reference=F.col("doc_id") < 10)
    r = out.collect()
    assert len(r) == 1 and r[0].doc_id == 20
    assert r[0].ref_id == 5 and r[0].jaccard == 1.0  # tie 5 vs 7 -> smallest


def test_containment_catches_embedded_paragraph(spark):
    """A small document copied INSIDE a much larger one: Jaccard is low
    (the big doc's shingle set dwarfs the small one's) but containment
    is ~1.0 — the case winnowing exists for."""
    from carbondata_spark.operators.dedup import ngram_jaccard_pairs
    from carbondata_spark.operators.winnow import containment_pairs

    para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = " ".join(f"filler{i} word{i} token{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, para), (2, f"{filler} {para} {filler}")],
        "doc_id long, text string",
    )
    got = containment_pairs(df, min_shared=2, max_fp_freq=None).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment >= 0.99  # every small-doc fingerprint recurs
    # while set-similarity dedup does NOT pair them at its threshold
    assert ngram_jaccard_pairs(df, threshold=0.5, max_shingle_freq=None).count() == 0


def test_containment_frequency_cap_binds(spark):
    """The stop-fingerprint cap excludes corpus-wide boilerplate from
    candidate generation (and from the counts), exactly like the
    shingle cap — pinned so the oracle's HAVING clause and the operator
    can never drift apart silently."""
    from carbondata_spark.operators.winnow import containment_pairs

    boiler = "common license header shared by every single document here"
    df = spark.createDataFrame(
        [(i, f"{boiler} unique{i} tail{i} words{i} extra{i} more{i}") for i in range(6)],
        "doc_id long, text string",
    )
    # uncapped: the boilerplate fingerprints pair everything
    assert containment_pairs(df, min_shared=1, max_fp_freq=None).count() == 15
    # cap below the corpus size: the corpus-wide boilerplate fingerprint
    # is excluded, so the all-pairs blowup collapses (only boundary-
    # window fingerprints shared by few docs may remain)
    assert containment_pairs(df, min_shared=1, max_fp_freq=5).count() < 15
    # cap=1 keeps only single-doc fingerprints: pairs are impossible
    assert containment_pairs(df, min_shared=1, max_fp_freq=1).count() == 0


def test_new_ops_prune_scan_columns(spark, sf_dir):
    """The registry forms of the round-9 operators must push column
    pruning into the parquet scan: winnow/quantize read exactly the
    columns they consume (a scan hauling the full documents row for a
    2-column operator is wrong at any scale)."""
    from carbondata_spark.queries import registry

    # another test file may have cached a full-column frame over these
    # tables; CacheManager substitution would then surface the cached
    # plan's unpruned FileScan and fail the check spuriously
    spark.catalog.clearCache()
    reg = registry()
    cases = {
        "p_text_winnow": ("documents", {"doc_id", "text"}),
        "p_embed_quantize": ("embeddings", {"vec_id", "embedding"}),
        "p_embed_hygiene": ("embeddings", {"vec_id", "embedding"}),
        "p_tokens_histogram": ("documents", {"text"}),
    }
    for name, (table, want_cols) in cases.items():
        df = reg[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = [
            ln for ln in plan.splitlines()
            if "FileScan parquet" in ln and table in ln
        ]
        assert scans, f"{name}: no parquet scan of {table} in plan"
        for ln in scans:
            schema = ln.split("ReadSchema: ")[-1]
            read = {
                c.split(":")[0]
                for c in schema.split("struct<", 1)[-1].rstrip(">... ").split(",")
                if ":" in c
            }
            assert read <= want_cols, f"{name} reads {read}, wants <= {want_cols}"
