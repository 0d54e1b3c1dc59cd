"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
algorithm): position-robust near-duplicate fingerprints.

MinHash (operators/dedup.py) answers "are these two documents similar
as SETS of shingles"; winnowing answers the complementary containment
question — its guarantee is that any shared run of at least
``noise = k + window - 1`` tokens between two documents produces at
least one IDENTICAL fingerprint in both, so a plagiarized paragraph
inside an otherwise different document is still caught. The classic
pipeline: k-gram rolling hashes → sliding-window minimum → distinct
window minima are the document's fingerprints.

Implementation is per-document array expressions only (transform over
a sequence + in-row sliding-window min): embarrassingly parallel,
whole-stage codegen, ZERO shuffles and zero UDFs — at 100 TB it runs at
scan speed and the fingerprint sets would land next to the documents
for a later band-style equi-join (the same candidate-generation shape
as MinHash LSH, which is why only the fingerprint extraction lives
here). Hashes are the first-8-hex-chars of md5 (32-bit), the repo's
portable hash convention — a DuckDB oracle reproduces every
fingerprint bit-for-bit.

The reference has no document operators at all; this extends the
training-data-pipeline family (SURVEY.md §6) next to the MinHash /
SimHash dedup surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from carbondata_spark.functions import dround


from carbondata_spark.operators.hof import let_once as _let


def _fingerprint_sets(
    df: DataFrame, id_col: str, text_col: str, k: int, window: int
) -> DataFrame:
    """(doc_id, _f) — the distinct winnowing fingerprint set per doc,
    [] for documents with fewer than ``k`` words. Shared plan prefix of
    the summary and exploded forms.

    Cost per document is O(m·k) hashing + O(m·window) min-folding, m =
    #k-grams: the words array and the gram-hash array each bind ONCE
    per row (``_let``), and the sliding-window minimum is ``window - 1``
    pairwise zip_with(least) folds over shifted slices — zip_with
    evaluates its array arguments once per row, never per element."""

    def fps_of(h: Column) -> Column:
        n_wins = F.size(h) - F.lit(window - 1)
        wins = F.slice(h, 1, F.greatest(n_wins, F.lit(1)))
        for i in range(1, window):
            wins = F.zip_with(
                wins,
                F.slice(h, 1 + i, F.greatest(n_wins, F.lit(1))),
                lambda x, y: F.least(x, y),
            )
        return F.array_distinct(
            F.when(n_wins >= 1, wins).otherwise(
                # 1 <= #grams < window: the single all-grams window, so
                # short docs keep a fingerprint
                F.when(F.size(h) > 0, F.array(F.array_min(h))).otherwise(
                    F.array().cast("array<long>")
                )
            )
        )

    def hashes_of(w: Column) -> Column:
        m = F.size(w) - F.lit(k - 1)  # number of k-grams
        gram_hash = (
            # j -> 32-bit hash of the j-th k-gram (1-based): k element_at
            # + concat_ws instead of slice+array_join — no per-gram array
            # allocation, byte-identical gram strings (split yields no
            # NULLs, see dedup.shingles_df)
            lambda j: F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", *[F.element_at(w, j + off) for off in range(k)])),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
        )
        return F.when(
            m >= 1, F.transform(F.sequence(F.lit(1), m), gram_hash)
        ).otherwise(F.array().cast("array<long>"))

    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    fps = _let(words, lambda w: _let(hashes_of(w), fps_of))
    return df.select(F.col(id_col).alias("doc_id"), fps.alias("_f"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprint summary:
    (doc_id, n_fingerprints, fp_min, fp_sum).

    ``k``-word grams are hashed to 32-bit ints (first 8 md5 hex chars);
    each window of ``window`` consecutive gram hashes contributes its
    minimum; the distinct minima are the fingerprints. Documents with
    fewer than ``k`` words have no k-gram and report 0 fingerprints
    (NULL min). fp_sum is the fingerprint-set sum — with fp_min and the
    count it pins the selected set across engines without emitting an
    array column (three scalars hash-compare cleanly driver-side).

    Windows shorter than ``window`` at the tail are NOT emitted (the
    standard guarantee needs full windows only; a document with
    1 <= #grams < window emits the single all-grams window so short
    docs keep a fingerprint).
    """
    return _fingerprint_sets(df, id_col, text_col, k, window).select(
        "doc_id",
        F.size("_f").alias("n_fingerprints"),
        F.array_min("_f").alias("fp_min"),
        F.aggregate("_f", F.lit(0).cast("long"), lambda a, x: a + x).alias("fp_sum"),
    )


def winnow_fingerprint_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """(doc_id, fp) — one row per distinct winnowing fingerprint per
    document; the exploded index ``containment_pairs`` joins on."""
    return _fingerprint_sets(df, id_col, text_col, k, window).select(
        "doc_id", F.explode("_f").alias("fp")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_fp_freq: int | None = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b) sharing >= ``min_shared`` winnowing
    fingerprints, with the containment score
    shared / min(|fps_a|, |fps_b|) — the detection join the fingerprints
    exist for. Unlike Jaccard this catches a small document EMBEDDED in
    a large one (copied paragraph, boilerplate license block).

    Same scale shape as the shingle join (dedup.ngram_jaccard_pairs):
    explode -> frequency-cap stop-fingerprints (a fingerprint in f docs
    yields f^2 candidates; boilerplate shared corpus-wide would dominate
    the join) -> self-equi-join on the 32-bit fp key (uniform,
    high-cardinality shuffle) -> per-pair count -> join per-doc
    fingerprint counts. The cap changes results, so the oracle applies
    the identical HAVING filter; ``None`` disables it for oracle-exact
    small-corpus runs.
    """
    from carbondata_spark.functions import repersist

    rows = winnow_fingerprint_rows(df, id_col, text_col, k, window)
    if max_fp_freq is not None:
        ok = rows.groupBy("fp").count().filter(F.col("count") <= max_fp_freq).select("fp")
        rows = rows.join(ok, "fp")
    # rows feeds the per-doc counts AND both sides of the candidate
    # self-join — persist so the fingerprint extraction over the corpus
    # runs exactly once (same lifecycle as the tfidf tf frame; one
    # compact (doc, fp) row per fingerprint, far smaller than the text)
    rows = repersist("winnow_rows", rows)
    counts = rows.groupBy("doc_id").agg(F.count("*").alias("c"))
    a, b = rows.alias("a"), rows.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("c").alias("ca"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("c").alias("cb"))
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            dround(F.col("n_shared") / F.least("ca", "cb"), 4).alias("containment"),
        )
    )
