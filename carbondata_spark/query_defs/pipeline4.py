"""Training-data pipeline queries, part 4: embedding lifecycle
(quantization / hygiene), winnowing fingerprints, corpus reports
(per-domain stats, token histogram, shard skew), and incremental
cross-corpus dedup.

Same oracle conventions as pipeline/pipeline2/pipeline3: md5-based
content addressing, dround for every rounded double, aggregate casts
pinned to BIGINT/INT on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.functions import dround
from carbondata_spark.queries import r2, register, t
from carbondata_spark.query_defs.pipeline import (
    _MINHASH_BANDS_CTE,
    _MINHASH_MH_CTE,
    _SHINGLES_CTE,
    _hex4_sql,
)

# 32-bit int from the first 8 md5 hex chars of a SQL expression — the
# repo's portable hash convention (same arithmetic as pipeline2's
# _KEY_FRAC numerator, exact in both engines)
def _h32_sql(expr: str) -> str:
    return f"(({_hex4_sql(f'md5({expr})', 1)}) * 65536 + ({_hex4_sql(f'md5({expr})', 5)}))"


_WS_TOKENS = r"len(string_split_regex(trim(text), '\s+'))"


@register(
    "p_embed_quantize",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS sc
          FROM v),
    err AS (SELECT vec_id, sc,
                   CASE WHEN sc = 0 THEN list_transform(e, x -> 0.0)
                        ELSE list_transform(e, x -> abs(x - floor(x / sc + 0.5) * sc))
                   END AS er
            FROM s)
    SELECT vec_id,
           round(sc, 6)                               AS scale,
           round(list_max(er), 6)                     AS max_err,
           round(list_aggregate(er, 'sum') / len(er), 6) AS mean_err
    FROM err
    """,
    doc="Symmetric int8 quantization error report per vector (scale = "
    "max|x|/127, explicit half-up codes) — map-side higher-order array "
    "expressions, no shuffle; the 4x-memory ANN precondition.",
)
def p_embed_quantize(spark, sf_dir):
    from carbondata_spark.operators.embeddings import quantize_int8

    return quantize_int8(t(spark, sf_dir, "embeddings"))


@register(
    "p_embed_hygiene",
    oracle="""
    WITH per AS (
      SELECT vec_id,
             len(e) AS dim,
             len(list_filter(e, x -> isnan(x) OR isinf(x))) > 0 AS bad,
             CASE WHEN len(list_filter(e, x -> isnan(x) OR isinf(x))) > 0 THEN NULL
                  ELSE sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
             END AS norm
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    )
    SELECT count(*)                                        AS n_vectors,
           CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
           CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
           CAST(min(dim) AS INT)                           AS dim_lo,
           CAST(max(dim) AS INT)                           AS dim_hi,
           round(min(norm), 4)                             AS norm_min,
           round(avg(norm), 2)                             AS norm_mean,
           round(max(norm), 4)                             AS norm_max
    FROM per
    """,
    doc="Corpus embedding sanity report (non-finite elements, zero "
    "norms, dimension drift, norm distribution) — one map-combined "
    "aggregate; the pre-index check that keeps NaN out of cosine top-k.",
)
def p_embed_hygiene(spark, sf_dir):
    from carbondata_spark.operators.embeddings import embedding_hygiene

    return embedding_hygiene(t(spark, sf_dir, "embeddings"))


# shared winnowing oracle CTEs: per-doc fingerprint SETS (k=3, window=4)
_WINNOW_FPS_CTES = f"""words AS (SELECT doc_id,
                          string_split_regex(trim(lower(text)), '\\s+') AS w
                   FROM documents),
    hs AS (SELECT doc_id,
                  CASE WHEN len(w) >= 3
                       THEN list_transform(range(1, len(w) - 1),
                              j -> CAST({_h32_sql("array_to_string(w[j:j+2], ' ')")} AS BIGINT))
                       ELSE [] END AS h
           FROM words),
    fps AS (SELECT doc_id,
                   CASE WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
                        ELSE list_distinct(list_transform(
                               range(1, greatest(len(h) - 3, 1) + 1),
                               j -> list_min(h[j:j+3])))
                   END AS f
            FROM hs)"""


@register(
    "p_text_winnow",
    oracle=f"""
    WITH {_WINNOW_FPS_CTES}
    SELECT doc_id,
           CAST(len(f) AS INT)                            AS n_fingerprints,
           CAST(list_min(f) AS BIGINT)                    AS fp_min,
           CAST(coalesce(list_aggregate(f, 'sum'), 0) AS BIGINT) AS fp_sum
    FROM fps
    """,
    doc="Winnowing (MOSS) fingerprints: 3-gram rolling hashes, "
    "window-4 sliding minima, distinct — guarantees a shared >=6-token "
    "run yields an identical fingerprint in both documents. Pure in-row "
    "array expressions, zero shuffles (operators/winnow.py).",
)
def p_text_winnow(spark, sf_dir):
    from carbondata_spark.operators.winnow import winnow_fingerprints

    return winnow_fingerprints(t(spark, sf_dir, "documents"), k=3, window=4)


@register(
    "p_winnow_containment",
    oracle=f"""
    WITH {_WINNOW_FPS_CTES},
    r AS (SELECT doc_id, unnest(f) AS fp FROM fps),
    ok AS (SELECT fp FROM r GROUP BY fp HAVING count(*) <= 1000),
    rc AS (SELECT r.doc_id, r.fp FROM r JOIN ok USING (fp)),
    counts AS (SELECT doc_id, count(*) AS c FROM rc GROUP BY 1),
    shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
               FROM rc a JOIN rc b ON a.fp = b.fp AND a.doc_id < b.doc_id
               GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared::DOUBLE / least(ca.c, cb.c), 4) AS containment
    FROM shared
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    """,
    doc="Winnowing containment detection: pairs sharing >=2 fingerprints "
    "scored by shared / min(|fps|) — catches a small document EMBEDDED "
    "in a large one, which Jaccard dedup misses. Frequency-capped "
    "fingerprint equi-join, same scale shape as the shingle join "
    "(operators/winnow.py:containment_pairs).",
)
def p_winnow_containment(spark, sf_dir):
    from carbondata_spark.operators.winnow import containment_pairs

    return containment_pairs(
        t(spark, sf_dir, "documents"), k=3, window=4, min_shared=2, max_fp_freq=1000
    )


@register(
    "p_domain_stats",
    oracle=f"""
    SELECT lang,
           count(*)                                   AS n_docs,
           CAST(sum({_WS_TOKENS}) AS BIGINT)          AS n_tokens,
           round(quantile_cont(n_chars, 0.5), 2)      AS p50_chars,
           round(avg({_WS_TOKENS}), 2)                AS avg_tokens
    FROM documents GROUP BY lang
    """,
    doc="Per-domain corpus report (docs, token mass, exact median "
    "length) — the mixture-planning input for token_budget_mix; one "
    "partial-aggregated shuffle of #domains rows.",
)
def p_domain_stats(spark, sf_dir):
    nt = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        t(spark, sf_dir, "documents")
        .withColumn("_nt", nt)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            r2(F.percentile("n_chars", F.lit(0.5))).alias("p50_chars"),
            r2(F.avg("_nt")).alias("avg_tokens"),
        )
    )


@register(
    "p_tokens_histogram",
    oracle=f"""
    SELECT CAST(length(CAST({_WS_TOKENS} AS VARCHAR)) AS INT) AS bucket,
           count(*)                                           AS n_docs,
           CAST(min({_WS_TOKENS}) AS INT)                     AS nt_lo,
           CAST(max({_WS_TOKENS}) AS INT)                     AS nt_hi
    FROM documents GROUP BY 1
    """,
    doc="Token-count histogram in decimal-digit buckets (bucket = digit "
    "count — exact integer arithmetic on both engines, no log-boundary "
    "float drift); the length-distribution check before chunking.",
)
def p_tokens_histogram(spark, sf_dir):
    nt = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        t(spark, sf_dir, "documents")
        .withColumn("_nt", nt)
        .groupBy(F.length(F.col("_nt").cast("string")).alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("_nt").alias("nt_lo"),
            F.max("_nt").alias("nt_hi"),
        )
    )


@register(
    "p_shard_skew",
    oracle=f"""
    SELECT CAST((({_hex4_sql("md5(CAST(doc_id AS VARCHAR))", 1)}) * 65536
                 + ({_hex4_sql("md5(CAST(doc_id AS VARCHAR))", 5)})) % 8 AS INT) AS shard,
           count(*)                          AS n_docs,
           CAST(sum(n_chars) AS BIGINT)      AS sum_chars
    FROM documents GROUP BY 1
    """,
    doc="Content-addressed shard balance report: docs + char mass per "
    "md5 shard — the skew check before one-file-per-shard writes "
    "(uniform md5 keys keep every shard within sampling noise).",
)
def p_shard_skew(spark, sf_dir):
    from carbondata_spark.operators.chunking import shard_assign

    return (
        shard_assign(t(spark, sf_dir, "documents"), n_shards=8)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


@register(
    "p_dedup_cross_corpus",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_MH_CTE},
    {_MINHASH_BANDS_CTE},
    tag AS (SELECT doc_id, (doc_id % 10) < 8 AS is_ref FROM documents),
    cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
             FROM bands a
             JOIN tag ta ON ta.doc_id = a.doc_id AND NOT ta.is_ref
             JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
             JOIN tag tb ON tb.doc_id = b.doc_id AND tb.is_ref),
    counts AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (SELECT c.new_id, c.ref_id, count(*) AS inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.new_id
              JOIN sh b ON b.doc_id = c.ref_id AND b.s = a.s
              GROUP BY 1, 2),
    j AS (SELECT new_id, ref_id,
                 inter::DOUBLE / (ca.c + cb.c - inter) AS jac
          FROM inter
          JOIN counts ca ON ca.doc_id = new_id
          JOIN counts cb ON cb.doc_id = ref_id
          WHERE inter::DOUBLE / (ca.c + cb.c - inter) >= 0.5)
    SELECT doc_id, ref_id, jaccard FROM (
      SELECT new_id AS doc_id, ref_id, round(jac, 4) AS jaccard,
             row_number() OVER (PARTITION BY new_id
                                ORDER BY jac DESC, ref_id ASC) AS rn
      FROM j) WHERE rn = 1
    """,
    doc="Incremental-ingest dedup: NEW docs (doc_id % 10 >= 8) near-"
    "matched against the REFERENCE corpus via cross-boundary MinHash "
    "band candidates + exact-Jaccard verify; best reference match per "
    "new doc (operators/incremental.py — asymmetric LSH, no ref x ref "
    "work).",
)
def p_dedup_cross_corpus(spark, sf_dir):
    from carbondata_spark.operators.incremental import cross_corpus_near_dups

    return cross_corpus_near_dups(
        t(spark, sf_dir, "documents"),
        is_reference=(F.col("doc_id") % 10) < 8,
        threshold=0.5,
    )
