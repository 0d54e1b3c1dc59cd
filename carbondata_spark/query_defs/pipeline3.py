"""Training-data pipeline queries, part 3: document chunking, repetition
scoring, benchmark decontamination, output sharding, thresholded kNN.

These complete the pre-training data-prep story: chunk documents to a
token budget, score boilerplate repetition, strip train/test overlap
against a held-out eval split, shard the output deterministically, and
link each vector to its nearest neighbors. All selection/routing is
content-addressed (md5) so every operator has an exact cross-engine
oracle and re-runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.functions import dround
from carbondata_spark.queries import register, t
from carbondata_spark.query_defs.pipeline import _hex4_sql

_KEY_MD5 = "md5(CAST(doc_id AS VARCHAR))"
_KEY_U32 = f"(({_hex4_sql(_KEY_MD5, 1)}) * 65536 + ({_hex4_sql(_KEY_MD5, 5)}))"


@register(
    "p_doc_chunk",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents),
    c AS (SELECT doc_id, w,
                 unnest(range(0, CAST(greatest(ceil(len(w) / 32.0), 1) AS INT)))
                   AS chunk_id
          FROM w)
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(w[chunk_id * 32 + 1 : chunk_id * 32 + 32]) AS INT) AS n_tokens,
           array_to_string(w[chunk_id * 32 + 1 : chunk_id * 32 + 32], ' ')
             AS chunk_text
    FROM c
    """,
    doc="Token-budget document chunking (≤32 whitespace tokens per chunk, "
    "order-preserving): pure in-row sequence/slice/explode — zero shuffle.",
)
def p_doc_chunk(spark, sf_dir):
    from carbondata_spark.operators.chunking import chunk_documents

    return chunk_documents(t(spark, sf_dir, "documents"), max_tokens=32)


@register(
    "p_text_repetition",
    oracle=r"""
    WITH b AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents),
    g AS (SELECT doc_id, len(w) AS nw,
                 list_transform(range(1, len(w) - 1),
                                i -> array_to_string(w[i:i+2], ' ')) AS grams
          FROM b)
    SELECT doc_id,
           round(CASE WHEN nw < 3 THEN 0.0
                      ELSE (len(grams) - len(list_distinct(grams)))
                           / CAST(len(grams) AS DOUBLE) END, 4) AS rep_ngram_frac,
           CAST(greatest(nw - 2, 0) AS INT) AS n_ngrams
    FROM g
    """,
    doc="Within-document repeated-trigram fraction (Gopher-style "
    "boilerplate signal) — in-row array expressions, zero shuffle.",
)
def p_text_repetition(spark, sf_dir):
    from carbondata_spark.operators.text import with_repetition

    return with_repetition(t(spark, sf_dir, "documents")).select(
        "doc_id", "rep_ngram_frac", "n_ngrams"
    )


@register(
    "p_decontaminate",
    oracle=rf"""
    WITH words AS (SELECT doc_id, substr({_KEY_MD5}, 1, 1) AS hd,
                          string_split_regex(trim(text), '\s+') AS w
                   FROM documents),
    sh AS (SELECT DISTINCT doc_id, hd, array_to_string(w[i:i+4], ' ') AS s
           FROM words, unnest(range(1, len(w) - 3)) AS t(i)),
    ev AS (SELECT DISTINCT s FROM sh WHERE hd = '0'),
    co AS (SELECT doc_id, s FROM sh WHERE hd <> '0')
    SELECT co.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM co JOIN ev USING (s)
    GROUP BY co.doc_id
    """,
    doc="Benchmark decontamination: corpus docs sharing any 5-gram with "
    "the held-out eval split (md5 digit 0 ≈ 1/16 of docs), with shared-"
    "shingle counts. Inverted-index join on the shingle string; eval side "
    "reduced to distinct shingles so multiplicity is 1.",
)
def p_decontaminate(spark, sf_dir):
    from carbondata_spark.operators.dedup import decontaminate

    docs = t(spark, sf_dir, "documents")
    hd = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return decontaminate(docs.filter(hd != "0"), docs.filter(hd == "0"), n=5)


@register(
    "p_shard_assign",
    oracle=rf"""
    WITH s AS (SELECT doc_id, n_chars,
                      CAST({_KEY_U32} % 8 AS INT) AS shard
               FROM documents)
    SELECT shard,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM s GROUP BY shard
    """,
    doc="Deterministic output sharding (md5-mod-8, content-addressed so "
    "re-runs route identically) + per-shard balance stats — the write-"
    "fanout stage of a training-data export.",
)
def p_shard_assign(spark, sf_dir):
    from carbondata_spark.operators.chunking import shard_assign

    s = shard_assign(t(spark, sf_dir, "documents"), n_shards=8)
    return s.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "p_sim_knn",
    oracle="""
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 4) AS cosine,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                     b.embedding::DOUBLE[]), 4)
                          DESC, b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4) >= 0.4
    ) WHERE rank <= 3
    """,
    doc="Thresholded kNN self-join: top-3 neighbors per vector among "
    "cosine ≥ 0.4, via losslessly-pruned IVF-bucketed candidate pairs "
    "(oracle = brute force + window).",
)
def p_sim_knn(spark, sf_dir):
    from carbondata_spark.operators.similarity import knn_pairs

    return knn_pairs(t(spark, sf_dir, "embeddings"), k=3, threshold=0.4)


@register(
    "p_text_entropy",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ),
    c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                   / CAST(sum(c) AS DOUBLE), 4) AS entropy
    FROM c GROUP BY doc_id
    """,
    headline=False,
    doc="Word-distribution Shannon entropy per document "
    "(operators/text.py:with_entropy): ln(n) - sum(c*ln(c))/n over "
    "per-word counts — the distributional quality signal next to the "
    "n-gram repetition score. Oracle recomputes the same formula in "
    "DuckDB; per-doc term counts are small so the float sum is "
    "margin-safe (audited by tools/margin_audit.py).",
)
def p_text_entropy(spark, sf_dir):
    from carbondata_spark.operators.text import with_entropy

    out = with_entropy(t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_words", dround(F.col("entropy"), 4).alias("entropy")
    )


@register(
    "p_text_pii",
    oracle=r"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_email,
           CAST(sum(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))) AS BIGINT) AS n_phone,
           CAST(sum(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS n_ipv4,
           CAST(sum(CASE WHEN regexp_replace(
                  regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g') <> text
                THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted
    FROM documents GROUP BY source
    """,
    doc="PII scrub parity per source (operators/text.py:pii_scrub): "
    "RE2-portable email/phone/ipv4 patterns counted and redacted in both "
    "engines — a diverging regex dialect, count, or replacement breaks "
    "the hash (planted-PII behavior unit-tested in test_operators.py; "
    "this row pins cross-engine pattern semantics on the real corpus). "
    "Pure map expressions: zero shuffle before the per-source rollup.",
)
def p_text_pii(spark, sf_dir):
    from carbondata_spark.operators.text import pii_scrub

    s = pii_scrub(t(spark, sf_dir, "documents"))
    return s.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_email").alias("n_email"),
        F.sum("n_phone").alias("n_phone"),
        F.sum("n_ipv4").alias("n_ipv4"),
        F.sum((F.col("text_redacted") != F.col("text")).cast("int")).alias("n_redacted"),
    )


@register(
    "p_quality_percentile_cut",
    oracle="""
    WITH thresh AS (
      SELECT quantile_cont(n_chars, 0.25) AS t FROM documents
    )
    SELECT source,
           count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents, thresh
    WHERE n_chars >= t
    GROUP BY source
    """,
    doc="Percentile-threshold quality cut: keep documents at or above the "
    "corpus 25th-percentile length — the standard 'drop the shortest "
    "quartile' pre-training filter, with the threshold computed from the "
    "data (not hardcoded). Spark plan: exact percentile() aggregate to a "
    "1-row frame, broadcast cross join, filtered scan — percentile "
    "state is a count-map over distinct lengths (bounded), never a "
    "global sort; the corpus side streams.",
)
def p_quality_percentile_cut(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    thresh = docs.agg(F.expr("percentile(n_chars, 0.25)").alias("t"))
    return (
        docs.crossJoin(F.broadcast(thresh))
        .filter(F.col("n_chars") >= F.col("t"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@register(
    "p_text_unigram_nll",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    corpus AS (SELECT w, sum(c) AS cw FROM tf GROUP BY w),
    tot AS (SELECT sum(cw) AS total FROM corpus)
    SELECT tf.doc_id,
           CAST(sum(tf.c) AS BIGINT) AS n_tokens,
           round(sum(CAST(tf.c AS DOUBLE)
                     * -ln(CAST(corpus.cw AS DOUBLE) / CAST(tot.total AS DOUBLE)))
                 / CAST(sum(tf.c) AS DOUBLE), 4) AS nll
    FROM tf JOIN corpus USING (w), tot
    GROUP BY tf.doc_id
    """,
    doc="Unigram perplexity proxy (operators/text.py:with_unigram_nll): "
    "per-document corpus-unigram negative log-likelihood — the "
    "quality-filter signal between rule scores and a real LM. Oracle "
    "recomputes the distribution in DuckDB; per-doc sums are small so "
    "the float accumulation is margin-safe (audited).",
)
def p_text_unigram_nll(spark, sf_dir):
    from carbondata_spark.operators.text import with_unigram_nll

    out = with_unigram_nll(t(spark, sf_dir, "documents"))
    return out.select("doc_id", "n_tokens", dround(F.col("nll"), 4).alias("nll"))


@register(
    "p_pack_sequences",
    oracle=f"""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             CAST({_KEY_U32} % 8 AS INT) AS shard
      FROM documents
    ),
    packed AS (
      SELECT shard, doc_id, n_chars,
             CAST(floor((sum(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_chars) / 2048.0) AS INT) AS bin
      FROM sharded
    )
    SELECT shard, bin,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM packed GROUP BY shard, bin
    """,
    doc="Deterministic sequence packing (operators/chunking.py:"
    "pack_sequences): per content-addressed shard, id-ordered running "
    "char totals split into 2048-char bins (bin = floor((cumsum-n)/L)) — "
    "the reproducible write-side packing step before training "
    "serialization. One window cumsum per shard; shards are the "
    "parallelism unit. Oracle replays the identical cumsum in DuckDB.",
)
def p_pack_sequences(spark, sf_dir):
    from carbondata_spark.operators.chunking import pack_sequences

    packed = pack_sequences(
        t(spark, sf_dir, "documents"), budget_tokens=2048, n_shards=8,
        token_col="n_chars",
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "p_quality_deciles",
    oracle="""
    WITH scored AS (
      SELECT source, n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT decile,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM scored GROUP BY decile
    """,
    doc="Quality-decile bucketing, exact ntile(10) semantics "
    "(deterministic total order: score then id) — the bucketing step of "
    "curriculum/quality mixing. Computed via the DISTRIBUTED rank "
    "(operators/ranking.py: range shuffle + parallel in-partition "
    "sorts + tiny offset cumsum), not a global window — the r4 "
    "scale-killer (single-partition ntile sort) is gone; the oracle "
    "still pins bit-identical ntile semantics. "
    "p_quality_percentile_cut remains the cheaper one-threshold form.",
)
def p_quality_deciles(spark, sf_dir):
    from carbondata_spark.operators.ranking import with_global_ntile

    docs = t(spark, sf_dir, "documents")
    scored = with_global_ntile(
        docs, ["n_chars", "doc_id"], 10, bucket_col="decile"
    )
    return scored.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
