"""Training-data pipeline queries, part 5 (round 10): corpus n-gram
reports, temperature mixing, quantized ANN search, and the streaming
dedup surface.

Same oracle conventions as pipeline/pipeline2/pipeline3/pipeline4:
every computed column aliased identically on both sides, dround for
every rounded double, aggregate casts pinned to BIGINT/INT, top-k
tie-breaks deterministic (count/score desc, then key asc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.queries import register, t

# shared words CTE (same split convention as pipeline._SHINGLES_CTE)
_WORDS_CTE = r"""
words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)
"""


@register(
    "p_ngram_topk",
    oracle=f"""
    WITH {_WORDS_CTE},
    occ AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
            FROM words, unnest(range(1, len(w) - 1)) AS t(i))
    SELECT s AS ngram,
           count(*)                              AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM occ GROUP BY s
    ORDER BY n_occurrences DESC, ngram
    LIMIT 50
    """,
    doc="Top-50 word trigrams by total occurrence count (boilerplate / "
    "decontamination review input) — one explode, partial-agg counts, "
    "TakeOrderedAndProject top-k; no sort of the ngram universe.",
)
def p_ngram_topk(spark, sf_dir):
    from carbondata_spark.operators.corpus import ngram_topk

    return ngram_topk(t(spark, sf_dir, "documents"), n=3, k=50)


@register(
    "p_dedup_span_commonality",
    oracle=f"""
    WITH {_WORDS_CTE},
    sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
           FROM words, unnest(range(1, len(w) - 1)) AS t(i)),
    dfq AS (SELECT s, count(*) AS d FROM sh GROUP BY s),
    per AS (SELECT doc_id,
                   CAST(count(*) AS INT) AS n_spans,
                   CAST(sum(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS INT) AS n_common
            FROM sh JOIN dfq USING (s) GROUP BY doc_id)
    SELECT doc.doc_id AS doc_id,
           coalesce(n_spans, 0)  AS n_spans,
           coalesce(n_common, 0) AS n_common,
           CASE WHEN coalesce(n_spans, 0) = 0 THEN 0.0
                ELSE round(n_common * 1.0 / n_spans, 4) END AS dup_frac
    FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id
    """,
    doc="Per-document corpus-common span fraction (trigram df >= 3) — "
    "the Gopher/RefinedWeb duplicated-text-fraction quality signal; "
    "explode + hash-agg + small-set join, no pairwise work.",
)
def p_dedup_span_commonality(spark, sf_dir):
    from carbondata_spark.operators.corpus import common_span_report

    return common_span_report(t(spark, sf_dir, "documents"), n=3, min_df=3)


@register(
    "p_mix_temperature",
    oracle=r"""
    WITH toks AS (SELECT lang AS domain,
                         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
                  FROM documents),
    totals AS (SELECT domain, CAST(sum(nt) AS BIGINT) AS n_tokens
               FROM toks GROUP BY domain)
    SELECT domain,
           n_tokens,
           round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER (), 6) AS weight,
           round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER ()
                 * sum(CAST(n_tokens AS DOUBLE)) OVER () / n_tokens, 4) AS oversample
    FROM totals
    """,
    doc="Temperature-scaled (alpha = 0.5, sqrt-exact) domain mixing "
    "weights + oversample factors — the mixture plan token_budget_mix "
    "executes; #domains-row aggregate, trivially small at any scale.",
)
def p_mix_temperature(spark, sf_dir):
    from carbondata_spark.operators.sampling import temperature_mix_weights

    return temperature_mix_weights(t(spark, sf_dir, "documents"))


@register(
    "p_sim_adc_topk",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS sc
          FROM v),
    d AS (SELECT vec_id,
                 CASE WHEN sc = 0 THEN list_transform(e, x -> 0.0)
                      ELSE list_transform(e, x -> floor(x / sc + 0.5) * sc)
                 END AS de
          FROM s),
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 5),
    scored AS (SELECT query_id, d.vec_id AS neighbor_id,
                      round(list_cosine_similarity(qv, de), 6) AS cos
               FROM q JOIN d ON d.vec_id != query_id)
    SELECT query_id, neighbor_id, cos AS cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="ADC top-10 over the int8-quantized corpus (full-precision "
    "queries, dequantized candidates — the 4x-memory serving trade); "
    "same broadcast + window plan as the exact baseline.",
)
def p_sim_adc_topk(spark, sf_dir):
    from carbondata_spark.operators.pq import adc_topk

    emb = t(spark, sf_dir, "embeddings")
    return adc_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n_unique_slots
    FROM (SELECT DISTINCT user_id, event_type,
                 date_trunc('minute', CAST(ts AS TIMESTAMP)) AS slot
          FROM events)
    GROUP BY event_type
    """,
    doc="Streaming exact dedup surface (dropDuplicatesWithinWatermark; "
    "batch degradation = dropDuplicates): unique (user, type, minute) "
    "slots per event type — at-least-once ingestion hygiene.",
)
def q_stream_dedup(spark, sf_dir):
    from carbondata_spark.streaming.ingest import stream_dedup

    ev = t(spark, sf_dir, "events").withColumn(
        "slot", F.date_trunc("minute", F.col("ts"))
    )
    dd = stream_dedup(ev, key_cols=["user_id", "event_type", "slot"])
    return dd.groupBy("event_type").agg(F.count("*").alias("n_unique_slots"))
