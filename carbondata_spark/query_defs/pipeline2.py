"""Training-data pipeline queries, part 2: deterministic corpus
sampling / domain mixing / survivor-policy dedup / vocabulary stats /
embedding-based near-dup groups.

Everything selection-related is content-addressed (md5 of a stable key),
never RNG-seeded — the only way a sampling operator can have an exact
cross-engine oracle, and the property a production pipeline wants anyway
(reproducible, auditable subsets). See operators/sampling.py scale notes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from carbondata_spark.queries import register, t
from carbondata_spark.query_defs.pipeline import _hex4_sql

# md5 hex of the stringified doc_id — the shared selection key
_KEY_MD5 = "md5(CAST(doc_id AS VARCHAR))"
# uniform [0,1) from the first 8 hex chars (× 65536 and ÷ 2^32 are exact
# power-of-two double ops, so Spark's conv()-based fraction is
# bit-identical)
_KEY_FRAC = f"(({_hex4_sql(_KEY_MD5, 1)}) * 65536.0 + ({_hex4_sql(_KEY_MD5, 5)})) / 4294967296.0"


@register(
    "p_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE (position(substr({_KEY_MD5}, 1, 1) IN '0123456789abcdef') - 1) < 2
    """,
    doc="Deterministic 2/16 content-addressed sample — zero-shuffle "
    "map-side filter, reproducible across runs and engines.",
)
def p_sample_hash(spark, sf_dir):
    from carbondata_spark.operators.sampling import hash_sample

    return hash_sample(t(spark, sf_dir, "documents"), keep=2).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "p_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY {_KEY_MD5}, doc_id)
               AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 20
    """,
    doc="Stratified sample: 20 docs per language in md5-key order "
    "(deterministic pseudo-random per-stratum fixed-size sample).",
)
def p_sample_stratified(spark, sf_dir):
    from carbondata_spark.operators.sampling import stratified_sample

    return stratified_sample(
        t(spark, sf_dir, "documents"), ["lang"], n_per_stratum=20
    ).select("doc_id", "lang", "sample_rank")


@register(
    "p_dedup_keep_best",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    doc="Exact dedup with a survivor POLICY: keep the highest-quality row "
    "per content hash (ties → lowest doc_id) via a single max_by hash "
    "aggregate — map-side combine, no window (oracle uses the window "
    "formulation; same survivors).",
)
def p_dedup_keep_best(spark, sf_dir):
    from carbondata_spark.operators.sampling import keep_best_dedup

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars", "text")
    return keep_best_dedup(docs).select("doc_id", "lang", "source", "n_chars")


# Domain-mixing budgets (tokens). en/es/zh bind (rate < 1) at every SF,
# de clamps to rate 1 (budget >> corpus), fr is absent → dropped: all
# three code paths are under the oracle.
_MIX_BUDGETS = {"en": 5000, "es": 2000, "zh": 1500, "de": 1_000_000}
_MIX_BUDGET_CASE = (
    "CASE lang WHEN 'en' THEN 5000.0 WHEN 'es' THEN 2000.0 "
    "WHEN 'zh' THEN 1500.0 WHEN 'de' THEN 1000000.0 END"
)


@register(
    "p_mix_token_budget",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             {_KEY_FRAC} AS frac
      FROM documents
    ),
    rates AS (
      SELECT lang,
             least(1.0, {_MIX_BUDGET_CASE} / CAST(sum(n_tokens) AS DOUBLE)) AS rate
      FROM toks GROUP BY lang
    )
    SELECT t.doc_id AS doc_id, t.lang AS lang, t.n_tokens AS n_tokens
    FROM toks t JOIN rates r ON r.lang = t.lang
    WHERE r.rate IS NOT NULL AND t.frac < r.rate
    """,
    doc="Domain mixing to per-language token budgets: rate-based "
    "deterministic thinning (rate = budget/total per domain), map-side "
    "filter after a #domains-row aggregate — no per-domain sequential "
    "cumsum, so one hot domain cannot serialize the job.",
)
def p_mix_token_budget(spark, sf_dir):
    from carbondata_spark.operators.sampling import token_budget_mix

    return token_budget_mix(t(spark, sf_dir, "documents"), _MIX_BUDGETS).select(
        "doc_id", "lang", "n_tokens"
    )


@register(
    "p_text_vocab",
    oracle=r"""
    WITH w AS (SELECT DISTINCT doc_id,
                      unnest(string_split_regex(trim(text), '\s+')) AS word
               FROM documents)
    SELECT word, CAST(count(*) AS BIGINT) AS doc_freq
    FROM w GROUP BY word
    ORDER BY doc_freq DESC, word
    LIMIT 50
    """,
    doc="Corpus vocabulary: top-50 words by document frequency — "
    "array_distinct dedups inside the row (no token shuffle), partial-agg "
    "word counts, TakeOrderedAndProject top-k.",
)
def p_text_vocab(spark, sf_dir):
    from carbondata_spark.operators.text import vocab_topk

    return vocab_topk(t(spark, sf_dir, "documents"), k=50)


@register(
    "p_dedup_embedding_groups",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4) >= 0.4
    ),
    e AS (SELECT id_a AS v, id_b AS u FROM p UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT v, u FROM e
      UNION
      SELECT r.v, e.u FROM reach r JOIN e ON r.u = e.v
    )
    SELECT emb.vec_id AS vec_id,
           CAST(least(emb.vec_id, coalesce(min(r.u), emb.vec_id)) AS BIGINT)
             AS group_id
    FROM embeddings emb LEFT JOIN reach r ON r.v = emb.vec_id
    GROUP BY emb.vec_id
    """,
    doc="Embedding-cosine near-dup GROUPS: IVF-bucketed cosine pairs "
    "(≥ 0.4) closed transitively into components (min-label propagation; "
    "oracle = recursive-CTE reachability over brute-force pairs).",
)
def p_dedup_embedding_groups(spark, sf_dir):
    from carbondata_spark.operators.dedup import near_dup_groups
    from carbondata_spark.operators.similarity import cosine_pairs

    emb = t(spark, sf_dir, "embeddings")
    return near_dup_groups(emb, cosine_pairs(emb, threshold=0.4), id_col="vec_id")
