"""Training-data pipeline tour: the north-star operators chained the way
a pretraining data build would run them, over the synthetic testdata.

    corpus reports -> quality/language gates -> exact + near dedup ->
    common-span boilerplate signal -> temperature mix plan -> token-budget
    mix -> sequence packing -> ANN over the (quantized) embedding corpus

Every step is a DataFrame -> DataFrame transform (lazy until the final
counts), so the same chain runs unchanged on a cluster at full scale —
the collect()s below are display-only.

Run:  python examples/pipeline_tour.py   [sf_dir, default /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from carbondata_spark import get_spark
    from carbondata_spark.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="pipeline_tour")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # -- 1. corpus reports (what am I looking at?) -----------------------
    from carbondata_spark.operators.corpus import common_span_report, ngram_topk
    from carbondata_spark.operators.sampling import temperature_mix_weights

    print("\ntop trigrams (boilerplate/contamination review):")
    for r in ngram_topk(docs, n=3, k=5).collect():
        print(f"  {r.n_occurrences:6d}x in {r.n_docs:4d} docs  {r.ngram!r}")

    print("\ntemperature (alpha=0.5) mix plan per language:")
    for r in temperature_mix_weights(docs).orderBy("domain").collect():
        print(f"  {r.domain}: {r.n_tokens:8d} tokens -> weight {r.weight:.4f}, "
              f"oversample {r.oversample:.3f}x")

    # -- 2. quality + language gates ------------------------------------
    from carbondata_spark.operators.text import with_lang_id, with_quality_score

    gated = with_lang_id(with_quality_score(docs)).filter(
        F.col("quality_score") >= 0.3
    )
    print(f"\nafter quality gate (score >= 0.3): {gated.count()} docs")

    # -- 3. dedup: exact, then near (MinHash-LSH), then span commonality --
    from carbondata_spark.operators.dedup import dedup_exact, minhash_lsh_pairs

    exact = dedup_exact(docs)
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    spans = common_span_report(docs, n=3, min_df=3)
    flagged = spans.filter(F.col("dup_frac") > 0.5)
    print(f"exact-dedup survivors: {exact.count()}")
    print(f"near-dup candidate pairs (LSH, j>=0.5): {pairs.count()}")
    print(f"docs >50% corpus-common trigram spans: {flagged.count()}")

    # -- 4. mix to token budgets, pack into sequences --------------------
    from carbondata_spark.operators.chunking import pack_sequences
    from carbondata_spark.operators.sampling import token_budget_mix

    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    mixed = token_budget_mix(docs, {lang: 2_000 for lang in langs})
    packed = pack_sequences(
        mixed.select("doc_id", "n_tokens"), budget_tokens=512, n_shards=8
    )
    n_bins = packed.select("shard", "bin").distinct().count()
    print(f"mixed to 2k-token/lang budgets: {mixed.count()} docs -> "
          f"{n_bins} packed 512-token sequences across 8 shards")

    # -- 5. ANN over the embedding corpus (exact vs int8 ADC) ------------
    from carbondata_spark.operators.pq import adc_topk
    from carbondata_spark.operators.similarity import cosine_topk

    queries = emb.filter(F.col("vec_id") < 3)
    exact_nn = cosine_topk(emb, queries, k=3)
    adc_nn = adc_topk(emb, queries, k=3)
    agree = exact_nn.alias("e").join(
        adc_nn.alias("a"),
        (F.col("e.query_id") == F.col("a.query_id"))
        & (F.col("e.rank") == F.col("a.rank"))
        & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
    )
    print(f"ANN: top-3 x 3 queries; int8-ADC agrees with exact on "
          f"{agree.count()}/{exact_nn.count()} (4x less corpus memory)")

    # -- 6. the 100 TB serving shape: quantized AND pruned ---------------
    # codes persisted as array<tinyint> hive-partitioned on centroid id;
    # the search dequantizes inside the probed buckets only (DPP prunes
    # the other directories before any code array is decoded)
    import tempfile

    from carbondata_spark.operators.ivf_adc import (
        build_ivf_adc_index,
        search_ivf_adc_index,
    )
    from carbondata_spark.store import CarbonStore

    store = CarbonStore(spark, tempfile.mkdtemp(prefix="carbon_tour_idx_"))
    build_ivf_adc_index(store, "emb", emb, n_centroids=8)
    pruned = search_ivf_adc_index(store, "emb", queries, k=3, nprobe=2)
    print(f"IVF-ADC (nprobe=2/8 buckets read): {pruned.count()} neighbor rows")

    # -- 7. boilerplate span scrubbing ------------------------------------
    from carbondata_spark.operators.corpus import remove_common_spans

    scrubbed = remove_common_spans(docs, n=3, min_df=3)
    stats = scrubbed.agg(
        F.sum("n_removed").alias("rm"), F.sum("n_tokens").alias("tot")
    ).collect()[0]
    print(f"span scrub (3-grams in >=3 docs): removed {stats['rm']}/{stats['tot']} "
          "boilerplate tokens while keeping every document")

    # -- 8. retrieval over the corpus: lexical, vector, hybrid (r14) -----
    from carbondata_spark.operators.bm25 import bm25_topk
    from carbondata_spark.operators.hybrid import rrf_fuse
    from carbondata_spark.operators.similarity import cosine_topk

    lex = bm25_topk(docs, ["vector", "merge", "window"], k=20)
    vec = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse({"lex": lex.select("doc_id", "rank"), "vec": vec}, topk=5)
    print("hybrid retrieval (BM25 + cosine via RRF):")
    for r in fused.collect():
        print(f"  #{r['rank']} doc {r['doc_id']} rrf={r['rrf']} "
              f"(lex {r['lex_rank'] or '-'}, vec {r['vec_rank'] or '-'})")

    # -- 9. corpus versioning: what changed between two snapshots? -------
    from carbondata_spark.operators.diffing import snapshot_diff

    v2 = docs.filter(F.col("doc_id") % 37 != 0)
    diff = snapshot_diff(docs, v2, "doc_id", compare_cols=["text"])
    counts = {r["status"]: r["n"] for r in
              diff.groupBy("status").agg(F.count("*").alias("n")).collect()}
    print(f"snapshot diff vs takedown batch: {counts}")

    # -- 10. multimodal: REAL codec-free decode over a MIXED column -------
    from carbondata_spark.operators.media_codecs import (
        decode_media_dispatch,
        synth_media_mixed,
    )

    media = synth_media_mixed(docs.limit(200))
    decoded = decode_media_dispatch(media)  # PPM/WAV/BMP in ONE pass
    mix = {r["codec"]: r["n"] for r in
           decoded.groupBy("codec").agg(F.count("*").alias("n")).collect()}
    print(f"mixed media decode (magic-byte dispatch in one mapInPandas "
          f"pass): {mix}")

    print("\ndone — every step above is shuffle-bounded and UDF-free "
          "(media decode is Arrow-batched mapInPandas, the one sanctioned "
          "Python hop); swap sf_dir for the full corpus to run the "
          "identical plan at scale.")


if __name__ == "__main__":
    main()
