"""Round-10 operator additions: corpus n-gram reports
(operators/corpus.py), temperature mixing weights (operators/sampling.py),
ADC search over the int8-quantized corpus (operators/pq.py), and the
streaming-dedup registry surface. Edge cases the sf-corpus oracle rows
cannot reach: sub-n-gram documents, single-domain mixes, quantization
round-trip identity, the ADC-vs-exact rank agreement, and the streaming
side of stream_dedup (the registry row only exercises the batch
degradation)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# corpus.ngram_topk
# ---------------------------------------------------------------------------


def test_ngram_topk_counts_and_order(spark):
    from carbondata_spark.operators.corpus import ngram_topk

    df = _docs(
        spark,
        [
            (1, "a b c a b c"),       # "a b c" x2, "b c a" x1, "c a b" x1
            (2, "a b c"),             # "a b c" x1
            (3, "x y"),               # shorter than n=3: no trigrams
        ],
    )
    out = {r.ngram: (r.n_occurrences, r.n_docs) for r in ngram_topk(df, n=3, k=10).collect()}
    assert out["a b c"] == (3, 2)
    assert out["b c a"] == (1, 1)
    assert out["c a b"] == (1, 1)
    assert len(out) == 3  # doc 3 contributes nothing, and nothing crashes
    # deterministic order: count desc then ngram asc
    ordered = [r.ngram for r in ngram_topk(df, n=3, k=10).collect()]
    assert ordered == ["a b c", "b c a", "c a b"]


def test_ngram_topk_is_topk_not_global_sort(spark, sf_dir):
    from carbondata_spark.operators.corpus import ngram_topk
    from carbondata_spark.queries import t

    plan = (
        ngram_topk(t(spark, sf_dir, "documents"), n=3, k=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k, no full sort of the ngram universe


# ---------------------------------------------------------------------------
# corpus.common_span_report
# ---------------------------------------------------------------------------


def test_common_span_report_fractions(spark):
    from carbondata_spark.operators.corpus import common_span_report

    # "a b c" occurs in all 3 long docs (df=3 >= min_df=3); every other
    # trigram is unique to its doc. doc 4 is too short for any trigram.
    df = _docs(
        spark,
        [
            (1, "a b c p q r"),  # spans: "a b c","b c p","c p q","p q r" -> 1/4 common
            (2, "a b c s t u"),
            (3, "a b c v w x"),
            (4, "a b"),
        ],
    )
    out = {r.doc_id: r for r in common_span_report(df, n=3, min_df=3).collect()}
    assert len(out) == 4  # short doc present, not dropped by the explode
    assert out[4].n_spans == 0 and out[4].n_common == 0 and out[4].dup_frac == 0.0
    for d in (1, 2, 3):
        assert out[d].n_spans == 4
        assert out[d].n_common == 1
        assert out[d].dup_frac == 0.25
    # repeated span inside ONE doc counts once (distinct spans per doc):
    # "a b c a b c" -> occurrences [a b c, b c a, c a b, a b c] -> 3 distinct
    solo = _docs(spark, [(1, "a b c a b c"), (2, "a b c"), (3, "a b c")])
    r1 = {r.doc_id: r for r in common_span_report(solo, n=3, min_df=3).collect()}[1]
    assert r1.n_spans == 3
    assert r1.n_common == 1  # only "a b c" reaches df=3


# ---------------------------------------------------------------------------
# sampling.temperature_mix_weights
# ---------------------------------------------------------------------------


def test_temperature_weights_math(spark):
    from carbondata_spark.operators.sampling import temperature_mix_weights

    df = spark.createDataFrame(
        [(1, "en", "w " * 900), (2, "fr", "w " * 100)],
        "doc_id long, lang string, text string",
    ).select("doc_id", "lang", F.trim(F.col("text")).alias("text"))
    out = {r.domain: r for r in temperature_mix_weights(df).collect()}
    assert out["en"].n_tokens == 900 and out["fr"].n_tokens == 100
    # sqrt temperature: 30 / (30 + 10) = 0.75, 10 / 40 = 0.25
    assert out["en"].weight == 0.75 and out["fr"].weight == 0.25
    # oversample: weight * total / n  ->  en 0.75*1000/900, fr 0.25*1000/100
    assert out["en"].oversample == round(0.75 * 1000 / 900, 4)
    assert out["fr"].oversample == 2.5  # tail domain repeated 2.5 epochs
    # weights always sum to 1 (single domain: degenerate mix)
    one = temperature_mix_weights(df.filter(F.col("lang") == "en")).collect()
    assert len(one) == 1 and one[0].weight == 1.0 and one[0].oversample == 1.0


# ---------------------------------------------------------------------------
# pq.adc_topk
# ---------------------------------------------------------------------------


def test_dequantized_int8_round_trip(spark):
    from carbondata_spark.operators.pq import dequantized_int8

    df = spark.createDataFrame(
        [(1, [127.0, -63.5, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r.vec_id: r.d
        for r in df.select("vec_id", dequantized_int8(F.col("embedding")).alias("d")).collect()
    }
    # scale = 1.0; -63.5 rounds half-up (floor(-63.5 + 0.5) = -63)
    assert rows[1] == [127.0, -63.0, 0.0]
    assert rows[2] == [0.0, 0.0, 0.0]  # zero vector round-trips to zero


def test_adc_topk_agrees_with_exact_on_sf(spark, sf_dir):
    from carbondata_spark.operators.pq import adc_topk
    from carbondata_spark.operators.similarity import cosine_topk
    from carbondata_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {(r.query_id, r.rank): r for r in cosine_topk(emb, q, k=5).collect()}
    adc = {(r.query_id, r.rank): r for r in adc_topk(emb, q, k=5).collect()}
    assert set(adc) == set(exact)
    agree = sum(
        1 for key in exact if adc[key].neighbor_id == exact[key].neighbor_id
    )
    # int8 quantization noise is ~1e-3 on cosines; on well-separated
    # neighbors the ranking survives — require near-total agreement and
    # pin the cosine error bound everywhere
    assert agree >= len(exact) - 2, f"only {agree}/{len(exact)} ranks agree"
    for key, r in adc.items():
        exact_match = [
            e for e in exact.values()
            if e.query_id == r.query_id and e.neighbor_id == r.neighbor_id
        ]
        if exact_match:
            assert abs(r.cosine - exact_match[0].cosine) < 5e-3


def test_adc_topk_plan_broadcasts_queries(spark, sf_dir):
    from carbondata_spark.operators.pq import adc_topk
    from carbondata_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    plan = (
        adc_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # queries side broadcast; the corpus scan itself never shuffles
    # (the only Exchange is the per-query window's hash partitioning)
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# streaming dedup (the registry row covers the batch degradation; this
# covers the STREAMING path end-to-end with a rate-limited replay)
# ---------------------------------------------------------------------------


def test_stream_dedup_streaming_path(spark, tmp_path):
    from carbondata_spark.streaming.ingest import stream_dedup

    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 00:00:10", 7, "click"),
        (2, "2024-01-01 00:00:40", 7, "click"),   # same (user,type,minute) -> dup
        (3, "2024-01-01 00:01:10", 7, "click"),   # next minute -> kept
        (4, "2024-01-01 00:00:20", 8, "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string")
    df.select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type").write.mode(
        "overwrite"
    ).parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .parquet(src)
        .withColumn("slot", F.date_trunc("minute", F.col("ts")))
    )
    dd = stream_dedup(stream, key_cols=["user_id", "event_type", "slot"])
    q = (
        dd.writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = spark.sql(
        "SELECT user_id, event_type, slot FROM t_stream_dedup ORDER BY user_id, slot"
    ).collect()
    assert [(r.user_id, r.event_type) for r in got] == [(7, "click"), (7, "click"), (8, "view")]
    slots = {str(r.slot) for r in got if r.user_id == 7}
    assert len(slots) == 2  # the two distinct minutes survived, the replay died


# ---------------------------------------------------------------------------
# lifecycle_q: the maintenance-cycle registry row leaves the store in the
# state the docstring claims (one compacted survivor, deleted load GC'd)
# ---------------------------------------------------------------------------


def test_lifecycle_compacted_store_state(spark, sf_dir):
    from carbondata_spark.query_defs.lifecycle_q import _compacted_store

    store = _compacted_store(spark, sf_dir)
    segs = store.show_segments("orders_l")
    # clean_files GC'd the deleted load AND the compacted inputs: the
    # manifest lists exactly the one surviving merged segment
    assert [(s["segment_id"], s["status"]) for s in segs] == [(3, "Success")], segs
    # zone-map survives the merge (sort_columns=[o_orderkey])
    assert "o_orderkey" in segs[0]["stats"]
    # row conservation: compacted table == the two surviving loads
    from carbondata_spark.queries import t
    from pyspark.sql import functions as F

    expect = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 != 1).count()
    assert store.table("orders_l").count() == expect


def test_salted_join_spreads_hot_key(spark):
    from carbondata_spark.functions import salted_join

    big = spark.range(0, 10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    )  # one pathological key
    small = spark.createDataFrame([(1, "hot")], "k int, name string")
    out = salted_join(big, small, on=["k"], n_salts=8)
    assert out.count() == 10_000  # replication x filter is lossless
    # the join key actually includes the salt (8-way spread), visible in
    # the physical plan's join condition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_round10_ops_prune_scan_columns(spark, sf_dir):
    """The registry forms of the round-10 operators must push column
    pruning into the parquet scan (same contract as the round-9 pin in
    test_new_pipeline_ops.py)."""
    from carbondata_spark.queries import registry

    spark.catalog.clearCache()
    reg = registry()
    cases = {
        "p_ngram_topk": ("documents", {"doc_id", "text"}),
        "p_dedup_span_commonality": ("documents", {"doc_id", "text"}),
        "p_mix_temperature": ("documents", {"lang", "text"}),
        "p_sim_adc_topk": ("embeddings", {"vec_id", "embedding"}),
        "q_stream_dedup": ("events", {"user_id", "event_type", "ts"}),
        "q_skew_salted_join": ("lineitem", {"l_suppkey", "l_quantity"}),
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
