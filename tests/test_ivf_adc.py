"""IVF + ADC composed (operators/ivf_adc.py): int8-coded index storage,
bit-identity with pq's quantization, rank agreement with adc_topk at
probe-all, and the DPP / no-corpus-shuffle plan shape at nprobe < k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from carbondata_spark.store import CarbonStore


@pytest.fixture(scope="module")
def adc_store(spark, sf_dir, tmp_path_factory):
    """One built index shared by the read-only tests below."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.operators.ivf_adc import build_ivf_adc_index

    emb = load_table(spark, sf_dir, "embeddings")
    store = CarbonStore(spark, str(tmp_path_factory.mktemp("adcidx") / "store"))
    build_ivf_adc_index(store, "idx", emb, n_centroids=8)
    return store, emb


def test_codes_table_schema_is_int8(adc_store):
    """The entire point is 8x narrower storage: code must persist as
    array<tinyint> (1 byte/element vs the float index's 8), one double
    scale per vector, partitioned on cid."""
    store, _ = adc_store
    codes = store.table("idx_codes")
    schema = {f.name: f.dataType for f in codes.schema.fields}
    assert schema["code"] == T.ArrayType(T.ByteType(), True) or schema[
        "code"
    ] == T.ArrayType(T.ByteType(), False), schema["code"]
    assert isinstance(schema["scale"], T.DoubleType)
    assert set(schema) == {"vid", "code", "scale", "cid"}
    # codes in the int8 envelope, no wraparound
    stats = codes.select(
        F.min(F.array_min("code")).alias("lo"), F.max(F.array_max("code")).alias("hi")
    ).collect()[0]
    assert -127 <= stats["lo"] and stats["hi"] <= 127


def test_dequantize_matches_pq_roundtrip(adc_store, spark, sf_dir):
    """Stored-code dequantization must be BIT-identical to
    pq.dequantized_int8 over the original vectors — the contract that
    makes probe-all search row-identical to adc_topk."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.operators.ivf_adc import dequantize
    from carbondata_spark.operators.pq import dequantized_int8

    store, _ = adc_store
    emb = load_table(spark, sf_dir, "embeddings")
    stored = {
        r["vid"]: r["dv"]
        for r in store.table("idx_codes")
        .select("vid", dequantize(F.col("code"), F.col("scale")).alias("dv"))
        .collect()
    }
    direct = {
        r["vec_id"]: r["dv"]
        for r in emb.select(
            "vec_id", dequantized_int8(F.col("embedding")).alias("dv")
        ).collect()
    }
    assert set(stored) == set(direct)
    for vid, dv in direct.items():
        assert stored[vid] == dv, f"vid {vid}: stored {stored[vid][:4]} != {dv[:4]}"


def test_probe_all_search_equals_adc_topk(adc_store):
    """nprobe >= n_centroids makes the bucketed search exhaustive: every
    row (query_id, neighbor_id, cosine, rank) must equal pq.adc_topk's
    over the same corpus — rank agreement between the two ADC surfaces,
    as the r10 verdict's composition note requires."""
    from carbondata_spark.operators.ivf_adc import search_ivf_adc_index
    from carbondata_spark.operators.pq import adc_topk

    store, emb = adc_store
    queries = emb.filter(F.col("vec_id") < 8)
    got = search_ivf_adc_index(store, "idx", queries, k=7, nprobe=8, decimals=6)
    want = adc_topk(emb, queries, k=7)
    gs = sorted(map(tuple, got.collect()))
    ws = sorted(map(tuple, want.collect()))
    assert gs == ws


def test_adc_search_prunes_bucket_directories(adc_store):
    """nprobe < n_centroids: the probed-cid restriction must reach the
    codes scan as DYNAMIC partition pruning (the dequantize projection
    sits above the scan and must not break PartitionFilters), cid never
    degrades to a row-level DataFilter, and k rows come back per query."""
    import re

    from carbondata_spark.operators.ivf_adc import search_ivf_adc_index

    store, emb = adc_store
    queries = emb.filter(F.col("vec_id") < 3)
    out = search_ivf_adc_index(store, "idx", queries, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"PartitionFilters: \[[^\]]*dynamicpruningexpression\(cid", plan
    ), plan
    assert not re.search(r"DataFilters: \[[^\]]*cid", plan), plan
    counts = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {0, 1, 2} and all(v == 5 for v in counts.values())


def test_adc_shuffle_probe_join_same_results_no_broadcast(adc_store):
    """probe_join='shuffle' (million-query batches): identical rows, no
    static broadcast hint on the probe set — same contract as the float
    index, inherited through the shared _topk_over_buckets engine."""
    from carbondata_spark.operators.ivf_adc import search_ivf_adc_index

    store, emb = adc_store
    queries = emb.filter(F.col("vec_id") < 5)
    bcast = search_ivf_adc_index(store, "idx", queries, k=5, nprobe=3, decimals=6)
    shuf = search_ivf_adc_index(
        store, "idx", queries, k=5, nprobe=3, decimals=6, probe_join="shuffle"
    )
    assert sorted(map(tuple, bcast.collect())) == sorted(map(tuple, shuf.collect()))
    n_b = bcast._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    n_s = shuf._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    assert (n_b, n_s) == (2, 1), (n_b, n_s)

    with pytest.raises(ValueError, match="probe_join"):
        search_ivf_adc_index(store, "idx", queries, probe_join="nope")


def test_incremental_build_covers_corpus_exactly(spark, sf_dir, tmp_path):
    """loads=3 over an odd-sized corpus: segment ingest + compaction must
    leave every vector coded exactly once, and probe-all search through
    the compacted index equals adc_topk row-for-row."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.operators.ivf_adc import (
        build_ivf_adc_index,
        search_ivf_adc_index,
    )
    from carbondata_spark.operators.pq import adc_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 101)
    n = emb.count()
    assert n % 3 != 0  # uneven slices, same property the float test pins
    store = CarbonStore(spark, str(tmp_path / "store"))
    build_ivf_adc_index(store, "idx", emb, n_centroids=4, loads=3)

    valid = store.valid_segments("idx_codes")
    assert [e.segment_id for e in valid] == [3]
    codes = store.table("idx_codes")
    assert codes.count() == n
    assert codes.select("vid").distinct().count() == n

    queries = emb.filter(F.col("vec_id") % 25 == 0)
    got = search_ivf_adc_index(store, "idx", queries, k=4, nprobe=4, decimals=6)
    want = adc_topk(emb, queries, k=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_zero_vector_roundtrips_to_zero(spark, tmp_path):
    """The scale==0 guard: a zero vector must encode to all-zero codes
    with scale 0.0 and dequantize to zeros (not NaN), matching
    pq.dequantized_int8's zero branch."""
    from carbondata_spark.operators.ivf_adc import dequantize, int8_codes, int8_scale

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        "vec_id",
        int8_scale(F.col("embedding")).alias("scale"),
        int8_codes(F.col("embedding"), int8_scale(F.col("embedding"))).alias("code"),
    ).withColumn("dv", dequantize(F.col("code"), F.col("scale")))
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[0]["scale"] == 0.0
    assert rows[0]["code"] == [0, 0, 0]
    assert rows[0]["dv"] == [0.0, 0.0, 0.0]
    assert rows[1]["code"] == [64, -127, 32]  # scale = 2/127
