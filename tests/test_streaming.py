"""Streaming ingestion tests: micro-batches → segments, windowed aggs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carbondata_spark.store import CarbonStore
from carbondata_spark.streaming.ingest import stream_load, windowed_agg


def test_stream_load_commits_segments(spark, tmp_path, sf_dir):
    from carbondata_spark.catalog import load_table

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    sample = load_table(spark, sf_dir, "orders").limit(500)
    # two source files → at least one micro-batch (availableNow may fuse)
    sample.filter(F.col("o_orderkey") % 2 == 0).write.parquet(str(src_dir / "f0"))
    sample.filter(F.col("o_orderkey") % 2 == 1).write.parquet(str(src_dir / "f1"))

    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table("orders_live", sample.schema, sort_columns=["o_orderdate"])

    stream = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    q = stream_load(store, "orders_live", stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    segs = store.show_segments("orders_live")
    assert len(segs) >= 1
    assert store.table("orders_live").count() == 500
    # streamed table is a first-class store table: lifecycle ops apply
    if len(segs) > 1:
        store.compact("orders_live")
        assert store.table("orders_live").count() == 500


def test_windowed_agg_streaming_matches_batch(spark, tmp_path, sf_dir):
    from carbondata_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000).cache()
    src = tmp_path / "ev"
    ev.write.parquet(str(src))

    batch = windowed_agg(ev, window="1 hour", group_cols=["event_type"])
    batch_rows = {
        (r["window"]["start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    agg = windowed_agg(stream, window="1 hour", group_cols=["event_type"])
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["window"]["start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert batch_rows.keys() == stream_rows.keys()
    for k, (n_b, s_b) in batch_rows.items():
        n_s, s_s = stream_rows[k]
        assert n_b == n_s
        assert abs(s_b - s_s) < 1e-9


def test_session_window_streaming_matches_batch(spark, tmp_path, sf_dir):
    """The STREAMING session_window path (watermark + state eviction)
    must produce exactly the batch sessionization over the same events,
    fed one file per micro-batch so sessions span batch boundaries."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.streaming.ingest import sessionized

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50).cache()
    src = tmp_path / "ev_sess"
    # split by time so one user's session can straddle micro-batches
    med = ev.approxQuantile("event_id", [0.5], 0.01)[0]
    ev.filter(F.col("event_id") <= med).write.parquet(str(src / "f0"))
    ev.filter(F.col("event_id") > med).write.parquet(str(src / "f1"))

    batch_rows = {
        (r["user_id"], r["session_window"]["start"]): (r["n_events"], round(r["sum_value"], 6))
        for r in sessionized(ev).collect()
    }

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        sessionized(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["user_id"], r["session_window"]["start"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert batch_rows == stream_rows
    assert len(batch_rows) > 0


def test_stateful_running_stats_across_batches(spark, tmp_path, sf_dir):
    """applyInPandasWithState must carry state across micro-batches: with
    one file per trigger, the final per-user totals equal the batch
    aggregate over all files."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.streaming.ingest import running_user_stats

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20).cache()
    src = tmp_path / "ev_state"
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.write.parquet(str(src / "f0"))
    half2.write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per user = final running total
    final = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM state_out) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == want


def test_stream_replay_does_not_duplicate_segments(spark, tmp_path, sf_dir):
    """Exactly-once table contents: re-running the same stream from a
    FRESH checkpoint (the worst-case replay — every epoch re-fires)
    commits nothing new, because each epoch's (stream, epoch) origin tag
    is already in the manifest."""
    from carbondata_spark.catalog import load_table

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    sample = load_table(spark, sf_dir, "orders").limit(300)
    sample.write.parquet(str(src_dir / "f0"))

    store = CarbonStore(spark, str(tmp_path / "store"))
    store.create_table("orders_eo", sample.schema, sort_columns=["o_orderdate"])

    def run(ckpt: str):
        stream = spark.readStream.schema(sample.schema).parquet(str(src_dir) + "/*")
        q = stream_load(store, "orders_eo", stream, str(tmp_path / ckpt), query_name="eo_stream")
        q.awaitTermination(120)

    run("ckpt1")
    n_segs = len(store.show_segments("orders_eo"))
    assert store.table("orders_eo").count() == 300

    run("ckpt2")  # fresh checkpoint -> same epoch ids replayed
    assert len(store.show_segments("orders_eo")) == n_segs
    assert store.table("orders_eo").count() == 300


def test_stream_dedup_drops_redelivered_rows(spark, tmp_path, sf_dir):
    """dropDuplicatesWithinWatermark on a stream that redelivers every
    row (two identical files) must emit each event_id once — the
    at-least-once-source dedup; batch form = plain dropDuplicates."""
    from carbondata_spark.catalog import load_table
    from carbondata_spark.streaming.ingest import stream_dedup

    ev = load_table(spark, sf_dir, "events").limit(500).cache()
    src = tmp_path / "dup_ev"
    ev.write.parquet(str(src))
    ev.write.mode("append").parquet(str(src))  # redelivery: every row twice

    doubled = spark.read.parquet(str(src))
    assert doubled.count() == 2 * ev.count()
    # batch degradation
    assert stream_dedup(doubled).count() == ev.count()

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    deduped = stream_dedup(stream, watermark="10 years")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_out").collect()[0]
    assert got.c == ev.count() and got.d == ev.count()
