"""Structured Streaming ingestion into the CarbonStore segment protocol.

The reference has no streaming layer (SURVEY.md §2.9) — its
"near-real-time" story is minute-granularity incremental segment loads
(README.md:17-18). This module is the green-field Spark-native upgrade
that preserves that contract: every micro-batch commits exactly one
segment through the same lock + atomic-manifest path as a batch load, so
batch readers, retention, and compaction work unchanged on streaming
tables, and a crashed stream leaves either a committed segment or
nothing.

At scale: use ``trigger(processingTime=...)`` sized so segments land in
the parquet-friendly 100 MB–1 GB range, and run ``compact`` periodically
to fold micro-batch segments (the classic small-files remedy; the
reference's MERGE serves the same purpose for its minute-loads).

Also provided: event-time windowed aggregation with watermarks — the
streaming counterpart of the OLAP group-bys (and its batch equivalent for
oracle checking, since F.window works identically in batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carbondata_spark.store import CarbonStore


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP: watermarks reject
    TIMESTAMP_NTZ (parquet written with isAdjustedToUTC=false infers NTZ),
    and the cast interprets NTZ in the session timezone (pinned UTC) — so
    batch and stream paths see identical instants."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_load(
    store: CarbonStore,
    table: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """writeStream → one store segment per micro-batch (foreachBatch).

    Exactly-once table contents: each micro-batch commit stamps the
    segment with an ``origin`` tag (stream name + epoch id). When the
    stream dies AFTER the manifest commit but BEFORE the checkpoint
    advances, Structured Streaming replays the epoch — the replay sees an
    already-committed segment with the same origin and skips, so the rows
    appear once. A batch that dies BEFORE the commit leaves only an
    orphan directory that ``clean_files`` removes (the manifest, not the
    filesystem, defines table contents).
    """
    stream_id = query_name or checkpoint_dir

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        origin = {"stream": stream_id, "epoch": epoch_id}
        if store.has_committed_origin(table, origin):
            return  # replayed epoch: segment already committed
        store.load(table, batch_df, origin=origin)

    writer = (
        stream_df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def running_user_stats(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Custom stateful streaming operator: per-user running totals across
    micro-batches via applyInPandasWithState (the Spark-native custom-
    stateful-operator hook; reference has no streaming, SURVEY §2.9 —
    green-field design).

    State: (n_events, sum_value) per user_id, carried across batches.
    Emits one updated row per user per batch. State is partitioned by
    user_id — the shuffle key — so at scale state shards across
    executors and each batch touches only the groups it contains.
    """
    from pyspark.sql.streaming.state import GroupState

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time SESSION windows (``F.session_window``): a session groups
    consecutive events per key whose inter-event gap is ≤ the gap duration
    (an event exactly ``gap`` after its predecessor still merges — window
    extension is inclusive; verified empirically and mirrored by the
    ``> gap`` boundary in the batch/oracle gaps-and-islands form,
    q_sessionize / q_stream_session_window).

    Works identically on a stream (watermark evicts closed-session state;
    state shards on the group key) and on a batch DataFrame — the batch
    form IS the oracle for the streaming path
    (tests/test_streaming.py::test_session_window_streaming_matches_batch).

    Scale: state per key is bounded by the watermark horizon; the shuffle
    keys are the group columns, so sessions for different users build on
    different executors — the Spark-native upgrade of the reference's
    minute-granularity incremental loads (no session concept there;
    green-field per SURVEY §2.9).
    """
    df = _as_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.session_window(ts_col, gap)] + [F.col(c) for c in (group_cols or ["user_id"])]
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling/sliding window aggregation with late-data
    handling; works identically on a stream (with watermark state
    eviction) and on a batch DataFrame (for the DuckDB oracle check —
    see q_stream_window in query_defs)."""
    df = _as_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    keys = [win] + [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: drop rows whose key was already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``) — the
    streaming counterpart of ``dedup_exact`` for at-least-once sources
    (Kafka redeliveries, replayed files).

    State is one entry per key, sharded on the key shuffle, and evicted
    once the watermark passes — bounded memory at any throughput, unlike
    plain ``dropDuplicates`` on a stream which keeps ALL keys forever. On
    a batch DataFrame it degrades to plain dropDuplicates (same result
    set, no state machinery).
    """
    keys = key_cols or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream event-time interval join: each purchase matched to
    every click by the same user in the preceding ``horizon``.

    On streams, both sides carry watermarks and the join condition bounds
    event time on BOTH sides, so Spark can evict join state (clicks older
    than the horizon + watermark can never match again). Shuffle key is
    the user — state shards across executors. On batch DataFrames the
    same condition runs as a plain interval join, which is the oracle for
    the streaming path (q_event_attribution).
    """
    clicks = _as_event_time(clicks, ts_col)
    purchases = _as_event_time(purchases, ts_col)
    c = clicks.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value"
    )
