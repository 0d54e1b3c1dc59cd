"""Structured Streaming → MERGE INTO: continuous CDC upsert into a store
table.

streaming/ingest.stream_load appends one segment per micro-batch — the
right shape for immutable event logs. Mutable state (user profiles,
document metadata, dedup-survivor registries) instead needs each
micro-batch UPSERTED: that is foreachBatch → store.merge_rows, the
Spark-native analogue of the "streaming table + auto-compaction" story
later Apache CarbonData versions grew (the reference era predates both
streaming and MERGE; see store.merge_rows for the CDC rationale).

Semantics: micro-batches apply in checkpoint order within a stream;
merge_rows' duplicate-source-key guard forces each batch to carry at
most one row per key (pre-aggregate in ``transform``), so a batch is an
atomic, unambiguous upsert — the manifest swap commits it all-or-
nothing, and a crash between merge and checkpoint replays the batch as
an upsert of the same values (idempotent for deterministic
transforms — the same last-write-wins contract Delta/Hudi streaming
MERGE offers).

Scale: every batch pays only merge_rows' pruned cost — zone-map
candidate pruning, ONE detection job, one rewrite of affected segments —
so steady-state cost tracks the touched key range, not the table size.
Size triggers so batches land parquet-friendly segments, and compact
periodically: the feed's compacted_from provenance keeps downstream
consumers exact across those maintenance merges.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from carbondata_spark.store import CarbonStore


def stream_merge(
    store: CarbonStore,
    table: str,
    stream_df: DataFrame,
    keys: str | list[str],
    checkpoint_dir: str,
    update_cols: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """writeStream → one MERGE INTO per micro-batch.

    ``transform`` maps the raw batch to merge-shaped rows (matching the
    table schema, unique per ``keys``) — typically a per-key aggregate
    of the batch's events. Unmatched keys insert, matched keys update
    ``update_cols`` (merge_rows defaults: all non-key columns).
    """

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        if batch_df.isEmpty():
            return
        store.merge_rows(table, batch_df, keys=keys, update_cols=update_cols)

    writer = (
        stream_df.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
