"""Incremental segment consumption: read only what was committed since a
checkpoint.

The pattern every downstream job at 100 TB needs (tokenizer re-runs,
index refreshes, training-shard builders): instead of rescanning the
table, checkpoint the manifest clock and read ONLY the segments that
appeared since. The manifest (store.valid_segments) already carries
per-segment commit timestamps and provenance, so the feed is pure
composition over the public store API — no new storage format.

Contract:

- ``new_segments(store, table, after_ts)`` — SUCCESS segments with
  ``load_end_ts > after_ts``, EXCLUDING

  * copy-on-write IUD rewrites (``origin["rewrite_of"]``): a rewrite
    re-materializes rows the consumer already saw (minus the deleted/
    updated ones), so an append-feed must not re-deliver it. Pass
    ``include_rewrites=True`` for IUD-aware consumers that want the
    rewrite stream;
  * compaction results whose ``origin["compacted_from"]`` inputs were
    ALL committed at-or-before the checkpoint: the merged segment holds
    exactly rows the consumer already drained. A merge with ANY
    post-checkpoint input still delivers whole (its new rows are
    inseparable from the merged files) — the at-least-once corner; and
    if ``clean_files`` already purged an input's manifest entry the
    proof is gone, so the feed falls back to delivering (at-least-once,
    never silent loss). Operationally: drain feeds before maintenance
    windows and both corners vanish.

- ``changes_since(store, table, after_ts)`` — the rows of those
  segments, as one segment-scoped scan (``store.table(segment_ids=…)``
  — no full-table listing, the whole point at scale).
- ``manifest_clock(store, table)`` — the max COMMIT timestamp
  (``load_end_ts``, stamped under the status-file lock, monotonic
  across commits) over SUCCESS segments: the value a consumer
  checkpoints AFTER draining. ``load_start_ts`` would be wrong here —
  store.load supports concurrent loaders via in-progress reservation,
  so a load that STARTS before a checkpoint but COMMITS after would
  sort before the checkpoint and be silently lost.

Reference parity: the reference's load manifest (tablestatus semantics —
SHOW LOADS / LoadMetadataDetails timestamps,
core/.../load/LoadMetadataDetails.java) is exactly this clock; its era
had no incremental-consumer API, but every entry this module reads is
the analogue of what SHOW LOADS prints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from carbondata_spark.store import CarbonStore


def _is_rewrite(origin: dict) -> bool:
    return "rewrite_of" in (origin or {})


def _already_delivered_merge(
    origin: dict, after_ts: float, commit_ts_by_id: dict[int, float]
) -> bool:
    """True iff this segment is a compaction result whose EVERY input
    was committed at-or-before ``after_ts`` — i.e. the merge only
    re-materializes rows a consumer checkpointed at ``after_ts`` has
    already drained. Missing provenance or a purged input entry returns
    False (deliver: at-least-once beats silent loss)."""
    inputs = (origin or {}).get("compacted_from")
    if not inputs:
        return False
    for sid in inputs:
        committed = commit_ts_by_id.get(sid)
        if committed is None or committed > after_ts:
            return False
    return True


def new_segments(
    store: CarbonStore,
    table: str,
    after_ts: float,
    include_rewrites: bool = False,
) -> list[int]:
    """Ids of SUCCESS segments committed strictly after ``after_ts``
    (manifest clock = ``load_end_ts``), minus IUD rewrites (unless
    ``include_rewrites``) and minus already-delivered compaction merges
    (exact via ``compacted_from`` provenance)."""
    commit_ts_by_id = {
        d["segment_id"]: d["load_end_ts"] for d in store.show_segments(table)
    }
    return sorted(
        e.segment_id
        for e in store.valid_segments(table)
        if e.load_end_ts > after_ts
        and (include_rewrites or not _is_rewrite(e.origin))
        and not _already_delivered_merge(e.origin, after_ts, commit_ts_by_id)
    )


def changes_since(
    store: CarbonStore,
    table: str,
    after_ts: float,
    include_rewrites: bool = False,
) -> DataFrame:
    """Rows committed after ``after_ts`` as one segment-scoped scan.

    Returns an empty frame (correct schema) when nothing is new — the
    cheap steady-state poll: one manifest read, zero data files listed.
    """
    ids = new_segments(store, table, after_ts, include_rewrites)
    if not ids:
        return store.table(table).limit(0)
    return store.table(table, segment_ids=ids)


def manifest_clock(store: CarbonStore, table: str) -> float:
    """The checkpoint value: max COMMIT timestamp (``load_end_ts``,
    stamped under the status lock, so monotonic across commits) over
    SUCCESS segments (0.0 for an empty table, so 'everything' is the
    first read)."""
    segs = store.valid_segments(table)
    return max((e.load_end_ts for e in segs), default=0.0)
