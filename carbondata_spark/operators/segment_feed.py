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
  ``load_start_ts > after_ts``, EXCLUDING copy-on-write IUD rewrites
  (``origin["rewrite_of"]``): a rewrite re-materializes rows the
  consumer already saw (minus the deleted/updated ones), so an
  append-feed must not re-deliver it. Pass ``include_rewrites=True`` for
  IUD-aware consumers that want the rewrite stream.
- ``changes_since(store, table, after_ts)`` — the rows of those
  segments, as one segment-scoped scan (``store.table(segment_ids=…)``
  — no full-table listing, the whole point at scale).
- ``manifest_clock(store, table)`` — the max commit timestamp over
  SUCCESS segments: the value a consumer checkpoints AFTER draining.

Known limit (documented + pinned in tests/test_segment_feed.py):
COMPACTION merges old segments into a new one whose origin does not yet
record its inputs, so a feed crossing a compaction re-delivers the
merged rows. Consumers either drain before compaction windows run (the
usual arrangement: compaction is a maintenance-window operation) or
dedup downstream on a key. Tagging ``compacted_from`` provenance in
``store.compact`` is the planned store-side follow-up; this module's
exclusion then becomes exact with a one-line change.

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


def new_segments(
    store: CarbonStore,
    table: str,
    after_ts: float,
    include_rewrites: bool = False,
) -> list[int]:
    """Ids of SUCCESS segments committed strictly after ``after_ts``
    (manifest clock), minus IUD rewrites unless ``include_rewrites``."""
    return sorted(
        e.segment_id
        for e in store.valid_segments(table)
        if e.load_start_ts > after_ts
        and (include_rewrites or not _is_rewrite(e.origin))
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
    """The checkpoint value: max commit timestamp over SUCCESS segments
    (0.0 for an empty table, so 'everything' is the first read)."""
    segs = store.valid_segments(table)
    return max((e.load_start_ts for e in segs), default=0.0)
