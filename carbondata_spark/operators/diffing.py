"""Dataset snapshot diff — added / removed / changed / unchanged.

A training corpus is rebuilt continuously (new crawls, takedowns, late
corrections); the first question about any rebuild is "what actually
changed?". This operator diffs two snapshots of a keyed table into a
row-level status column, the primitive behind refresh auditing,
incremental re-embedding (recompute vectors only for added|changed), and
takedown verification (removed must cover the request list).

Scale shape (100 TB): both sides are projected to (key, md5(compare
columns)) BEFORE the join, so the full-outer join — the one unavoidable
shuffle, on the key both snapshots share — moves 32-byte digests, not
document payloads. Status is a null-pattern CASE over the two digest
columns. No window, no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots on ``key_cols``.

    Returns (key columns..., status) with status ∈ added | removed |
    changed | unchanged: added = key only in ``new``, removed = key only
    in ``old``, changed = key in both with any ``compare_cols``
    difference (default: all shared non-key columns), NULL-safely — a
    value moving to/from NULL is a change.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    if not compare_cols:
        raise ValueError("snapshot_diff: no compare columns")

    def digest(df: DataFrame, alias: str) -> DataFrame:
        # Hash the JSON encoding of a struct, not a delimiter-joined
        # concat: JSON escaping makes the serialization injective, so
        # values containing a would-be separator can't alias across
        # column boundaries, and ignoreNullFields=false keeps
        # ('a', NULL) distinct from ('a',) and from ('a', 'null').
        cells = F.struct(*[F.col(c).cast("string").alias(c) for c in compare_cols])
        return df.select(
            *keys,
            F.md5(F.to_json(cells, {"ignoreNullFields": "false"})).alias(alias),
        )

    j = digest(old, "_h_old").join(digest(new, "_h_new"), on=keys, how="full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, status.alias("status"))
