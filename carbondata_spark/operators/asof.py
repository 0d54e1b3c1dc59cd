"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to every left row the most
recent right row at-or-before its timestamp, per key. Implemented as the
scalable union-window pattern, NOT a Pandas UDF:

1. union left (side=1) and right (side=0) rows over (key, ts);
2. one window per key ordered by (ts, side, tiebreak):
   ``last(right_value, ignoreNulls=True)`` carries the latest right
   value forward onto each left row (side ordering makes the join
   inclusive: a right row at the same ts sorts before the left row);
3. keep only left rows.

Scale shape: a single shuffle on the key column (both inputs
co-partitioned by the window), one sort per partition — the same cost
profile as any windowed aggregation, with none of the range-join blowup
a naive ``left.ts >= right.ts`` join would have. Skewed keys fall back
to AQE skew handling like any window.

Semantics pinned cross-engine by q_asof_join vs DuckDB's native
ASOF JOIN (inclusive, backward direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[on] <= left[on]`` within the same ``by`` group (NULLs when no
    prior right row exists).

    ``tiebreak``: right-side column ordering rows with identical (by, on)
    — the highest wins, making results deterministic.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    l_tagged = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"{c}{suffix}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    for c in left.columns:
        if c not in (by, on):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col(on).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        # left rows carry NULL in the right tiebreak column — nulls_last
        # keeps them after right rows at equal ts (inclusive join), while
        # right rows order among themselves so last() picks the max.
        tb = f"{tiebreak}{suffix}" if tiebreak in value_cols else tiebreak
        order.insert(1, F.col(tb).asc_nulls_last())
    w = W.partitionBy(by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    out = unioned
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side")
