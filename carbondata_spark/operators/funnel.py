"""Ordered-funnel analysis over event streams.

Green-field operator (the reference has no event-sequence surface; its
query layer stops at HiveQL aggregates — SURVEY.md §2.4): for a sequence
of step names, compute per entity the furthest step reached such that
each step's FIRST occurrence is strictly after the previous step's first
occurrence — the standard product-analytics funnel (MATCH_RECOGNIZE's
simplest shape, built from conditional aggregation).

Scale: one shuffle keyed on the entity id with full map-side combine
(min() partials); state per entity is k timestamps for a k-step funnel.
No windows, no self-joins — the naive k-way self-join alternative
shuffles the event table k times and explodes on hot users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, stage): stage = number of funnel steps completed in strict
    first-occurrence order (0 = never did step 1)."""
    mins = [
        F.min(F.when(F.col(type_col) == step, F.col(ts_col))).alias(f"_t{i}")
        for i, step in enumerate(steps)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(*mins)
    stage = F.when(F.col("_t0").isNull(), 0).otherwise(1)
    for i in range(1, len(steps)):
        cond = F.lit(True)
        for j in range(1, i + 1):
            cond = cond & F.col(f"_t{j}").isNotNull() & (
                F.col(f"_t{j}") > F.col(f"_t{j-1}")
            )
        stage = F.when(cond, i + 1).otherwise(stage)
    return per_user.select("user_id", stage.alias("stage"))
