"""Duplicate-aware training weights.

Exact deduplication (operators/dedup.py) DROPS duplicates; the other
standard treatment (used when repetition carries signal — e.g. quoted
boilerplate vs. genuinely popular text) KEEPS every copy but
down-weights it so each distinct text contributes one unit of training
mass: weight = 1 / multiplicity. This module computes that weight
without ever dropping a row.

Scale shape (100 TB): the text payload never shuffles. Rows are
projected to (id, md5(normalized text)) FIRST — a 32-byte digest — and
the multiplicity is a count window over the digest key, the same
exchange the exact-dedup hash-agg uses (dedup.py's md5 spelling, so the
two operators agree on what "the same document" means). No join back to
the corpus is needed for the (id, weight) output; callers who want the
full row join on the id key downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from carbondata_spark.functions import dround


def dup_weight(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup_count, weight) per input row: weight = 1/multiplicity of
    the row's normalized text (lower + trim + whitespace collapse, then
    md5 — byte-identical to the exact-dedup grouping key, dedup.py:96,
    so both operators agree on document identity and the weights of one
    dedup group always sum to exactly one unit of training mass)."""
    h = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    projected = df.select(F.col(id_col).alias(id_col), h.alias("_h"))
    n = F.count("*").over(Window.partitionBy("_h"))
    return projected.select(
        id_col,
        n.alias("dup_count"),
        dround(F.lit(1.0) / n, 6).alias("weight"),
    )
