"""Hybrid retrieval: reciprocal-rank fusion of ranked lists.

Production retrieval over a large corpus is almost never one ranker:
the standard recipe is a lexical leg (BM25, operators/bm25.py) fused
with a vector leg (cosine/ANN, operators/similarity.py) — RRF
(Cormack, Clarke & Büttcher, SIGIR 2009) is the fusion every major
search engine ships because it needs NO score calibration between legs,
only ranks:

    rrf(d) = Σ_legs 1 / (K + rank_leg(d))        (K = 60 canonically)

A document absent from a leg contributes 0 from that leg (its rank
column surfaces as 0 — "not retrieved" — so the output is join-shaped
with no nullable ints).

Scale shape: each leg is already a top-k (bounded, typically ≤ a few
hundred rows after its own distributed work), so the fusion is a join
of tiny frames — cost lives in the legs, not here. Ranks (not raw
scores) cross the operator boundary, which is exactly what makes RRF
robust to leg-score distribution drift at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from carbondata_spark.functions import dround


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Fuse ranked lists into (id, <name>_rank..., rrf, rank).

    Each leg frame carries (id_col, rank_col); leg order (dict order)
    fixes the summation order so the fused double is engine-
    reproducible. rrf is rounded to 6 decimals BEFORE the final ranking
    (ties then break on the id), the repo-wide cross-engine contract.
    """
    if not legs:
        raise ValueError("rrf_fuse: need at least one leg")
    names = list(legs)
    renamed = [
        legs[n].select(F.col(id_col), F.col(rank_col).alias(f"{n}_rank"))
        for n in names
    ]
    fused = reduce(lambda a, b: a.join(b, id_col, "full_outer"), renamed)
    contrib = [
        F.coalesce(F.lit(1.0) / (F.lit(k) + F.col(f"{n}_rank")), F.lit(0.0))
        for n in names
    ]
    fused = fused.select(
        id_col,
        *[F.coalesce(F.col(f"{n}_rank"), F.lit(0)).cast("int").alias(f"{n}_rank")
          for n in names],
        dround(reduce(lambda a, b: a + b, contrib), 6).alias("rrf"),
    )
    top = fused.orderBy(F.desc("rrf"), id_col).limit(topk)
    # rank over the ≤topk surviving rows only. Literal partition key:
    # identical semantics (one partition either way), but no WindowExec
    # no-partition warning — so that warning in a sweep log always
    # means a real unbounded window.
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy(F.desc("rrf"), id_col))
        .cast("int"),
    )
