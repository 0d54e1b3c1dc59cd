"""Similarity search over embedding columns (array<float>).

Two paths, as a production vector pipeline would have:

- ``cosine_topk``      — exact brute-force top-k: broadcast the (small)
  query set against the corpus, cosine via zip_with/aggregate (JVM
  expressions, whole-stage codegen), per-query window top-k. This is the
  baseline and the verification oracle for the approximate path.
- ``ivf_topk``         — IVF-style approximate search: corpus vectors are
  bucketed by nearest centroid (trained once with a tiny k-means,
  distributed Lloyd iterations in DataFrame ops); queries probe only the
  ``nprobe`` nearest centroid buckets. At 100 TB, the probe join shuffles
  only the probed buckets instead of the full corpus — the standard
  recall/throughput trade.
- ``cosine_pairs``     — all-pairs near-dup by cosine ≥ threshold
  (embedding-space analogue of dedup; brute force at test scale, the
  bucketed variant composes ivf assignment with a bucket self-join).

All cosines are computed in float64 with sequential accumulation so the
DuckDB oracle (list_cosine_similarity on DOUBLE[]) matches bit-for-bit
before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from carbondata_spark.functions import dround


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).

    Plan: broadcast-nested-loop join (queries side broadcast — it is the
    small side by construction), cosine as codegen'd array expressions,
    TopK per query via row_number window. Ties broken by corpus id so
    results are engine-independent.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    from carbondata_spark.functions import ensure_parallelism

    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dround(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos").alias("cosine"), F.col("rn").alias("rank"))
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold (embedding near-dup)."""
    from carbondata_spark.functions import ensure_parallelism

    df = ensure_parallelism(df)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dround(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF approximate search
# ---------------------------------------------------------------------------


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Tiny distributed k-means (Lloyd) entirely in DataFrame ops.

    Init: the ``n_centroids`` lowest-id vectors (deterministic). Each
    iteration: assign by max cosine (broadcast centroids), recompute
    means with element-wise array aggregation. Centroid count is small by
    design (IVF lists), so the broadcast is cheap; the only shuffle is
    the groupBy(centroid) over (a sample of) the corpus.
    """
    data = corpus.select(F.col(id_col).alias("vid"), F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    if sample_fraction:
        data = data.sample(fraction=sample_fraction, seed=42)
    cents = (
        data.orderBy("vid")
        .limit(n_centroids)
        .select(F.monotonically_increasing_id().alias("cid"), F.col("v").alias("cv"))
        .select(F.row_number().over(W.orderBy("cid")).alias("cid"), "cv")
    )
    dim = len(data.select("v").first()["v"])
    for _ in range(iters):
        assigned = _assign(data, cents)
        sums = assigned.groupBy("cid").agg(
            *[F.sum(F.element_at("v", i + 1)).alias(f"s{i}") for i in range(dim)],
            F.count("*").alias("n"),
        )
        cents = sums.select(
            "cid",
            F.array(*[(F.col(f"s{i}") / F.col("n")) for i in range(dim)]).alias("cv"),
        )
    return cents


def _assign(data: DataFrame, cents: DataFrame) -> DataFrame:
    from carbondata_spark.functions import ensure_parallelism

    data = ensure_parallelism(data)
    scored = data.join(F.broadcast(cents)).select(
        "vid", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("cos")
    )
    w = W.partitionBy("vid").orderBy(F.desc("cos"), F.asc("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
        "vid", "v", "cid"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest IVF buckets.

    At scale the assignment is precomputed and stored partitioned by cid
    (bucket-pruned scans); here it is derived inline. Recall vs
    ``cosine_topk`` is asserted in tests (recall@10 target with
    nprobe=4/16 buckets).
    """
    if centroids is None:
        centroids = train_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    data = corpus.select(
        F.col(id_col).alias("vid"), F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    assigned = _assign(data, centroids)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.transform(vec_col, lambda x: x.cast("double")).alias("qvec")
    )
    qscored = q.join(F.broadcast(centroids)).select(
        "query_id", "qvec", "cid", cosine(F.col("qvec"), F.col("cv")).alias("ccos")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = qscored.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select(
        "query_id", "qvec", "cid"
    )

    scored = (
        assigned.join(probes, "cid")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            dround(cosine(F.col("qvec"), F.col("v")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos").alias("cosine"), F.col("rn").alias("rank"))
    )
