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
- ``cosine_pairs``     — near-dup pairs by cosine ≥ threshold, computed
  EXACTLY via an IVF-bucketed join pruned with the angular triangle
  inequality (no cartesian product; ``cosine_pairs_bruteforce`` is the
  quadratic oracle used only in tests).

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


def _as_double(df: DataFrame, col: str) -> DataFrame:
    """Cast an array column to array<double> ONCE (no-op already-double
    frames skip even that) so downstream per-pair expressions never
    re-run the interpreted element-wise cast."""
    if dict(df.dtypes).get(col) == "array<double>":
        return df
    return df.withColumn(col, F.transform(col, lambda x: x.cast("double")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).

    Plan: broadcast-nested-loop join (queries side broadcast — it is the
    small side by construction), cosine as JVM array expressions,
    TopK per query via row_number window (Spark's WindowGroupLimit
    pushes the per-partition top-k below the exchange). Ties broken by
    corpus id so results are engine-independent.

    Array higher-order functions are INTERPRETED, so the norms are
    hoisted out of the pair expression: each side's norm is computed
    once per ROW instead of once per PAIR (3 HOF passes per pair -> 1;
    identical doubles — same expressions, same sequential accumulation,
    same qn*cn multiply order as the inline cosine()).
    """
    q = _as_double(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec",
    ).withColumn("_qn", _norm(F.col("qvec")))
    from carbondata_spark.functions import ensure_parallelism

    c = _as_double(
        ensure_parallelism(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
        ),
        "cvec",
    ).withColumn("_cn", _norm(F.col("cvec")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dround(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")), 6
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos").alias("cosine"), F.col("rn").alias("rank"))
    )


def _clamp1(c: Column) -> Column:
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), c))


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """All pairs (a < b) with rounded cosine ≥ threshold — EXACT result via
    IVF-bucketed join pruned by the angular triangle inequality.

    Plan shape (no cartesian product — the scale-killer of the naive
    all-pairs theta join): vectors are assigned to their nearest centroid
    (``_assign``); each bucket gets an angular radius r = max angle of a
    member to its centroid; an *admissible bucket-pair* table (k², tiny,
    broadcast) keeps only ordered bucket pairs where
    ``angle(ca, cb) - r_a - r_b <= acos(threshold)`` — by the triangle
    inequality on angles no qualifying pair can straddle an inadmissible
    bucket pair, so pruning is lossless and the output equals brute force
    (``cosine_pairs_bruteforce`` is the test oracle). The survivor join is
    two equi-joins on bucket ids: shuffle keys are centroid ids, and with
    clustered data most of the k² bucket pairs are pruned; worst case
    (one smeared cluster) degrades to the full bucket cross — still
    executed as hash joins, never a per-row cartesian.
    """
    from carbondata_spark.functions import ensure_parallelism

    data = ensure_parallelism(
        df.select(
            F.col(id_col).alias("vid"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        )
    )
    if centroids is None:
        centroids = train_centroids(df, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = _assign(data, centroids).withColumn("r", F.acos(_clamp1(F.col("ccos"))))
    radii = assigned.groupBy("cid").agg(F.max("r").alias("r"))

    # threshold applies to the 4-dp ROUNDED cosine (oracle semantics), so
    # the admissibility bound uses threshold - 5e-5 - slack.
    theta_max = F.acos(F.lit(min(1.0, max(-1.0, threshold - 1e-3))))
    ca = centroids.select(F.lit(1).alias("_one"), F.col("cid").alias("ca"), F.col("cv").alias("cva"))
    cb = centroids.select(F.lit(1).alias("_one"), F.col("cid").alias("cb"), F.col("cv").alias("cvb"))
    cang = F.acos(_clamp1(cosine(F.col("cva"), F.col("cvb"))))
    bucket_pairs = ca.join(F.broadcast(cb), "_one").select("ca", "cb", cang.alias("cang"))  # k² rows
    admissible = (
        bucket_pairs.join(radii.select(F.col("cid").alias("ca"), F.col("r").alias("r_a")), "ca")
        .join(radii.select(F.col("cid").alias("cb"), F.col("r").alias("r_b")), "cb")
        .filter(F.col("cang") - F.col("r_a") - F.col("r_b") <= theta_max)
        .select("ca", "cb")
    )
    # ordered bucket pairs (both orientations present) ⇒ each vector pair
    # (id_a < id_b) is generated exactly once, via its own orientation.
    # Norms hoisted per side (per-row, not per-pair — see cosine_topk).
    left = assigned.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("cid").alias("ca")
    ).withColumn("_na", _norm(F.col("va")))
    right = assigned.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("cid").alias("cb")
    ).withColumn("_nb", _norm(F.col("vb")))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    return (
        left.join(F.broadcast(admissible), "ca")
        .join(right, "cb")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dround(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_bruteforce(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Naive all-pairs theta join — O(n²); kept ONLY as the test oracle for
    ``cosine_pairs`` (never register this as a driver query)."""
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

    The mean recompute is dimension-agnostic: posexplode to
    (cid, pos, val) and hash-aggregate on (cid, pos). Partial aggregation
    reduces each map task to at most k*dim rows before the shuffle, so
    the exploded form costs no more shuffle volume than per-dimension sum
    columns would — and, unlike one generated sum expression per
    dimension, it neither blows up codegen at dim=768+ nor needs a
    driver-side action to probe the vector width.
    """
    data = corpus.select(F.col(id_col).alias("vid"), F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    if sample_fraction:
        data = data.sample(fraction=sample_fraction, seed=42)
    cents = (
        data.orderBy("vid")
        .limit(n_centroids)
        .select(F.monotonically_increasing_id().alias("cid"), F.col("v").alias("cv"))
        # literal partition key over the ≤n_centroids post-limit rows:
        # identical semantics (one partition either way), but keeps the
        # repo's no-unpartitioned-WindowExec convention so sweep logs
        # flagging that warning always mean a REAL unbounded window
        .select(
            F.row_number()
            .over(W.partitionBy(F.lit(1)).orderBy("cid"))
            .alias("cid"),
            "cv",
        )
    )
    for _ in range(iters):
        assigned = _assign(data, cents)
        sums = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        )
        cents = (
            sums.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", (F.col("s") / F.col("n")).alias("m")))
                ).alias("pm")
            )
            .select("cid", F.transform("pm", lambda x: x["m"]).alias("cv"))
        )
    return cents


def _assign(data: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vid, v, cid, ccos) — ``ccos`` is the
    cosine to the assigned centroid (callers needing the angular radius of
    each bucket reuse it instead of re-scoring).

    Argmax is a ``max_by`` hash aggregate, not a row_number window: the
    aggregate combines map-side (each task reduces its corpus×k scored
    rows to one candidate per vid before the shuffle) and needs no sort —
    at corpus scale that halves the shuffle volume vs. the window
    formulation, which must shuffle ALL k scored rows per vid and sort
    each partition. Ties (equal cosine) break toward the lowest cid via
    the (cos, -cid) ordering struct, matching the old window's
    ``orderBy(desc(cos), asc(cid))`` exactly.
    """
    from carbondata_spark.functions import ensure_parallelism

    data = _as_double(ensure_parallelism(data), "v")
    cents = _as_double(cents, "cv")
    # constant-key broadcast hash join == broadcast cross with the (tiny)
    # centroid set, but keeps the plan free of CartesianProduct/BNLJ nodes
    # (asserted by plan-shape tests). Norms are hoisted per SIDE (one
    # interpreted HOF pass per vector / per centroid instead of per
    # scored pair — bit-identical doubles, see cosine_topk).
    scored = (
        data.withColumn("_one", F.lit(1))
        .withColumn("_nv", _norm(F.col("v")))
        .join(
            F.broadcast(
                cents.withColumn("_one", F.lit(1)).withColumn(
                    "_nc", _norm(F.col("cv"))
                )
            ),
            "_one",
        )
        .select(
            "vid",
            "v",
            "cid",
            (_dot(F.col("v"), F.col("cv")) / (F.col("_nv") * F.col("_nc"))).alias("cos"),
        )
    )
    best = F.max_by(
        F.struct(F.col("cid"), F.col("cos"), F.col("v")),
        F.struct(F.col("cos").alias("o1"), (-F.col("cid")).alias("o2")),
    )
    return scored.groupBy("vid").agg(best.alias("b")).select(
        "vid", F.col("b.v").alias("v"), F.col("b.cid").alias("cid"), F.col("b.cos").alias("ccos")
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
    # Norms hoisted per side (per-row, not per-probed-pair): identical
    # doubles, one interpreted HOF pass per vector — see cosine_topk.
    assigned = _assign(data, centroids).withColumn("_nv", _norm(F.col("v")))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.transform(vec_col, lambda x: x.cast("double")).alias("qvec")
    ).withColumn("_nq", _norm(F.col("qvec")))
    qscored = (
        q.withColumn("_one", F.lit(1))
        .join(F.broadcast(centroids.withColumn("_one", F.lit(1))), "_one")
        .select("query_id", "qvec", "_nq", "cid", cosine(F.col("qvec"), F.col("cv")).alias("ccos"))
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = qscored.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select(
        "query_id", "qvec", "_nq", "cid"
    )

    scored = (
        assigned.join(probes, "cid")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            dround(
                _dot(F.col("qvec"), F.col("v")) / (F.col("_nq") * F.col("_nv")), 6
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos").alias("cosine"), F.col("rn").alias("rank"))
    )


def knn_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Thresholded k-NN self-join: for every vector, its top-``k`` most
    similar neighbors among those with rounded cosine ≥ ``threshold``.
    EXACT (within the threshold) — candidates come from the losslessly
    pruned ``cosine_pairs``, so no all-pairs join; the threshold is what
    makes a kNN join tractable at corpus scale (an unthresholded exact
    kNN is inherently quadratic — use ``ivf_topk`` for that trade).

    The per-vector top-k runs AFTER threshold thinning, so the window
    sorts only candidate neighbors (bounded per vector), not the corpus.
    Ties break on ascending neighbor id for engine-independent results.
    """
    pairs = cosine_pairs(df, threshold=threshold, id_col=id_col, vec_col=vec_col)
    sym = pairs.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"), "cosine"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("query_id"), F.col("id_a").alias("neighbor_id"), "cosine"
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
