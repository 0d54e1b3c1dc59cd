"""Document chunking for training-data preparation: split each document
into fixed-token-budget chunks while preserving document order.

Scale notes (100 TB): chunking is a pure per-row transformation — the
chunk index array is built with ``sequence`` and each chunk sliced out of
the token array with ``slice``/``array_join``, then exploded. Zero
shuffle, whole-stage codegen, embarrassingly parallel; output
partitioning inherits the scan. This is the shape a tokenizer-sharding
stage wants: no repartition before the write, and deterministic
(chunk boundaries depend only on the document, not on partitioning).

The reference has no text-pipeline surface (its LOAD path is
CSV→columnar ETL, processing/.../CarbonDataLoadRDD-era graph); chunking
is part of the training-data extension layer built on the same DataFrame
API its query path delegates to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into consecutive chunks of at most
    ``max_tokens`` whitespace tokens.

    Returns (doc_id, chunk_id, n_tokens, chunk_text) — chunk_id is
    0-based and consecutive; every token lands in exactly one chunk; the
    last chunk of a document may be short. Empty/whitespace-only docs
    produce a single empty chunk (chunk_id 0) so no document silently
    disappears from the corpus.
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.greatest(F.ceil(F.size(w) / F.lit(max_tokens)).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_chunks - 1)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        w.alias("w"),
        F.explode(idx).alias("chunk_id"),
    )
    chunk = F.slice(F.col("w"), F.col("chunk_id") * max_tokens + 1, max_tokens)
    return out.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def shard_assign(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic output sharding: shard = first 8 md5 hex chars of the
    key mod ``n_shards`` — content-addressed (stable across runs and
    engines, unlike ``pmod(hash(...))`` whose hash is Spark-specific), so
    an incremental pipeline re-run routes every document to the same
    shard. Map-side expression; the subsequent write would
    ``repartition(n_shards, "shard")`` for one file per shard.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
    return df.withColumn("shard", (h.cast("long") % n_shards).cast("int"))


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Deterministic contiguous sequence packing: assign each document to
    a (shard, bin) by its START offset in the per-shard id-ordered token
    stream — ``bin = floor((cumsum - n) / budget)`` — the write-side
    packing step before training serialization. Reproducible (re-runs
    and other engines produce identical assignments), no driver loop.

    Bin-size contract: a bin's total can overflow the budget by AT MOST
    its last document (a doc straddling a boundary belongs to the bin it
    starts in); downstream writers truncate/pad the tail as usual.
    Exact never-overflow packing is sequential first-fit — not
    prefix-computable, and not what distributed packing pipelines run.

    Scale: one window cumsum per shard — shards are the parallelism unit
    (pick n_shards >= cluster cores); within a shard the sort is by the
    id, the same order the docs will be written. Oversized documents
    (n > budget) still get a bin (their own overflowing one) — splitting
    them belongs to chunk_documents upstream.
    """
    from pyspark.sql import Window as W

    sharded = shard_assign(df, n_shards=n_shards, key_col=id_col)
    # explicit ROWS frame: the default RANGE frame includes PEER rows
    # (equal ids) in the cumsum, diverging from the oracle's ROWS replay
    # whenever id_col is not unique
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return sharded.withColumn(
        "bin",
        F.floor((cum - F.col(token_col)) / F.lit(budget_tokens)).cast("int"),
    )
