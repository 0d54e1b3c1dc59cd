"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes clearly marked STUB — but the Spark-side plumbing is
real and tested: schemas, mapInPandas batch iteration, partition-count
preservation, and the metadata extraction used by the oracle-checked
query. Swapping a stub for PIL/ffmpeg changes one pure function per
kernel, nothing in the plan.

Binary payload model:

    media: struct fields (doc_id, media_type, content: binary,
           meta: struct<codec string, n_bytes long>)

Scale notes: mapInPandas streams Arrow record batches (no per-row serde);
decode work is embarrassingly parallel so the operator inherits the scan's
partitioning — for 100 TB of media the only tuning is
``spark.sql.files.maxPartitionBytes`` and batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, checksum string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_checksum string"


def documents_as_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Adapter: wrap the documents table's text as a binary media column —
    the test stand-in for real image/audio bytes."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("fake/raw").alias("codec"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _stub_decode_image(content: bytes) -> tuple[int, int, str]:
    """STUB decode kernel. A real build calls PIL.Image.open here.

    Deterministic fake: (width, height) from the first md5 bytes of the
    content — stable across engines and runs; checksum = md5 hex.
    """
    digest = hashlib.md5(content).hexdigest()
    width = int(digest[:2], 16) + 1
    height = int(digest[2:4], 16) + 1
    return width, height, digest


def decode_media(media: DataFrame) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    Batch-at-a-time: each Arrow batch becomes one pandas DataFrame; the
    decode loop is pure Python per batch (vectorizable when a real codec
    takes buffers).
    """

    # NB: the closure must only reference stdlib/pandas and locals — a
    # reference to a module-level helper would pickle by module reference,
    # and executor Python workers cannot import carbondata_spark when the
    # driver runs from outside the repo (mirrors _stub_decode_image).
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def _decode(content: bytes) -> tuple[int, int, str]:
            digest = _hashlib.md5(content).hexdigest()
            return int(digest[:2], 16) + 1, int(digest[2:4], 16) + 1, digest

        for pdf in it:
            decoded = [_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


FEATURE_DIM = 16


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """STUB feature extractor: binary payload → unit-norm float vector
    (a real build would run a vision/audio encoder per Arrow batch; the
    fake derives a deterministic vector from the md5 digest bytes).

    Output (doc_id, embedding array<float>) plugs directly into the
    similarity operators (cosine_topk / ivf_index) — the multimodal →
    embedding → ANN pipeline with real Spark plumbing end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math as _math

        def embed(content: bytes) -> list[float]:
            raw = _hashlib.md5(content).digest()
            vals = [raw[i % 16] / 255.0 - 0.5 for i in range(dim)]
            norm = _math.sqrt(sum(v * v for v in vals)) or 1.0
            return [v / norm for v in vals]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "embedding": [embed(c) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(batches, schema="doc_id long, embedding array<float>")


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """STUB resize: rescales the fake (width, height) preserving aspect
    ratio; a real build would transform pixel buffers. Demonstrates a
    second chained mapInPandas stage sharing the decoded schema."""
    decoded = decode_media(media)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            pdf = pdf.assign(
                width=(pdf["width"] * scale).astype("int32").clip(lower=1),
                height=(pdf["height"] * scale).astype("int32").clip(lower=1),
            )
            yield pdf

    return decoded.mapInPandas(batches, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """STUB video frame sampler: emits one 'frame' per ``every_n_bytes``
    of payload (a real build would demux with ffmpeg). Demonstrates a
    1→N exploding mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_frames = max(1, len(content) // every_n_bytes)
                for i in range(n_frames):
                    chunk = bytes(content[i * every_n_bytes : (i + 1) * every_n_bytes])
                    rows.append((doc_id, i, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_checksum"])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
