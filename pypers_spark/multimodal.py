"""Multimodal column plumbing (SURVEY.md §2.F).

Treats image/audio/video payloads as opaque ``binary`` columns plus a
typed metadata struct, with decode / feature-extraction / resize /
frame-sampling implemented as Arrow-batched ``mapInPandas`` pipelines.

STUBBED CODECS: this container has no image/audio libraries, so the
actual byte→pixels decode is a clearly-marked deterministic fake
(:func:`_fake_decode`) — it derives stable pseudo-content from the
payload hash. Everything Spark-side is real and tested: schemas, the
``mapInPandas`` batch iteration, partition behavior, and the UDF
signatures. Swapping :func:`_fake_decode` for Pillow/ffmpeg is a
one-function change on a real deployment.

Scale notes: ``mapInPandas`` streams Arrow batches — payload bytes never
gather on the driver; per-batch decode keeps peak memory at
(batch size × payload size); metadata-only queries (filters on
mime/width/duration) never touch the binary column thanks to column
pruning on the parquet scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("content_sha", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        # float64: keeps the byte-histogram ratios bit-identical to the
        # DuckDB oracle (float32 would shift 1-in-10^4 rounding edges).
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents table (payload = utf-8 text).

    Stands in for a real binary column (scanned parquet with
    image/audio bytes); schema and code paths are identical.
    """
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.col("source"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder — deterministic fake standing in for Pillow/ffmpeg.

    Derives (width, height, channels) from the payload's sha1 so tests
    are reproducible. A real deployment replaces ONLY this function.
    """
    digest = hashlib.sha1(payload).digest()
    return {
        "width": 16 + digest[0] % 240,
        "height": 16 + digest[1] % 240,
        "n_channels": 1 + digest[2] % 3,
        "content_sha": hashlib.sha1(payload).hexdigest(),
    }


def decode_media(media: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "mime_type": pdf["mime_type"].values,
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_channels": [d["n_channels"] for d in decoded],
                    "content_sha": [d["content_sha"] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim feature vector per payload (stub: hashed byte histogram).

    The real version runs an embedding model per Arrow batch; the
    contract (one float vector per row, vectorized batch compute) is
    exercised here with a histogram of payload bytes folded to ``dim``.
    """
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "features": feats})

    return media.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_bytes: int = 64) -> DataFrame:
    """'Resize' payloads (stub: truncate bytes; real impl re-encodes).

    Returns the full media schema so resize composes with decode /
    feature stages.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [bytes(p)[:max_bytes] for p in pdf["payload"]]
            out["n_bytes"] = [min(len(bytes(p)), max_bytes) for p in pdf["payload"]]
            yield out

    return media.mapInPandas(resize_batches, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Sample N evenly-spaced 'frames' per payload (stub: byte slices).

    Explodes one media row into ``n_frames`` frame rows — the shape a
    video frame-sampler produces. Row-explosion inside mapInPandas keeps
    the fan-out distributed (no driver involvement).
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for media_id, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                if not raw:
                    continue
                step = max(1, len(raw) // n_frames)
                for i in range(min(n_frames, len(raw))):
                    ids.append(media_id)
                    idxs.append(i)
                    payloads.append(raw[i * step : i * step + frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)
