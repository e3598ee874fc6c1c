"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed:
``decoder="fake"`` produces a deterministic pseudo-decode (seeded from
the payload bytes) so the Spark-side plumbing — schema, partitioning,
UDF signatures, batch shapes, feature extraction — is real and
testable; ``decoder="real"`` raises NotImplementedError where a PIL /
torchaudio / ffmpeg call would go.

Scale design: payloads stay BinaryType end to end (no base64 blowup),
mapInPandas streams Arrow batches so executor memory is bounded by
maxRecordsPerBatch x payload size, and feature extraction emits small
fixed-width vectors that downstream ANN/dedup operators (knn.py,
dedup.py) consume directly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode(payload: bytes, out_len: int) -> np.ndarray:
    """Deterministic stand-in for a codec: expand md5(payload) into
    out_len pseudo-samples in [0, 1). Stable across runs/engines."""
    h = hashlib.md5(payload).digest()
    n_rep = -(-out_len // len(h))
    buf = np.frombuffer(
        b"".join(hashlib.md5(h + i.to_bytes(4, "big")).digest() for i in range(n_rep)),
        dtype=np.uint8,
    )[:out_len]
    return buf.astype(np.float32) / 255.0


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + fixed-width feature extraction (mean/std pooling over
    FEATURE_DIM/2 chunks) via mapInPandas. Returns
    (media_id, media_type, n_bytes, feature float[FEATURE_DIM])."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                if decoder == "real":
                    raise NotImplementedError(
                        "real codecs unavailable in this container; plug PIL/ffmpeg here"
                    )
                samples = _fake_decode(bytes(payload), 1024)
                chunks = samples.reshape(FEATURE_DIM // 2, -1)
                feats.append(
                    np.concatenate([chunks.mean(axis=1), chunks.std(axis=1)]).astype(np.float32)
                )
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video frame sampling: one row per sampled frame with a per-frame
    feature (decode stubbed like extract_features). Frame count =
    duration_ms // every_ms, the real batch-shape contract a video
    pipeline needs."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "feature": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if decoder == "real":
                    raise NotImplementedError("real codecs unavailable; plug ffmpeg here")
                n_frames = max(int(dur or 0) // every_ms, 1)
                for i in range(n_frames):
                    samples = _fake_decode(bytes(payload) + i.to_bytes(4, "big"), 256)
                    chunks = samples.reshape(FEATURE_DIM // 2, -1)
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["feature"].append(
                        np.concatenate([chunks.mean(axis=1), chunks.std(axis=1)]).astype(np.float32)
                    )
            yield pd.DataFrame(rows)

    return media.filter(media.media_type == "video").mapInPandas(run, schema=out_schema)
