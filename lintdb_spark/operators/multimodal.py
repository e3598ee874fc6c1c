"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is pluggable. ``decoder="fake"`` produces a
deterministic pseudo-decode (seeded from the payload bytes) so the
Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes, feature extraction — is real and testable without codecs.
``decoder="real"`` decodes images through Pillow when it is installed
(optional import, executor-side) and raises an honest
NotImplementedError otherwise — this container ships no PIL/ffmpeg, so
tests cover the fake path, the error path, and the callable path.
Any callable ``(payload, media_type, out_len, frame_idx) ->
np.ndarray`` plugs in a custom codec (torchaudio, ffmpeg, ...) without
touching the Spark plumbing.

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


def _fake_decode(
    payload: bytes, out_len: int, frame_idx: int | None = None
) -> np.ndarray:
    """Deterministic stand-in for a codec: expand an md5 HEX-STRING
    chain over the payload into out_len pseudo-samples in [0, 1).
    Stable across runs AND engines — the chain works in the hex-string
    domain (never raw digest bytes) precisely so an ANSI-SQL oracle
    can replicate it (``md5()`` in DuckDB/most engines is
    VARCHAR-only), which puts the multimodal plumbing under the same
    value-hash correctness gate as every other operator
    (queries.q_media_features). float64 math so SQL DOUBLE
    accumulation matches bit-for-bit before the float32 feature cast.

    sample j = byte at hex position 2j of
    md5(d0 '-' j//16), d0 = md5(payload) [md5(d0 '/' frame) for
    frames], / 255."""
    d0 = hashlib.md5(payload).hexdigest()
    if frame_idx is not None:
        d0 = hashlib.md5(f"{d0}/{frame_idx}".encode()).hexdigest()
    n_rep = -(-out_len // 16)  # 16 bytes (32 hex chars) per digest
    hexstr = "".join(
        hashlib.md5(f"{d0}-{i}".encode()).hexdigest() for i in range(n_rep)
    )
    buf = np.frombuffer(bytes.fromhex(hexstr[: 2 * out_len]), dtype=np.uint8)
    return buf.astype(np.float64) / 255.0


def _real_decode(
    payload: bytes, media_type: str, out_len: int, frame_idx: int | None = None
) -> np.ndarray:
    """The real-codec seam. Images decode via Pillow when installed
    (optional executor-side import — the driver never needs it); other
    media types need a user-supplied callable codec. Raises
    NotImplementedError with the remedy when the codec is missing."""
    if media_type == "image" and frame_idx is None:
        try:
            from PIL import Image  # optional dep, absent in this container
        except ImportError as exc:
            raise NotImplementedError(
                "image decode needs Pillow (pip install pillow) — or use "
                "decoder='fake' / a callable decoder"
            ) from exc
        import io

        side = max(int(out_len**0.5), 1)
        img = Image.open(io.BytesIO(payload)).convert("L").resize((side, side))
        arr = np.asarray(img, dtype=np.float32).ravel() / 255.0
        if arr.size < out_len:
            arr = np.pad(arr, (0, out_len - arr.size))
        return arr[:out_len]
    raise NotImplementedError(
        f"no built-in codec for media_type={media_type!r}"
        + (" frames" if frame_idx is not None else "")
        + " — pass a callable decoder (payload, media_type, out_len, frame_idx)"
    )


def _decoder_fn(decoder):
    if callable(decoder):
        return decoder
    if decoder == "fake":
        return lambda p, mt, n, fi=None: _fake_decode(p, n, fi)
    if decoder == "real":
        return _real_decode
    raise ValueError("decoder must be 'fake', 'real', or a callable")


def extract_features(media: DataFrame, decoder="fake") -> DataFrame:
    """Decode + fixed-width feature extraction (mean/std pooling over
    FEATURE_DIM/2 chunks) via mapInPandas. Returns
    (media_id, media_type, n_bytes, feature float[FEATURE_DIM])."""
    decode = _decoder_fn(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                samples = decode(bytes(payload), mt, 1024)
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


def sample_frames(media: DataFrame, every_ms: int = 1000, decoder="fake") -> DataFrame:
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

    decode = _decoder_fn(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "feature": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                # NULL duration arrives as NaN through Arrow->pandas
                # (float64 column); NaN is truthy, so `int(dur or 0)`
                # would raise. Treat missing duration as one frame —
                # the same contract frame_plan's greatest(..) applies.
                n_frames = max((0 if pd.isna(dur) else int(dur)) // every_ms, 1)
                for i in range(n_frames):
                    samples = decode(bytes(payload), "video", 256, i)
                    chunks = samples.reshape(FEATURE_DIM // 2, -1)
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["feature"].append(
                        np.concatenate([chunks.mean(axis=1), chunks.std(axis=1)]).astype(np.float32)
                    )
            yield pd.DataFrame(rows)

    return media.filter(media.media_type == "video").mapInPandas(run, schema=out_schema)


def media_table(documents: "DataFrame") -> DataFrame:
    """Deterministic media derivation over the driver's ``documents``
    table (the container ships no real image/audio fixtures): payload
    is the document text's UTF-8 bytes, media_type cycles
    image/audio/video by doc_id, and the typed metadata derives from
    doc_id. The SAME derivation exists as a SQL CTE in the q_media_*
    oracles, so the whole multimodal pipeline — binary column, typed
    metadata, mapInPandas decode, feature extraction, frame fan-out —
    is value-hash-checked end to end, not just shape-tested."""
    from pyspark.sql import functions as F

    # the source parquet is a single input split; without the spread
    # every downstream mapInPandas decode runs in ONE task — the same
    # serialization failure dedup.doc_shingles guards against, and
    # with a REAL codec (Pillow/ffmpeg) a catastrophic one. Quarter
    # parallelism: the payload shuffle is the cost and decode the
    # win, so fewer/larger partitions than the compute-bound caches
    # (at scale media arrives as many files and this is a no-op).
    sc = documents.sparkSession.sparkContext
    base = documents.repartition(
        max(8, sc.defaultParallelism // 4), F.col("doc_id")
    ).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    is_img = F.col("media_type") == "image"
    return base.select(
        "media_id",
        "media_type",
        "payload",
        F.when(is_img, (64 + F.col("media_id") % 32).cast("int")).alias("width"),
        F.when(is_img, (48 + F.col("media_id") % 24).cast("int")).alias("height"),
        F.when(~is_img, (500 + (F.col("media_id") % 7) * 700).cast("int")).alias(
            "duration_ms"
        ),
    )


def frame_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Declarative frame-sampling PLAN: one row per sampled frame
    (media_id, frame_idx, frame_ts_ms) as pure column expressions —
    same fan-out contract as sample_frames (frame count =
    max(duration_ms // every_ms, 1)) with NO decode and NO Python.

    The plan/decode split is the 100 TB shape: mapInPandas blocks
    column pruning, so projecting just frame metadata off
    sample_frames still decodes every frame of every video. Plan the
    frames declaratively (scan-speed, filterable/joinable — pick the
    frames you actually need), then feed the selection into the
    decode seam. Agreement between the two paths is pytest-enforced
    (test_frame_plan_matches_decode_fanout)."""
    from pyspark.sql import functions as F

    n = F.greatest(
        F.floor(F.col("duration_ms") / F.lit(every_ms)), F.lit(1)
    ).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
    )
