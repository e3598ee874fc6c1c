"""Streaming ingest + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lintdb_spark.index import Index, SearchOptions, VectorQuery
from lintdb_spark.operators import multimodal
from lintdb_spark.streaming.ingest import stream_ingest, windowed_event_counts
from tests.test_index_lifecycle import OPTS, doc_tokens, make_docs, make_schema


def test_stream_ingest_into_index(spark, tmp_path):
    """File-source stream -> foreachBatch -> Index.add -> searchable."""
    idx = Index.create(spark, str(tmp_path / "idx"), make_schema("none"))
    batch = make_docs(spark, range(10))
    idx.train(batch)

    src = str(tmp_path / "incoming")
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = stream_ingest(idx, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    res = idx.search(0, VectorQuery("colbert", doc_tokens(4)), k=3, opts=OPTS).collect()
    assert res[0]["doc_id"] == 4

    # second micro-batch: new files picked up, no reprocessing of old ones
    make_docs(spark, range(200, 205)).write.mode("append").parquet(src)
    q2 = stream_ingest(idx, spark.readStream.schema(batch.schema).parquet(src), str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    res = idx.search(0, VectorQuery("colbert", doc_tokens(202)), k=3, opts=OPTS).collect()
    assert res[0]["doc_id"] == 202
    # doc 4 indexed exactly once (checkpoint prevented reprocessing)
    docs = idx._docs()
    assert docs.filter("doc_id = 4").count() == 1


def test_windowed_event_counts_matches_batch(spark, sf_dir, tmp_path):
    """Streaming windowed agg over the events table == batch groupBy."""
    from lintdb_spark.operators.relational import events_hourly
    from lintdb_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; compare those against batch
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expect = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_hourly(events).collect()
    }
    assert len(got) > 0
    for (ws, et), (n, tv) in got.items():
        key = (int(ws.timestamp()), et)
        assert key in expect
        assert expect[key] == (n, tv)


def test_stateful_sessionization(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer: closed-session counts are
    consistent with the batch sessionizer (stream closes every session
    except each user's final open one, which stays in state)."""
    from lintdb_spark.operators.relational import user_sessions
    from lintdb_spark.streaming.ingest import sessionize_stream
    from lintdb_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_t")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM sess_t GROUP BY 1"
        ).collect()
    }
    batch = {r["user_id"]: r["n_sessions"] for r in user_sessions(events).collect()}
    assert len(closed) > 0
    for u, c in closed.items():
        assert c <= batch[u]
    # stream emits every session except at most one open session/user
    assert sum(closed.values()) >= sum(batch.values()) - len(batch)


def _media_df(spark, n=20):
    rows = [
        (
            i,
            ["image", "audio", "video"][i % 3],
            bytes([i % 256]) * (100 + i),
            64,
            64,
            3000 + 1000 * (i % 3),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_multimodal_features_deterministic(spark):
    media = _media_df(spark)
    f1 = multimodal.extract_features(media).collect()
    f2 = multimodal.extract_features(media).collect()
    assert len(f1) == 20
    by_id1 = {r["media_id"]: r["feature"] for r in f1}
    by_id2 = {r["media_id"]: r["feature"] for r in f2}
    for k in by_id1:
        np.testing.assert_array_equal(by_id1[k], by_id2[k])
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in f1)
    assert all(r["n_bytes"] == 100 + r["media_id"] for r in f1)


def test_multimodal_frame_sampling(spark):
    media = _media_df(spark)
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in frames}
    assert vids == {i for i in range(20) if i % 3 == 2}  # only videos
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_id.items():
        dur = 3000 + 1000 * (mid % 3)
        assert len(rs) == dur // 1000
        assert sorted(x["frame_ts_ms"] for x in rs) == [i * 1000 for i in range(len(rs))]


def test_multimodal_real_decoder_stub(spark):
    with pytest.raises(Exception, match="NotImplementedError|real codecs"):
        multimodal.extract_features(_media_df(spark, 3), decoder="real").collect()


def test_multimodal_callable_decoder(spark):
    """A user-supplied codec flows through the same mapInPandas
    plumbing: the callable sees (payload, media_type, out_len,
    frame_idx) and its output feeds the pooling unchanged."""

    def byte_codec(payload, media_type, out_len, frame_idx=None):
        base = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        reps = -(-out_len // base.size)
        return np.tile(base, reps)[:out_len] / 255.0

    feats = multimodal.extract_features(
        _media_df(spark, 4), decoder=byte_codec
    ).collect()
    assert len(feats) == 4
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    frames = multimodal.sample_frames(
        _media_df(spark, 6), every_ms=1000, decoder=byte_codec
    ).collect()
    assert {r["media_id"] for r in frames} == {2, 5}


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _tiny_png(value: int, w: int = 4, h: int = 4) -> bytes:
    """A valid grayscale PNG built with stdlib only (zlib + struct):
    every pixel = ``value``. Constant images survive ANY resampling
    filter unchanged, which makes the decode parity check robust to
    Pillow's resize internals."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes([value]) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(_pil_available(), reason="Pillow installed: real decode works")
def test_multimodal_real_decoder_image_message(spark):
    """decoder='real' on images names the missing optional dep (Pillow)
    rather than a generic failure — the seam is pluggable, not dead."""
    img_only = _media_df(spark, 6).filter(F.col("media_type") == "image")
    with pytest.raises(Exception, match="Pillow|PIL"):
        multimodal.extract_features(img_only, decoder="real").collect()


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_multimodal_real_decoder_png_parity(spark):
    """With Pillow present, _real_decode on a committed-bytes PNG
    fixture returns the known pixel values: a constant-128 grayscale
    PNG decodes (convert L, any resize) to exactly 128/255 everywhere,
    and the full mapInPandas pipeline pools those into the expected
    constant mean / zero std feature."""
    png = _tiny_png(128)
    arr = multimodal._real_decode(png, "image", 16)
    np.testing.assert_allclose(arr, np.full(16, 128.0 / 255.0), rtol=0, atol=1e-7)
    rows = [(0, "image", png, 4, 4, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media, decoder="real").collect()
    assert len(feats) == 1
    f = np.asarray(feats[0]["feature"])
    np.testing.assert_allclose(
        f[: multimodal.FEATURE_DIM // 2], 128.0 / 255.0, atol=1e-6
    )
    np.testing.assert_allclose(f[multimodal.FEATURE_DIM // 2 :], 0.0, atol=1e-6)


def test_dedup_stream_suppresses_exact_dups(spark, tmp_path):
    """dedup_stream keeps one row per content hash across micro-batches
    within the watermark horizon."""
    import datetime

    from lintdb_spark.streaming.ingest import dedup_stream

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (i, f"text-{i % 4}", t0 + datetime.timedelta(minutes=i)) for i in range(12)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    out = dedup_stream(spark.readStream.schema(schema).parquet(src))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text FROM dedup_out").collect()
    assert sorted(r["text"] for r in got) == [f"text-{i}" for i in range(4)]


def test_neardup_stream_suppresses_reformatted_dups(spark, tmp_path):
    """neardup_stream drops documents whose analyzed trigram set
    matches an earlier arrival (reformatted duplicates byte-hashing
    misses) while keeping genuinely distinct docs."""
    import datetime

    from lintdb_spark.streaming.ingest import neardup_stream

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, base, t0),
        # same analyzed trigrams, different bytes (case + punctuation)
        (2, "Alpha BETA gamma, delta epsilon zeta!", t0 + datetime.timedelta(minutes=1)),
        (3, "one two three four five six", t0 + datetime.timedelta(minutes=2)),
    ]
    src = str(tmp_path / "src_nd")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    out = neardup_stream(spark.readStream.schema(schema).parquet(src))
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_nd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM neardup_out").collect()
    )
    # doc 2 suppressed (signature collision with doc 1); 1 and 3 kept
    assert len(got) == 2 and 3 in got and (1 in got or 2 in got)


# slow lane: cadence probe; segment-bounding is also enforced by the
# auto-compact backstop and its artifact-store tests
@pytest.mark.slow
def test_stream_ingest_compact_every_bounds_segments(spark, tmp_path):
    """compact_every keeps the live segment count bounded across
    micro-batches and preserves searchability of every ingested doc."""
    import glob

    idx = Index.create(spark, str(tmp_path / "idx_ce"), make_schema("none"))
    train = make_docs(spark, range(10))
    idx.train(train)

    src = str(tmp_path / "incoming_ce")
    # three separate files -> maxFilesPerTrigger=1 yields 3 micro-batches
    for lo in (0, 4, 8):
        make_docs(spark, range(lo, lo + 4 if lo < 8 else 10)).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest(
        idx, stream, str(tmp_path / "ckpt_ce"), compact_every=2
    )
    q.awaitTermination(180)

    # 3 batches with compact_every=2: compaction fired at batch 2 ->
    # bound holds (1 compacted + 1 post-compaction add = 2 live)
    assert len(idx._segments("docs")) <= 2

    res = idx.search(0, VectorQuery("colbert", doc_tokens(9)), k=3, opts=OPTS).collect()
    assert res[0]["doc_id"] == 9
    assert idx._docs().count() == 10


def test_frame_plan_matches_decode_fanout(spark, sf_dir):
    """The declarative frame plan and the decoding sample_frames path
    agree row-for-row on (media_id, frame_idx, frame_ts_ms) — the
    plan/decode split contract q_media_frames relies on."""
    from lintdb_spark.operators import multimodal
    from lintdb_spark.tables import load_table

    media = multimodal.media_table(load_table(spark, sf_dir, "documents"))
    plan = sorted(
        (r["media_id"], r["frame_idx"], r["frame_ts_ms"])
        for r in multimodal.frame_plan(media, every_ms=1000).collect()
    )
    decoded = sorted(
        (r["media_id"], r["frame_idx"], r["frame_ts_ms"])
        for r in multimodal.sample_frames(media, every_ms=1000)
        .select("media_id", "frame_idx", "frame_ts_ms")
        .collect()
    )
    assert plan == decoded and len(plan) > 0


def test_doc_chunks_works_on_streams(spark, tmp_path):
    """The featurization layer is stateless column logic, so it runs
    unchanged on Structured Streaming inputs: doc_chunks over a file
    stream equals the batch result on the same data."""
    from lintdb_spark.operators import textstats

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c")]
    src = str(tmp_path / "chunk_src")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    batch = sorted(
        tuple(r) for r in textstats.doc_chunks(
            spark.read.parquet(src), chunk_tokens=4, stride=3
        ).collect()
    )
    out = textstats.doc_chunks(
        spark.readStream.schema(schema).parquet(src), chunk_tokens=4, stride=3
    )
    q = (
        out.writeStream.format("memory")
        .queryName("chunk_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM chunk_out").collect()
    )
    assert streamed == batch and len(batch) >= 4


def test_gates_pass_input_schema_through(spark, tmp_path):
    """dedup_stream / neardup_stream return the INPUT schema — helper
    key columns must not leak into downstream strict-schema sinks."""
    from lintdb_spark.streaming.ingest import dedup_stream, neardup_stream

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "schema_src")
    import datetime

    spark.createDataFrame(
        [(1, "a b c", datetime.datetime(2026, 1, 1))], schema
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    assert dedup_stream(stream).columns == ["doc_id", "text", "ts"]
    assert neardup_stream(stream).columns == ["doc_id", "text", "ts"]


def test_sample_frames_tolerates_null_duration(spark):
    """A video row with NULL duration_ms yields one frame (the same
    contract as frame_plan) instead of a NaN->int task crash."""
    from lintdb_spark.operators import multimodal

    media = spark.createDataFrame(
        [(1, "video", bytearray(b"payload"), None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.sample_frames(media, every_ms=1000).collect()
    assert len(out) == 1 and out[0]["frame_idx"] == 0
