#!/usr/bin/env python
"""Streaming scale probe (round 7): run the streaming operators above
toy scale and record per-batch throughput AND state-store size, so the
"watermark bounds state" claims are measured, not design arguments.

Protocol: the sf1 corpora (10x bench scale — 50k docs, 1M events) are
re-chunked into time-ordered parquet files (one partitioned write;
chunk mtimes bumped in order so the file source replays oldest-first);
a maxFilesPerTrigger=1 stream replays them as micro-batches with event
time advancing chunk over chunk, so the watermark moves and state
eviction actually runs (a static toy stream never evicts — exactly
what the pytest tier cannot show).

Probes:
- neardup gate (dedup.neardup_stream): in-row MinHash signature +
  dropDuplicatesWithinWatermark over 50k docs in 20 chunks, synthetic
  event time advancing 1 hour/chunk, watermark 30 min. Bounded state =
  numRowsTotal stays ~O(docs within the watermark horizon), not
  cumulative.
- windowed aggregation (ingest.windowed_event_counts): 1M events in 20
  time-ordered chunks, 1-hour tumbling windows, 2-hour watermark.
  Bounded state = open windows x event types, flat across batches.

Usage: python scripts/streaming_probe.py  [env STREAM_PROBE_SF_DIR]
Prints a JSON line per probe; paste the table into SCALE.md §7.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.streaming import ingest as sti  # noqa: E402

SF = os.environ.get("STREAM_PROBE_SF_DIR", os.path.join(REPO, ".scale_probe", "sf1"))
CHUNKS = 20


FILES_PER_CHUNK = 8  # micro-batch parallelism: tasks per trigger


def _write_chunks(df_with_c, salt_col, out_dir):
    """ONE partitioned write (the per-chunk loop re-sorted the source
    CHUNKS times), salted to FILES_PER_CHUNK files per chunk dir so a
    micro-batch runs FILES_PER_CHUNK tasks instead of one; then bump
    each chunk dir's mtimes in order: the file stream source processes
    oldest-mtime first, which is what makes event time advance batch
    over batch (maxFilesPerTrigger=FILES_PER_CHUNK pulls exactly one
    chunk per trigger since a chunk's files share an mtime)."""
    (
        df_with_c.repartition(
            CHUNKS * FILES_PER_CHUNK, "_c", salt_col % FILES_PER_CHUNK
        )
        .write.partitionBy("_c")
        .mode("overwrite")
        .parquet(out_dir)
    )
    base = time.time() - CHUNKS * 10
    for i in range(1, CHUNKS + 1):
        d = os.path.join(out_dir, f"_c={i}")
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (base + i * 10, base + i * 10))


def _run(stream_out, checkpoint, label):
    q = (
        stream_out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batch": p.get("batchId"),
                "in_rows": p.get("numInputRows"),
                "ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": so.get("numRowsTotal"),
                "state_mb": round((so.get("memoryUsedBytes") or 0) / 1e6, 2),
            }
        )
    print(json.dumps({"probe": label, "batches": rows}), flush=True)
    mid = [r for r in rows if r["in_rows"]]
    if mid:
        peak = max(r["state_rows"] or 0 for r in mid)
        last = mid[-1]["state_rows"]
        tput = sum(r["in_rows"] for r in mid) / max(
            sum(r["ms"] or 0 for r in mid) / 1000.0, 1e-9
        )
        print(
            f"{label}: {len(mid)} batches, {tput:,.0f} rows/s, "
            f"state peak {peak:,} rows, final {last:,} rows",
            file=sys.stderr,
            flush=True,
        )


def main() -> None:
    spark = get_spark("lintdb_spark_streaming_probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_probe_")
    try:
        # ---- probe 1: near-dup gate over sf1 documents ----
        # synthetic event time: chunk i lands at hour i, so a 30-min
        # watermark evicts every previous chunk's signature state
        docs = (
            spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "text")
            .withColumn("_c", (F.col("doc_id") % CHUNKS) + 1)
            .withColumn(
                "ts",
                F.to_timestamp(
                    F.format_string("2026-01-01 %02d:00:00", F.col("_c") - 1)
                ),
            )
        )
        ddir = os.path.join(work, "docs")
        _write_chunks(docs, F.col("doc_id"), ddir)
        print("docs chunks written", file=sys.stderr, flush=True)
        dstream = (
            spark.readStream.schema(spark.read.parquet(ddir).schema)
            .option("maxFilesPerTrigger", FILES_PER_CHUNK)
            .parquet(ddir)
        )
        gated = sti.neardup_stream(dstream, watermark="30 minutes")
        _run(gated, os.path.join(work, "ckpt_dedup"), "neardup_gate_sf1")

        # ---- probe 2: windowed aggregation over sf1 events ----
        # real event times (they span days); ts-ordered chunks via one
        # ntile window so replay advances the watermark
        events = (
            spark.read.parquet(os.path.join(SF, "events.parquet"))
            .select("event_id", "ts", "event_type", "value")
            .withColumn("_c", F.ntile(CHUNKS).over(Window.orderBy("ts")))
        )
        edir = os.path.join(work, "events")
        _write_chunks(events, F.col("event_id"), edir)
        print("event chunks written", file=sys.stderr, flush=True)
        estream = (
            spark.readStream.schema(spark.read.parquet(edir).schema)
            .option("maxFilesPerTrigger", FILES_PER_CHUNK)
            .parquet(edir)
        )
        counts = sti.windowed_event_counts(estream, window="1 hour", watermark="2 hours")
        _run(counts, os.path.join(work, "ckpt_win"), "windowed_counts_sf1")
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
