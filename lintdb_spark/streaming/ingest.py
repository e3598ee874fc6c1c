"""Structured Streaming extensions.

The reference has NO streaming subsystem (SURVEY.md §2.G): incremental
behavior is point add/remove/update on a live index. The Spark rebuild
gets real streaming for free:

- stream_ingest: micro-batch ingestion into an Index via foreachBatch —
  each batch runs the same validate -> assign -> encode -> append
  pipeline as Index.add, so batch and streaming ingest share one code
  path (the Kappa-architecture property the reference can't offer).
- windowed_event_counts: event-time tumbling window with watermark —
  the streaming twin of operators.relational.events_hourly; late data
  beyond the watermark is dropped instead of corrupting closed windows.

At scale: foreachBatch appends are per-micro-batch atomic (same
parquet-append path), watermark state is bounded by (window x keys),
and shuffle partitioning follows the session AQE config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lintdb_spark.index.index import Index


def stream_ingest(
    index: Index,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Append a streaming DataFrame (ingest schema) into an index.

    foreachBatch reuses Index.add verbatim — the reference's
    OMP-parallel per-doc add pipeline (lintdb/index.cpp:481-490)
    becomes per-micro-batch distributed ingestion.

    Delivery semantics: the checkpoint prevents re-processing of
    COMPLETED batches (verified: restart re-ingests nothing), but
    Index.add is several parquet appends, not one transaction — a
    crash BETWEEN the docs write and a postings write, followed by a
    retry, would duplicate that batch's docs rows. So: exactly-once on
    clean runs and restarts, at-least-once across mid-batch failures.
    A Delta-backed Index (SCALE.md §2.1) upgrades this to true
    exactly-once via multi-table transactional commit."""
    def _add(batch_df: DataFrame, _id: int) -> None:
        # Index.add runs two actions (docs write + postings write);
        # cache the micro-batch so the source is scanned once, not twice.
        batch_df.persist()
        try:
            index.add(batch_df)
        finally:
            batch_df.unpersist()

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_add)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window aggregate over event-time ``ts``:
    (window_start, event_type, n_events, total_value). Watermark bounds
    state and drops data later than ``watermark``."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
