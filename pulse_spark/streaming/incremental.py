"""Structured-Streaming incremental index maintenance.

The reference is batch-only (SURVEY §2.6); this module extends the engine
the Spark-native way: transcripts arriving in a directory (stand-in for
Kafka/Iceberg CDC) are tokenized per micro-batch and appended as posting
DELTAS; the global term table / stats are cheap re-aggregations over the
deltas at finalize (or on a schedule — the classic "segment + merge"
search-engine pattern, which is also exactly SPIMI's dump-then-merge
(pkg/spimi/spimi.go:44-90,123-228) reborn as streaming micro-batches).

Each micro-batch writes an idempotent parquet append keyed by batch_id
(exactly-once via the streaming checkpoint + overwrite-by-batch dir), so
a crashed stream resumes without double-counting — the streaming twin of
the batch builder's stage checkpoints.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index import build as B

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def start_incremental_build(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    settings: IndexingSettings = IndexingSettings(),
    trigger_available_now: bool = True,
):
    """Start the stream: parquet files appearing in input_dir are indexed
    into out_dir/{docs_delta,postings_delta}/batch_id=N."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = B.docs_df(batch_df)
        # overwrite the batch's own subdir -> idempotent on replay
        docs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "docs_delta", f"batch_id={batch_id}")
        )
        postings = B.postings_df(docs, settings)
        postings.write.mode("overwrite").parquet(
            os.path.join(out_dir, "postings_delta", f"batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_stream_index(spark: SparkSession, out_dir: str, settings: IndexingSettings):
    """Merge deltas into a queryable Index (terms/stats re-aggregated —
    the 'merge' half of SPIMI, one shuffle)."""
    from pulse_spark.index.persist import Index

    docs = spark.read.parquet(os.path.join(out_dir, "docs_delta"))
    postings = spark.read.parquet(os.path.join(out_dir, "postings_delta"))
    terms = B.terms_df(postings)
    row = B.stats_df(docs).collect()[0]
    return Index(
        out_dir=out_dir, settings=settings, docs=docs, postings=postings,
        terms=terms, n_docs=int(row["n_docs"]), adl=float(row["adl"]),
    )


def streaming_hourly_counts(spark: SparkSession, input_dir: str, watermark: str = "2 hours"):
    """Watermarked tumbling-window aggregation over an event stream —
    the streaming form of datapipe.events.hourly_counts."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(input_dir)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type", "n", F.round("sum_value", 6).alias("sum_value"),
        )
    )
