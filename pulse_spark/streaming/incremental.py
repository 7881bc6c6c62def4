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

    # persist the stream's preprocessing settings next to the deltas:
    # they BIND the delta semantics (postings are already tokenized), so
    # compaction must reuse them — never trust a caller to re-specify
    import json

    os.makedirs(out_dir, exist_ok=True)
    spath = os.path.join(out_dir, "stream_settings.json")
    if os.path.exists(spath):
        with open(spath) as f:
            prior = json.load(f)
        if prior != settings.to_dict():
            raise ValueError(
                f"stream at {out_dir} was started with {prior}; restarting "
                f"with {settings.to_dict()} would mix incompatibly "
                "tokenized deltas"
            )
    else:
        with open(spath, "w") as f:
            json.dump(settings.to_dict(), f)

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


def compact_stream_index(
    spark: SparkSession,
    stream_dir: str,
    out_dir: str,
    settings: IndexingSettings | None = None,
    build_segments: bool = True,
    num_doc_partitions: int | None = None,
):
    """Compact accumulated micro-batch deltas into a COMMITTED index —
    the terminal "merge" of the streaming SPIMI analogy, closing the
    loop: stream all day into deltas, compact once into the
    bucketed/sorted layout (+ compressed block segments), then serve it
    via serve.PointServer or absorb it into the main corpus index with
    index.merge.merge_indexes — all without ever re-tokenizing a turn
    (the deltas already hold posting rows; the only per-token work
    happened in the micro-batches).

    Shuffle profile: doc_id assignment (range partition on the stable
    key), one doc_no->doc_id equi-join of the posting deltas (no
    broadcast assumption — AQE picks the strategy), the salted bucket
    layout shuffle, and the segments range shuffle.  Token-linear Python:
    none.
    """
    import json

    from pulse_spark.index import checkpoint as ckpt
    from pulse_spark.index.persist import Index

    # the stream's persisted settings are authoritative (they bound the
    # tokenization of the deltas); an explicit settings arg must agree
    spath = os.path.join(stream_dir, "stream_settings.json")
    if os.path.exists(spath):
        with open(spath) as f:
            stream_settings = IndexingSettings.from_dict(json.load(f))
        if settings is not None and settings != stream_settings:
            raise ValueError(
                f"compact settings {settings.to_dict()} differ from the "
                f"stream's recorded {stream_settings.to_dict()}"
            )
        settings = stream_settings
    elif settings is None:
        raise ValueError(
            f"no stream_settings.json at {stream_dir} and no settings "
            "given — cannot infer the deltas' tokenization"
        )

    docs_delta = spark.read.parquet(os.path.join(stream_dir, "docs_delta"))
    postings_delta = spark.read.parquet(
        os.path.join(stream_dir, "postings_delta")
    )
    npart = num_doc_partitions or spark.sparkContext.defaultParallelism
    manifest = ckpt.load_manifest(out_dir)
    ckpt.check_settings(manifest, settings)
    ckpt.save_manifest(out_dir, manifest)

    assign_ids = build_segments
    d = docs_delta
    cached = None
    if assign_ids:
        d, cached = B.assign_doc_ids(spark, d, npart)
    meta_cols = ["doc_no", "conv_id", "turn_idx", "doc_len"]
    if settings.store_text:
        meta_cols.insert(3, "text")
    if assign_ids:
        meta_cols.append("doc_id")
    docs = ckpt.commit_stage(out_dir, manifest, "docs", d.select(*meta_cols))

    p = postings_delta
    id_col = "doc_no"
    if assign_ids:
        # deltas key postings by doc_no; map to the dense ids via ONE
        # equi-join against the committed docs stage (never re-tokenize)
        id_col = "doc_id"
        p = (
            p.join(docs.select("doc_no", "doc_id"), "doc_no")
            .select("term", "doc_id", "doc_len", "tf")
        )
    p = B.with_term_bucket(p, settings.term_buckets)
    # same salted layout as the batch builder (persist.py): a hot term's
    # postings split across salt_partitions reducers
    n_salt = max(settings.salt_partitions, 1)
    if n_salt > 1:
        salt = F.pmod(F.xxhash64(id_col), F.lit(n_salt))
        p = p.repartition(settings.term_buckets * n_salt, "bucket", salt)
    else:
        p = p.repartition(settings.term_buckets, "bucket")
    postings = ckpt.commit_stage(
        out_dir, manifest, "postings", p,
        partition_by=["bucket"], sort_within=["term", id_col],
    )

    terms = ckpt.commit_stage(out_dir, manifest, "terms", B.terms_df(postings))

    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    row = B.stats_df(docs).collect()[0]
    n_docs, adl = int(row["n_docs"]), float(row["adl"])
    t0 = _time.time()
    stats_dir = os.path.join(out_dir, "stats")
    os.makedirs(stats_dir, exist_ok=True)
    pq.write_table(
        pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                  "adl": pa.array([adl], pa.float64())}),
        os.path.join(stats_dir, "part-00000.parquet"),
    )
    ckpt.record_stage(spark, out_dir, manifest, "stats",
                      round(_time.time() - t0, 3))
    if cached is not None:
        cached.unpersist()

    if build_segments:
        from pulse_spark.index import segments as seg

        seg.build_segments(spark, out_dir, manifest, postings, settings)

    return Index(out_dir=out_dir, settings=settings, docs=docs,
                 postings=postings, terms=terms, n_docs=n_docs, adl=adl)
