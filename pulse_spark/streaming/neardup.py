"""Streaming near-duplicate detection — MinHash/LSH banding over a
document stream (the dedup-family extension of incremental.py's pattern).

Documents arriving in a directory (stand-in for Kafka/Iceberg CDC) are
shingled, MinHash-signed, and LSH-banded per micro-batch with the SAME
batch operators as datapipe.dedup (token_shingles / minhash_signatures /
lsh_bucket_keys), then joined against an accumulated bucket-key store to
emit every near-dup pair the new docs form — with earlier docs (new×old
on band_key) and among themselves (new×new).  Candidates are
exact-verified with shingle-set Jaccard (dedup.verify_jaccard_pairs)
against the accumulated shingle store, so the emitted pairs carry the
same exact jaccard as the batch operator.

Why foreachBatch + a keyed parquet store rather than
applyInPandasWithState: exact verification needs the shingle SETS of
both pair members, and a per-bucket state cell cannot see other buckets'
shingles — the growing (doc_id, shingle) / (doc_id, band_key) stores ARE
the operator state, partitioned and joinable.  Each batch's work is
bounded: one equi-join of the new docs' band keys against the store (no
rescan of old×old), exactly the incremental cost profile a 10^12-turn
stream needs.  At scale the stores would live in Iceberg with
band_key-bucketed layout and periodic compaction; the sandbox uses plain
parquet with batch_id subdirs.

Exactly-once: every pair (a, b) is emitted in precisely the batch where
the LATER member arrives; batch outputs overwrite their own batch_id
subdir and the state read excludes the current batch_id, so a replayed
batch neither double-emits nor self-joins its own first attempt.

Correctness oracle: the union of emitted pairs over the whole stream
equals dedup.minhash_lsh_pairs over the whole corpus (tests/
test_streaming.py), assuming unique doc ids across the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"


def start_streaming_neardup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    min_jaccard: float = 0.2,
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Stream parquet doc files from input_dir; append verified near-dup
    pairs to out_dir/pairs/batch_id=N and maintain the bucket/shingle
    state under out_dir/state/."""
    from pulse_spark.datapipe import dedup

    store_bk = os.path.join(out_dir, "state", "buckets")
    store_sh = os.path.join(out_dir, "state", "shingles")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sh_new = dedup.token_shingles(batch_df, id_col).persist()
        bk_new = dedup.lsh_bucket_keys(
            dedup.minhash_signatures(sh_new, id_col), id_col
        ).persist()

        new_a = bk_new.select(
            F.col(id_col).alias("id_a"), "band", "band_key"
        )
        new_b = bk_new.select(
            F.col(id_col).alias("id_b"), "band", "band_key"
        )
        cand = (
            new_a.join(new_b, ["band", "band_key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        sh_all = sh_new
        if os.path.isdir(store_bk):
            # state read EXCLUDES the current batch_id: a replay of a
            # half-committed batch must not pair new docs against their
            # own previous attempt
            bk_old = spark.read.parquet(store_bk).where(
                F.col("batch_id") < batch_id
            )
            old = bk_old.select(
                F.col(id_col).alias("_old_id"), "band", "band_key"
            )
            cross = (
                old.join(
                    bk_new.select(F.col(id_col).alias("_new_id"),
                                  "band", "band_key"),
                    ["band", "band_key"],
                )
                .where(F.col("_old_id") != F.col("_new_id"))
                .select(
                    F.least("_old_id", "_new_id").alias("id_a"),
                    F.greatest("_old_id", "_new_id").alias("id_b"),
                )
            )
            cand = cand.unionByName(cross)
            sh_old = spark.read.parquet(store_sh).where(
                F.col("batch_id") < batch_id
            ).select(id_col, "shingle")
            sh_all = sh_new.unionByName(sh_old)
        cand = cand.distinct()

        pairs = dedup.verify_jaccard_pairs(cand, sh_all, id_col, min_jaccard)
        pairs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "pairs", f"batch_id={batch_id}")
        )
        bk_new.write.mode("overwrite").parquet(
            os.path.join(store_bk, f"batch_id={batch_id}")
        )
        sh_new.write.mode("overwrite").parquet(
            os.path.join(store_sh, f"batch_id={batch_id}")
        )
        sh_new.unpersist()
        bk_new.unpersist()

    stream = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = stream.parquet(input_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_stream_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """All near-dup pairs emitted so far: (id_a, id_b, jaccard)."""
    return spark.read.parquet(os.path.join(out_dir, "pairs")).select(
        "id_a", "id_b", "jaccard"
    )
