"""Document deletion: tombstones + vacuum — the index-lifecycle piece
the reference lacks (its index is immutable once built; a production
corpus needs takedowns and re-ingests without a 10^12-turn rebuild).

Semantics are Lucene's live-docs model, stated explicitly:

  tombstone (delete_docs)  deleted docs stop appearing in ANY result
      (DataFrame path, segments scorer, sidecar), but corpus statistics
      — N, ADL, df — are NOT recomputed: surviving docs keep their exact
      scores.  This is what makes deletion O(deleted), not O(corpus),
      and it is also what Lucene does between merges.
  vacuum (vacuum_index)    physically rewrites the index without the
      deleted docs into a NEW directory (immutable index dirs, like
      merge/compact): dense doc_ids reassigned by the same deterministic
      rank, terms/stats recomputed, segments rebuilt — scores now
      reflect the reduced corpus, and the result is indistinguishable
      from a fresh build over the surviving corpus.  Still zero
      re-tokenization: postings rows are filtered and re-keyed, never
      re-derived from text.

Tombstones are an append-only parquet dir (out_dir/deletes/): each
delete_docs call writes (doc_no, doc_id) rows into its OWN uuid-named
subdirectory — no read-modify-write, and no two writers ever share an
output path (concurrent `mode("append")` jobs into one directory share
the FileOutputCommitter's `_temporary` staging dir and can clobber each
other's commits; per-call subdirs make concurrent deleters safe by
construction).  Duplicates across calls are harmless (every consumer
treats the set as membership).  Readers list the tree recursively, so
pre-subdir flat layouts keep working.

Scale note: query paths consume tombstones as an anti-join (DataFrame
path — arbitrarily large delete sets) or as an in-memory sorted id array
(segments scorer + sidecar — the live-docs-bitmap envelope: 10^8 deleted
ids ≈ 800 MB; beyond that, vacuum).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulse_spark.index import checkpoint as ckpt


def _deletes_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "deletes")


def delete_docs(spark: SparkSession, out_dir: str, doc_nos) -> int:
    """Tombstone documents by doc_no (list[str] or a 1-column DataFrame).
    Returns how many ids resolved against the docs table (unknown
    doc_nos are ignored).  Appends; never rewrites prior tombstones."""
    if not isinstance(doc_nos, DataFrame):
        doc_nos = spark.createDataFrame(
            [(str(d),) for d in doc_nos], "doc_no string"
        )
    docs = ckpt.read_stage(spark, out_dir, "docs")
    cols = ["doc_no", "doc_id"] if "doc_id" in docs.columns else ["doc_no"]
    resolved = docs.select(*cols).join(
        F.broadcast(doc_nos.select("doc_no").distinct()), "doc_no"
    )
    if "doc_id" not in resolved.columns:
        resolved = resolved.withColumn("doc_id", F.lit(None).cast("long"))
    n = resolved.count()
    if n:
        import uuid

        resolved.write.mode("overwrite").parquet(
            os.path.join(_deletes_dir(out_dir), uuid.uuid4().hex)
        )
    return n


def load_deletes(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """(doc_no, doc_id) tombstones, or None if nothing was ever deleted."""
    d = _deletes_dir(out_dir)
    if not os.path.isdir(d):
        return None
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(d)
        .select("doc_no", "doc_id")
    )


def deleted_id_array(out_dir: str) -> np.ndarray | None:
    """Sorted unique deleted doc_ids as int64 (driver/sidecar-side, via
    pyarrow — no Spark).  None if no tombstones."""
    d = _deletes_dir(out_dir)
    if not os.path.isdir(d):
        return None
    import pyarrow.parquet as pq

    try:
        t = pq.read_table(d, columns=["doc_id"])
    except FileNotFoundError:
        return None
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    ids = ids[~np.isnan(ids)] if ids.dtype.kind == "f" else ids
    return np.unique(ids.astype(np.int64))


def vacuum_index(spark: SparkSession, in_dir: str, out_dir: str,
                 num_doc_partitions: int | None = None):
    """Physically drop tombstoned docs: write a NEW committed index over
    the survivors (see module docstring for semantics).  Returns the new
    Index."""
    import json

    from pulse_spark.config import IndexingSettings
    from pulse_spark.index import build as B
    from pulse_spark.index.persist import Index

    with open(os.path.join(in_dir, "manifest.json")) as f:
        src_manifest = json.load(f)
    settings = IndexingSettings.from_dict(src_manifest["settings"])
    had_segments = "segments" in src_manifest.get("stages", {})

    manifest = ckpt.load_manifest(out_dir)
    manifest["settings"] = settings.to_dict()
    manifest["vacuumed_from"] = os.path.abspath(in_dir)
    ckpt.save_manifest(out_dir, manifest)

    dels = load_deletes(spark, in_dir)
    docs = ckpt.read_stage(spark, in_dir, "docs")
    if dels is not None:
        docs = docs.join(dels.select("doc_no"), "doc_no", "left_anti")

    has_ids = "doc_id" in docs.columns
    id_map = None
    parted = None
    if has_ids:
        # dense re-rank over the survivors: same deterministic key as the
        # builder (rank of (conv_id, turn_idx)), so a vacuumed index is
        # bit-compatible with a fresh build over the surviving corpus.
        # assign_doc_ids is the builder's range-partitioned two-phase
        # numbering (no global window — the 10^12-doc-safe path); the
        # id_map rows carry only ids + the 2-column key, never text.
        npart = num_doc_partitions or spark.sparkContext.defaultParallelism
        mapped, parted = B.assign_doc_ids(
            spark,
            docs.select(F.col("doc_id").alias("_old_id"),
                        "conv_id", "turn_idx"),
            npart,
        )
        id_map = mapped.select("_old_id", "doc_id")
        docs = (
            docs.withColumnRenamed("doc_id", "_old_id")
            .join(id_map, "_old_id")
            .drop("_old_id")
        )
    docs = ckpt.commit_stage(out_dir, manifest, "docs", docs)

    postings = ckpt.read_stage(spark, in_dir, "postings")
    if dels is not None:
        key = "doc_id" if "doc_id" in postings.columns else "doc_no"
        postings = postings.join(dels.select(key).distinct(), key, "left_anti")
    if "doc_id" in postings.columns and id_map is not None:
        postings = (
            postings.withColumnRenamed("doc_id", "_old_id")
            .join(id_map, "_old_id")
            .drop("_old_id")
        )
    id_col = "doc_id" if "doc_id" in postings.columns else "doc_no"
    n_salt = max(settings.salt_partitions, 1)
    if n_salt > 1:
        salt = F.pmod(F.xxhash64(id_col), F.lit(n_salt))
        postings = postings.repartition(
            settings.term_buckets * n_salt, "bucket", salt
        )
    else:
        postings = postings.repartition(settings.term_buckets, "bucket")
    postings = ckpt.commit_stage(
        out_dir, manifest, "postings", postings,
        partition_by=["bucket"], sort_within=["term", id_col],
    )
    if parted is not None:
        parted.unpersist()

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

    if had_segments and has_ids:
        from pulse_spark.index import segments as seg

        seg.build_segments(spark, out_dir, manifest, postings, settings)

    return Index(out_dir=out_dir, settings=settings, docs=docs,
                 postings=postings, terms=terms, n_docs=n_docs, adl=adl)
