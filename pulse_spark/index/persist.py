"""Persisted index build + load.

Layout (out_dir):
  manifest.json                 settings + stage lineage (checkpoint.py)
  docs/                         (doc_no, conv_id, turn_idx, text, doc_len
                                 [, doc_id when assign_ids])
  postings/bucket=B/            (term, <id>, tf, doc_len) where <id> is
                                the 8-byte doc_id when assign_ids=True
                                (slim layout — no doc_no string on the
                                wire) else the doc_no string; sorted by
                                (term, <id>) within files → parquet
                                row-group min/max prune on term
  terms/                        (term, df, max_tf)
  stats/                        single row (n_docs, adl)
  segments/doc_range=R/         (M3) block-compressed postings, see
                                segments.py

Equivalent of the reference's data/dump/<i>/ files (SURVEY §1.2) with the
merge (spimi.go:123-228) replaced by shuffles.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index import build as B
from pulse_spark.index import checkpoint as ckpt


@dataclass
class Index:
    out_dir: str
    settings: IndexingSettings
    docs: DataFrame
    postings: DataFrame
    terms: DataFrame
    n_docs: int
    adl: float

    @property
    def has_segments(self) -> bool:
        return os.path.isdir(os.path.join(self.out_dir, "segments"))


def build_persisted_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    settings: IndexingSettings = IndexingSettings(),
    num_doc_partitions: int | None = None,
    build_segments: bool = False,
    assign_ids: bool | None = None,
) -> Index:
    """Stage-checkpointed build; resumable — completed stages are skipped.

    assign_ids: dense deterministic doc_ids (rank of (conv_id, turn_idx)).
    Needed only by the compressed-segments layout (delta-varint wants
    ints); the DataFrame query path keys on doc_no, like the reference's
    doc numbers.  Defaults to build_segments — skipping it removes a
    range-sample pass, a full-corpus shuffle, and a count job from the
    build's critical path.
    """
    if assign_ids is None:
        assign_ids = build_segments
    if build_segments and not assign_ids:
        raise ValueError("segments need dense doc_ids (assign_ids=True)")
    manifest = ckpt.load_manifest(out_dir)
    ckpt.check_settings(manifest, settings)
    ckpt.save_manifest(out_dir, manifest)
    npart = num_doc_partitions or spark.sparkContext.defaultParallelism

    # stage: docs (dense deterministic doc_id only when needed)
    if ckpt.stage_done(manifest, "docs"):
        docs = ckpt.read_stage(spark, out_dir, "docs")
    else:
        d = B.docs_df(transcripts)
        cached = None
        if assign_ids:
            d, cached = B.assign_doc_ids(spark, d, npart)
        docs = ckpt.commit_stage(out_dir, manifest, "docs", d)
        if cached is not None:
            cached.unpersist()

    # stage: postings, hash-bucketed by term, term-sorted within files
    if ckpt.stage_done(manifest, "postings"):
        postings = ckpt.read_stage(spark, out_dir, "postings")
    else:
        # doc_id rides through the tokenizer — no join back to docs, so
        # the only shuffle here is the bucket layout one.  With dense ids
        # the posting row carries ONLY the 8-byte id (doc_no is recovered
        # at output time from the docs table): at 10^12 turns the doc_no
        # string would dominate shuffle/storage bytes.
        id_col = "doc_id" if assign_ids else "doc_no"
        p = B.postings_df(docs, settings, id_col=id_col)
        p = B.with_term_bucket(p, settings.term_buckets)
        # SALTED repartition (north rule): a bare repartition("bucket")
        # sends a hot term's millions of postings to ONE task — the stage
        # tail is then single-threaded and grows with corpus size (Zipf
        # text guarantees hot terms).  Salting by a hash of the doc id
        # splits each bucket across PARTITION_SALT tasks; partitionBy at
        # write still groups files under one bucket dir, so query-side
        # partition pruning is unchanged.
        n_salt = max(settings.salt_partitions, 1)
        if n_salt > 1:
            salt = F.pmod(F.xxhash64(id_col), F.lit(n_salt))
            p = p.repartition(settings.term_buckets * n_salt, "bucket", salt)
        else:
            p = p.repartition(settings.term_buckets, "bucket")
        postings = ckpt.commit_stage(
            out_dir, manifest, "postings", p,
            partition_by=["bucket"],
            sort_within=["term", "doc_id"] if assign_ids else ["term", "doc_no"],
        )

    # stage: terms (global lexicon merge: df sum, max_tf max)
    if ckpt.stage_done(manifest, "terms"):
        terms = ckpt.read_stage(spark, out_dir, "terms")
    else:
        terms = ckpt.commit_stage(out_dir, manifest, "terms", B.terms_df(postings))

    # stage: stats
    if ckpt.stage_done(manifest, "stats"):
        stats = ckpt.read_stage(spark, out_dir, "stats")
    else:
        stats = ckpt.commit_stage(out_dir, manifest, "stats", B.stats_df(docs))

    if build_segments and not ckpt.stage_done(manifest, "segments"):
        from pulse_spark.index import segments as seg
        seg.build_segments(spark, out_dir, manifest, postings, settings)

    row = stats.collect()[0]
    return Index(
        out_dir=out_dir,
        settings=settings,
        docs=docs,
        postings=postings,
        terms=terms,
        n_docs=int(row["n_docs"]),
        adl=float(row["adl"]),
    )


def load_index(spark: SparkSession, out_dir: str, cache_terms: bool = True) -> Index:
    """Open an existing index; settings come from the manifest, mirroring
    the reference's stats.bin coupling (engine.go:38-43).

    cache_terms: Spark-cache the terms table — the query path joins it on
    every search (the reference mmaps its lexicon once at load,
    engine.go:45-54; distributed cache is the Spark analog)."""
    manifest = ckpt.load_manifest(out_dir)
    if manifest["settings"] is None:
        raise FileNotFoundError(f"no index manifest at {out_dir}")
    settings = IndexingSettings.from_dict(manifest["settings"])
    docs = ckpt.read_stage(spark, out_dir, "docs")
    postings = ckpt.read_stage(spark, out_dir, "postings")
    terms = ckpt.read_stage(spark, out_dir, "terms")
    if cache_terms:
        terms = terms.cache()
    row = ckpt.read_stage(spark, out_dir, "stats").collect()[0]
    return Index(
        out_dir=out_dir, settings=settings, docs=docs,
        postings=postings, terms=terms,
        n_docs=int(row["n_docs"]), adl=float(row["adl"]),
    )
