"""Merge two committed indexes into one — the artifact-level analog of
the reference's SPIMI partial-index merge (spimi.go:123-228), re-expressed
over the parquet stage layout.

Why it exists: a production corpus arrives in batches (daily transcript
drops, per-tenant backfills).  Rebuilding 10^12 turns to add 10^9 is a
non-starter; merging two committed indexes touches only index artifacts
(postings/terms/stats/segments), never the source text, and every step is
a union + aggregation — no tokenization, no per-token work at all.

Mechanics (A absorbs B; doc_nos must be disjoint across inputs):

  docs      union, B.doc_id += offset
  postings  union, B.doc_id += offset; bucket values are identical on
            both sides (same term_buckets -> same xxhash64 bucketing), so
            the merged layout keeps partition pruning with NO shuffle
  terms     groupBy(term): df = sum, max_tf = max  (lexicon.go:37-42)
  stats     n = n_a + n_b, adl = weighted mean, fingerprint = xor-combine
            (the input fingerprint is an order-independent xor, so merge
            composes it exactly)
  segments  ONE linear mapInPandas pass over the union of both sides'
            blocks: B's doc_ids are shifted and its blocks re-split onto
            A's doc_range grid (batches of different sizes build with
            different range_size — np.searchsorted at the range
            boundaries, no sorting); and per-block max_part is
            RECOMPUTED for every block at the MERGED ADL.  The recompute
            is a correctness requirement, not housekeeping: max_part is
            increasing in ADL, so a bound stored against an input's own
            (smaller) ADL understates scores under the merged ADL and
            would make MaxScore pruning drop true top-k docs.

doc_id offset = A's id_space exactly (no padding), so merged ids stay
dense; stats still records `id_space` explicitly (= offset + B's
id_space) so dense-accumulator consumers (serve.PointServer) never have
to assume density.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index import checkpoint as ckpt
from pulse_spark.index.persist import Index


def merge_indexes(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    out_dir: str,
    check_disjoint: bool = True,
) -> Index:
    """Merge committed indexes at a_dir and b_dir into out_dir.

    Requires identical IndexingSettings on both inputs (an index's
    preprocessing binds its query path — engine.go:38-43 — so merging
    differently-preprocessed indexes would corrupt semantics).  Segments
    are merged iff BOTH inputs have them (and share range_size).

    check_disjoint: assert no doc_no occurs in both inputs (one count
    aggregation over the two docs tables — cheap next to the postings
    union; disable for trusted disjoint batches)."""
    ma = ckpt.load_manifest(a_dir)
    mb = ckpt.load_manifest(b_dir)
    if ma["settings"] is None or mb["settings"] is None:
        raise FileNotFoundError("both inputs must be committed indexes")
    if ma["settings"] != mb["settings"]:
        raise ValueError(
            f"settings mismatch: {ma['settings']} != {mb['settings']} — "
            "an index's preprocessing binds its query semantics"
        )
    settings = IndexingSettings.from_dict(ma["settings"])

    sa = ckpt.read_stage(spark, a_dir, "stats").collect()[0]
    sb = ckpt.read_stage(spark, b_dir, "stats").collect()[0]
    n_a, n_b = int(sa["n_docs"]), int(sb["n_docs"])
    # id_space of A (≥ n_docs when A is itself a gap-carrying merge)
    space_a = int(sa["id_space"]) if "id_space" in sa.asDict() else n_a

    seg_a = ma.get("stages", {}).get("segments")
    seg_b = mb.get("stages", {}).get("segments")
    do_segments = seg_a is not None and seg_b is not None
    offset = space_a

    if n_a == 0 or n_b == 0:
        raise ValueError("refusing to merge an empty index (nothing to do)")
    docs_a = ckpt.read_stage(spark, a_dir, "docs")
    docs_b = ckpt.read_stage(spark, b_dir, "docs")
    if sorted(docs_a.columns) != sorted(docs_b.columns):
        raise ValueError(
            "docs schema mismatch (e.g. one side built with assign_ids/"
            f"store_text and the other not): {sorted(docs_a.columns)} != "
            f"{sorted(docs_b.columns)}"
        )
    has_ids = "doc_id" in docs_a.columns
    if do_segments and not has_ids:
        raise ValueError("segment merge needs dense doc_ids on both inputs")

    if check_disjoint:
        dup = (
            docs_a.select("doc_no").intersect(docs_b.select("doc_no")).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"doc_no {dup[0]['doc_no']!r} exists in both inputs — "
                "merge requires disjoint corpora"
            )

    manifest = ckpt.load_manifest(out_dir)
    manifest["settings"] = settings.to_dict()
    manifest["merged_from"] = [os.path.abspath(a_dir), os.path.abspath(b_dir)]
    ckpt.save_manifest(out_dir, manifest)

    def _shift(df):
        return df.withColumn("doc_id", F.col("doc_id") + F.lit(offset)) if has_ids else df

    docs = ckpt.commit_stage(
        out_dir, manifest, "docs", docs_a.unionByName(_shift(docs_b))
    )

    post_a = ckpt.read_stage(spark, a_dir, "postings")
    post_b = ckpt.read_stage(spark, b_dir, "postings")
    if sorted(post_a.columns) != sorted(post_b.columns):
        raise ValueError(
            f"postings schema mismatch: {sorted(post_a.columns)} != "
            f"{sorted(post_b.columns)}"
        )
    id_col = "doc_id" if "doc_id" in post_a.columns else "doc_no"
    pb = (
        post_b.withColumn("doc_id", F.col("doc_id") + F.lit(offset))
        if id_col == "doc_id" else post_b
    )
    postings = ckpt.commit_stage(
        out_dir, manifest, "postings", post_a.unionByName(pb),
        partition_by=["bucket"], sort_within=["term", id_col],
    )

    terms = ckpt.commit_stage(
        out_dir, manifest, "terms",
        ckpt.read_stage(spark, a_dir, "terms")
        .unionByName(ckpt.read_stage(spark, b_dir, "terms"))
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.max("max_tf").alias("max_tf")),
    )

    # stats: weighted-exact mean; fingerprint xor-composes when present
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = n_a + n_b
    adl = (float(sa["adl"]) * n_a + float(sb["adl"]) * n_b) / n
    id_space = offset + (
        int(sb["id_space"]) if "id_space" in sb.asDict() else n_b
    )
    t0 = _time.time()
    stats_dir = os.path.join(out_dir, "stats")
    os.makedirs(stats_dir, exist_ok=True)
    pq.write_table(
        pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "adl": pa.array([adl], pa.float64()),
            "id_space": pa.array([id_space], pa.int64()),
        }),
        os.path.join(stats_dir, "part-00000.parquet"),
    )
    ckpt.record_stage(spark, out_dir, manifest, "stats",
                      round(_time.time() - t0, 3))
    fa, fb = ma.get("input_fingerprint"), mb.get("input_fingerprint")
    if fa and fb:
        manifest["input_fingerprint"] = {
            "rows": fa["rows"] + fb["rows"], "xor": fa["xor"] ^ fb["xor"]
        }
        ckpt.save_manifest(out_dir, manifest)

    if do_segments:
        _merge_segments(spark, a_dir, b_dir, out_dir, manifest, settings,
                        offset, int(seg_a["range_size"]), id_space, adl)

    return Index(out_dir=out_dir, settings=settings, docs=docs,
                 postings=postings, terms=terms, n_docs=n, adl=adl)


def _merge_segments(spark, a_dir, b_dir, out_dir, manifest, settings,
                    offset, range_size, id_space, adl):
    """One linear pass over both sides' blocks (see module docstring):
    shift+re-split B onto A's range grid, recompute max_part everywhere
    at the merged ADL.  Embarrassingly parallel; never sorts."""
    from collections.abc import Iterator

    import pandas as pd

    from pulse_spark.index.segments import (
        SEGMENT_SCHEMA,
        _encode_block,
        decode_payload,
    )

    compress = settings.compression
    rs = range_size

    def make_pass(shift: int):
        def blocks_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                out = []
                for term, ids_bin, tfs_bin, lens_bin in zip(
                    pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"],
                    pdf["doc_lens_bin"]
                ):
                    ids, tfs, lens = decode_payload(
                        ids_bin, tfs_bin, lens_bin, compress
                    )
                    if shift:
                        ids = ids + np.uint64(shift)
                    # split at the merged range grid (ids are ascending)
                    lo_r = int(ids[0]) // rs
                    hi_r = int(ids[-1]) // rs
                    if lo_r == hi_r:
                        pieces = [(lo_r, slice(None))]
                    else:
                        bounds = np.searchsorted(
                            ids, [np.uint64((r + 1) * rs)
                                  for r in range(lo_r, hi_r)]
                        )
                        cuts = [0, *bounds.tolist(), len(ids)]
                        pieces = [
                            (lo_r + i, slice(cuts[i], cuts[i + 1]))
                            for i in range(len(cuts) - 1)
                            if cuts[i] < cuts[i + 1]
                        ]
                    for rng, sl in pieces:
                        # _encode_block recomputes max_tf AND max_part at
                        # the MERGED adl — the pruning-safety requirement
                        out.append(_encode_block(
                            term, rng, ids[sl], tfs[sl], lens[sl], adl,
                            compress,
                        ))
                yield pd.DataFrame(
                    out, columns=[f.name for f in SEGMENT_SCHEMA.fields]
                )

        return blocks_pass

    cols = [f.name for f in SEGMENT_SCHEMA.fields]
    sa = (
        ckpt.read_stage(spark, a_dir, "segments").select(*cols)
        .mapInPandas(make_pass(0), SEGMENT_SCHEMA)
    )
    sb = (
        ckpt.read_stage(spark, b_dir, "segments").select(*cols)
        .mapInPandas(make_pass(offset), SEGMENT_SCHEMA)
    )
    ckpt.commit_stage(
        out_dir, manifest, "segments", sa.unionByName(sb),
        partition_by=["doc_range"], sort_within=["term", "min_doc_id"],
    )
    manifest["stages"]["segments"]["range_size"] = rs
    manifest["stages"]["segments"]["n_ranges"] = -(-id_space // rs)
    ckpt.save_manifest(out_dir, manifest)
