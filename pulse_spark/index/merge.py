"""Merge committed indexes into one — the artifact-level analog of the
reference's SPIMI partial-index merge (spimi.go:123-228), re-expressed
over the parquet stage layout.

Why it exists: a production corpus arrives in batches (daily transcript
drops, per-tenant backfills).  Rebuilding 10^12 turns to add 10^9 is a
non-starter; merging committed indexes touches only index artifacts
(postings/terms/stats/segments), never the source text, and every step is
a union + aggregation — no tokenization, no per-token work at all.

Mechanics (N-way; doc_nos must be disjoint across inputs; input i's
doc_ids are shifted by the cumulative id_space of inputs 0..i-1):

  docs      union, input_i.doc_id += offset_i
  postings  union, shifted; bucket values are identical on every side
            (same term_buckets -> same xxhash64 bucketing), so the
            merged layout keeps partition pruning with NO shuffle
  terms     groupBy(term): df = sum, max_tf = max  (lexicon.go:37-42)
  stats     n = Σ n_i, adl = weighted mean, fingerprint = xor-combine
            (the input fingerprint is an order-independent xor, so merge
            composes it exactly)
  deletes   tombstones (index/deletes.py) are CARRIED FORWARD: each
            input's (doc_no, doc_id) rows are doc_id-shifted by that
            input's offset and written into the output's deletes/ tree,
            so a doc deleted before the merge stays deleted after it
            (takedown safety — merging must never resurrect).  Live-docs
            semantics are preserved: merged N/ADL/df still count the
            tombstoned docs, exactly as they did in the input.
  segments  ONE linear mapInPandas pass over the union of all sides'
            blocks: each input's doc_ids are shifted and its blocks
            re-split onto the FIRST input's doc_range grid (inputs may
            have different range_size — np.searchsorted at the range
            boundaries, no sorting); and per-block max_part is
            RECOMPUTED for every block at the MERGED ADL.  The recompute
            is a correctness requirement, not housekeeping: max_part is
            increasing in ADL, so a bound stored against an input's own
            (smaller) ADL understates scores under the merged ADL and
            would make MaxScore pruning drop true top-k docs.

doc_id offset = the cumulative id_space exactly (no padding), so merged
ids stay dense; stats still records `id_space` explicitly so
dense-accumulator consumers (serve.PointServer) never have to assume
density.
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
    """Two-way convenience form of merge_many (A absorbs B)."""
    return merge_many(spark, [a_dir, b_dir], out_dir,
                      check_disjoint=check_disjoint)


def _spans_disjoint(spans: list[tuple]) -> bool:
    """True iff every input's [min,max] doc_no interval is disjoint from
    every other's — a PROOF of doc_no disjointness that costs one
    shuffle-free agg per input (see check_disjoint below)."""
    spans = sorted(spans)
    return all(
        spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1)
    )


def merge_many(
    spark: SparkSession,
    in_dirs: list[str],
    out_dir: str,
    check_disjoint: bool = True,
) -> Index:
    """Merge N committed indexes into out_dir in ONE pass (a pairwise
    fold would rewrite the accumulated artifacts N-1 times; this unions
    all inputs once — the same single-pass shape as the reference's
    N-way SPIMI merge, spimi.go:123-146, which heap-merges all partial
    indexes together rather than two at a time).

    Requires identical IndexingSettings on all inputs (an index's
    preprocessing binds its query path — engine.go:38-43 — so merging
    differently-preprocessed indexes would corrupt semantics).  Segments
    are merged iff ALL inputs have them; inputs may have DIFFERENT
    range_size — every side's blocks are re-split onto the first input's
    range grid (the module docstring's linear pass).

    check_disjoint: assert no doc_no occurs in two inputs (one count
    aggregation over the union of docs tables — cheap next to the
    postings union; disable for trusted disjoint batches)."""
    if len(in_dirs) < 2:
        raise ValueError("merge needs at least two inputs")
    # realpath, not abspath: a symlink alias of an input would bypass an
    # abspath guard and _merge_tombstones' rmtree would then delete the
    # input's deletes/ tree mid-merge
    if any(os.path.realpath(d) == os.path.realpath(out_dir) for d in in_dirs):
        # refuse BEFORE any stage write — merging an index into itself
        # would clobber the input mid-read
        raise ValueError("merge out_dir must differ from every input dir")
    manifests = [ckpt.load_manifest(d) for d in in_dirs]
    for d, m in zip(in_dirs, manifests):
        if m["settings"] is None:
            raise FileNotFoundError(f"{d} is not a committed index")
        if m["settings"] != manifests[0]["settings"]:
            raise ValueError(
                f"settings mismatch: {manifests[0]['settings']} != "
                f"{m['settings']} ({d}) — an index's preprocessing binds "
                "its query semantics"
            )
    settings = IndexingSettings.from_dict(manifests[0]["settings"])

    stats_rows = [
        ckpt.read_stage(spark, d, "stats").collect()[0] for d in in_dirs
    ]
    n_i = [int(s["n_docs"]) for s in stats_rows]
    # id_space (≥ n_docs when an input is itself a gap-carrying merge)
    space_i = [
        int(s["id_space"]) if "id_space" in s.asDict() else int(s["n_docs"])
        for s in stats_rows
    ]
    if any(n == 0 for n in n_i):
        raise ValueError("refusing to merge an empty index (nothing to do)")
    offsets = [0]
    for sp in space_i[:-1]:
        offsets.append(offsets[-1] + sp)
    id_space = offsets[-1] + space_i[-1]

    seg_meta = [m.get("stages", {}).get("segments") for m in manifests]
    do_segments = all(s is not None for s in seg_meta)

    docs_in = [ckpt.read_stage(spark, d, "docs") for d in in_dirs]
    for d, df in zip(in_dirs, docs_in):
        if sorted(df.columns) != sorted(docs_in[0].columns):
            raise ValueError(
                "docs schema mismatch (e.g. one side built with assign_ids/"
                f"store_text and the other not): {sorted(docs_in[0].columns)}"
                f" != {sorted(df.columns)} ({d})"
            )
    has_ids = "doc_id" in docs_in[0].columns
    if do_segments and not has_ids:
        raise ValueError("segment merge needs dense doc_ids on all inputs")

    if check_disjoint:
        # cheap exact pre-pass: per-input (min,max) doc_no is a
        # map-side-combine agg (one row to the driver, NO shuffle).
        # Corpora are usually ingested in disjoint doc_no ranges
        # (per-batch prefixes, monotone ids) — when every pair of
        # intervals is disjoint the inputs are PROVABLY disjoint and the
        # O(total-docs) union+groupBy below is skipped entirely; only
        # overlapping intervals pay for the full check (round-4 advisor:
        # at 10^12 docs the unconditional shuffle dominated the merge's
        # "cheap" guard)
        intervals_disjoint = _spans_disjoint([
            tuple(df.agg(F.min("doc_no"), F.max("doc_no")).collect()[0])
            for df in docs_in
        ])
    if check_disjoint and not intervals_disjoint:
        # count DISTINCT source inputs per doc_no — a duplicate doc_no
        # WITHIN one input is that input's own business (the old
        # pairwise intersect accepted it; a raw union-count would
        # misreport it as a cross-input overlap)
        union_nos = docs_in[0].select("doc_no").withColumn("_src", F.lit(0))
        for i, df in enumerate(docs_in[1:], start=1):
            union_nos = union_nos.unionByName(
                df.select("doc_no").withColumn("_src", F.lit(i))
            )
        dup = (
            union_nos.groupBy("doc_no")
            .agg(F.countDistinct("_src").alias("_n_src"))
            .where(F.col("_n_src") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"doc_no {dup[0]['doc_no']!r} exists in both inputs — "
                "merge requires disjoint corpora"
            )

    manifest = ckpt.load_manifest(out_dir)
    manifest["settings"] = settings.to_dict()
    manifest["merged_from"] = [os.path.abspath(d) for d in in_dirs]
    ckpt.save_manifest(out_dir, manifest)

    def _shift(df, off):
        return (
            df.withColumn("doc_id", F.col("doc_id") + F.lit(off))
            if has_ids and off else df
        )

    docs_u = _shift(docs_in[0], 0)
    for df, off in zip(docs_in[1:], offsets[1:]):
        docs_u = docs_u.unionByName(_shift(df, off))
    docs = ckpt.commit_stage(out_dir, manifest, "docs", docs_u)

    posts_in = [ckpt.read_stage(spark, d, "postings") for d in in_dirs]
    for d, df in zip(in_dirs, posts_in):
        if sorted(df.columns) != sorted(posts_in[0].columns):
            raise ValueError(
                f"postings schema mismatch: {sorted(posts_in[0].columns)} != "
                f"{sorted(df.columns)} ({d})"
            )
    id_col = "doc_id" if "doc_id" in posts_in[0].columns else "doc_no"

    def _shift_p(df, off):
        return (
            df.withColumn("doc_id", F.col("doc_id") + F.lit(off))
            if id_col == "doc_id" and off else df
        )

    posts_u = posts_in[0]
    for df, off in zip(posts_in[1:], offsets[1:]):
        posts_u = posts_u.unionByName(_shift_p(df, off))
    postings = ckpt.commit_stage(
        out_dir, manifest, "postings", posts_u,
        partition_by=["bucket"], sort_within=["term", id_col],
    )

    terms_u = ckpt.read_stage(spark, in_dirs[0], "terms")
    for d in in_dirs[1:]:
        terms_u = terms_u.unionByName(ckpt.read_stage(spark, d, "terms"))
    terms = ckpt.commit_stage(
        out_dir, manifest, "terms",
        terms_u.groupBy("term").agg(
            F.sum("df").alias("df"), F.max("max_tf").alias("max_tf")
        ),
    )

    # stats: weighted-exact mean; fingerprint xor-composes when present
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = sum(n_i)
    adl = sum(float(s["adl"]) * ni for s, ni in zip(stats_rows, n_i)) / n
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
    fps = [m.get("input_fingerprint") for m in manifests]
    if all(fps):
        fp = {"rows": 0, "xor": 0}
        for f in fps:
            fp["rows"] += f["rows"]
            fp["xor"] ^= f["xor"]
        manifest["input_fingerprint"] = fp
        ckpt.save_manifest(out_dir, manifest)

    _merge_tombstones(spark, in_dirs, offsets, out_dir)

    if do_segments:
        _merge_segments(spark, in_dirs, out_dir, manifest, settings,
                        offsets, int(seg_meta[0]["range_size"]),
                        id_space, adl)

    return Index(out_dir=out_dir, settings=settings, docs=docs,
                 postings=postings, terms=terms, n_docs=n, adl=adl)


def _merge_tombstones(spark, in_dirs, offsets, out_dir):
    """Carry every input's live-docs tombstones into the output with its
    doc_ids shifted by the same offset the docs union used — deleting
    then merging must equal merging then deleting (takedown safety;
    pinned in tests/test_merge.py).  O(deleted) rows, zero cost when no
    input has tombstones.

    Idempotent like every other merge stage: the output's deletes/ tree
    is CLEARED first, so re-merging into a previously-used out_dir
    cannot leave a prior run's tombstones behind (their doc_id offsets
    were computed for the OLD input set — stale ones would silently
    tombstone live docs of the new index).  Post-merge `delete_docs`
    calls append fresh uuid subdirs as usual."""
    import shutil

    from pulse_spark.index.deletes import load_deletes

    out_deletes = os.path.join(out_dir, "deletes")
    # out_dir != every in_dir is guaranteed by merge_many's early guard,
    # so this never removes an INPUT's tombstones
    shutil.rmtree(out_deletes, ignore_errors=True)
    parts = []
    for d, off in zip(in_dirs, offsets):
        dels = load_deletes(spark, d)
        if dels is None:
            continue
        # null doc_id (a no-dense-ids build) stays null under the shift
        parts.append(dels.withColumn("doc_id", F.col("doc_id") + F.lit(off)))
    if not parts:
        return
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    merged.write.mode("overwrite").parquet(
        os.path.join(out_deletes, "merged")
    )


def _merge_segments(spark, in_dirs, out_dir, manifest, settings,
                    offsets, range_size, id_space, adl):
    """One linear pass over every side's blocks (see module docstring):
    shift + re-split each input onto the first input's range grid,
    recompute max_part everywhere at the merged ADL.  Embarrassingly
    parallel; never sorts."""
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

    from pulse_spark.index.segments import SEGMENT_ROW_GROUP_BYTES

    cols = [f.name for f in SEGMENT_SCHEMA.fields]
    union = None
    for d, off in zip(in_dirs, offsets):
        side = (
            ckpt.read_stage(spark, d, "segments").select(*cols)
            .mapInPandas(make_pass(off), SEGMENT_SCHEMA)
        )
        union = side if union is None else union.unionByName(side)
    ckpt.commit_stage(
        out_dir, manifest, "segments", union,
        partition_by=["doc_range"], sort_within=["term", "min_doc_id"],
        options={"parquet.block.size": str(SEGMENT_ROW_GROUP_BYTES)},
    )
    manifest["stages"]["segments"]["range_size"] = rs
    manifest["stages"]["segments"]["n_ranges"] = -(-id_space // rs)
    ckpt.save_manifest(out_dir, manifest)
