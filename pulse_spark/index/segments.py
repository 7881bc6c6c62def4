"""Block-structured compressed posting segments + per-block max-score
metadata — the performance path for query execution.

Layout (out_dir/segments/, parquet partitioned by doc_range):
  (doc_range int, term string, min_doc_id long, max_doc_id long, n int,
   doc_ids_bin binary,   -- delta+varint (codecs.py, reference bitstream)
   tfs_bin binary,       -- unary, min=1 (reference bitstream)
   doc_lens_bin binary,  -- uint32 LE raw (reference doc.bin style)
   max_tf int, max_part double)

max_part = max over block entries of  tf / (k1*((1-b) + b*dl/ADL) + tf)
— the df-independent BM25 factor; a block's score upper bound for a term
with document frequency df is  ln(N/df) * max_part.  The reference
computes MaxTermFrequency for exactly this purpose but never uses it
(lexicon.go:37, spimi.go:197; SURVEY §4.3) — here the scorer actually
prunes with it.

Scale design: documents are split into doc_ranges (the unit of scoring
parallelism — the analog of the reference's per-partition search,
search.go:52-62).  Segment build is ONE shuffle (repartition by
doc_range, sort by term within partitions) and a linear mapInPandas pass;
no per-term grouping, so hot terms cannot skew an aggregation — a mega
term simply spans many blocks across ranges.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulse_spark.compression.codecs import (
    delta_varint_decode,
    delta_varint_encode,
    unary_decode,
    unary_encode,
)
from pulse_spark.config import BM25_B, BM25_K1, IndexingSettings

# Parquet row-group size for the segments stage.  Row-group min/max
# stats on `term` are the ONLY pruning unit a term-filtered reader gets
# (parquet predicate pushdown decodes whole row groups, and the sidecar's
# pyarrow scan does no page-level pruning) — with Spark's 128 MB default,
# one cold hot-term lookup at a 9M-doc corpus decompressed hundreds of
# MB of other terms' blocks (measured 1.48 s read for one term).  1 MB
# groups make the pruning unit ~the size of one term's local run: same
# lookup reads a few MB (measured ~10x faster cold).  Cost: more row
# groups per file — a full-scan (merge/compact) pays a few % more footer
# and boundary overhead, which the merge bench absorbs in noise.
SEGMENT_ROW_GROUP_BYTES = 1 << 20

SEGMENT_SCHEMA = T.StructType([
    T.StructField("doc_range", T.IntegerType()),
    T.StructField("term", T.StringType()),
    T.StructField("min_doc_id", T.LongType()),
    T.StructField("max_doc_id", T.LongType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("doc_ids_bin", T.BinaryType()),
    T.StructField("tfs_bin", T.BinaryType()),
    T.StructField("doc_lens_bin", T.BinaryType()),
    T.StructField("max_tf", T.IntegerType()),
    T.StructField("max_part", T.DoubleType()),
])


def _encode_block(term, rng, ids, tfs, lens, adl, compress):
    ids = np.asarray(ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    lens = np.asarray(lens, dtype=np.uint64)
    part = tfs / (BM25_K1 * ((1 - BM25_B) + BM25_B * (lens / adl)) + tfs)
    if compress:
        ids_bin = delta_varint_encode(ids)
        tfs_bin = unary_encode(tfs, minimum=1)
    else:
        ids_bin = ids.astype("<u4").tobytes()
        tfs_bin = tfs.astype("<u4").tobytes()
    return {
        "doc_range": int(rng),
        "term": term,
        "min_doc_id": int(ids[0]),
        "max_doc_id": int(ids[-1]),
        "n": int(len(ids)),
        "doc_ids_bin": ids_bin,
        "tfs_bin": tfs_bin,
        "doc_lens_bin": lens.astype("<u4").tobytes(),
        "max_tf": int(tfs.max()),
        "max_part": float(part.max()),
    }


def decode_payload(ids_bin: bytes, tfs_bin: bytes, lens_bin: bytes, compress: bool):
    """-> (doc_ids u64, tfs u64, doc_lens u64) numpy arrays."""
    if compress:
        ids = delta_varint_decode(bytes(ids_bin))
        tfs = unary_decode(bytes(tfs_bin), minimum=1)
    else:
        ids = np.frombuffer(bytes(ids_bin), dtype="<u4").astype(np.uint64)
        tfs = np.frombuffer(bytes(tfs_bin), dtype="<u4").astype(np.uint64)
    lens = np.frombuffer(bytes(lens_bin), dtype="<u4").astype(np.uint64)
    return ids, tfs, lens


def decode_block(row, compress: bool):
    """-> (doc_ids u64, tfs u64, doc_lens u64) numpy arrays."""
    return decode_payload(
        row["doc_ids_bin"], row["tfs_bin"], row["doc_lens_bin"], compress
    )


def build_segments(
    spark: SparkSession,
    out_dir: str,
    manifest: dict,
    postings: DataFrame,
    settings: IndexingSettings,
    n_ranges: int | None = None,
) -> DataFrame:
    """postings must carry (term, doc_id, tf, doc_len). One shuffle."""
    import os

    from pulse_spark.index import checkpoint as ckpt

    adl_row = spark.read.parquet(os.path.join(out_dir, "stats")).collect()[0]
    adl = float(adl_row["adl"])
    n_docs = int(adl_row["n_docs"])
    n_ranges = n_ranges or max(spark.sparkContext.defaultParallelism, 8)
    range_size = max(1, -(-n_docs // n_ranges))  # ceil
    block_size = settings.block_size
    compress = settings.compression

    src = postings.withColumn(
        "doc_range", (F.col("doc_id") / F.lit(range_size)).cast("int")
    )

    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: list[dict] = []
        cur_term, cur_rng = None, None
        ids: list[int] = []
        tfs: list[int] = []
        lens: list[int] = []

        def flush():
            nonlocal ids, tfs, lens
            if ids:
                out.append(
                    _encode_block(cur_term, cur_rng, ids, tfs, lens, adl, compress)
                )
                ids, tfs, lens = [], [], []

        for pdf in batches:
            for term, rng, did, tf, dl in zip(
                pdf["term"], pdf["doc_range"], pdf["doc_id"], pdf["tf"], pdf["doc_len"]
            ):
                if term != cur_term or rng != cur_rng or len(ids) >= block_size:
                    flush()
                    cur_term, cur_rng = term, rng
                ids.append(int(did)); tfs.append(int(tf)); lens.append(int(dl))
        flush()
        yield pd.DataFrame(out, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    seg = (
        src.repartition(n_ranges, "doc_range")
        .sortWithinPartitions("term", "doc_id")
        .select("term", "doc_range", "doc_id", "tf", "doc_len")
        .mapInPandas(encode_partition, SEGMENT_SCHEMA)
    )
    committed = ckpt.commit_stage(
        out_dir, manifest, "segments", seg, partition_by=["doc_range"],
        sort_within=["term", "min_doc_id"],
        options={"parquet.block.size": str(SEGMENT_ROW_GROUP_BYTES)},
    )
    manifest["stages"]["segments"]["range_size"] = range_size
    manifest["stages"]["segments"]["n_ranges"] = n_ranges
    ckpt.save_manifest(out_dir, manifest)
    return committed


# ---------------------------------------------------------------------------
# MaxScore / block-max scorer
# ---------------------------------------------------------------------------


def search_segments(
    spark: SparkSession,
    index,
    queries: DataFrame,
    k: int = 10,
    metric: str = "BM25",
    conjunctive: bool = False,
) -> DataFrame:
    """Top-k over the compressed segments with MaxScore pruning.

    Per (query_id, doc_range) an applyInPandas scorer runs term-at-a-time
    accumulation in numpy; terms are processed in decreasing score-upper
    order and once the remaining terms' summed upper bound cannot lift a
    NEW document into the current top-k, later terms only update existing
    candidates and skip blocks that cannot intersect them (block-level
    min/max doc id + per-block max_part bound).  Score-safe: pruning uses
    a strict 1e-9 margin, so the returned top-k equals the exact path's.

    Shuffle profile: segments join broadcast(query terms) → shuffle by
    (query_id, doc_range) [rows = query's blocks, not postings] → ≤ k rows
    per group out → global window top-k over ≤ k·ranges rows.
    """
    import json
    import os

    from pulse_spark.query.search import tokenize_queries

    manifest = json.load(open(os.path.join(index.out_dir, "manifest.json")))
    compress = index.settings.compression
    n, adl = index.n_docs, index.adl
    # live-docs tombstones (index/deletes.py): deleted postings are
    # dropped DURING accumulation (not after top-k) so MaxScore's k-th
    # threshold never rests on a deleted doc's score — a post-hoc filter
    # would both under-fill k and make the pruning bound unsafe
    from pulse_spark.index.deletes import deleted_id_array

    del_ids = deleted_id_array(index.out_dir)
    if metric.upper() not in ("BM25", "TFIDF"):
        raise ValueError(f"{metric} is not a valid metric")
    use_bm25 = metric.upper() == "BM25"

    qt = tokenize_queries(queries, index)
    qt = qt.join(index.terms.select("term", "df"), "term")
    # per-term occurrence weight (duplicate tokens score multiple times)
    qw = qt.groupBy("query_id", "term", "df").agg(
        F.count(F.lit(1)).cast("int").alias("w")
    )
    q_terms = [r["term"] for r in qw.select("term").distinct().collect()]
    if not q_terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    n_req = {
        r["query_id"]: r["cnt"]
        for r in qw.groupBy("query_id").agg(F.count_distinct("term").alias("cnt")).collect()
    }

    seg = spark.read.parquet(os.path.join(index.out_dir, "segments"))
    seg = seg.where(F.col("term").isin(q_terms))
    joined = seg.join(F.broadcast(qw), "term")

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    range_size = int(manifest["stages"]["segments"]["range_size"])

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # Dense range-local numpy accumulation (serve.py:175-195 pattern):
        # acc[doc_id - base] += score — no per-posting Python loop anywhere
        # on the posting-volume path.  Memory: the dense arrays cover the
        # doc ids actually present in this range (≤ range_size entries ×
        # 13 B), bounded by construction — at larger corpora n_ranges
        # grows with the corpus so range_size (and the accumulator) stays
        # fixed per task.
        qid = int(pdf["query_id"].iloc[0])
        base = int(pdf["doc_range"].iloc[0]) * range_size

        df_col = pdf["df"].to_numpy()
        w_col = pdf["w"].to_numpy()
        mp_col = pdf["max_part"].to_numpy()
        mt_col = pdf["max_tf"].to_numpy()
        lo_col = pdf["min_doc_id"].to_numpy()
        hi_col = pdf["max_doc_id"].to_numpy()
        ids_bins = pdf["doc_ids_bin"].tolist()
        tfs_bins = pdf["tfs_bin"].tolist()
        lens_bins = pdf["doc_lens_bin"].tolist()

        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(pdf["term"].tolist()):
            by_term.setdefault(t, []).append(i)

        infos = []
        for t, rows in by_term.items():
            idf = math.log(n / int(df_col[rows[0]]))
            wgt = int(w_col[rows[0]])
            if use_bm25:
                upper = wgt * idf * float(mp_col[rows].max())
            else:
                upper = wgt * (1 + math.log(int(mt_col[rows].max()))) * idf
            infos.append((rows, wgt, idf, upper))
        infos.sort(key=lambda x: -x[3])
        suffix = np.cumsum([u for *_, u in infos][::-1])[::-1]

        size = int(hi_col.max()) - base + 1
        acc = np.zeros(size, dtype=np.float64)
        # matched = MEMBERSHIP (zero-score postings of idf=0 terms still
        # belong to the disjunctive candidate set — rank-identity)
        matched = np.zeros(size, dtype=bool)
        hits = np.zeros(size, dtype=np.int32) if conjunctive else None
        n_matched = 0
        for i, (rows, wgt, idf, upper) in enumerate(infos):
            remaining = suffix[i]
            kth = -math.inf
            if n_matched >= k:
                kth = -np.partition(-acc[matched], k - 1)[k - 1]
            only_existing = (
                (not conjunctive) and n_matched >= k and remaining < kth - 1e-9
            )
            if only_existing:
                nz = np.nonzero(matched)[0]
                lo, hi = int(nz[0]) + base, int(nz[-1]) + base
            for ri in rows:
                if only_existing and (hi_col[ri] < lo or lo_col[ri] > hi):
                    continue  # block-level skip: cannot intersect candidates
                ids, tfs, lens = decode_payload(
                    ids_bins[ri], tfs_bins[ri], lens_bins[ri], compress
                )
                if del_ids is not None and ids.size:
                    live = ~np.isin(ids.astype(np.int64), del_ids,
                                    assume_unique=False)
                    if not live.all():
                        ids, tfs, lens = ids[live], tfs[live], lens[live]
                        if ids.size == 0:
                            continue
                if use_bm25:
                    part = tfs / (
                        BM25_K1 * ((1 - BM25_B) + BM25_B * (lens / adl)) + tfs
                    )
                    sc = wgt * idf * part
                else:
                    sc = wgt * (1 + np.log(tfs.astype(np.float64))) * idf
                idx = ids.astype(np.int64) - base
                if only_existing:
                    m = matched[idx]
                    acc[idx[m]] += sc[m]
                else:
                    acc[idx] += sc
                    new = ~matched[idx]
                    n_matched += int(np.count_nonzero(new))
                    matched[idx] = True
                    if conjunctive:
                        # conjunctive never prunes (only_existing False), so
                        # every posting passes here once per term — a doc's
                        # hit count is its distinct-term count
                        hits[idx] += 1

        if conjunctive:
            cand = np.nonzero(hits >= n_req.get(qid, 0))[0]
        else:
            cand = np.nonzero(matched)[0]
        if cand.size == 0:
            return pd.DataFrame(columns=["query_id", "doc_id", "score"]).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        scores = acc[cand]
        if cand.size > k:
            kth = -np.partition(-scores, k - 1)[k - 1]
            keep = scores >= kth  # ties widen; doc_id tiebreak below
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        return pd.DataFrame({
            "query_id": np.full(len(order), qid, dtype=np.int64),
            "doc_id": cand[order] + base,
            "score": scores[order],
        })

    local = joined.groupBy("query_id", "doc_range").applyInPandas(
        score_group, out_schema
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w) - 1)
        .where(F.col("rank") < k)
        .select("query_id", "rank", "doc_id", "score")
    )
