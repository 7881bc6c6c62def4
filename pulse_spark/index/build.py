"""Distributed inverted-index build — the Spark-first replacement for the
reference's SPIMI pipeline (pkg/spimi/spimi.go:33-228).

Where the reference tokenizes on worker goroutines behind a mutex-guarded
in-memory lexicon, spills partial indexes on a memory watchdog, and merges
them sequentially, this builder declares the same computation as a
DataFrame plan and lets Spark's shuffle machinery do the spilling and the
merge:

  transcripts ──mapInPandas tokenize──► exploded terms
      ──groupBy(doc,term).count()──► postings (tf)           [shuffle 1]
      ──groupBy(term).agg(df,max_tf)──► terms                [shuffle 2*]
      ──agg(count,avg)──► stats (N, ADL)

(*) partial/map-side aggregation makes shuffle 2 carry one row per
(task, term) — the salted two-phase pattern the north rule asks for is
exactly Catalyst's partial+final HashAggregate; an explicit salt column is
only needed for order-sensitive merges (segment building), where we avoid
per-term grouping entirely by range-partitioning on (term, doc_id) and
cutting bounded blocks inside each partition (segments.py).

The build is stage-checkpointed: each stage commits a parquet directory
and a manifest entry with per-partition row counts (lineage); re-running
with the same out_dir skips completed stages (see checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.text.udfs import doc_no, make_term_freq_udf, trimmed

# ---------------------------------------------------------------------------
# logical-plan builders (no IO) — shared by the persisted build and the
# in-memory harness queries
# ---------------------------------------------------------------------------


def docs_df(transcripts: DataFrame) -> DataFrame:
    """One row per turn: (doc_no, conv_id, turn_idx, text, doc_len).

    doc_len = bytes of ASCII-trimmed raw text (reference spimi.go:109 via
    ms-marco.go:70); every turn counts toward N/ADL even if it tokenizes
    to nothing (builder.add is unconditional, builder.go:38-47).
    """
    t = trimmed("text")
    return transcripts.select(
        doc_no().alias("doc_no"),
        "conv_id",
        "turn_idx",
        t.alias("text"),
        F.octet_length(t).alias("doc_len"),
    )


def postings_df(
    docs: DataFrame,
    settings: IndexingSettings,
    id_col: str = "doc_no",
    extra_cols: tuple[str, ...] = (),
    tokenizer: str = "arrow",
) -> DataFrame:
    """(term, <id_col>, tf, doc_len [, extra_cols]): the exploded
    inverted index.

    tokenizer strategies (identical output, different execution; both
    ZERO-shuffle — tf is doc-local either way):

    - "arrow" (default): the fused pandas-UDF path (tokenize + doc-local
      tf inside one Arrow batch — preprocess.Frequencies,
      preprocess.go:36-46); every token pays Python.

    - "expr": JVM whole-stage-codegen tokenization + per-doc tf as column
      expressions for short ASCII rows (text/exprs.py); Porter (when
      enabled) is the only Python left — an Arrow UDF of memoized dict
      lookups, O(vocab) Porter runs.  Non-ASCII or very long rows fall
      back to the exact fused UDF.

    Default choice is MEASURED, not assumed (BENCH.md §1): on this
    sandbox the build's bottleneck is the JVM shuffle+parquet side, not
    Python — the Spark-free tokenizer pool does 411 k docs/s at 8 procs
    vs the whole build's ~80 k turns/s, so "arrow" wins the head-to-head
    (~80 k vs ~60 k turns/s at 8 cores; expr's extra scan+Arrow stem
    round-trip costs more than the Python it removes).  "expr" is the
    right strategy only once per-node build throughput approaches the
    Python workers' ceiling (real clusters with fast local NVMe shuffle,
    or stemming=False configs where it is pure codegen end-to-end).

    Equivalent of the reference's per-partition Lexicon accumulation +
    global merge (lexicon.go:28-42, spimi.go:123-228).  doc_len (and
    optionally doc_id) are denormalized into the posting row so scoring
    never joins the docs table (the reference likewise reads
    (docno, size) per hit).
    """
    keep = [id_col, "doc_len", *extra_cols]
    if tokenizer == "arrow":
        tf = make_term_freq_udf(settings.preprocess)
        exploded = docs.select(
            *keep, F.explode(tf(F.col("text"))).alias("p")
        )
        return exploded.select(
            F.col("p.term").alias("term"), *keep, F.col("p.tf").alias("tf")
        )
    if tokenizer != "expr":
        raise ValueError(f"unknown tokenizer strategy {tokenizer!r}")

    from pulse_spark.text import exprs as X

    pre = settings.preprocess
    base = docs.select(*keep, "text")
    fast = X.is_ascii(F.col("text")) & (
        F.octet_length(F.col("text")) < F.lit(X.MAX_EXPR_DOC_BYTES)
    )
    jvm = base.where(fast).select(
        *keep,
        X.tokens_ascii_expr(F.col("text"), pre.stopwords_removal).alias("_toks"),
    )
    if pre.stemming:
        # stemming happens AFTER tokenization and BEFORE counting, so
        # stem collisions within a doc merge in the tf count below —
        # identical to the reference's stem-then-Frequencies order
        jvm = jvm.select(
            *keep, X.make_stem_arr_udf()(F.col("_toks")).alias("_toks")
        )
    jvm = jvm.select(*keep, F.explode(X.term_freqs_expr(F.col("_toks"))).alias("p"))
    # non-ASCII or very long rows: the exact fused Python pipeline.  The
    # union scans the source twice (each branch filters its rows); scan
    # cost is tiny next to tokenization, and every row is processed by
    # exactly one branch — NULL text matches neither filter, which equals
    # the UDF path's empty token list (no posting rows either way).
    tf = make_term_freq_udf(pre)
    py = base.where(~fast).select(
        *keep, F.explode(tf(F.col("text"))).alias("p")
    )
    return jvm.unionByName(py).select(
        F.col("p.term").alias("term"), *keep, F.col("p.tf").alias("tf")
    )


def terms_df(postings: DataFrame) -> DataFrame:
    """Global term table: (term, df, max_tf) — the merged lexicon
    (df summed, max_tf maxed across partitions; spimi.go:196-197).
    Catalyst's partial+final hash aggregate is the salted two-phase merge."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.max("tf").alias("max_tf"),
    )


def stats_df(docs: DataFrame) -> DataFrame:
    """(n_docs, adl): corpus size + average doc length (stats.go:8-12).
    Exact mean — the reference's incremental/weighted mean converges to
    the same value (collection.go:22, stats.go:19-23)."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("adl"),
    )


def assign_doc_ids(
    spark: SparkSession, docs: DataFrame, num_partitions: int
) -> tuple[DataFrame, DataFrame]:
    """Dense, deterministic doc_id = rank of (conv_id, turn_idx).

    Scalable two-phase assignment (no global window): range-partition by
    the key, number rows within each sorted partition, then add exclusive
    partition-offset prefix sums (tiny driver-side table, broadcast back).
    Pure function of the data — never monotonically_increasing_id().
    """
    from pyspark.sql import Window

    # JVM-side tagging: range-shuffle once, then a window keyed on the
    # physical partition id.  (A mapInPandas tag was measured 2-3x slower
    # here — it streams every text payload through Arrow+Python just to
    # add two ints.)
    parted = (
        docs.repartitionByRange(num_partitions, "conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
            ).cast("long") - 1,
        )
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    from pulse_spark.sources.readers import local_table

    off_df = local_table(
        spark, [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    out = (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
    return out, parted  # caller unpersists `parted` after materializing out


def with_term_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Stable hash bucket of the term — the physical partition key of the
    postings/segments layout. Query-side computes the same bucket for its
    terms and gets partition pruning on the scan."""
    return df.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
