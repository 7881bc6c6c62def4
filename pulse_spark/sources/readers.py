"""Dataset readers — the Spark counterpart of the reference's pluggable
ChunkReader API (pkg/spimi/reader.go:10-13): a new dataset = a new
`spark.read.format(...)` invocation, not a new interface implementation.

  - MS MARCO-style TSV (docno \\t text), the reference's only shipped
    reader (pkg/spimi/reader/ms-marco.go:24-79).  Chunking (`--chunk`,
    50k docs) is an artifact of its producer/consumer loop; Spark's input
    splits replace it (maxPartitionBytes governs split size).
  - query TSV (query_id \\t text), reference pkg/query/query.go:19-51.
  - transcripts: parquet (or Iceberg when a catalog is configured —
    same call with format("iceberg")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MSMARCO_SCHEMA = T.StructType([
    T.StructField("doc_no", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
])

QUERY_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
])


def read_msmarco_tsv(spark: SparkSession, path: str) -> DataFrame:
    """docno \\t content, content whitespace-trimmed like the reference's
    TrimSpace at read time (ms-marco.go:70). Returns (doc_no, text)."""
    df = (
        spark.read.option("sep", "\t")
        .option("quote", "")  # TSV is not quoted; keep embedded quotes
        .schema(MSMARCO_SCHEMA)
        .csv(path)
    )
    return df.withColumn("text", F.coalesce(F.col("text"), F.lit("")))


def msmarco_as_transcripts(df: DataFrame) -> DataFrame:
    """Adapt an MS MARCO-style (doc_no, text) table to the transcripts
    input shape (each passage = a single-turn conversation)."""
    return df.select(
        F.col("doc_no").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit("").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def read_queries_tsv(spark: SparkSession, path: str) -> DataFrame:
    """query_id \\t text (pkg/query/query.go:19-51)."""
    return (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .schema(QUERY_SCHEMA)
        .csv(path)
    )


def read_transcripts(spark: SparkSession, path_or_table: str, fmt: str = "parquet") -> DataFrame:
    """Primary input: Iceberg/parquet transcripts table
    (conv_id, turn_idx, role, text, tool, ts)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.format(fmt).load(path_or_table)


# DataFrame objects per (applicationId, path): every fresh
# spark.read.parquet(path) call runs a 1-task schema/footer job before
# the query proper — measured ~0.1-0.2 s per harness query at sf0.1 —
# so the resolved relation is built once per session and reused (plans
# are immutable; reuse is safe).  Entries of dead sessions evicted on
# access, like harness._SHARED.
_READ_CACHE: dict = {}


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read, one footer/schema job per session per path."""
    app = spark.sparkContext.applicationId
    for k in [k for k in _READ_CACHE if k[0] != app]:
        del _READ_CACHE[k]
    key = (app, path, "plain")
    if key not in _READ_CACHE:
        _READ_CACHE[key] = spark.read.parquet(path)
    return _READ_CACHE[key]


def read_parquet_spread(spark: SparkSession, path: str, key_col: str) -> DataFrame:
    """Parquet read with scale-adaptive parallelism (optimization guide
    §2/§6): parquet cannot split below row-group granularity, so a small
    input (one file, one row group) scans as ONE task and every per-row
    operator downstream — tokenizer UDFs, regex projections, HOF math —
    runs single-threaded no matter how many cores exist.  When the scan
    yields fewer splits than the cluster's cores, hash-repartition once
    by the table's key (deterministic under task retry, unlike
    round-robin; the shuffle moves each small row exactly once).  A
    large input already scans as >= cores splits and this is a no-op —
    the partitioning is derived from the input, never a local-mode
    constant."""
    sc = spark.sparkContext
    key = (sc.applicationId, path, "spread", key_col)
    if key not in _READ_CACHE:
        df = read_parquet_cached(spark, path)
        par = sc.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par, F.col(key_col))
        _READ_CACHE[key] = df
    return _READ_CACHE[key]


def local_table(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Tiny driver-side table shipped to the JVM as ONE Arrow batch.

    ``createDataFrame(list_of_rows)`` parallelizes the rows into
    ``defaultParallelism`` pickled-PYTHON partitions, so every job that
    touches a 30-row query/probe table runs a full wave of Python-worker
    tasks (guide §4: keep Python off the hot path).  The pandas/Arrow
    path serializes the same rows into a single record batch read
    JVM-side — no Python stage at execution time, one partition."""
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    # parse the DDL properly — naive comma-splitting breaks on types
    # whose DDL contains commas (struct<...>, map<...>, decimal(p,s))
    names = T.StructType.fromDDL(schema).fieldNames()
    pdf = pd.DataFrame([tuple(r) for r in rows], columns=names)
    return spark.createDataFrame(pdf, schema=schema)
