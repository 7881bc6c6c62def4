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
