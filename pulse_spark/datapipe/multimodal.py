"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container —
clearly marked below); everything Spark-side is real and tested: binary
schema, Arrow batch shapes, mapInPandas signatures, partitioning.  Swap
`_decode_stub` for a real decoder (PIL/librosa/av) on a cluster with the
libs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def as_binary_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload binary, meta struct): the multimodal table shape.
    Here the payload is the UTF-8 bytes of `text` standing in for an
    image/audio blob; on real data this column comes straight from the
    source (e.g. parquet BINARY written by the capture pipeline)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: a real pipeline would decode the image/audio here
    (`PIL.Image.open(io.BytesIO(payload))` …).  The stand-in produces a
    deterministic FEATURE_DIM-dim 'embedding' — mean byte value per
    stripe — so the Spark plumbing (schema/batching/partitioning) is
    exercised end-to-end with stable outputs."""
    if not payload:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8)
    stripes = np.array_split(arr, FEATURE_DIM)
    return np.array([float(s.mean()) if len(s) else 0.0 for s in stripes])


def decode_real(payload: bytes):
    """The real decode entrypoint — intentionally unimplemented in this
    container (no image/audio libraries baked in)."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in "
        "this environment; use _decode_stub for plumbing tests"
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow
    batches in, Arrow batches out; scales linearly (no shuffle)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [np.round(_decode_stub(p), 6).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
            })

    return payloads.mapInPandas(fn, FEATURE_SCHEMA)


def multimodal_meta(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bytes, head_byte): metadata projection over the binary
    payload — pure column exprs, SQL-oracle-checkable."""
    p = as_binary_payload(docs, id_col)
    return p.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.when(F.col("meta.n_bytes") > 0, F.ascii(F.decode(F.col("payload"), "UTF-8")))
        .otherwise(F.lit(0)).cast("long").alias("head_byte"),
    )
