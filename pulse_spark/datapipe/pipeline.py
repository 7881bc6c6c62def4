"""End-to-end corpus filtering — the composed training-data prep pass.

A real pretraining pipeline doesn't run quality scoring and dedup as
separate jobs over separate copies: it computes per-doc KEEP decisions in
one composed plan and materializes the kept corpus once.  corpus_filter
composes:

  keep_quality  text_quality thresholds (C4-style: enough tokens, not
                digit soup, English-looking stopword density)
  keep_dedup    the doc is its near-dup cluster's canonical member
                (cluster_id == doc_id, clusters from near_dup_clusters —
                exact duplicates collapse there too, since identical text
                has Jaccard 1.0)

Everything stays in one DataFrame plan: the quality side is a pure
projection (zero shuffle) joined to the cluster labels; at 100 TB the
output is the `keep` boolean per doc — the materialization of the kept
text happens by joining this decision table back to the source scan, so
the text bytes move exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulse_spark.datapipe.dedup import near_dup_clusters
from pulse_spark.datapipe.textstats import text_quality

MIN_TOKENS = 5
MAX_DIGIT_RATIO = 0.3
MIN_STOPWORD_RATIO = 0.01


def corpus_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    min_tokens: int = MIN_TOKENS,
    max_digit_ratio: float = MAX_DIGIT_RATIO,
    min_stopword_ratio: float = MIN_STOPWORD_RATIO,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """(doc_id, keep_quality, keep_dedup, keep): per-doc filter decisions."""
    q = text_quality(docs, id_col).select(
        id_col,
        (
            (F.col("n_tokens") >= min_tokens)
            & (F.col("digit_ratio") <= max_digit_ratio)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
        ).alias("keep_quality"),
    )
    c = near_dup_clusters(docs, id_col, min_jaccard=min_jaccard).select(
        id_col, (F.col("cluster_id") == F.col(id_col)).alias("keep_dedup")
    )
    return q.join(c, id_col).select(
        F.col(id_col).cast("long").alias(id_col),
        "keep_quality",
        "keep_dedup",
        (F.col("keep_quality") & F.col("keep_dedup")).alias("keep"),
    )


def kept_corpus(docs: DataFrame, id_col: str = "doc_id", **kw) -> DataFrame:
    """The filtered corpus itself: source rows where keep.  The keep-list
    is most of the corpus (dedup+quality typically keep the majority), so
    it must NOT be broadcast — a plain equi-join lets Spark shuffle both
    sides on the id (or broadcast on its own if AQE sees it's small)."""
    keep = corpus_filter(docs, id_col, **kw).where("keep").select(id_col)
    return docs.join(keep, id_col)
