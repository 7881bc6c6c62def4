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


def train_val_split(docs, val_frac: float = 0.125, id_col: str = "doc_id",
                    salt: str = "split"):
    """(doc_id, split): deterministic hash-based train/val assignment —
    the split must be a pure function of the doc identity so it is (a)
    reproducible across runs/clusters with no stored split table, (b)
    stable under corpus growth (new docs never flip old assignments —
    unlike any sample()/random() split), (c) cheap: one projection, zero
    shuffles, no driver state.

    Mechanism: md5 of (salt | id); the first 3 hex chars compared against
    a threshold prefix, so val_frac is quantized to n/4096 (documented —
    exactness of the fraction matters less than determinism; a different
    salt gives an independent re-split).  md5 is the one hash Spark and
    DuckDB share, keeping this under the SQL oracle."""
    from pyspark.sql import functions as F

    thr_int = max(0, min(4096, round(val_frac * 4096)))
    # "zzz" sorts above every hex prefix -> val_frac=1.0 puts all in val
    thr = "zzz" if thr_int == 4096 else format(thr_int, "03x")
    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.when(F.substring(h, 1, 3) < F.lit(thr), F.lit("val"))
        .otherwise(F.lit("train")).alias("split"),
    )
