"""Retrieval-quality evaluation — the trec_eval analog.

The reference ships trec_eval integration and publishes P@k / recall /
NDCG / MAP for its TREC DL 2020 runs (trec_eval/README.md:1-36,
docs/run.sh:21-46, docs.pdf Tables 4.4-4.5).  This module computes the
same metrics as a DataFrame plan (pure column expressions — JVM-side,
oracle-checkable in SQL), over:

  results: (query_id, rank, <id>)        rank 0-based, from any engine path
  qrels:   (query_id, <id>, rel)         graded relevance, rel > 0 = relevant

Only queries present in qrels are evaluated (trec_eval behavior).

Metrics per query at cutoff k:
  p_at_k      |top-k ∩ relevant| / k
  recall_at_k |top-k ∩ relevant| / |relevant|
  ndcg_at_k   Σ (2^rel-1)/log2(rank+2) over top-k, normalized by the
              ideal DCG of the query's best-possible top-k
  ap_at_k     Σ_i P@i·rel_i / |relevant|   (MAP when averaged; trec_eval
              divides by the TOTAL relevant count, not min(R, k) — a
              query with more relevant docs than k can therefore never
              reach AP 1.0 at that cutoff, exactly like trec_eval)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trec_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-query metrics: (query_id, p_at_k, recall_at_k, ndcg_at_k,
    ap_at_k), each rounded to 6 for cross-engine comparison."""
    r = results.where(F.col("rank") < k).select("query_id", "rank", id_col)
    q = qrels.select("query_id", id_col, F.col("rel").cast("int").alias("rel"))

    j = (
        r.join(q, ["query_id", id_col], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("is_rel", (F.col("rel") > 0).cast("int"))
    )
    # DCG gain of each returned row; precision-at-i prefix for AP
    w_rank = Window.partitionBy("query_id").orderBy("rank")
    j = j.withColumn(
        "gain", (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("rank") + 2.0)
    ).withColumn(
        "prec_at_i",
        F.sum("is_rel").over(w_rank) / (F.col("rank") + 1.0),
    )
    per_q = j.groupBy("query_id").agg(
        F.sum("is_rel").alias("n_hit"),
        F.sum("gain").alias("dcg"),
        F.sum(F.col("prec_at_i") * F.col("is_rel")).alias("ap_num"),
    )

    # ideal DCG: the query's qrels sorted by rel desc, best k
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc(id_col)
    )
    ideal = (
        q.where(F.col("rel") > 0)
        .withColumn("_i", F.row_number().over(w_ideal) - 1)
        .where(F.col("_i") < k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("_i") + 2.0)
            ).alias("idcg")
        )
    )
    totals = (
        q.where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )

    out = (
        totals.join(ideal, "query_id")
        .join(per_q, "query_id", "left")
        .select(
            F.col("query_id").cast("long"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k)), 6)
            .alias(f"p_at_{k}"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel"), 6
            ).alias(f"recall_at_{k}"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
            ).alias(f"ndcg_at_{k}"),
            F.round(
                F.coalesce(F.col("ap_num"), F.lit(0.0))
                / F.col("n_rel").cast("double"),
                6,
            ).alias(f"ap_at_{k}"),
        )
    )
    return out


def macro_average(metrics: DataFrame) -> DataFrame:
    """Mean of each metric column over queries (MAP = mean ap_at_k)."""
    cols = [c for c in metrics.columns if c != "query_id"]
    return metrics.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        *[F.round(F.avg(c), 6).alias(f"mean_{c}") for c in cols],
    )
