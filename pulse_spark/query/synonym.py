"""Synonym-group scoring (Lucene SynonymQuery): terms declared synonymous
score as ONE pseudo-term — per document the group's tf is the SUM of the
member tfs and the group's df is the MAX member df (Lucene's
SynonymQuery/BlendedTermQuery semantics: a document mentioning any
variant is one occurrence of the concept; the rarest-variant df would
over-reward common concepts, so the most frequent member's df is used).

This is a genuinely different scoring function from weighted expansion
(expand.py): expansion scores each variant independently and sums —
a doc matching three variants triple-counts the saturation curve;
blending saturates ONCE on the combined tf.

Scale shape: identical to topk_from_tables plus one extra partial-agg
groupBy — matched postings aggregate to (query, group, doc) before
scoring, both shuffles touch candidates only, the group-df table is
query-side (tiny, broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulse_spark.query.search import bounded_topk, score_expr


def synonym_topk(
    postings: DataFrame,
    terms: DataFrame,
    q_groups: DataFrame,
    n_docs: int,
    adl: float,
    k: int = 10,
    metric: str = "BM25",
    id_col: str = "doc_no",
    tie_round: int | None = None,
    deletes: DataFrame | None = None,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Top-k where each query position holds a synonym GROUP.

    q_groups: (query_id, pos, term) — one row per group MEMBER; rows
    sharing (query_id, pos) are synonyms of one another.  A plain term
    is a singleton group (then this reduces exactly to the standard
    scorer).  Corpus-absent members drop out of both tf and df; a group
    with no present member drops entirely (search.go:29-46 convention).
    Returns (query_id, rank, <id_col>, score).
    """
    if metric.upper() not in ("BM25", "TFIDF"):
        raise ValueError(f"{metric} is not a valid metric")
    qt = q_groups.join(terms.select("term", "df"), "term")
    # group df = max over corpus-present members — query-side, tiny
    gdf = qt.groupBy("query_id", "pos").agg(F.max("df").alias("df"))

    matched = postings.join(
        F.broadcast(qt.select("query_id", "pos", "term")), "term"
    )
    if doc_filter is not None:
        matched = matched.join(doc_filter.select(id_col), id_col, "left_semi")

    # blend: one row per (query, group, doc) with the summed tf
    blended = matched.groupBy("query_id", "pos", id_col).agg(
        F.sum("tf").alias("tf"), F.max("doc_len").alias("doc_len")
    ).join(F.broadcast(gdf), ["query_id", "pos"])

    per_doc = blended.withColumn(
        "part_score", score_expr(metric, n_docs, adl)
    ).groupBy("query_id", id_col).agg(F.sum("part_score").alias("score"))

    if deletes is not None:
        per_doc = per_doc.join(
            deletes.select(id_col).distinct(), id_col, "left_anti"
        )
    return bounded_topk(per_doc, k, id_col, tie_round,
                        approx_candidates=n_docs)
