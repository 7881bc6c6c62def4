"""Result collapsing (ES field collapsing / Lucene grouping): top-k
over the candidate set keeping at most ONE doc — the best-scoring —
per group (here: per conversation, the natural dedup unit of a
transcript corpus; a conversation with twenty matching turns should
occupy one result slot, not twenty).

Group membership is an EXPRESSION over the candidate row (`group_col`),
not a join: the engine's doc identity is conv_id:turn_idx (SURVEY §1
docID scheme), so the collapse key is derivable from the id itself.
That keeps collapse zero-join — the only added cost over plain top-k is
one extra window pass over the already-scored candidates.

Scale shape: the per-group best is a window over (query, group) — the
same shuffle class as the scoring groupBy (candidates only, never the
corpus); the final cut reuses the two-phase bounded top-k, so no single
task ever sees a hot query's full collapsed set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pulse_spark.query.search import (bounded_topk, order_key,
                                      scored_candidates)


def collapse_topk(
    postings: DataFrame,
    terms: DataFrame,
    q_occurrences: DataFrame,
    n_docs: int,
    adl: float,
    group_col: Column,
    k: int = 10,
    metric: str = "BM25",
    conjunctive: bool = False,
    id_col: str = "doc_no",
    tie_round: int | None = None,
    deletes: DataFrame | None = None,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Top-k with at most one (best) doc per group.

    group_col: expression evaluated over the scored-candidate row
    (columns available: query_id, <id_col>, score) producing the
    collapse key — e.g. ``F.col("doc_id") % 100`` or a conv-extracting
    substring of doc_no.  Within a group the winner is (score desc,
    <id_col> asc) — same tie rule as ranking (over round(score,
    tie_round) when set).  Returns (query_id, rank, <id_col>, group,
    score), rank 0-based over the collapsed list.
    """
    per_doc = scored_candidates(
        postings, terms, q_occurrences, n_docs, adl, metric=metric,
        conjunctive=conjunctive, id_col=id_col, deletes=deletes,
        doc_filter=doc_filter,
    ).withColumn("group", group_col)
    w = Window.partitionBy("query_id", "group").orderBy(
        F.desc(order_key(tie_round)), F.asc(id_col)
    )
    best = (
        per_doc.withColumn("_gr", F.row_number().over(w))
        .where(F.col("_gr") == 1)
        .drop("_gr")
    )
    topk = bounded_topk(best, k, id_col, tie_round, approx_candidates=n_docs)
    # bounded_topk projects the group away; group_col is an expression
    # over (query_id, <id_col>, score) so re-evaluating it on the k·q
    # winners is free — no join back to the candidate set
    return topk.withColumn("group", group_col).select(
        "query_id", "rank", id_col, "group", "score"
    )
