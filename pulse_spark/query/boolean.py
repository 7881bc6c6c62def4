"""Boolean query composition: must / should / must_not clauses
(Spark-first extension; the Lucene BooleanQuery model the reference's
flat disjunctive/conjunctive switch doesn't offer — search.go:138-141
only toggles all-or-any over one term set).

Semantics, adapted to the engine's conventions:
  - score = sum of the standard per-occurrence contributions
    (query/search.py score_expr) over MUST and SHOULD occurrences —
    in Lucene, must clauses score too; must_not never contributes.
  - a candidate must contain ALL corpus-present distinct MUST terms
    (the engine's conjunctive convention: terms absent from the corpus
    don't veto — search.go:29-46 drops them at lookup) and NO must_not
    term.
  - a document matched only by must_not (or by nothing) is not a
    candidate; a query with only must_not clauses matches nothing
    (Lucene's pure-negative behavior).

Scale shape: identical to topk_from_tables — ONE term-pruned postings
scan covers all three clause kinds (the clause tag rides the broadcast
query side), one partial-agg groupBy folds score, must-coverage and
must_not-veto together, then the shared two-phase bounded top-k.  No
extra join or scan versus a plain disjunctive query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulse_spark.query.search import bounded_topk, score_expr

CLAUSES = ("must", "should", "must_not")


def boolean_topk(
    postings: DataFrame,
    terms: DataFrame,
    q_clauses: DataFrame,
    n_docs: int,
    adl: float,
    k: int = 10,
    metric: str = "BM25",
    id_col: str = "doc_no",
    tie_round: int | None = None,
    deletes: DataFrame | None = None,
    doc_filter: DataFrame | None = None,
    min_should_match: int = 0,
) -> DataFrame:
    """Top-k under boolean clause composition.

    q_clauses: (query_id, pos, term, clause) — one row per token
    OCCURRENCE, clause in {'must', 'should', 'must_not'} (duplicate
    must/should occurrences score per occurrence, like every query path
    in this engine).  Returns (query_id, rank, <id_col>, score).

    min_should_match: candidates must match at least this many DISTINCT
    should terms (Lucene's minimumShouldMatch).  Unlike the must
    convention, the count is literal — a should term absent from the
    corpus never matches, so msm greater than the number of
    corpus-present should terms matches nothing (Lucene's behavior:
    absent optional clauses simply never satisfy the minimum).
    """
    bad = q_clauses.where(~F.col("clause").isin(*CLAUSES)).limit(1).collect()
    if bad:
        raise ValueError(f"{bad[0]['clause']} is not a valid clause")

    qt = q_clauses.join(terms.select("term", "df"), "term")
    part = F.when(
        F.col("clause") != "must_not", score_expr(metric, n_docs, adl)
    ).otherwise(F.lit(0.0))
    matched = postings.join(F.broadcast(qt), "term")
    if doc_filter is not None:
        matched = matched.join(doc_filter.select(id_col), id_col, "left_semi")

    per_doc = matched.groupBy("query_id", id_col).agg(
        F.sum(part).alias("score"),
        F.count_distinct(
            F.when(F.col("clause") == "must", F.col("term"))
        ).alias("_must_hits"),
        F.count_distinct(
            F.when(F.col("clause") == "should", F.col("term"))
        ).alias("_should_hits"),
        F.max((F.col("clause") == "must_not").cast("int")).alias("_banned"),
    )
    # corpus-present distinct must terms per query (absent terms dropped
    # by the qt inner join, the engine's conjunctive convention)
    n_must = qt.where(F.col("clause") == "must").groupBy("query_id").agg(
        F.count_distinct("term").alias("_n_must")
    )
    per_doc = (
        per_doc.join(F.broadcast(n_must), "query_id", "left")
        .where(
            (F.col("_must_hits") == F.coalesce(F.col("_n_must"), F.lit(0)))
            & (F.col("_banned") == 0)
            & (F.col("_should_hits") >= min_should_match)
        )
    )
    if deletes is not None:
        per_doc = per_doc.join(
            deletes.select(id_col).distinct(), id_col, "left_anti"
        )
    return bounded_topk(per_doc, k, id_col, tie_round,
                        approx_candidates=n_docs)
