"""Semantics pins for per-term score explanation (query/explain.py).
Cross-engine value-equality at sf0.01 is the DuckDB oracle gate's job
(row bm25_explain); here we pin the decomposition invariants on a
hand-built corpus."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index.build import postings_df, terms_df
from pulse_spark.query.explain import explain_topk
from pulse_spark.query.search import topk_from_tables
from pulse_spark.text.udfs import doc_len_bytes

SETTINGS = IndexingSettings(stopwords_removal=True, stemming=False)


def _corpus(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_len = docs.select(
        "doc_id", "text", doc_len_bytes("text").cast("long").alias("doc_len")
    )
    p = postings_df(with_len, SETTINGS, id_col="doc_id")
    t = terms_df(p)
    st = with_len.agg(F.count(F.lit(1)), F.avg("doc_len")).collect()[0]
    return p, t, int(st[0]), float(st[1])


CORPUS = [
    (1, "spark join merge"),
    (2, "spark join"),
    (3, "spark merge"),
    (4, "join merge"),
    (5, "merge merge"),
]


def _occ(spark, rows):
    return spark.createDataFrame(rows, "query_id long, pos int, term string")


def test_term_scores_sum_to_doc_score(spark):
    p, t, n, adl = _corpus(spark, CORPUS)
    occ = _occ(spark, [(1, 0, "spark"), (1, 1, "merge")])
    exp = explain_topk(p, t, occ, n, adl, k=5, id_col="doc_id").collect()
    by_doc = {}
    for r in exp:
        by_doc.setdefault((r["query_id"], r["doc_id"]), []).append(r)
    assert by_doc  # non-empty
    for rows in by_doc.values():
        total = rows[0]["score"]
        assert all(r["score"] == total for r in rows)
        assert math.isclose(sum(r["term_score"] for r in rows), total,
                            rel_tol=1e-9)


def test_winners_match_topk_and_evidence_fields(spark):
    p, t, n, adl = _corpus(spark, CORPUS)
    occ = _occ(spark, [(1, 0, "spark"), (1, 1, "merge")])
    winners = topk_from_tables(p, t, occ, n, adl, k=5, id_col="doc_id")
    exp = explain_topk(p, t, occ, n, adl, k=5, id_col="doc_id")
    w = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
         for r in winners.collect()}
    e = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
         for r in exp.select("query_id", "doc_id", "rank", "score")
                     .distinct().collect()}
    assert e == w
    # evidence: doc 5 = "merge merge" has tf=2 for 'merge'; df checks
    rows = {(r["doc_id"], r["term"]): r for r in exp.collect()}
    assert rows[(5, "merge")]["tf"] == 2
    assert rows[(5, "merge")]["df"] == 4  # docs 1,3,4,5
    assert math.isclose(rows[(1, "spark")]["idf"], math.log(n / 3),
                        rel_tol=1e-12)


def test_duplicate_query_tokens_double_contribution(spark):
    """'merge merge' as a query: occurrences=2 and term_score is exactly
    2x the single-occurrence contribution (search.go:30-46 semantics)."""
    p, t, n, adl = _corpus(spark, CORPUS)
    single = explain_topk(p, t, _occ(spark, [(1, 0, "merge")]),
                          n, adl, k=5, id_col="doc_id").collect()
    double = explain_topk(
        p, t, _occ(spark, [(1, 0, "merge"), (1, 1, "merge")]),
        n, adl, k=5, id_col="doc_id").collect()
    s = {r["doc_id"]: r for r in single}
    d = {r["doc_id"]: r for r in double}
    assert set(s) == set(d)
    for doc_id, r in d.items():
        assert r["occurrences"] == 2
        assert math.isclose(r["term_score"], 2 * s[doc_id]["term_score"],
                            rel_tol=1e-9)


def test_absent_terms_dropped(spark):
    """Terms missing from the corpus produce no explanation rows and
    don't disturb the winners (search.go:29-46)."""
    p, t, n, adl = _corpus(spark, CORPUS)
    occ = _occ(spark, [(1, 0, "spark"), (1, 1, "zzzmissing")])
    exp = explain_topk(p, t, occ, n, adl, k=5, id_col="doc_id")
    terms_seen = {r["term"] for r in exp.collect()}
    assert terms_seen == {"spark"}
