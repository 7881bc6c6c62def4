"""trec_eval-analog metrics (eval.py): hand-computed golden case +
self-consistency against the engine's own rankings."""

from __future__ import annotations

import math

from pulse_spark.eval import macro_average, trec_metrics


def test_trec_metrics_hand_case(spark):
    # query 1 returns docs [10, 11, 12, 13]; qrels: 10 rel=2 (hit at 0),
    # 12 rel=1 (hit at 2), 99 rel=1 (missed)
    results = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 11), (1, 2, 12), (1, 3, 13)],
        "query_id long, rank int, doc_id long",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1), (1, 99, 1)], "query_id long, doc_id long, rel int"
    )
    m = trec_metrics(results, qrels, k=4).collect()[0]
    assert m["p_at_4"] == 0.5                      # 2 of 4
    assert math.isclose(m["recall_at_4"], 2 / 3, abs_tol=1e-6)
    dcg = 3 / math.log2(2) + 1 / math.log2(4)      # ranks 0 and 2
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert math.isclose(m["ndcg_at_4"], dcg / idcg, abs_tol=1e-6)
    ap = (1 / 1 + 2 / 3) / 3                       # P@1*1 + P@3*1 over n_rel
    assert math.isclose(m["ap_at_4"], ap, abs_tol=1e-6)

    avg = macro_average(trec_metrics(results, qrels, k=4)).collect()[0]
    assert avg["n_queries"] == 1
    assert avg["mean_p_at_4"] == 0.5


def test_trec_metrics_query_without_results(spark):
    """A query with qrels but no returned rows scores 0 across the board
    (trec_eval behavior), and queries without qrels are not evaluated."""
    results = spark.createDataFrame(
        [(1, 0, 10), (7, 0, 20)], "query_id long, rank int, doc_id long"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (2, 10, 1)], "query_id long, doc_id long, rel int"
    )
    rows = {r["query_id"]: r for r in trec_metrics(results, qrels, k=5).collect()}
    assert set(rows) == {1, 2}  # qid 7 has no qrels -> not evaluated
    assert rows[2]["p_at_5"] == 0.0 and rows[2]["ndcg_at_5"] == 0.0
    assert rows[1]["recall_at_5"] == 1.0


def test_engine_perfect_against_own_labels(spark):
    """Self-consistency guard: label the engine's own stemmed BM25 top-3
    as relevant; the engine must then score P@3 = NDCG@3 = 1.0.  Any
    semantic drift between runs (tokenizer, scoring, ranking) breaks it."""
    from pulse_spark.harness import HARNESS_QUERIES, SETTINGS_STEMMED, _topk

    sf = "/root/testdata/sf0.001"
    res = _topk(spark, sf, "BM25", conjunctive=False,
                settings=SETTINGS_STEMMED).persist()
    qrels = res.where("rank < 3").selectExpr(
        "query_id", "doc_id", "cast(1 as int) as rel"
    )
    m = {r["query_id"]: r for r in trec_metrics(res, qrels, k=3).collect()}
    answered = {q for q, _ in HARNESS_QUERIES if q in m}
    assert answered  # at least the in-vocabulary queries
    for q in answered:
        assert m[q]["p_at_3"] == 1.0, (q, m[q])
        assert m[q]["ndcg_at_3"] == 1.0, (q, m[q])


def test_ap_denominator_is_total_relevant(spark):
    """trec_eval parity: MAP divides by the TOTAL relevant count, not
    min(R, k) — with 3 relevant docs and k=2, two perfect hits give
    AP@2 = (1 + 1) / 3, not 1.0."""
    results = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 11)], "query_id long, rank int, doc_id long"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 1), (1, 12, 1)],
        "query_id long, doc_id long, rel int",
    )
    m = trec_metrics(results, qrels, k=2).collect()[0]
    assert math.isclose(m["ap_at_2"], 2 / 3, abs_tol=1e-6)
