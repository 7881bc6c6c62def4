"""Semantics pins for synonym-group (blended-tf) scoring
(query/synonym.py) on hand-built corpora.  Cross-engine value-equality
at sf0.01 is the DuckDB oracle gate's job (row bm25_synonym_topk)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulse_spark.config import BM25_B, BM25_K1, IndexingSettings
from pulse_spark.index.build import postings_df, terms_df
from pulse_spark.query.search import topk_from_tables
from pulse_spark.query.synonym import synonym_topk
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


def _groups(spark, rows):
    return spark.createDataFrame(rows, "query_id long, pos int, term string")


CORPUS = [
    (1, "spark stream merge"),   # both variants of the group
    (2, "spark join"),
    (3, "stream stream"),
    (4, "join merge"),
]


def test_singleton_groups_reduce_to_plain_topk(spark):
    p, t, n, adl = _corpus(spark, CORPUS)
    g = _groups(spark, [(1, 0, "spark"), (1, 1, "merge")])
    syn = synonym_topk(p, t, g, n, adl, k=10, id_col="doc_id", tie_round=6)
    plain = topk_from_tables(p, t, g, n, adl, k=10, id_col="doc_id",
                             tie_round=6)
    key = lambda rs: [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
                      for r in sorted(rs, key=lambda r: (r["query_id"], r["rank"]))]
    assert key(syn.collect()) == key(plain.collect())


def test_blended_tf_and_max_df(spark):
    """doc 1 holds both variants: group tf = 1+1 = 2 saturates ONCE with
    df = max(df_spark, df_stream) — checked against the closed form."""
    p, t, n, adl = _corpus(spark, CORPUS)
    g = _groups(spark, [(1, 0, "spark"), (1, 0, "stream")])
    res = {r["doc_id"]: r["score"]
           for r in synonym_topk(p, t, g, n, adl, k=10, id_col="doc_id").collect()}
    # corpus dfs: spark=2 (docs 1,2), stream=2 (docs 1,3) -> df_max=2
    doc_len = {r["doc_id"]: r["doc_len"]
               for r in p.select("doc_id", "doc_len").distinct().collect()}

    def bm25(tf, dl, dfm):
        return tf / (BM25_K1 * ((1 - BM25_B) + BM25_B * (dl / adl)) + tf) \
            * math.log(n / dfm)

    assert math.isclose(res[1], bm25(2, doc_len[1], 2), rel_tol=1e-9)
    assert math.isclose(res[2], bm25(1, doc_len[2], 2), rel_tol=1e-9)
    assert math.isclose(res[3], bm25(2, doc_len[3], 2), rel_tol=1e-9)
    # blending saturates once: doc 1's blended score is LESS than the
    # independent two-term sum (the expansion semantics)
    plain = topk_from_tables(p, t, g, n, adl, k=10, id_col="doc_id").collect()
    plain1 = next(r["score"] for r in plain if r["doc_id"] == 1)
    assert res[1] < plain1


def test_absent_member_ignored_all_absent_drops(spark):
    p, t, n, adl = _corpus(spark, CORPUS)
    g = _groups(spark, [
        (1, 0, "spark"), (1, 0, "zzzabsent"),
        (2, 0, "zzzabsent"), (2, 0, "qqqabsent"),
    ])
    res = synonym_topk(p, t, g, n, adl, k=10, id_col="doc_id").collect()
    assert {r["query_id"] for r in res} == {1}
    # identical to the singleton group (absent member contributes nothing)
    solo = synonym_topk(p, t, _groups(spark, [(1, 0, "spark")]),
                        n, adl, k=10, id_col="doc_id").collect()
    key = lambda rs: sorted((r["doc_id"], round(r["score"], 9)) for r in rs)
    assert key(res) == key(solo)
