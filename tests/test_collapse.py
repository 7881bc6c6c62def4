"""Semantics pins for field-collapsed top-k (query/collapse.py) on
hand-built corpora.  Cross-engine value-equality at sf0.01 is the
DuckDB oracle gate's job (row bm25_collapse_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index.build import postings_df, terms_df
from pulse_spark.query.collapse import collapse_topk
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


def _occ(spark, rows):
    return spark.createDataFrame(rows, "query_id long, pos int, term string")


# two "conversations" (group = doc_id // 10): docs 10-12 and 20-21.
# 'spark spark' beats 'spark ...' on tf, so each group's winner is
# derivable by inspection.
CORPUS = [
    (10, "spark spark"),
    (11, "spark join"),
    (12, "join merge"),
    (20, "spark merge"),
    (21, "merge merge"),
]


def test_one_result_per_group_best_survives(spark):
    p, t, n, adl = _corpus(spark, CORPUS)
    res = collapse_topk(
        p, t, _occ(spark, [(1, 0, "spark")]), n, adl,
        group_col=(F.col("doc_id") / 10).cast("long"),
        k=10, id_col="doc_id",
    ).collect()
    rows = sorted(res, key=lambda r: r["rank"])
    # candidates: 10, 11 (group 1), 20 (group 2); 10 beats 11 on tf
    assert [(r["doc_id"], r["group"]) for r in rows] == [(10, 1), (20, 2)]
    # collapsed ranks are dense 0..n-1
    assert [r["rank"] for r in rows] == [0, 1]


def test_singleton_groups_equal_plain_topk(spark):
    """Collapsing on a key that is unique per doc is exactly plain
    top-k (scores, ranks, ties included)."""
    p, t, n, adl = _corpus(spark, CORPUS)
    occ = _occ(spark, [(1, 0, "spark"), (1, 1, "merge")])
    plain = topk_from_tables(p, t, occ, n, adl, k=10, id_col="doc_id")
    col = collapse_topk(
        p, t, occ, n, adl, group_col=F.col("doc_id"),
        k=10, id_col="doc_id",
    )
    key = lambda rs: [(r["query_id"], r["rank"], r["doc_id"], r["score"])
                      for r in sorted(rs, key=lambda r: (r["query_id"], r["rank"]))]
    assert key(col.collect()) == key(plain.collect())


def test_within_group_tie_breaks_on_doc_id(spark):
    """Equal-scoring docs in one group: the lower doc_id survives (the
    engine's tie rule)."""
    p, t, n, adl = _corpus(
        spark, [(30, "spark join"), (31, "spark join"), (40, "merge")]
    )
    res = collapse_topk(
        p, t, _occ(spark, [(1, 0, "spark")]), n, adl,
        group_col=(F.col("doc_id") / 10).cast("long"),
        k=10, id_col="doc_id", tie_round=6,
    ).collect()
    assert [r["doc_id"] for r in res] == [30]
