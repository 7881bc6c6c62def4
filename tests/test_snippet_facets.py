"""Properties of snippet extraction and facet counts that the DuckDB
oracle rows (snippet_extract, facet_counts in the harness) cannot cover:
the stemmed-index highlighting branch, NULL facet values, duplicate
query terms, and window/tie mechanics on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index.build import postings_df, terms_df
from pulse_spark.query.facets import facet_counts
from pulse_spark.query.snippet import snippet_topk
from pulse_spark.text.udfs import doc_len_bytes

UNSTEMMED = IndexingSettings(stopwords_removal=True, stemming=False)
STEMMED = IndexingSettings(stopwords_removal=True, stemming=True)


def _tables(spark, rows, settings):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dl = docs.select(
        "doc_id", "text", doc_len_bytes("text").cast("long").alias("doc_len")
    )
    p = postings_df(dl, settings, id_col="doc_id")
    t = terms_df(p)
    return docs, p, t, docs.count()


def test_snippet_picks_densest_window_earliest_tie(spark):
    # doc 0: the two rare terms sit together at the tail — the best
    # window must cover both; doc 1: two equal single-term windows far
    # apart — tie goes to the EARLIEST start
    rows = [
        (0, "alpha beta beta beta beta beta beta beta beta gamma delta"),
        (1, "gamma beta beta beta beta beta beta beta beta beta gamma"),
    ]
    docs, p, t, n = _tables(spark, rows, UNSTEMMED)
    res = spark.createDataFrame([(1, 0), (1, 1)], "query_id long, doc_id long")
    occ = spark.createDataFrame(
        [(1, 0, "gamma"), (1, 1, "delta"), (1, 2, "gamma")],  # dup term
        "query_id long, pos int, term string",
    )
    out = {
        r["doc_id"]: r
        for r in snippet_topk(
            res, docs, occ, t, n, UNSTEMMED.preprocess,
            window=4, id_col="doc_id", tie_round=6,
        ).collect()
    }
    # doc 0: only start=7 covers both gamma(pos 9) and delta(pos 10)
    assert out[0]["start"] == 7
    assert "gamma delta" in out[0]["snippet"]
    # doc 1: gamma at pos 0 and pos 10 weigh the same; dup query term
    # must NOT double-count; earliest start wins
    assert out[1]["start"] == 0
    assert out[1]["snippet"].startswith("gamma")


def test_snippet_stemmed_index_highlights_surface_forms(spark):
    """A stemmed index must locate the UNSTEMMED surface form: query
    'running' and text 'runs' share the stem 'run'."""
    rows = [(0, "alpha alpha alpha runs beta beta beta beta beta beta")]
    docs, p, t, n = _tables(spark, rows, STEMMED)
    res = spark.createDataFrame([(1, 0)], "query_id long, doc_id long")
    from pulse_spark.text.normalize import tokens as py_tokens

    q_terms = py_tokens("running", STEMMED.preprocess)
    occ = spark.createDataFrame(
        [(1, i, tm) for i, tm in enumerate(q_terms)],
        "query_id long, pos int, term string",
    )
    out = snippet_topk(
        res, docs, occ, t, n, STEMMED.preprocess,
        window=3, id_col="doc_id", tie_round=6,
    ).collect()
    assert len(out) == 1
    # window anchored on the surface token 'runs' (pos 3): starts 1..3
    # all score equally, earliest wins; snippet shows 'runs', not 'run'
    assert out[0]["start"] == 1
    assert "runs" in out[0]["snippet"]


def test_facet_counts_null_values_and_dup_terms(spark):
    rows = [
        (0, "alpha beta"),
        (1, "alpha gamma"),
        (2, "delta delta"),
    ]
    docs, p, t, n = _tables(spark, rows, UNSTEMMED)
    meta = spark.createDataFrame(
        [(0, "en"), (1, None), (2, "en")], "doc_id long, lang string"
    )
    occ = spark.createDataFrame(
        # 'alpha' twice (dedup), 'zzz' absent from corpus (drops out)
        [(1, 0, "alpha"), (1, 1, "alpha"), (1, 2, "zzz")],
        "query_id long, pos int, term string",
    )
    got = {
        (r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(p, occ, meta, ["lang"], id_col="doc_id").collect()
    }
    # docs 0 and 1 match 'alpha' exactly once each despite the dup term
    assert got == {("lang", "en"): 1, ("lang", None): 1}


def test_facet_counts_requires_columns(spark):
    docs, p, t, n = _tables(spark, [(0, "alpha")], UNSTEMMED)
    occ = spark.createDataFrame(
        [(1, 0, "alpha")], "query_id long, pos int, term string"
    )
    with pytest.raises(ValueError):
        facet_counts(p, occ, docs, [], id_col="doc_id")
