"""Semantics pins for boolean clause composition (query/boolean.py) and
sloppy-phrase proximity matching (query/phrase.py slop>0) on hand-built
corpora.  Cross-engine value-equality at sf0.01 is the DuckDB oracle
gate's job (rows bm25_boolean_topk / phrase_slop_match)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index.build import postings_df, terms_df
from pulse_spark.query.boolean import boolean_topk
from pulse_spark.query.phrase import phrase_match
from pulse_spark.query.search import topk_from_tables
from pulse_spark.text.normalize import PreprocessSettings
from pulse_spark.text.udfs import doc_len_bytes

SETTINGS = IndexingSettings(stopwords_removal=True, stemming=False)
PREP = PreprocessSettings(stemming=False)


def _corpus(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_len = docs.select(
        "doc_id", "text", doc_len_bytes("text").cast("long").alias("doc_len")
    )
    p = postings_df(with_len, SETTINGS, id_col="doc_id")
    t = terms_df(p)
    st = with_len.agg(F.count(F.lit(1)), F.avg("doc_len")).collect()[0]
    return p, t, int(st[0]), float(st[1])


def _clauses(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, pos int, term string, clause string"
    )


def _ranked(res):
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in sorted(res.collect(), key=lambda r: (r["query_id"], r["rank"]))
    ]


CORPUS = [
    (1, "spark join merge"),
    (2, "spark join"),
    (3, "spark merge"),
    (4, "join merge"),
    (5, "merge merge"),
]


def test_all_should_equals_disjunctive(spark):
    """A query of only should clauses is exactly the plain disjunctive
    top-k (scores included)."""
    p, t, n, adl = _corpus(spark, CORPUS)
    res = boolean_topk(
        p, t,
        _clauses(spark, [(1, 0, "spark", "should"), (1, 1, "join", "should")]),
        n, adl, k=5, id_col="doc_id", tie_round=6,
    )
    occ = spark.createDataFrame(
        [(1, 0, "spark"), (1, 1, "join")], "query_id long, pos int, term string"
    )
    plain = topk_from_tables(p, t, occ, n, adl, k=5, id_col="doc_id", tie_round=6)
    assert _ranked(res) == _ranked(plain)


def test_must_requires_and_scores(spark):
    """must restricts candidates to docs containing every corpus-present
    must term AND contributes to the score: must{spark}+should{merge}
    keeps only spark-docs, scored as spark+merge."""
    p, t, n, adl = _corpus(spark, CORPUS)
    res = boolean_topk(
        p, t,
        _clauses(spark, [(1, 0, "spark", "must"), (1, 1, "merge", "should")]),
        n, adl, k=5, id_col="doc_id", tie_round=6,
    )
    got = _ranked(res)
    assert {r[2] for r in got} == {1, 2, 3}  # spark-containing docs only
    occ = spark.createDataFrame(
        [(1, 0, "spark"), (1, 1, "merge")], "query_id long, pos int, term string"
    )
    both = {
        r[2]: r[3]
        for r in _ranked(
            topk_from_tables(p, t, occ, n, adl, k=5, id_col="doc_id", tie_round=6)
        )
    }
    for _, _, d, s in got:
        assert s == pytest.approx(both[d], rel=1e-12)


def test_must_not_vetoes(spark):
    """must_not removes any doc containing the banned term and never
    contributes to scores; surviving docs score identically to the same
    query without the must_not clause."""
    p, t, n, adl = _corpus(spark, CORPUS)
    res = boolean_topk(
        p, t,
        _clauses(
            spark,
            [(1, 0, "spark", "should"), (1, 1, "join", "should"),
             (1, 2, "merge", "must_not")],
        ),
        n, adl, k=5, id_col="doc_id", tie_round=6,
    )
    got = _ranked(res)
    assert {r[2] for r in got} == {2}  # docs 1,3,4,5 contain merge
    occ = spark.createDataFrame(
        [(1, 0, "spark"), (1, 1, "join")], "query_id long, pos int, term string"
    )
    plain = {
        r[2]: r[3]
        for r in _ranked(
            topk_from_tables(p, t, occ, n, adl, k=5, id_col="doc_id", tie_round=6)
        )
    }
    assert got[0][3] == pytest.approx(plain[2], rel=1e-12)


def test_boolean_edges(spark):
    """Pure-negative queries match nothing; an absent must term doesn't
    veto (corpus-present convention); an invalid clause raises."""
    p, t, n, adl = _corpus(spark, CORPUS)
    negative = boolean_topk(
        p, t, _clauses(spark, [(1, 0, "spark", "must_not")]),
        n, adl, k=5, id_col="doc_id",
    )
    assert negative.count() == 0
    absent_must = boolean_topk(
        p, t,
        _clauses(spark, [(1, 0, "zzz", "must"), (1, 1, "spark", "should")]),
        n, adl, k=5, id_col="doc_id", tie_round=6,
    )
    assert {r[2] for r in _ranked(absent_must)} == {1, 2, 3}
    with pytest.raises(ValueError, match="clause"):
        boolean_topk(
            p, t, _clauses(spark, [(1, 0, "spark", "filter")]),
            n, adl, k=5, id_col="doc_id",
        ).collect()


def _occs(spark, df, phrase, slop):
    return {
        r["doc_id"]: r["n_occ"]
        for r in phrase_match(df, phrase, PREP, slop=slop).collect()
    }


def test_sloppy_phrase_semantics(spark):
    """slop widens the ordered match span: slop=0 is exact adjacency,
    slop=s allows up to s extra tokens between (ordered) phrase tokens;
    reversed order never matches; counts are per valid start."""
    df = spark.createDataFrame(
        [
            (1, "spark join now"),          # adjacent
            (2, "spark big join"),          # 1 intruder
            (3, "spark big fast join"),     # 2 intruders
            (4, "join spark"),              # wrong order
            (5, "spark spark join"),        # two valid starts at slop>=1
        ],
        "doc_id long, text string",
    )
    assert _occs(spark, df, "spark join", 0) == {1: 1, 5: 1}
    assert _occs(spark, df, "spark join", 1) == {1: 1, 2: 1, 5: 2}
    assert _occs(spark, df, "spark join", 2) == {1: 1, 2: 1, 3: 1, 5: 2}
    # slop=0 path and proximity path agree on the exact-adjacency corpus
    assert _occs(spark, df, "spark join", 0) == {
        k: v for k, v in _occs(spark, df, "spark join", 0).items()
    }


def test_sloppy_three_token_greedy_exact(spark):
    """3-token chain: greedy earliest-next is exact for existence within
    the span bound; span counting includes all intruders."""
    df = spark.createDataFrame(
        [
            (1, "spark join merge"),             # span 2 = n-1: slop 0
            (2, "spark big join merge"),         # span 3: slop 1
            (3, "spark join big big merge"),     # span 4: slop 2
            (4, "spark merge join"),             # out of order
        ],
        "doc_id long, text string",
    )
    assert _occs(spark, df, "spark join merge", 0) == {1: 1}
    assert _occs(spark, df, "spark join merge", 1) == {1: 1, 2: 1}
    assert _occs(spark, df, "spark join merge", 2) == {1: 1, 2: 1, 3: 1}
    assert 4 not in _occs(spark, df, "spark join merge", 5)


def test_min_should_match_cuts_candidates(spark):
    """msm=2 over three should terms keeps only docs matching >= 2
    distinct ones; msm=0 is the default behavior unchanged."""
    p, t, n, adl = _corpus(spark, CORPUS)
    clauses = _clauses(spark, [
        (1, 0, "spark", "should"), (1, 1, "join", "should"),
        (1, 2, "merge", "should"),
    ])
    res2 = boolean_topk(p, t, clauses, n, adl, k=5, id_col="doc_id",
                        tie_round=6, min_should_match=2)
    # docs 1 (all three), 2 (spark+join), 3 (spark+merge), 4 (join+merge)
    assert sorted(r["doc_id"] for r in res2.collect()) == [1, 2, 3, 4]
    res0 = boolean_topk(p, t, clauses, n, adl, k=5, id_col="doc_id",
                        tie_round=6)
    assert sorted(r["doc_id"] for r in res0.collect()) == [1, 2, 3, 4, 5]


def test_min_should_match_literal_count_absent_terms(spark):
    """msm counts literally: an absent should term never matches, so
    msm=2 over one present + one absent term matches nothing (Lucene's
    behavior), while the same query at msm=1 still matches."""
    p, t, n, adl = _corpus(spark, CORPUS)
    clauses = _clauses(spark, [
        (1, 0, "spark", "should"), (1, 1, "zzzabsent", "should"),
    ])
    res = boolean_topk(p, t, clauses, n, adl, k=5, id_col="doc_id",
                       min_should_match=2)
    assert res.collect() == []
    res1 = boolean_topk(p, t, clauses, n, adl, k=5, id_col="doc_id",
                        min_should_match=1)
    assert sorted(r["doc_id"] for r in res1.collect()) == [1, 2, 3]


def test_msm_interacts_with_must_and_must_not(spark):
    """must still required, must_not still vetoes, msm applies to the
    should subset only."""
    p, t, n, adl = _corpus(spark, CORPUS)
    clauses = _clauses(spark, [
        (1, 0, "spark", "must"), (1, 1, "join", "should"),
        (1, 2, "merge", "should"), (1, 3, "zzz", "should"),
    ])
    # must=spark AND >=1 of {join, merge}: docs 1 (both), 2 (join), 3 (merge)
    res = boolean_topk(p, t, clauses, n, adl, k=5, id_col="doc_id",
                       min_should_match=1)
    assert sorted(r["doc_id"] for r in res.collect()) == [1, 2, 3]


def test_hit_stats_counts_and_max_score(spark):
    """hit_stats: exact candidate count + best score per query; a query
    matching nothing yields no row; count equals the unbounded top-k
    length and max_score its rank-0 score."""
    from pulse_spark.query.search import hit_stats

    p, t, n, adl = _corpus(spark, CORPUS)
    occ = spark.createDataFrame(
        [(1, 0, "spark"), (1, 1, "merge"), (2, 0, "zzzabsent")],
        "query_id long, pos int, term string",
    )
    hs = {r["query_id"]: r for r in
          hit_stats(p, t, occ, n, adl, id_col="doc_id", tie_round=6).collect()}
    assert set(hs) == {1}
    full = topk_from_tables(p, t, occ, n, adl, k=100, id_col="doc_id",
                            tie_round=6).collect()
    assert hs[1]["n_hits"] == len(full)
    best = round(max(r["score"] for r in full), 6)
    assert abs(hs[1]["max_score"] - best) < 1e-9


def test_unordered_near_semantics(spark):
    """near_match: any order within the n+slop window; ordered-only
    corpora match both directions; beyond-window docs don't match."""
    from pulse_spark.query.phrase import near_match
    from pulse_spark.text.normalize import PreprocessSettings

    prep = PreprocessSettings(stemming=False)
    docs = spark.createDataFrame(
        [
            (1, "spark join"),              # adjacent, in order
            (2, "join spark"),              # adjacent, REVERSED
            (3, "spark big data platform query join"),  # gap 4 > slop 2
            (4, "spark big fast join"),     # gap 2 == slop 2
            (5, "spark merge"),             # missing 'join'
        ],
        "doc_id long, text string",
    )
    res = {r["doc_id"]: r["n_occ"]
           for r in near_match(docs, "spark join", prep, slop=2).collect()}
    assert set(res) == {1, 2, 4}
    # windows counted per covering start position (overlaps count):
    # doc 1 "spark join": window size 4, starts i=1 covers both; i<=... 
    assert all(v >= 1 for v in res.values())

    # slop=0: terms must be packed tight (adjacent, any order)
    tight = {r["doc_id"] for r in
             near_match(docs, "spark join", prep, slop=0).collect()}
    assert tight == {1, 2}

    # duplicate query tokens dedupe: {spark, spark} == {spark}
    dup = {r["doc_id"]: r["n_occ"] for r in
           near_match(docs, "spark spark", prep, slop=0).collect()}
    single = {r["doc_id"]: r["n_occ"] for r in
              near_match(docs, "spark", prep, slop=0).collect()}
    assert dup == single


def test_unordered_near_superset_of_ordered_slop(spark):
    """Every doc the ordered sloppy phrase matches, the unordered near
    at the same window also matches (order is a strictly weaker
    constraint)."""
    from pulse_spark.query.phrase import near_match, phrase_match
    from pulse_spark.text.normalize import PreprocessSettings

    prep = PreprocessSettings(stemming=False)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "spark fast join", "join spark", "spark merge join merge",
            "join fast fast spark", "spark join spark join",
        ])],
        "doc_id long, text string",
    )
    ordered = {r["doc_id"] for r in
               phrase_match(docs, "spark join", prep, slop=1).collect()}
    unordered = {r["doc_id"] for r in
                 near_match(docs, "spark join", prep, slop=1).collect()}
    assert ordered <= unordered
    assert 1 in unordered - ordered or 3 in unordered - ordered
