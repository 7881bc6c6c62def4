"""Semantics pins for prefix (wildcard) and fuzzy term-expansion queries
(query/wildcard.py) on hand-built corpora where the expected expansion
set is derivable by inspection.  Cross-engine value-equality at sf0.01
is the DuckDB oracle gate's job (tests/test_harness_oracle.py rows
bm25_prefix_topk / bm25_fuzzy_topk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index.build import postings_df, terms_df
from pulse_spark.query.search import topk_from_tables
from pulse_spark.query.wildcard import fuzzy_topk, prefix_topk
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


def _ranked(res):
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in sorted(res.collect(), key=lambda r: (r["query_id"], r["rank"]))
    ]


def _probes(spark, rows, col):
    return spark.createDataFrame(rows, f"query_id long, pos int, {col} string")


def test_prefix_expands_to_manual_disjunction(spark):
    """A prefix probe scores exactly like the hand-expanded multi-term
    query: one occurrence per matched lexicon term at the probe's pos."""
    p, t, n, adl = _corpus(
        spark,
        [
            (1, "spark spam join"),
            (2, "spark spark merge"),
            (3, "spam spot"),
            (4, "join merge"),
        ],
    )
    res = prefix_topk(
        p, t, _probes(spark, [(1, 0, "sp")], "prefix"), n, adl,
        k=4, id_col="doc_id", tie_round=6,
    )
    manual_occ = _probes(
        spark,
        [(1, 0, "spam"), (1, 0, "spark"), (1, 0, "spot")],
        "term",
    )
    manual = topk_from_tables(
        p, t, manual_occ, n, adl, k=4, id_col="doc_id", tie_round=6
    )
    assert _ranked(res) == _ranked(manual)
    # doc 4 matches no sp* term and must be absent
    assert 4 not in {r[2] for r in _ranked(res)}


def test_prefix_max_expansions_keeps_top_df(spark):
    """With max_expansions=2 the probe keeps only the 2 highest-df
    matches (ties term-asc) — Lucene's top-terms rewrite."""
    # dfs: spark=3 docs, spam=2, spot=1
    p, t, n, adl = _corpus(
        spark,
        [
            (1, "spark spam"),
            (2, "spark spam"),
            (3, "spark spot"),
            (4, "merge"),
        ],
    )
    res = prefix_topk(
        p, t, _probes(spark, [(1, 0, "sp")], "prefix"), n, adl,
        k=4, max_expansions=2, id_col="doc_id", tie_round=6,
    )
    manual = topk_from_tables(
        p, t,
        _probes(spark, [(1, 0, "spark"), (1, 0, "spam")], "term"),
        n, adl, k=4, id_col="doc_id", tie_round=6,
    )
    assert _ranked(res) == _ranked(manual)
    # doc 3 still matches via 'spark', but 'spot' contributes nothing:
    # its score must equal the spark-only contribution, not spark+spot
    only_spark = dict(
        (r[2], r[3]) for r in _ranked(
            topk_from_tables(
                p, t, _probes(spark, [(1, 0, "spark")], "term"),
                n, adl, k=4, id_col="doc_id", tie_round=6,
            )
        )
    )
    got = {r[2]: r[3] for r in _ranked(res)}
    assert got[3] == pytest.approx(only_spark[3], rel=1e-12)


def test_fuzzy_matches_within_edit_distance(spark):
    """max_edits=1 catches distance-0 (exact) and distance-1 lexicon
    terms and excludes distance-2; per-occurrence semantics hold (a
    duplicated probe occurrence scores twice)."""
    p, t, n, adl = _corpus(
        spark,
        [
            (1, "slow merge"),   # slow: dist("sow","slow")=1
            (2, "row join"),     # row:  dist("sow","row")=1
            (3, "sort scan"),    # sort: dist("sow","sort")=2 -> excluded
        ],
    )
    res = fuzzy_topk(
        p, t, _probes(spark, [(1, 0, "sow")], "token"), n, adl,
        k=3, max_edits=1, id_col="doc_id", tie_round=6,
    )
    manual = topk_from_tables(
        p, t, _probes(spark, [(1, 0, "row"), (1, 0, "slow")], "term"),
        n, adl, k=3, id_col="doc_id", tie_round=6,
    )
    assert _ranked(res) == _ranked(manual)
    assert 3 not in {r[2] for r in _ranked(res)}

    dup = fuzzy_topk(
        p, t, _probes(spark, [(2, 0, "slow"), (2, 1, "slow")], "token"),
        n, adl, k=3, max_edits=1, id_col="doc_id", tie_round=6,
    )
    single = fuzzy_topk(
        p, t, _probes(spark, [(2, 0, "slow")], "token"),
        n, adl, k=3, max_edits=1, id_col="doc_id", tie_round=6,
    )
    d, s = dict(
        (r[2], r[3]) for r in _ranked(dup)
    ), dict((r[2], r[3]) for r in _ranked(single))
    assert set(d) == set(s)
    for doc, sc in s.items():
        assert d[doc] == pytest.approx(2 * sc, rel=1e-12)


def test_missing_probes_drop_out(spark):
    """Probes matching nothing contribute nothing; a query whose probes
    all miss returns no rows; an empty probe set returns an empty frame
    with the contract schema."""
    p, t, n, adl = _corpus(spark, [(1, "spark join"), (2, "merge")])
    res = prefix_topk(
        p, t,
        _probes(spark, [(1, 0, "zz"), (2, 0, "sp"), (2, 1, "zz")], "prefix"),
        n, adl, k=3, id_col="doc_id", tie_round=6,
    )
    got = _ranked(res)
    assert {r[0] for r in got} == {2}  # query 1 fully missed
    only_sp = _ranked(
        prefix_topk(
            p, t, _probes(spark, [(2, 0, "sp")], "prefix"), n, adl,
            k=3, id_col="doc_id", tie_round=6,
        )
    )
    assert got == only_sp  # the missed probe changed nothing

    empty = prefix_topk(
        p, t, _probes(spark, [], "prefix"), n, adl, k=3, id_col="doc_id"
    )
    assert empty.count() == 0
    assert set(empty.columns) == {"query_id", "rank", "doc_id", "score"}
    fz = fuzzy_topk(
        p, t, _probes(spark, [(1, 0, "xyzzy")], "token"), n, adl,
        k=3, max_edits=1, id_col="doc_id",
    )
    assert fz.count() == 0


# ---------------------------------------------------------------------------
# spell suggestions (suggest_terms)
# ---------------------------------------------------------------------------


def test_suggest_only_for_absent_tokens(spark):
    """In-lexicon tokens are not misspellings: no suggestion rows; an
    absent token gets the closest lexicon terms ranked (distance asc,
    df desc, term asc)."""
    from pulse_spark.query.wildcard import suggest_terms

    p, t, n, adl = _corpus(
        spark,
        [
            (1, "spark spark merge"),
            (2, "spark join"),
            (3, "merge join"),
        ],
    )
    res = suggest_terms(
        t,
        _probes(spark, [(1, 0, "spark"), (2, 0, "sprk"), (3, 0, "zzzz")],
                "token"),
        max_edits=2, n_suggestions=3,
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert 1 not in by_q           # in-lexicon token vetoed
    assert 3 not in by_q           # nothing within 2 edits
    sugg = sorted(by_q[2], key=lambda r: r["srank"])
    assert [s["suggestion"] for s in sugg] == ["spark"]
    assert sugg[0]["distance"] == 1 and sugg[0]["df"] == 2


def test_suggest_ranking_distance_then_df_then_term(spark):
    """distance beats df; at equal distance higher df wins; at equal
    (distance, df) term-asc breaks the tie — and n_suggestions cuts."""
    from pulse_spark.query.wildcard import suggest_terms

    # lexicon: merge(df 3), marge(df 2), merged(df 1)
    p, t, n, adl = _corpus(
        spark,
        [
            (1, "merge marge merged"),
            (2, "merge marge"),
            (3, "merge"),
        ],
    )
    res = suggest_terms(
        t, _probes(spark, [(1, 0, "mrge")], "token"),
        max_edits=2, n_suggestions=2,
    ).collect()
    ranked = sorted(res, key=lambda r: r["srank"])
    # mrge: merge=1 (df 3), marge=1 (df 2), merged=2 — the distance-1
    # pair wins, ordered df desc; n_suggestions=2 cuts merged entirely
    assert [(r["suggestion"], r["distance"]) for r in ranked] == [
        ("merge", 1), ("marge", 1),
    ]


def test_suggest_per_occurrence_rows(spark):
    """A token appearing at two positions yields suggestion rows for
    BOTH occurrences (per-occurrence semantics, like every query op)."""
    from pulse_spark.query.wildcard import suggest_terms

    p, t, n, adl = _corpus(spark, [(1, "spark join"), (2, "spark")])
    res = suggest_terms(
        t, _probes(spark, [(1, 0, "sprk"), (1, 1, "sprk")], "token"),
        max_edits=1, n_suggestions=3,
    ).collect()
    assert sorted((r["pos"], r["suggestion"]) for r in res) == [
        (0, "spark"), (1, "spark"),
    ]


# ---------------------------------------------------------------------------
# regexp queries (regexp_topk)
# ---------------------------------------------------------------------------


def test_regexp_is_anchored_full_term_match(spark):
    """Lucene RegexpQuery semantics: the ENTIRE term must match —
    'par.*' must NOT match 'spark' (substring), only terms starting
    'par'; and the expansion equals the hand-built disjunction."""
    from pulse_spark.query.wildcard import regexp_topk

    p, t, n, adl = _corpus(
        spark,
        [
            (1, "spark part partition"),
            (2, "spark part"),
            (3, "partition join"),
        ],
    )
    res = regexp_topk(
        p, t, _probes(spark, [(1, 0, "par.*")], "pattern"),
        n, adl, k=10, id_col="doc_id", tie_round=6,
    )
    occ = spark.createDataFrame(
        [(1, 0, "part"), (1, 0, "partition")],
        "query_id long, pos int, term string",
    )
    plain = topk_from_tables(p, t, occ, n, adl, k=10, id_col="doc_id",
                             tie_round=6)
    key = lambda rs: [(r["doc_id"], round(r["score"], 9))
                      for r in sorted(rs, key=lambda r: r["rank"])]
    assert key(res.collect()) == key(plain.collect())


def test_regexp_miss_and_alternation(spark):
    from pulse_spark.query.wildcard import regexp_topk

    p, t, n, adl = _corpus(
        spark, [(1, "merge join"), (2, "marge"), (3, "join")]
    )
    res = regexp_topk(
        p, t,
        _probes(spark, [(1, 0, "m(e|a)rge"), (2, 0, "zz+")], "pattern"),
        n, adl, k=10, id_col="doc_id",
    ).collect()
    assert {r["query_id"] for r in res} == {1}
    assert sorted(r["doc_id"] for r in res) == [1, 2]  # merge + marge docs
