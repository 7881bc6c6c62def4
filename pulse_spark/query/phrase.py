"""Positional phrase matching.

The reference has no positional index (SURVEY §2.6) — this is a
Spark-first extension: a phrase query is token-adjacency over the same
preprocessed token stream the index uses (so "spark join" matches with
stopwords removed between the surface words exactly like a positional
index built from the engine's tokens_exploded would).

Execution shape: a single projection over the corpus — the adjacency
test runs INSIDE the tokenizer's output array with higher-order
functions (element_at over a guarded sequence), so there is no explode,
no join, no shuffle; Catalyst pipelines it with any downstream filter.
At 100 TB this is one scan, and with an index present the candidate set
can be pre-pruned by conjunctive term lookup first (all phrase terms
must be present) — the classic two-phase phrase plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulse_spark.text.normalize import PreprocessSettings
from pulse_spark.text.udfs import make_tokenizer_udf


def phrase_count_expr(n: int, phrase_tokens: list[str]) -> Column:
    """Occurrences of the n-token phrase in the array column `_toks`
    (1-based element_at, mirroring the SQL oracle's 1-based lists).
    Guarded: Spark's sequence(1, 0) is [1, 0], not empty."""
    for t in phrase_tokens:
        if "'" in t or "\\" in t:
            raise ValueError(f"unsupported token {t!r}")
    cond = " AND ".join(
        f"element_at(_toks, CAST(i + {j} AS INT)) = '{t}'"
        for j, t in enumerate(phrase_tokens)
    )
    return F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"size(filter(sequence(1, size(_toks) - {n - 1}), i -> {cond})) "
        f"ELSE 0 END"
    )


def proximity_count_expr(n: int, phrase_tokens: list[str], slop: int) -> Column:
    """Sloppy-phrase occurrences in `_toks` (Lucene sloppy PhraseQuery,
    ordered variant): a match starts at a position i holding token 1,
    and each later token is found GREEDILY at its earliest position
    after the previous one; the match counts iff the full span fits in
    n - 1 + slop.  Greedy-earliest minimizes the final position for a
    fixed start (exchange argument), so existence-within-span is exact.
    slop=0 reduces to exact adjacency (phrase_count_expr semantics).

    Expression shape: per-token 1-based position arrays, then a nested
    earliest-after chain.  Nested HOFs are interpreted (no codegen) and
    re-evaluate the inner chain per candidate position — fine for the
    n ≤ ~4 tokens real queries carry; the conjunctive term-lookup
    pre-prune keeps the scanned doc set small at scale."""
    for t in phrase_tokens:
        if "'" in t or "\\" in t:
            raise ValueError(f"unsupported token {t!r}")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    pos = {
        j: (
            f"filter(sequence(1, size(_toks)), p{j} -> "
            f"element_at(_toks, CAST(p{j} AS INT)) = '{t}')"
        )
        for j, t in enumerate(phrase_tokens)
    }
    chain = "i"
    for j in range(1, n):
        chain = f"array_min(filter(_np{j}, q{j} -> q{j} > {chain}))"
    cond = f"{chain} <= i + {n - 1 + slop}" if n > 1 else "true"
    expr = f"size(filter(_np0, i -> {cond}))"
    for j in range(n):
        # let-binding via a single-element transform (see
        # near_count_expr): the position array is evaluated ONCE per
        # row instead of per candidate position — HOFs don't CSE
        # non-lambda subexpressions
        expr = f"element_at(transform(array({pos[j]}), _np{j} -> {expr}), 1)"
    return F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN ({expr}) ELSE 0 END"
    )


def near_count_expr(near_tokens: list[str], slop: int) -> Column:
    """Unordered proximity (Lucene SpanNearQuery inOrder=false): count
    of positions p in `_toks` whose window [p, p + n - 1 + slop]
    contains EVERY query term, any order (n = number of distinct
    terms).  Overlapping windows each count — the count is a
    well-defined co-occurrence density, mirrored position-for-position
    by the SQL oracle; existence (n_occ > 0) is the retrieval
    predicate.

    Same expression budget as proximity_count_expr: per-term position
    arrays + an `exists` per term per candidate position — interpreted
    HOFs, fine at the n ≤ ~4 terms real near-queries carry."""
    for t in near_tokens:
        if "'" in t or "\\" in t:
            raise ValueError(f"unsupported token {t!r}")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    n = len(near_tokens)
    w = n + slop  # max span length, Lucene's n - 1 + slop gap budget + 1
    # Per-term position arrays referenced TWICE (emptiness guard +
    # exists probe): Spark HOFs don't CSE non-lambda subexpressions —
    # a single-use array would be inlined by CollapseProject and
    # re-FILTERED per candidate position (O(len²) per doc, the
    # bigram_pmi trap); the multi-use guard keeps each array
    # materialized once per row, so the per-position work is just the
    # exists probes over the (short) occurrence lists.
    pos = {
        j: (
            f"filter(sequence(1, size(_toks)), "
            f"p{j} -> element_at(_toks, CAST(p{j} AS INT)) = '{t}')"
        )
        for j, t in enumerate(near_tokens)
    }
    guard = " OR ".join(f"size(_np{j}) = 0" for j in pos)
    cond = " AND ".join(
        f"exists(_np{j}, q{j} -> q{j} >= i AND q{j} < i + {w})" for j in pos
    )
    expr = (
        f"CASE WHEN {guard} THEN 0 ELSE "
        f"size(filter(sequence(1, size(_toks)), i -> {cond})) END"
    )
    for j, p in pos.items():
        # let-binding via a single-element transform: the position array
        # P is evaluated ONCE and bound to the lambda variable _npj —
        # lambda variables are never re-inlined, unlike projected attrs
        expr = f"element_at(transform(array({p}), _np{j} -> {expr}), 1)"
    return F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN ({expr}) ELSE 0 END"
    )


def phrase_prefilter(required: list[str]) -> Column:
    """Necessary-condition pre-prune for the phrase family (r6; the
    two-phase plan of the module docstring): a document can only match
    if EVERY required token appears as a substring of its lowercased
    text, and substring containment is a codegen'd contains() — so the
    per-row Python tokenizer and the interpreted positional HOFs run
    only on documents that pass, instead of on the whole corpus.  The
    plan stays a single scan + filter: no join, no shuffle, and the
    at-scale wall drops with match selectivity.

    Exactness: a token is a substring of lower(text) whenever no
    character was REMOVED ahead of tokenization (punctuation and HTML
    tags become spaces — they never merge runs).  Removal happens only
    in the non-ASCII path (NFD / Mn-drop / NFC) and for ASCII control
    characters, so rows with either BYPASS the prefilter and take the
    exact tokenize path.  NULL text yields a NULL predicate = dropped,
    matching the tokenizer's None -> [] -> n_occ 0.

    Callers must pass SURFACE tokens: a Porter STEM is generally not a
    substring of the matching surface form ('happy' stems to 'happi'),
    so phrase_match/near_match skip this prefilter entirely when
    settings.stemming is on (see their bodies)."""
    lt = F.lower(F.col("text"))
    bypass = (
        (F.octet_length("text") != F.length("text"))
        | F.col("text").rlike("[\\x00-\\x08\\x0B-\\x1F\\x7F]")
    )
    cond = F.lit(True)
    for t in required:
        cond = cond & lt.contains(t)
    return bypass | cond


def near_match(
    docs: DataFrame,
    terms_text: str,
    settings: PreprocessSettings = PreprocessSettings(stemming=False),
    id_col: str = "doc_id",
    slop: int = 0,
) -> DataFrame:
    """(id, n_occ): documents where ALL distinct query terms co-occur
    within a window of n + slop tokens in ANY order (slop=0 = the terms
    packed tight).  Duplicate query tokens are deduped (first-seen
    order) — an unordered near over {a, a} is just {a}."""
    tok = make_tokenizer_udf(settings)
    from pulse_spark.text.normalize import tokens as py_tokens

    seen: dict[str, None] = {}
    for t in py_tokens(terms_text, settings):
        seen.setdefault(t)
    near_tokens = list(seen)
    if not near_tokens:
        spark = docs.sparkSession
        return spark.createDataFrame([], f"{id_col} long, n_occ long")
    # prefilter only without stemming: stemmed query tokens are not
    # substrings of their surface forms (r6 review finding)
    if not settings.stemming:
        docs = docs.where(phrase_prefilter(sorted(set(near_tokens))))
    return (
        docs.withColumn("_toks", tok(F.col("text")))
        .select(
            F.col(id_col).cast("long").alias(id_col),
            near_count_expr(near_tokens, slop).cast("long").alias("n_occ"),
        )
        .where(F.col("n_occ") > 0)
    )


def phrase_match(
    docs: DataFrame,
    phrase: str,
    settings: PreprocessSettings = PreprocessSettings(stemming=False),
    id_col: str = "doc_id",
    slop: int = 0,
) -> DataFrame:
    """(id, n_occ): documents containing the phrase, with occurrence
    counts; n_occ > 0 only.  slop=0 is exact adjacency; slop>0 allows
    up to `slop` extra tokens inside the (ordered) match span."""
    tok = make_tokenizer_udf(settings)
    from pulse_spark.text.normalize import tokens as py_tokens

    phrase_tokens = py_tokens(phrase, settings)
    if not phrase_tokens:
        spark = docs.sparkSession
        return spark.createDataFrame([], f"{id_col} long, n_occ long")
    n = len(phrase_tokens)
    count = (
        phrase_count_expr(n, phrase_tokens)
        if slop == 0
        else proximity_count_expr(n, phrase_tokens, slop)
    )
    # prefilter only without stemming: stemmed query tokens are not
    # substrings of their surface forms (r6 review finding)
    if not settings.stemming:
        docs = docs.where(phrase_prefilter(sorted(set(phrase_tokens))))
    return (
        docs.withColumn("_toks", tok(F.col("text")))
        .select(
            F.col(id_col).cast("long").alias(id_col),
            count.cast("long").alias("n_occ"),
        )
        .where(F.col("n_occ") > 0)
    )
