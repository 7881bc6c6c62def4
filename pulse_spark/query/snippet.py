"""Best-window snippet extraction for search results (Spark-first
extension; the Lucene/Elasticsearch "highlighting" feature the reference
engine leaves to its caller).

For each (query, result-doc) pair, find the `window`-token span of the
document that maximizes the summed idf of matched query-term
occurrences (rare matched terms pull the snippet toward themselves),
tie-broken to the earliest start, and return it as display text.

Scale shape — the part that must survive 100 TB:
  - only the RESULT docs are ever tokenized: the k·q winning ids are a
    broadcast semi-join against the docs table, so snippet cost is
    O(results), independent of corpus size;
  - window scoring is additive over matched occurrences, so each
    occurrence explodes into at most `window` candidate starts (a
    bounded fan-out, all JVM-side after the tokenizer UDF) and the best
    window is one partial-aggregated groupBy over (query, doc, start) —
    no per-doc Python loop, no O(len^2) self-join;
  - positions/snippets use the display stream (stopwords KEPT, stemming
    off) so snippets read naturally, while match keys go through the
    index's stemming so a stemmed index highlights correctly; the two
    streams are positionally aligned because stemming is a per-token
    map and stopword removal is deferred to the match join (a stopword
    can never equal a preprocessed query term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pulse_spark.text.normalize import PreprocessSettings
from pulse_spark.text.udfs import make_tokenizer_udf


def snippet_topk(
    results: DataFrame,
    docs_text: DataFrame,
    q_occurrences: DataFrame,
    terms: DataFrame,
    n_docs: int,
    preprocess: PreprocessSettings,
    window: int = 8,
    id_col: str = "doc_no",
    tie_round: int | None = None,
) -> DataFrame:
    """Per (query_id, <id_col>) result row, the best `window`-token
    snippet.

    results:       (query_id, <id_col>) winners from search — tiny (k·q).
    docs_text:     (<id_col>, text).
    q_occurrences: (query_id, ..., term) preprocessed query tokens;
                   duplicates are fine (scoring uses distinct terms — a
                   window is not better because the USER typed a term
                   twice).
    terms:         (term, df) global lexicon for idf weighting.
    tie_round:     like topk_from_tables — round window scores before
                   comparing so cross-engine ulps tie-break on start.

    Returns (query_id, <id_col>, start, snip_score, snippet): start is
    the 0-based token offset in the display stream; docs with no matched
    occurrence (possible under rank-floor paths) are omitted.
    """
    display = PreprocessSettings(stopwords_removal=False, stemming=False)
    tok_display = make_tokenizer_udf(display)

    hit_docs = docs_text.join(
        F.broadcast(results.select(id_col).distinct()), id_col, "left_semi"
    ).select(id_col, tok_display(F.col("text")).alias("toks"))

    occ = hit_docs.select(
        id_col, F.posexplode("toks").alias("pos", "_disp")
    )
    if preprocess.stemming:
        match_keyed = PreprocessSettings(stopwords_removal=False, stemming=True)
        tok_match = make_tokenizer_udf(match_keyed)
        stemmed = docs_text.join(
            F.broadcast(results.select(id_col).distinct()), id_col, "left_semi"
        ).select(id_col, F.posexplode(tok_match(F.col("text"))).alias("pos", "term"))
        occ = occ.join(stemmed, [id_col, "pos"]).drop("_disp")
    else:
        occ = occ.withColumnRenamed("_disp", "term")

    # idf weight per distinct (query, term); absent terms drop in the join
    qw = (
        q_occurrences.select("query_id", "term").distinct()
        .join(terms.select("term", "df"), "term")
        .withColumn("weight", F.log(F.lit(float(n_docs)) / F.col("df")))
    )
    matched = (
        results.select("query_id", id_col)
        .join(occ, id_col)
        .join(F.broadcast(qw.select("query_id", "term", "weight")),
              ["query_id", "term"])
    )

    # each occurrence supports windows starting in [pos-window+1, pos]
    starts = matched.select(
        "query_id", id_col, "weight",
        F.explode(
            F.sequence(F.greatest(F.col("pos") - window + 1, F.lit(0)),
                       F.col("pos"))
        ).alias("start"),
    )
    win = starts.groupBy("query_id", id_col, "start").agg(
        F.sum("weight").alias("snip_score")
    )
    order_key = (
        F.round("snip_score", tie_round) if tie_round is not None
        else F.col("snip_score")
    )
    w = Window.partitionBy("query_id", id_col).orderBy(
        F.desc(order_key), F.asc("start")
    )
    best = win.withColumn("_r", F.row_number().over(w)).where(
        F.col("_r") == 1
    ).drop("_r")

    return best.join(F.broadcast(hit_docs), id_col).select(
        "query_id", id_col, F.col("start").cast("long").alias("start"),
        "snip_score",
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("start") + 1, window)
        ).alias("snippet"),
    )
