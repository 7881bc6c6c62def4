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


def phrase_match(
    docs: DataFrame,
    phrase: str,
    settings: PreprocessSettings = PreprocessSettings(stemming=False),
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_occ): documents containing the phrase (adjacent tokens
    after preprocessing), with occurrence counts; n_occ > 0 only."""
    tok = make_tokenizer_udf(settings)
    from pulse_spark.text.normalize import tokens as py_tokens

    phrase_tokens = py_tokens(phrase, settings)
    if not phrase_tokens:
        spark = docs.sparkSession
        return spark.createDataFrame([], f"{id_col} long, n_occ long")
    n = len(phrase_tokens)
    return (
        docs.withColumn("_toks", tok(F.col("text")))
        .select(
            F.col(id_col).cast("long").alias(id_col),
            phrase_count_expr(n, phrase_tokens).cast("long").alias("n_occ"),
        )
        .where(F.col("n_occ") > 0)
    )
