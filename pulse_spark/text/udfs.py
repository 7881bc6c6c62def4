"""Arrow-vectorized Spark UDFs for the text pipeline.

Per the north rule, no per-row Python UDFs anywhere: tokenization runs as
a pandas UDF over Arrow batches, with a per-batch memo on distinct strings
(Zipfian text ⇒ most batch rows share few distinct token sets is false,
but tokens themselves repeat heavily, and the Porter stemmer keeps its own
distinct-token memo — see porter.stem_tokens).

Column-expression (JVM/codegen) equivalents are used wherever exact
(trim/length); only the unicode-normalize + stem steps genuinely need
Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pulse_spark.text.normalize import PreprocessSettings, tokens

# ASCII whitespace class shared with the DuckDB oracle SQL (RE2) and the
# Python oracle (str.strip(ASCII_WS)); Java \s == [ \t\n\x0B\f\r].
#
# DOCUMENTED DEVIATION: the reference's strings.TrimSpace (ms-marco.go:70)
# trims the full Unicode whitespace set (unicode.IsSpace), so doc_len —
# and hence ADL and BM25 scores — can differ from the reference for
# documents padded with non-ASCII whitespace (e.g. U+00A0). This engine is
# deliberately ASCII-only and SELF-CONSISTENT across all three
# implementations (Spark regexp, DuckDB oracle regexp, Python str.strip):
# a Unicode class here would force every SQL oracle onto engine-specific
# Unicode regex behavior, a worse trade than matching Go on exotic inputs.
_WS = r"[ \t\n\r\f\x0B]"


def trimmed(col: Column | str) -> Column:
    """ASCII-whitespace trim (reference TrimSpace, ms-marco.go:70)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, f"^{_WS}+", ""), f"{_WS}+$", "")


def doc_len_bytes(col: Column | str) -> Column:
    """Doc length = BYTES of trimmed raw text (spimi.go:109)."""
    return F.octet_length(trimmed(col))


def doc_no(conv_id: Column | str = "conv_id", turn_idx: Column | str = "turn_idx") -> Column:
    """docID = conv_id:turn_idx (BASELINE.json north_star)."""
    ci = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    ti = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.concat_ws(":", ci, ti.cast("string"))


def make_tokenizer_udf(settings: PreprocessSettings):
    """Returns a pandas UDF str -> array<string> running the full
    reference pipeline (T1-T7 of SURVEY.md §2.2)."""

    stop = settings.stopwords_removal
    stemming = settings.stemming

    @pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        s = PreprocessSettings(stopwords_removal=stop, stemming=stemming)
        return texts.map(lambda t: tokens(t, s) if t is not None else [])

    return tokenize_udf


def make_term_freq_udf(settings: PreprocessSettings):
    """T1-T7 + T8 fused: str -> array<struct<term,tf>>.

    Per-doc term frequencies are computed INSIDE the Arrow batch
    (preprocess.Frequencies, preprocess.go:36-46), so the index build
    needs no (term, doc) shuffle at all — tf is local to the document by
    construction; only the df/max_tf merge aggregates across documents."""

    stop = settings.stopwords_removal
    stemming = settings.stemming
    out_t = T.ArrayType(
        T.StructType([
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.IntegerType()),
        ])
    )

    @pandas_udf(out_t)
    def term_freq_udf(texts: pd.Series) -> pd.Series:
        s = PreprocessSettings(stopwords_removal=stop, stemming=stemming)

        def freqs(t):
            if t is None:
                return []
            counts: dict[str, int] = {}
            for tok in tokens(t, s):
                counts[tok] = counts.get(tok, 0) + 1
            return list(counts.items())

        return texts.map(freqs)

    return term_freq_udf
