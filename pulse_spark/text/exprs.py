"""JVM-side (whole-stage-codegen) tokenizer expressions.

The Arrow pandas-UDF tokenizer (udfs.py) is exact but Python-bound: a
Spark-free control (`bench.py --host-ceiling`) shows THIS VM caps any
Python-per-token workload at ~0.65 scaling efficiency going 8->32
processes, while integer/JVM work reaches ~0.87.  To scale the build past
the Python ceiling, the hot path must leave Python.

The reference pipeline (pkg/preprocess/preprocess.go:23-34) on ASCII text
is exactly expressible with built-in string expressions — lowercase, the
control-char strip, the HTML strip, the punctuation strip and the
whitespace split are all `regexp_replace`/`split` (compiled into
whole-stage codegen, no Arrow boundary, no GIL).  Non-ASCII rows (where
NFD/Mn-drop/NFC genuinely needs Python's unicodedata) take the pandas-UDF
fallback — the two branches are split by a cheap byte-length==char-length
test, so a mostly-ASCII corpus (MS MARCO, English web text) pays Python
for only the non-ASCII sliver.

Porter stemming stays in Python but runs over the DISTINCT VOCABULARY
(Heaps' law: sublinear in corpus size), not over every token: the build
stems a (token -> stem) dictionary with a pandas UDF and joins it back
(AQE picks broadcast while the vocabulary fits, shuffle join beyond).
Per-token work at 10^12 turns is therefore O(vocab), not O(corpus).

Exactness: every expression here mirrors normalize.py line-for-line on
ASCII input (the fast paths at normalize.py:93-97 and 107-109 are the
same character classes); parity is pinned against the Python oracle in
tests/test_exprs.py, including the mixed ASCII/non-ASCII union.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pulse_spark.text.stopwords import STOPWORDS

_HTML = r"<[^>]*>"  # word.go:17,26 via normalize.py:49

# The punctuation strip ([^a-zA-Z0-9\s]+ -> " ", normalize.py:118) and
# the control strip ([\x00-\x08\x0B-\x1F\x7F] -> "", normalize.py:87; on
# ASCII, NFD/NFC are identity so this IS the unicode-normalize step) are
# done by ONE translate() — a per-char table map, measured ~10x faster
# than the equivalent regexp_replace on this corpus (regex replacement
# buffers dominate the whole tokenize otherwise).  translate maps
# matching[i] -> replace[i] and DELETES chars beyond len(replace), so
# punct chars (first) map to space and control chars (tail) are removed.
#
# Reorder safety (Python strips controls BEFORE the HTML regex, this
# expression after): control chars are never '<' or '>' and [^>] matches
# them, so the set of <[^>]*> matches is identical on the original and
# control-stripped strings — the two orders produce the same text.
_PUNCT_CHARS = "".join(
    c for c in map(chr, range(0x20, 0x7F))
    if not (c.islower() or c.isdigit() or c == " ")
)
_CTRL_CHARS = "".join(
    map(chr, [*range(0x00, 0x09), *range(0x0B, 0x20), 0x7F])
)
# after the strip, the only whitespace left in ASCII text is space/\t/\n —
# all inside Java's \s — so split("\s+") == Python str.split()


def is_ascii(col: Column) -> Column:
    """True iff the UTF-8 byte length equals the character count."""
    return F.octet_length(col) == F.length(col)


def tokens_ascii_expr(col: Column, stopwords_removal: bool = True) -> Column:
    """array<string> of unstemmed tokens — reference steps T1-T6 as pure
    column expressions.  EXACT on ASCII input only (callers branch on
    :func:`is_ascii`); uppercase letters sit in the translate table only
    for safety — lower() has already removed them."""
    s = F.lower(col)
    s = F.regexp_replace(s, _HTML, " ")
    s = F.translate(s, _PUNCT_CHARS + _CTRL_CHARS, " " * len(_PUNCT_CHARS))
    toks = F.filter(F.split(s, r"\s+"), lambda t: t != F.lit(""))
    if stopwords_removal:
        # 173 literals -> Catalyst folds the In to an InSet hash probe
        stop = sorted(STOPWORDS)
        toks = F.filter(toks, lambda t: ~t.isin(*stop))
    return toks


# Texts longer than this take the fused-UDF branch: term_freqs_expr is
# O(tokens x distinct) per document — ideal for short transcript turns
# (avg ~10 tokens; the north-rule input), quadratic for book-length
# docs.  ~700 tokens at the cutoff keeps the worst JVM doc ~2e5 compares.
MAX_EXPR_DOC_BYTES = 4096


def term_freqs_expr(toks: Column) -> Column:
    """array<struct<term,tf>> — per-doc term frequencies as a pure column
    expression (preprocess.Frequencies, preprocess.go:36-46).  Zero
    shuffle: tf is doc-local by construction, exactly like the fused UDF.

    O(n*d) per doc (for each distinct term, count its occurrences) — the
    sort+run-length alternative is O(n log n) on paper but measured 10x
    SLOWER here (nested higher-order functions with element_at fall out
    of codegen); see MAX_EXPR_DOC_BYTES for the long-doc guard."""
    return F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )


def make_stem_arr_udf():
    """pandas UDF array<string> -> array<string>: Porter over a token
    array.  porter.stem_tokens memoizes distinct tokens per worker
    process, so the per-token cost is a dict lookup — the Porter itself
    runs O(vocab) times (Heaps' law: sublinear in corpus size)."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def stem_arr_udf(toks: pd.Series) -> pd.Series:
        from pulse_spark.text.porter import stem_tokens

        return toks.map(lambda ts: stem_tokens(list(ts)) if ts is not None else None)

    return stem_arr_udf
