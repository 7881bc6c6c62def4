"""Parity pins for the JVM-expression tokenizer path (text/exprs.py).

The "expr" strategy must be indistinguishable from the fused pandas-UDF
("arrow") strategy — which is itself pinned against the reference golds
in test_text.py / test_sources_and_golds.py — on every settings combo,
including rows that exercise the non-ASCII and long-doc fallback
branches."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings
from pulse_spark.index import build as B
from pulse_spark.text import exprs as X
from pulse_spark.text.normalize import PreprocessSettings, tokens
from pulse_spark.text.udfs import trimmed

EDGE_ROWS = [
    ("x1", "Café au lait — déjà vu! <b>très</b> bien ok"),
    ("x2", "ASCII only <a href='x'>link</a> text, with 123 numbers!"),
    ("x3", ""),
    ("x4", None),
    ("x5", "\x01\x02weird\x0bctrl\rchars\there"),
    ("x6", "naïve résumé 北京 søk"),
    ("x7", "don't <tag\x0bbroken> mix<b>ed</b> punct... (lots)! of~it"),
    # > MAX_EXPR_DOC_BYTES: must route through the fused-UDF branch
    ("x8", "long doc " + "running jumps quickly " * 400),
]


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_no"), "text"
    )
    extra = spark.createDataFrame(EDGE_ROWS, "doc_no string, text string")
    t = trimmed(F.col("text"))
    return (
        base.unionByName(extra)
        .select("doc_no", t.alias("text"), F.octet_length(t).alias("doc_len"))
        .persist()
    )


@pytest.mark.parametrize("stem", [True, False])
@pytest.mark.parametrize("stop", [True, False])
def test_expr_postings_match_arrow(docs, stem, stop):
    s = IndexingSettings(stemming=stem, stopwords_removal=stop)
    cols = ["term", "doc_no", "doc_len", "tf"]
    a = (
        B.postings_df(docs, s, tokenizer="arrow").toPandas()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    e = (
        B.postings_df(docs, s, tokenizer="expr").toPandas()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    assert len(a) == len(e)
    pd.testing.assert_frame_equal(a, e)


def test_tokens_ascii_expr_matches_python_oracle(spark):
    """Token-level (ordered) parity of the pure-JVM pipeline on ASCII."""
    texts = [
        "The quick <b>brown</b> fox... jumped! Over 42 lazy-dogs?",
        "a an the of to in  spaces\t\ttabs\nnewlines",
        "punct:;only!!! ###",
        "don't can't won't it's",
        "\x01ctrl\x0bchars\x7fhere ok",
        "",
        "UPPER Case MiXeD",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(X.tokens_ascii_expr(F.col("text")).alias("t")).collect()
    ps = PreprocessSettings(stopwords_removal=True, stemming=False)
    for row, text in zip(got, texts):
        assert list(row["t"]) == tokens(text, ps), text


def test_unknown_tokenizer_rejected(docs):
    with pytest.raises(ValueError, match="tokenizer"):
        B.postings_df(docs, IndexingSettings(), tokenizer="bogus")


from hypothesis import HealthCheck, given, settings as hsettings
from hypothesis import strategies as st

_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=127), max_size=120
)


@hsettings(max_examples=5, deadline=None,
           suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_ascii_text, min_size=1, max_size=40))
def test_tokens_expr_hypothesis_parity(spark, texts):
    """Random ASCII (control chars, fake tags, punctuation soup): the
    JVM expression pipeline must produce the Python oracle's token list,
    in order, for every row."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(X.tokens_ascii_expr(F.col("text")).alias("t")).collect()
    ps = PreprocessSettings(stopwords_removal=True, stemming=False)
    for row, text in zip(got, texts):
        assert list(row["t"]) == tokens(text, ps), repr(text)
