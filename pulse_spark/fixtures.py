"""Deterministic synthetic fixtures (FIXTURES.md): the `transcripts`
table mandated by BASELINE.json input_hint —
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp) — plus a reference query set.  Seeded, no external data.

The vocabulary mixes all 174 reference stopwords (hot-term skew), domain
words, a Zipf tail, and edge tokens (diacritics, emoji, HTML fragments,
punctuation runs, mixed case, tabs/newlines, leading/trailing spaces) so
the tokenizer and the skew handling are both exercised.
"""

from __future__ import annotations

import datetime as dt
import random

from pulse_spark.text.stopwords import STOPWORDS

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "", "", "bash", "search", "editor", "browser"]

_DOMAIN = [
    "function", "error", "deploy", "traceback", "kernel", "cluster",
    "partition", "shuffle", "executor", "dataframe", "parquet", "iceberg",
    "token", "index", "query", "ranking", "retrieval", "compression",
    "varint", "posting", "lexicon", "stemming", "pipeline", "checkpoint",
    "lineage", "throughput", "latency", "benchmark", "schema", "manhattan",
    "project", "scientific", "communication", "purpose", "offender",
    "justice", "restorative", "community", "running", "jumps", "flies",
    "caresses", "ponies", "relational", "conditional", "hopeful",
    "generalization", "oscillators", "operator", "aggregate", "broadcast",
]

_EDGE = [
    "café", "naïve", "résumé", "zürich", "日本語", "emoji🙂word", "🚀",
    "<p>", "<br/>", "don't", "it's", "C++", "x=y+1", "foo_bar", "A/B",
    "100%", "...", "—dash—", "MixedCase", "UPPER",
]


def _vocab(rng: random.Random) -> list[str]:
    vocab = sorted(STOPWORDS) + _DOMAIN + _EDGE
    # Zipf tail of rare synthetic words
    for i in range(1600):
        vocab.append("w%04d" % i)
    return vocab


def gen_transcripts(n_convs: int = 200, seed: int = 42) -> list[dict]:
    """Rows for the transcripts table. ~4 turns/conv on average."""
    rng = random.Random(seed)
    vocab = _vocab(rng)
    nv = len(vocab)
    rows = []
    base_ts = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    for c in range(n_convs):
        conv_id = "c%06d" % c
        n_turns = rng.randint(1, 8)
        t0 = base_ts + dt.timedelta(minutes=c)
        for turn in range(n_turns):
            n_words = rng.randint(0, 40)
            # Zipf-ish: rank r chosen with p ∝ 1/(r+1)
            words = []
            for _ in range(n_words):
                r = min(int(rng.paretovariate(0.8)) - 1, nv - 1)
                words.append(vocab[r])
            text = " ".join(words)
            if rng.random() < 0.1:
                text = "  " + text  # leading spaces (trim-before-length)
            if rng.random() < 0.1:
                text = text + " \t"
            if rng.random() < 0.05:
                text = text.replace(" ", "\n", 1)
            rows.append({
                "conv_id": conv_id,
                "turn_idx": turn,
                "role": ROLES[rng.randrange(len(ROLES))],
                "text": text,
                "tool": TOOLS[rng.randrange(len(TOOLS))],
                "ts": t0 + dt.timedelta(seconds=30 * turn),
            })
    return rows


def gen_queries() -> list[tuple[int, str]]:
    """Reference query set (FIXTURES.md §2): single/multi-term, duplicated
    term, all-stopword, absent term, conjunctive hit/miss, edge tokens."""
    return [
        (1, "manhattan project"),
        (2, "scientific communication"),
        (3, "error"),
        (4, "error error"),                      # duplicate → scores twice
        (5, "the of and a"),                     # all stopwords
        (6, "zzzznotaword"),                     # absent from corpus
        (7, "partition shuffle executor"),
        (8, "restorative justice offender"),
        (9, "café naïve"),                       # diacritics → cafe naive
        (10, "running jumps"),                   # stemming → run jump
        (11, "deploy checkpoint lineage"),
        (12, "query index"),
        (13, "compression varint posting"),
        (14, "throughput latency benchmark"),
        (15, "dataframe parquet"),
        (16, "🚀"),                              # emoji kept by \p{So}
        (17, "function error traceback kernel"),
        (18, "w0001 w0002"),
        (19, "w0500"),
        (20, "purpose"),
        (21, "the error"),                       # stopword + term
        (22, "generalization oscillators"),
        (23, "relational conditional"),
        (24, "<p>html</p> tags"),
        (25, "it's don't"),                      # apostrophes split
        (26, "w1599"),                           # rare tail
        (27, "broadcast aggregate operator"),
        (28, "index index index"),               # triple duplicate
        (29, "schema"),
        (30, "cluster partition cluster"),       # dup + distinct mix
    ]


def synth_transcripts_spark(spark, n_convs: int, seed: int = 42):
    """Spark-native deterministic transcripts generator for BENCHMARK
    scale (all JVM expressions — millions of turns in seconds; the Python
    generator above keeps the edge-case-rich fixture for correctness
    tests).  Text is Zipf(1)-ish: rank = floor(V^u) with u hash-uniform,
    so hot terms (stopwords at the head of the vocab) dominate like real
    text and exercise the skew handling."""
    from pyspark.sql import functions as F

    vocab = _vocab(random.Random(seed))
    v = len(vocab)
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    convs = spark.range(n_convs).select(
        F.format_string("c%09d", F.col("id")).alias("conv_id"),
        F.col("id").alias("cid"),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(8)) + 1).alias("n_turns"),
    )
    turns = convs.select(
        "conv_id", "cid",
        F.explode(F.sequence(F.lit(0), (F.col("n_turns") - 1).cast("int"))).alias("turn_idx"),
    )
    n_words = (F.pmod(F.xxhash64("cid", "turn_idx", F.lit(seed + 1)), F.lit(41))).cast("int")
    u = (
        F.pmod(F.xxhash64("cid", "turn_idx", F.col("_i"), F.lit(seed + 2)), F.lit(1000003))
        / F.lit(1000003.0)
    )
    rank = F.least(
        F.floor(F.pow(F.lit(float(v)), u)).cast("int") - 1, F.lit(v - 1)
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_arr,
            F.least(
                F.floor(
                    F.pow(
                        F.lit(float(v)),
                        F.pmod(
                            F.xxhash64("cid", "turn_idx", i, F.lit(seed + 2)),
                            F.lit(1000003),
                        )
                        / F.lit(1000003.0),
                    )
                ).cast("int"),
                F.lit(v - 1),
            )
            + 1,
        ),
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.pmod(F.xxhash64("cid", "turn_idx", F.lit(seed + 3)), F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        F.array_join(words, " ").alias("text"),
        F.lit("").alias("tool"),
        (
            F.lit("2025-06-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("cid") * 60 + F.col("turn_idx") * 30).cast("double"))
        ).alias("ts"),
    )


def write_transcripts_parquet(path: str, n_convs: int = 200, seed: int = 42) -> int:
    """Write the fixture transcripts as one parquet file; returns n rows.
    Uses pyarrow directly (no Spark) so tests/oracles can share it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = gen_transcripts(n_convs=n_convs, seed=seed)
    table = pa.table({
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": pa.array([r["role"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "tool": pa.array([r["tool"] for r in rows], pa.string()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us", tz="UTC")),
    })
    pq.write_table(table, path)
    return len(rows)
