"""CLI surface: build + search drive the same engine end-to-end with
TREC-formatted output (cmd/search.go:92-101 parity)."""

from __future__ import annotations

import json


def test_cli_build_and_search(spark, transcripts_path, tmp_path, capsys):
    from pulse_spark.cli import main

    out = str(tmp_path / "idx")
    rc = main([
        "build", "--input", transcripts_path, "--output", out,
        "--term-buckets", "4",
    ])
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] > 0

    rc = main(["search", "--index", out, "--query", "error function", "-k", "5"])
    assert rc == 0
    all_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    # reference prints "#\t<qid>\t<elapsed>\t<µs>" after each query's
    # results (cmd/search.go:98-101) — present, and skipped by TREC parsers
    timing = [ln for ln in all_lines if ln.startswith("#")]
    assert timing and len(timing[0].split("\t")) == 4
    lines = [ln for ln in all_lines if not ln.startswith("#")]
    for ln in lines:
        qid, q0, doc_no, rank, score, tag = ln.split("\t")
        assert q0 == "Q0" and tag == "pulse_spark"
        assert ":" in doc_no
        float(score)

    # conjunctive + TFIDF paths exercise flag plumbing
    rc = main(["search", "--index", out, "--query", "error", "--metric", "tfidf",
               "--conjunctive", "-k", "3"])
    assert rc == 0
