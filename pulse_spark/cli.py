"""spark-submit entry point.

Cluster usage (north rule: spark-submit --py-files on multi-executor
clusters):

    zip -r pulse_spark.zip pulse_spark
    spark-submit --py-files pulse_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        -m pulse_spark.cli build --input <table-or-path> --output <index-dir>

Local usage:
    python -m pulse_spark.cli build  --input t.parquet --output /tmp/idx
    python -m pulse_spark.cli search --index /tmp/idx --query "error trace" -k 10
    python -m pulse_spark.cli search --index /tmp/idx --queries q.tsv --metric TFIDF

The reference CLI equivalents: `pulse spimi` (cmd/spimi.go) and
`pulse search` (cmd/search.go); flags mirror its
--no-stemming/--no-stopwords/--no-compression/--k/--metric/--conjunctive.
"""

from __future__ import annotations

import argparse
import json
import sys

from pulse_spark.config import IndexingSettings


def _spark(args):
    from pulse_spark.session import get_spark

    return get_spark(app_name="pulse_spark_cli", master=args.master)


def cmd_build(args) -> int:
    spark = _spark(args)
    settings = IndexingSettings(
        stopwords_removal=not args.no_stopwords,
        stemming=not args.no_stemming,
        compression=not args.no_compression,
        term_buckets=args.term_buckets,
    )
    from pulse_spark.index.persist import build_persisted_index

    src = spark.read.format(args.format).load(args.input)
    idx = build_persisted_index(
        spark, src, args.output, settings, build_segments=args.segments
    )
    print(json.dumps({"n_docs": idx.n_docs, "adl": idx.adl, "out": args.output}))
    return 0


def cmd_search(args) -> int:
    spark = _spark(args)
    from pulse_spark.index.persist import load_index
    from pulse_spark.query.search import search_topk

    idx = load_index(spark, args.index)
    if args.interactive:
        # reference: query.InteractiveQueries stdin REPL (query.go:56-80)
        print("pulse_spark> enter queries (ctrl-d to exit)", file=sys.stderr)
        qid = 0
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            qdf = spark.createDataFrame([(qid, line)], "query_id long, text string")
            res = search_topk(idx, qdf, k=args.k, metric=args.metric,
                              conjunctive=args.conjunctive).collect()
            for r in sorted(res, key=lambda r: r["rank"]):
                print(f"{qid}\tQ0\t{r['doc_no']}\t{r['rank']}\t{r['score']:.6f}\tpulse_spark")
            qid += 1
        return 0
    if args.query:
        rows = [(0, args.query)]
    else:
        rows = [
            (int(a), b)
            for a, b in (
                ln.split("\t", 1) for ln in open(args.queries) if ln.strip()
            )
        ]
    qdf = spark.createDataFrame(rows, "query_id long, text string")
    res = search_topk(
        idx, qdf, k=args.k, metric=args.metric, conjunctive=args.conjunctive
    ).collect()
    # TREC-style output (cmd/search.go:92-101)
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        print(f"{r['query_id']}\tQ0\t{r['doc_no']}\t{r['rank']}\t{r['score']:.6f}\tpulse_spark")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pulse_spark")
    p.add_argument("--master", default=None, help="spark master (default: env/local)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--format", default="parquet")
    b.add_argument("--output", required=True)
    b.add_argument("--no-stemming", action="store_true")
    b.add_argument("--no-stopwords", action="store_true")
    b.add_argument("--no-compression", action="store_true")
    b.add_argument("--segments", action="store_true",
                   help="also build compressed block segments")
    b.add_argument("--term-buckets", type=int, default=32)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="top-k search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", default=None)
    s.add_argument("--queries", default=None, help="TSV: query_id\\ttext")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--metric", default="BM25", choices=["BM25", "TFIDF", "bm25", "tfidf"])
    s.add_argument("--conjunctive", action="store_true")
    s.add_argument("--interactive", action="store_true",
                   help="stdin REPL (reference query.go:56-80)")
    s.set_defaults(fn=cmd_search)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
