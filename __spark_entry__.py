"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship BM25 top-k over sf0.001 documents
queries()       — named operators from SURVEY.md §2 (+ data-pipeline ops)
oracle_sql()    — DuckDB-equivalent SQL for the order-insensitive
                  value-hash correctness gate
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: disjunctive BM25 top-10 over the reference-style
    query set on sf0.001 documents."""
    from pulse_spark.harness import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pulse_spark import harness

    out: dict[str, Callable] = {}
    out.update(harness.FULLTEXT_QUERIES)
    try:
        from pulse_spark.datapipe import harness as dp_harness

        out.update(dp_harness.DATAPIPE_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from pulse_spark import harness

    out: dict[str, str] = {}
    out.update(harness.FULLTEXT_ORACLES)
    try:
        from pulse_spark.datapipe import harness as dp_harness

        out.update(dp_harness.DATAPIPE_ORACLES)
    except ImportError:
        pass
    return out
