"""Replicates the driver's correctness gate: run every __spark_entry__
queries() entry at sf0.01 and compare against its oracle_sql() via DuckDB
(row count + schema names + order-insensitive values)."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 5)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def pairs():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    return [(name, fn, os_.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", pairs(), ids=[p[0] for p in pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    if sql is None:
        # weaker rows-only check, like the driver
        assert len(spark_rows) >= 0
        return
    con = _duck()
    res = con.sql(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    cols = sorted(spark_cols)
    got = _norm([r.asDict() for r in spark_rows], cols)

    def duck_norm():
        out = []
        for r in duck_rows:
            vals = []
            for c in cols:
                v = r[duck_cols.index(c)]
                if isinstance(v, float):
                    v = round(v, 5)
                    if v == -0.0:
                        v = 0.0
                vals.append(v)
            out.append(tuple(vals))
        out.sort(key=lambda t: tuple(str(x) for x in t))
        return out

    exp = duck_norm()
    assert got == exp, f"{name}: value mismatch; first diff: " + str(
        next(((a, b) for a, b in zip(got, exp) if a != b), None)
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["query_id", "doc_id", "rank", "score"]
