"""Mimics the driver's correctness gate: every queries() entry vs its
oracle_sql() on DuckDB over /root/testdata/sf0.01 (row count + values)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(rows, cols):
    """Sort columns by name and rows by value (driver-style compare)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_vs_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    ores = duck.execute(entry_mod.oracle_sql()[name])
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} vs {len(orows)}"
    sn, _ = _normalize(srows, scols)
    on, _ = _normalize(orows, ocols)
    for a, b in zip(sn, on):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                assert math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-8), \
                    f"{name}: {a} vs {b}"
            else:
                assert x == y, f"{name}: {a} vs {b}"


def test_rows_only_queries(spark):
    """queries() entries without an oracle still must run and be stable."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score", "conv_id", "role", "text"}
