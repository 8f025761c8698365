"""Driver-contract emulation: every queries() entry vs its DuckDB
oracle at sf0.001 — row count, schema-ish (column names), and
order-insensitive value equality (the CORRECTNESS_r{N}.json gate)."""

from __future__ import annotations

import math

import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return 0.0 if v == 0.0 else round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLED = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_oracled_query_matches(spark, ddb, name):
    qfn = E.queries()[name]
    sdf = qfn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    ores = ddb.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    got = _rowset(scols, [[r[c] for c in scols] for r in srows])
    expect = _rowset(ocols, orows)
    for g, e in zip(got, expect):
        assert g == e, f"{name}: first diff row\n  spark={g}\n  duck ={e}"


def test_every_query_has_an_oracle():
    """Full oracle coverage: no rows-only (weak-check) queries remain —
    every queries() entry gets the driver's value-hash comparison."""
    assert set(E.oracle_sql()) == set(E.queries())


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "snippet" in df.columns
