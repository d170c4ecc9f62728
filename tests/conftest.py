"""Shared fixtures: one SparkSession + one DuckDB connection per test
session, and the oracle-compare helper mirroring the driver's check
(row-count + schema + order-insensitive value-hash)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    from aprsdb_spark.session import get_spark

    s = get_spark("aprsdb_spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize one cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0 / +0.0
        # EXACT comparison otherwise: the driver's value-hash may use full
        # precision, so the local mirror must be at least as strict —
        # queries are designed to be bit-identical across engines
        # (identical IEEE ops, or portable floor-rounding of aggregates)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonical_rows(cols, rows):
    """Sort columns by name, canonicalize cells, sort rows — the driver's
    order-insensitive value-hash, reproduced as comparable tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def compare_query(spark, duck, qfn, sql, sf_dir=SF_DIR):
    """Run the Spark callable and the DuckDB oracle; assert equality."""
    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_rel = duck.execute(sql)
    d_cols = [c[0] for c in d_rel.description]
    d_rows = d_rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, s_canon = canonical_rows(s_cols, s_rows)
    _, d_canon = canonical_rows(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
    # row count back to the caller so test_oracle can reject vacuous
    # empty-vs-empty passes (SCALE.md §4u)
    return len(s_rows)
