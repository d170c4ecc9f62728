"""Self-run mirror of the driver's t2 gate: every qid with an oracle is
run on Spark AND DuckDB at sf0.01 and compared on count+schema+values.
Rows-only qids are smoke-run (must execute, return a stable schema)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query


def _registry():
    import __spark_entry__ as entry_mod

    return entry_mod.queries(), entry_mod.oracle_sql()


QUERIES, ORACLE = _registry()


@pytest.mark.parametrize("qid", sorted(ORACLE))
def test_oracle_match(spark, duck, qid):
    compare_query(spark, duck, QUERIES[qid], ORACLE[qid])


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, qid):
    df = QUERIES[qid](spark, SF_DIR)
    assert df.columns, f"{qid}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns
