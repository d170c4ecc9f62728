"""qid registry wiring SURVEY.md §2 rows to the driver contract.

Every operator registers here via the ``@query`` decorator; the driver's
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over these
dicts. A qid with ``oracle=None`` gets the driver's weaker rows-only check
(SURVEY.md §2 '◦' rows).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate qid {qid!r}")

        # Every registered query must work on the DRIVER's session — a
        # vanilla SparkSession built outside this package, possibly with
        # cwd != repo. tune() pins the correctness confs (UTC, ns-as-long)
        # and ships the package zip to executor python workers, so
        # fixture-backed qids that never call tables.load() (aprs_*,
        # literal-frame parses, pandas-UDF paths) get the same guarantees
        # as table-backed ones. Idempotent and ~free after the first call.
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .session import tune

            tune(spark)
            return fn(spark, sf_dir)

        QUERIES[qid] = wrapped
        if oracle is not None:
            ORACLE[qid] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so decorators run (idempotent)."""
    from .queries import ALL_MODULES  # noqa: F401
