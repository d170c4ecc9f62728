"""qid registry wiring SURVEY.md §2 rows to the driver contract.

Every operator registers here via the ``@query`` decorator; the driver's
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over these
dicts. A qid with ``oracle=None`` gets the driver's weaker rows-only check
(SURVEY.md §2 '◦' rows).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate qid {qid!r}")
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLE[qid] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so decorators run (idempotent)."""
    from .queries import ALL_MODULES  # noqa: F401
