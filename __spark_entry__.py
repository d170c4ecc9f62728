"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``aprsdb_spark`` package; this module is
a thin adapter over its registry (aprsdb_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: last event per user
    ("last position per station"), enriched through the customer→nation
    star with broadcast dims. Scan → broadcast join → window → filter."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aprsdb_spark.functions import rnd
    from aprsdb_spark.tables import load

    t = load(spark, "/root/testdata/sf0.001")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_ms").desc(), F.col("event_id").desc())
    last_ev = (
        t.events.select(
            "user_id", "event_id", "event_type", "value", "ts_ms"
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        last_ev.join(t.customer, last_ev.user_id == t.customer.c_custkey, "inner")
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            rnd("value", 2).alias("value"),
            "ts_ms",
            "c_name",
            "n_name",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's scored window (first 50 entries) covers the qids that
    have not yet received a CORRECTNESS row (registry.DRIVER_ORDER)."""
    from aprsdb_spark.registry import QUERIES, driver_ordered, load_all

    load_all()
    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every hash-checkable qid."""
    from aprsdb_spark.registry import ORACLE, driver_ordered, load_all

    load_all()
    return driver_ordered(ORACLE)
