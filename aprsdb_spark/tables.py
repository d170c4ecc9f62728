"""Loaders for the driver's parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file (or directory) each under an
``sf_dir``. Schema comes from parquet footers; production ingest paths
declare explicit StructTypes instead (aprs/schema.py).
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is LONG nanoseconds (see session._RUNTIME_CONFS): derive the
        # canonical epoch-ms column every time-based operator keys on.
        # Integer div — double math would lose precision above 2^53 ns.
        from pyspark.sql import functions as F

        df = df.withColumn("ts_ms", F.expr("ts div 1000000"))
    return df


def load(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Load all ten tables lazily (parquet scan plans, no IO until action).

    Also pins runtime confs (UTC, AQE) on the session — the driver hands us
    sessions we didn't build.
    """
    tune(spark)
    return SimpleNamespace(**{n: table(spark, sf_dir, n) for n in TABLE_NAMES})
