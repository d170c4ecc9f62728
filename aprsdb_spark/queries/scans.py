"""§2.A — scans. Pushdown and pruning are Catalyst's job; these queries
exist to *verify* (via .explain: PushedFilters / ReadSchema) that the
declarative form reaches the parquet reader, and to anchor the bench.

100 TB note: at scale these scans hit a date/src-partitioned layout;
predicate + partition pruning means a 1-day query reads ~1/365th of the
data. Nothing in the query text changes — that is the point of staying
declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "a_scan_parquet",
    oracle="SELECT * FROM lineitem",
)
def a_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of lineitem (SURVEY.md §2.A)."""
    return load(spark, sf_dir).lineitem


@query(
    "a_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_extendedprice, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def a_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan: 3 of 11 columns, date filter.

    .explain('formatted') must show PushedFilters: [GreaterThanOrEqual(
    l_shipdate,...)] and ReadSchema with only the 3 columns.
    """
    t = load(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_extendedprice",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )
