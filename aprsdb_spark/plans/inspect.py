"""Plan-inspection helpers: the engine's substitute for reading a
custom planner's source (SURVEY.md §3) — assertions about Catalyst's
output become part of the spec (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text (verbose operator list + codegen ids)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE if executed) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.strip() for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    ]


def partition_filters(df: DataFrame) -> list[str]:
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PartitionFilters" in line
    ]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan — the scale currency."""
    return formatted_plan(df).count("Exchange")
