"""§2.G — set operations: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].

Spark lowers distinct-set ops to aggregates/joins under the hood; ALL
variants preserve multiset multiplicity (hash-checked as multisets by
the driver's order-insensitive compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def _hi_value_users(t) -> DataFrame:
    return t.events.where(F.col("value") > 400).select("user_id")


def _typed_users(t, kind: str) -> DataFrame:
    return t.events.where(F.col("event_type") == kind).select("user_id")


@query(
    "g_union",
    oracle="""
    SELECT user_id FROM events WHERE value > 400
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def g_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two user slices."""
    t = load(spark, sf_dir)
    return _hi_value_users(t).union(_typed_users(t, "purchase")).distinct()


@query(
    "g_union_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE value > 400
    UNION ALL
    SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
    """,
)
def g_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — multiplicity preserved (rows in both slices doubled)."""
    t = load(spark, sf_dir)
    a = t.events.where(F.col("value") > 400).select("user_id", "event_type")
    b = t.events.where(F.col("event_type") == "purchase").select("user_id", "event_type")
    return a.unionByName(b)


@query(
    "g_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def g_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users who both clicked and purchased."""
    t = load(spark, sf_dir)
    return _typed_users(t, "click").intersect(_typed_users(t, "purchase"))


@query(
    "g_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def g_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — min multiplicity per engine-agnostic multiset."""
    t = load(spark, sf_dir)
    return _typed_users(t, "click").intersectAll(_typed_users(t, "error"))


@query(
    "g_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def g_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): viewers who never purchased."""
    t = load(spark, sf_dir)
    return _typed_users(t, "view").subtract(_typed_users(t, "purchase"))


@query(
    "g_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def g_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference."""
    t = load(spark, sf_dir)
    return _typed_users(t, "view").exceptAll(_typed_users(t, "purchase"))


@query(
    "g_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the schema-evolution
    union — two generations of a feed with different column subsets
    stacked by NAME (position-based union would silently misalign),
    missing columns surfacing as typed NULLs. The batch twin of what
    streaming/ingest.py's upsert does across micro-batch schemas and
    the set-op counterpart of a_scan_evolve's mergeSchema read. Narrow
    op: no shuffle, both inputs scan-partitioned."""
    t = load(spark, sf_dir)
    v1 = t.orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice"
    )
    v2 = t.orders.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderpriority"
    )
    return v1.unionByName(v2, allowMissingColumns=True)
