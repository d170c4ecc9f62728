"""§2.F — sort / limit / top-k.

Determinism rule: every LIMIT rides on a total order ending in a unique
key, otherwise boundary ties make the selected set engine-dependent.

100 TB: orderBy().limit(k) compiles to TakeOrderedAndProject — per-
partition top-k heaps + a k-row merge on the driver; no global sort.
Top-k per group = window row_number, one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "f_sort_multi",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_np, o_totalprice
    FROM orders
    ORDER BY NULLIF(o_orderstatus, 'P') DESC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def f_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS LAST (nulls manufactured via NULLIF) and
    a unique tiebreak; LIMIT makes the sort observable under the driver's
    order-insensitive hash."""
    t = load(spark, sf_dir)
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        t.orders.select("o_orderkey", status_np.alias("status_np"), "o_totalprice")
        .orderBy(
            F.col("status_np").desc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "f_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders — TakeOrderedAndProject, not a full sort."""
    t = load(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "f_topk_group",
    oracle="""
    WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders)
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM r WHERE rk <= 3
    """,
)
def f_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranked window."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t.orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= 3)
    )


@query(
    "f_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def f_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET pagination (ANSI OFFSET landed in Spark 3.4/4.0's
    SQL surface and as DataFrame.offset) — rows 101-150 of the
    total-priced order ranking. Determinism: the order ends in the
    unique o_orderkey, so the page boundary cannot straddle a tie.

    100 TB: offset+limit compiles to a single TakeOrderedAndProject of
    (offset + limit) rows — per-partition heaps of 150 rows merged on
    the driver, NO global sort; deep pagination (offset in the
    millions) would degrade into that many driver rows, which is why
    production pagination keys on (last_price, last_key) predicates
    instead — this qid pins the shallow-page primitive."""
    t = load(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(100)
        .limit(50)
    )
