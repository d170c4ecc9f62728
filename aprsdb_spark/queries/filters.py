"""§2.B — projection / filter / predicates.

APRS-IS server-side filters (p/ prefix, b/ budlist) map to LIKE / IN;
compound predicates and null semantics round out the group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import rnd
from ..registry import query
from ..tables import load


@query(
    "b_filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' AND o_totalprice BETWEEN 50000 AND 150000)
       OR o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def b_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/BETWEEN/IN predicate over orders."""
    t = load(spark, sf_dir)
    return t.orders.where(
        (
            (F.col("o_orderstatus") == "O")
            & F.col("o_totalprice").between(50000, 150000)
        )
        | F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "b_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%'
      AND regexp_matches(p_name, '^[a-z]+ ')
      AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
    """,
)
def b_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix / regex / budlist filters — the APRS-IS `p/PFX` and `b/CALLS`
    server filters expressed relationally (LIKE 'PFX%', IN list)."""
    t = load(spark, sf_dir)
    return t.part.where(
        F.col("p_type").like("PROMO%")
        & F.col("p_name").rlike("^[a-z]+ ")
        & F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "b_filter_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_np,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULLIF(o_orderpriority, o_orderpriority)) AS both_null
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NULL
    """,
)
def b_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF/COALESCE/IS NULL and null-safe equality <=>.

    The driver data has no physical nulls, so nulls are manufactured with
    NULLIF — semantics, not data, are under test.
    """
    t = load(spark, sf_dir)
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        t.orders.where(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull())
        .select(
            "o_orderkey",
            status_np.alias("status_np"),
            F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
            status_np.eqNullSafe(
                F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority"))
            ).alias("both_null"),
        )
    )


@query(
    "b_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS net_price,
           FLOOR((l_extendedprice * l_discount) * 100 + 0.5) / 100 AS discount_amt
    FROM lineitem
    """,
)
def b_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: TPC-H-style net pricing arithmetic."""
    t = load(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        rnd(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("net_price"),
        rnd(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("discount_amt"),
    )
