"""§2.C (SQL entry point, EP2) — the decorrelation-heavy TPC-H shapes.

Q3/Q5/Q10/Q18 live in queries/joins.py; this module adds the shapes
whose interest is what Catalyst's subquery machinery does to them:

  * Q4  — correlated EXISTS with a NON-EQUI outer reference
          (l_shipdate > o_orderdate + interval): decorrelates to a
          left-semi join on the equi key with the range predicate as a
          post-join filter.
  * Q13 — double aggregation over a pushed-down outer-join condition
          (the COUNT-of-COUNTs distribution).
  * Q14 — conditional-aggregate ratio (promo revenue share).
  * Q15 — scalar subquery over a CTE reused twice (revenue view + its
          MAX): AQE dedups the exchange via exchange reuse.
  * Q17 — correlated scalar AVG threshold (the classic per-part
          anti-correlation): decorrelates to an aggregate + equi join.
  * Q19 — disjunctive mixed join/filter predicates: the common
          p_partkey equi key is extracted so the OR-arms run as a
          post-join filter, never a nested loop.
  * Q21 — EXISTS + NOT EXISTS against the same fact with an outer
          reference two tables away (o_orderdate inside the l3
          subquery): both decorrelate onto the l_orderkey equi key.
  * Q22 — anti join + uncorrelated scalar aggregate threshold.

Schema adaptations (documented per query): the test tables carry no
l_commitdate / l_receiptdate / l_shipmode / c_phone and no partsupp, so
"late" is l_shipdate > o_orderdate + K days, Q22's "no orders" becomes
"no URGENT order" (every customer here has orders), and Q14's promo
test is equality on the single-word p_type domain.

Float parity with the DuckDB oracle follows the house money rule
(joins.py c_join_smj): money sums run in DECIMAL(12,2) so parallel
summation order is irrelevant, doubles appear only after the final CAST;
Q17's correlated AVG is exact because l_quantity is integral (integer
sums are exactly representable in double at any aggregation order) and
Q22's threshold comparison is multiplied through (bal * n > sum, all
DECIMAL/BIGINT) so no engine ever divides.

100 TB notes: every shape here is one fact-table shuffle on its equi
key after decorrelation — the EXISTS/NOT-EXISTS pairs share the
l_orderkey exchange, Q13's outer join shuffles on custkey then
aggregates the tiny (c_count, n) domain, and the dim sides (part,
supplier, nation) broadcast. Nothing in this file introduces a nested
loop or a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load

_REV = (
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - l_discount AS DECIMAL(12,2)))"
)
_MONEY = "FLOOR(CAST({expr} AS DOUBLE) * 100 + 0.5) / 100"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    t = load(spark, sf_dir)
    for n in names:
        getattr(t, n).createOrReplaceTempView(f"v_{n}")


_Q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM {p}orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM {p}lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("c_sql_q4", oracle=_Q4.format(p=""))
def c_sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS whose
    inner predicate references the outer row non-equi (shipped >45 days
    after the order date — the no-commitdate adaptation of "late").
    Catalyst decorrelates to a left-semi join on l_orderkey with the
    date comparison as a join-side filter, so the lineitem side is
    semi-reduced before the priority rollup; at 100 TB the orders date
    filter prunes partitions first and the semi join shuffles only
    qualifying keys."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4.format(p="v_"))


_Q13 = """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM {p}customer LEFT JOIN {p}orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query("c_sql_q13", oracle=_Q13.format(p=""))
def c_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with the filter INSIDE the join condition (a pushed filter
    would drop zero-order customers), then a COUNT-of-COUNTs double
    aggregate. One custkey shuffle; the second aggregate's domain is
    the tiny distinct c_count set, so it collapses map-side."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13.format(p="v_"))


_Q14 = f"""
    SELECT FLOOR(
             100.0
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                  * CAST(1 - l_discount AS DECIMAL(12,2))
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST({_REV} AS DOUBLE)
             * 10000 + 0.5) / 10000 AS promo_share
    FROM {{p}}lineitem JOIN {{p}}part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


@query("c_sql_q14", oracle=_Q14.format(p=""))
def c_sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional-aggregate
    ratio over one month of shipments. Both sums run in DECIMAL so the
    ratio's operands are exact; the single division happens once, on
    identical doubles, in both engines. part broadcasts; the month
    filter is the pushed scan predicate (at 100 TB: the shipdate
    partition key prunes ~1/60 of the fact)."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14.format(p="v_"))


_Q15 = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
      FROM {{p}}lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           {_MONEY.format(expr="total_revenue")} AS total_rev
    FROM {{p}}supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""


@query("c_sql_q15", oracle=_Q15.format(p=""))
def c_sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a revenue CTE consumed twice —
    once joined to supplier, once under MAX — with equality on the
    EXACT decimal total (ties surface identically in both engines).
    AQE's exchange reuse evaluates the rollup once; the MAX side
    reduces to a 1-row broadcast."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15.format(p="v_"))


_Q17 = """
    SELECT FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0 * 100 + 0.5) / 100 AS avg_yearly
    FROM {p}lineitem l JOIN {p}part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 15
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM {p}lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
"""


@query("c_sql_q17", oracle=_Q17.format(p=""))
def c_sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): the correlated scalar
    AVG threshold per part. Catalyst decorrelates to a per-partkey
    aggregate joined back on the equi key — one lineitem shuffle on
    l_partkey feeding both the probe and the threshold. Exactness: the
    test data's l_quantity is integral, so SUM/AVG are
    order-independent in double and 0.2*avg is the same bit pattern in
    both engines; the strict < never sits on an engine-dependent
    boundary. (p_size <= 15 stands in for the container predicate —
    this schema has no p_container.)"""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17.format(p="v_"))


_Q19 = f"""
    SELECT {_MONEY.format(expr=_REV)} AS revenue
    FROM {{p}}lineitem JOIN {{p}}part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 35
           AND l_quantity BETWEEN 20 AND 30)
"""


@query("c_sql_q19", oracle=_Q19.format(p=""))
def c_sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR-arms that each mix part and lineitem columns. The planner
    extracts the common p_partkey equi conjunct, so this is a broadcast
    hash join with the disjunction as a post-join filter — NOT a
    nested-loop — and the per-arm p_brand/p_size conjuncts still push
    into the part scan as an OR-of-ANDs filter. (Brands 12/17/23 from
    this data's Brand#1..25 domain; no l_shipmode/l_shipinstruct here.)"""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19.format(p="v_"))


_Q21 = """
    SELECT s_name, COUNT(*) AS numwait
    FROM {p}supplier s
    JOIN {p}lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN {p}orders o ON o.o_orderkey = l1.l_orderkey
    JOIN {p}nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM {p}lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM {p}lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      AND n.n_name IN ('NATION_3', 'NATION_7')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@query("c_sql_q21", oracle=_Q21.format(p=""))
def c_sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS / NOT-EXISTS pair against the same fact, where the NOT
    EXISTS arm's predicate references a column from a DIFFERENT outer
    table than its equi key (o_orderdate vs l1.l_orderkey). Both arms
    decorrelate onto the l_orderkey equi key — a semi then an anti
    join sharing the fact's exchange; supplier and nation broadcast.
    "Kept waiting" is the shipdate adaptation: this supplier shipped
    >60 days after the order date and every other supplier on the
    order shipped on time."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21.format(p="v_"))


_Q22 = """
    SELECT n_name AS nation, COUNT(*) AS numcust,
           FLOOR(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS totacctbal
    FROM {p}customer JOIN {p}nation ON c_nationkey = n_nationkey
    WHERE CAST(c_acctbal AS DECIMAL(12,2))
          * (SELECT COUNT(*) FROM {p}customer WHERE c_acctbal > 0.0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2)))
             FROM {p}customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM {p}orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    ORDER BY n_name
"""


@query("c_sql_q22", oracle=_Q22.format(p=""))
def c_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (high-balance inactive customers): uncorrelated
    scalar-aggregate threshold + anti join. The avg-balance comparison
    is multiplied through (bal * n > sum) so both sides stay in exact
    DECIMAL/BIGINT arithmetic — no engine ever divides, so no float
    boundary exists. Adaptation: every customer in this data has
    orders, so the anti join excludes customers with any URGENT order
    (same anti shape, non-degenerate result); nation stands in for the
    missing c_phone country code. The two scalar subqueries are 1-row
    broadcasts; the anti join shuffles on custkey."""
    _views(spark, sf_dir, "customer", "nation", "orders")
    return spark.sql(_Q22.format(p="v_"))
