"""§2.C — joins: equi (broadcast / shuffle), outer, semi/anti, theta,
interval, as-of, self, cross.

100 TB notes per shape:
- dims (region/nation/supplier) are broadcast — no shuffle of the fact;
- fact-fact joins shuffle on the key: co-partition/bucket both sides by
  the join key at write time to elide the shuffle entirely;
- theta/band joins get an equi pre-key (user, band bucket) so the range
  predicate only runs within buckets, never as a global nested loop;
- as-of joins use the union+window lowering (operators/asof.py): one
  shuffle, no range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..functions import rnd
from ..registry import query
from ..tables import load


@query(
    "c_join_inner",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def c_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer; AQE picks broadcast vs shuffle."""
    t = load(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
    )


@query(
    "c_join_bcast",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_cust, FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def c_join_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join with explicit broadcast of the two tiny dims:
    the fact table never shuffles for the join (map-side hash joins)."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            rnd(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@query(
    "c_join_smj",
    oracle="""
    SELECT o_orderpriority,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def c_join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join (lineitem⋈orders) — hinted sort-merge, the shape
    that survives when neither side fits in memory. At 100 TB: bucket both
    tables by orderkey at write time and this becomes a zero-shuffle join."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.hint("merge")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            # Money sums run in DECIMAL so the aggregate is EXACT (float
            # summation is order-dependent: at sf0.001 a Q10 revenue
            # landed on an exact .005 boundary and the two engines'
            # 1-ulp-apart sums rounded to different cents); the cast to
            # DOUBLE happens only on the final rounded output.
            F.expr(
                "FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)"
                " * 100 + 0.5) / 100"
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "c_join_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           FLOOR((COALESCE(SUM(o_totalprice), 0)) * 100 + 0.5) / 100 AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def c_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers with zero orders survive with count 0."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            rnd(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "c_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def c_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS — left-semi join: customers with >=1 urgent order, no
    duplication of the left side."""
    t = load(spark, sf_dir)
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "c_join_anti",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    """,
)
def c_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — left-anti join: parts never shipped."""
    t = load(spark, sf_dir)
    return t.part.join(
        t.lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_anti"
    ).select("p_partkey", "p_name")


@query(
    "c_join_theta",
    oracle="""
    SELECT s1.s_nationkey AS nationkey, COUNT(*) AS n_pairs,
           FLOOR((SUM(s2.s_acctbal - s1.s_acctbal)) * 100 + 0.5) / 100 AS sum_gap
    FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal < s2.s_acctbal
    GROUP BY s1.s_nationkey
    """,
)
def c_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join — broadcast nested loop. Kept on the
    small dimension on purpose: at scale a pure theta join is a design
    smell; band-bucket it (see c_join_interval) before it reaches 100 TB."""
    t = load(spark, sf_dir)
    s1 = t.supplier.alias("s1")
    s2 = t.supplier.alias("s2")
    return (
        s1.join(s2, F.col("s1.s_acctbal") < F.col("s2.s_acctbal"))
        .groupBy(F.col("s1.s_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_pairs"),
            rnd(F.sum(F.col("s2.s_acctbal") - F.col("s1.s_acctbal")), 2).alias("sum_gap"),
        )
    )


@query(
    "c_join_interval",
    oracle="""
    WITH s AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
               WHERE event_type = 'signup'),
         p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events
               WHERE event_type = 'purchase')
    SELECT s.user_id, s.event_id AS signup_event, p.event_id AS purchase_event,
           p.ts_ms - s.ts_ms AS delay_ms, FLOOR((p.value) * 100 + 0.5) / 100 AS purchase_value
    FROM s JOIN p
      ON s.user_id = p.user_id
     AND p.ts_ms BETWEEN s.ts_ms AND s.ts_ms + 3600000
    """,
)
def c_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval join: purchases within 1h after a signup, same user.

    The equi key (user_id) carries the shuffle; the range predicate
    evaluates only within each key's hash bucket — the scalable form of a
    temporal join. All time math in epoch-ms (ns parquet truncates
    differently across engines — FIXTURES.md §A)."""
    t = load(spark, sf_dir)
    ms = F.col("ts_ms")
    s = t.events.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event"), ms.alias("s_ms")
    )
    p = t.events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event"),
        ms.alias("p_ms"),
        "value",
    )
    return (
        s.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & F.col("p_ms").between(F.col("s_ms"), F.col("s_ms") + 3600000),
        )
        .select(
            "user_id",
            "signup_event",
            "purchase_event",
            (F.col("p_ms") - F.col("s_ms")).alias("delay_ms"),
            rnd("value", 2).alias("purchase_value"),
        )
    )


@query(
    "c_join_asof",
    oracle="""
    WITH v AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
               WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
               WHERE event_type = 'purchase'),
         pairs AS (
           SELECT p.event_id AS purchase_event, p.user_id, p.ts_ms AS purchase_ms,
                  v.event_id AS asof_view_event, v.ts_ms AS asof_view_ms,
                  ROW_NUMBER() OVER (PARTITION BY p.event_id
                                     ORDER BY v.ts_ms DESC, v.event_id DESC) AS rn
           FROM p JOIN v ON p.user_id = v.user_id AND v.ts_ms <= p.ts_ms)
    SELECT purchase_event, user_id, purchase_ms, asof_view_event, asof_view_ms
    FROM pairs WHERE rn = 1
    """,
)
def c_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view at-or-before it by
    the same user ("position of station X at time T" in APRS terms).

    Uses the union+window lowering (operators/asof.py) — one shuffle on
    user_id, no range-join explosion. The DuckDB oracle is the quadratic
    row_number form; results must agree exactly, including same-ms ties
    (largest event_id wins on both sides)."""
    t = load(spark, sf_dir)
    ms = F.col("ts_ms")
    v = t.events.where(F.col("event_type") == "view").select(
        "user_id", "event_id", ms.alias("ts_ms")
    )
    p = t.events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", ms.alias("ts_ms")
    )
    joined = asof_join(
        p, v, on="user_id", t="ts_ms", tiebreak="event_id", right_cols=["event_id", "ts_ms"]
    )
    return joined.select(
        F.col("event_id").alias("purchase_event"),
        "user_id",
        F.col("ts_ms").alias("purchase_ms"),
        F.col("asof_event_id").alias("asof_view_event"),
        F.col("asof_ts_ms").alias("asof_view_ms"),
    )


@query(
    "c_join_self",
    oracle="""
    SELECT l1.l_returnflag AS rf1, l2.l_returnflag AS rf2, COUNT(*) AS n_pairs
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    GROUP BY l1.l_returnflag, l2.l_returnflag
    """,
)
def c_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: line pairs within an order (message↔ack correlation is
    the APRS analog — same shape, key (from,to,msgNo))."""
    t = load(spark, sf_dir)
    l1 = t.lineitem.alias("l1")
    l2 = t.lineitem.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .groupBy(
            F.col("l1.l_returnflag").alias("rf1"),
            F.col("l2.l_returnflag").alias("rf2"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "c_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def c_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two tiny dims (5 x 25)."""
    t = load(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


@query(
    "c_sql_q3",
    oracle="""
    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS od,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def c_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the SQL entry point (EP2, SURVEY.md §3):
    same ANTLR-parse → Catalyst pipeline as the DataFrame API, proving
    both front-ends drive one engine. Views re-registered per call —
    temp-view registration is catalog metadata, not data movement."""
    t = load(spark, sf_dir)
    t.customer.createOrReplaceTempView("v_customer")
    t.orders.createOrReplaceTempView("v_orders")
    t.lineitem.createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS od,
               FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """)


@query(
    "c_sql_q10",
    oracle="""
    SELECT c_custkey, c_name,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
           FLOOR(c_acctbal * 100 + 0.5) / 100 AS acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def c_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue in a quarter, through the SQL entry point. Planning
    properties: the returnflag filter reaches the lineitem scan and the
    date range the orders scan BEFORE the fact-fact join; nation
    broadcasts; the final ORDER BY ... LIMIT 20 compiles to
    TakeOrderedAndProject (per-partition heaps), never a global sort of
    the aggregate."""
    t = load(spark, sf_dir)
    for name in ("customer", "orders", "lineitem", "nation"):
        getattr(t, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql("""
        SELECT c_custkey, c_name,
               FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
               FLOOR(c_acctbal * 100 + 0.5) / 100 AS acctbal,
               n_name
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """)


@query(
    "c_sql_q5",
    oracle="""
    SELECT n_name,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def c_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): the six-way star+fact-fact
    join, through the SQL entry point. The interesting planning property
    is mixed strategies in ONE query: region/nation/supplier broadcast
    (Catalyst pushes r_name through the dim chain before sizing them),
    while customer⋈orders⋈lineitem shuffle on their keys with the date
    range pushed into the orders scan. The c_nationkey = s_nationkey
    residual makes the supplier join a composite-key equi-join, not a
    filter-after — at 100 TB that is the difference between joining on
    suppkey then filtering ~96% of rows away and never materializing
    them."""
    t = load(spark, sf_dir)
    for name in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        getattr(t, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql("""
        SELECT n_name,
               FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN v_nation ON s_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """)


@query(
    "c_sql_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    SELECT c_name, c_custkey, o.o_orderkey,
           CAST(o_orderdate AS DATE) AS od, o_totalprice,
           FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON big.l_orderkey = o.o_orderkey
    GROUP BY c_name, c_custkey, o.o_orderkey, CAST(o_orderdate AS DATE),
             o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def c_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers) through the SQL entry
    point: the HAVING-driven semi-reduction — orders whose total
    quantity exceeds the threshold — feeding a three-way join and a
    top-100. The classic test of aggregate-then-join ordering: the
    `big` rollup reduces lineitem to qualifying order keys FIRST, so
    the expensive join fans out only over ~1% of orders; quantity sums
    run in DECIMAL (the c_join_smj money rule, same parallel-sum
    argument for quantities on an exact half-way boundary); the final
    ORDER BY + LIMIT is per-partition heaps."""
    t = load(spark, sf_dir)
    t.customer.createOrReplaceTempView("v_customer")
    t.orders.createOrReplaceTempView("v_orders")
    t.lineitem.createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        WITH big AS (
          SELECT l_orderkey FROM v_lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        SELECT c_name, c_custkey, o.o_orderkey,
               CAST(o_orderdate AS DATE) AS od, o_totalprice,
               FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS total_qty
        FROM v_customer c
        JOIN v_orders o ON c.c_custkey = o.o_custkey
        JOIN v_lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN big ON big.l_orderkey = o.o_orderkey
        GROUP BY c_name, c_custkey, o.o_orderkey, CAST(o_orderdate AS DATE),
                 o_totalprice
        ORDER BY o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """)


@query(
    "c_join_salted",
    oracle="""
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR(SUM(value) * 1000000 + 0.5) / 1000000 AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def c_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe equi join (operators/skew.salted_join): fact rows
    carry a deterministic salt, the dim side is replicated once per
    salt value, and the join key becomes (key, salt) — a viral key's
    rows fan out over 8 tasks instead of serializing onto one. The
    oracle is the PLAIN join: salting is a physical rewrite, the result
    set is identical by construction (the companion of d_agg_salted,
    which applies the same trick to aggregation fan-in). AQE's
    OptimizeSkewedJoin covers skewed sort-merge partitions at runtime;
    the explicit rewrite remains the tool for stream-static joins
    (no AQE mid-stream) and hash-join build-side hot keys."""
    from ..operators.skew import salted_join

    t = load(spark, sf_dir)
    joined = salted_join(
        t.events.select("user_id", "event_type", "value", "event_id"),
        t.customer.select("c_custkey", "c_mktsegment"),
        fact_key="user_id",
        dim_key="c_custkey",
        uniquifier="event_id",
        buckets=8,
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.floor(F.sum("value") * 1000000 + F.lit(0.5)) / 1000000).alias("sum_value"),
    )


_LATERAL_SQL = """
    SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM {p}orders o,
    LATERAL (SELECT l_linenumber, l_extendedprice FROM {p}lineitem li
             WHERE li.l_orderkey = o.o_orderkey
             ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
    WHERE o.o_totalprice > 400000
"""


@query("c_join_lateral", oracle=_LATERAL_SQL.format(p=""))
def c_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-2
    lineitems per qualifying order) — the SQL-standard per-row
    table-valued join, same text on both engines. What makes it
    scale-safe on Spark: Catalyst decorrelates the per-order LIMIT
    into WindowGroupLimit (a rank-<=2 group limit evaluated DURING the
    sort, before any window materialization) feeding ONE hash join on
    o_orderkey — pinned in tests/test_plans.py, because the naive
    execution of a correlated LIMIT is a nested loop re-running the
    subquery per outer row. The totalprice filter pushes to the orders
    scan; tie-break ends in the unique (orderkey, linenumber)."""
    t = load(spark, sf_dir)
    t.orders.createOrReplaceTempView("v_orders")
    t.lineitem.createOrReplaceTempView("v_lineitem")
    return spark.sql(_LATERAL_SQL.format(p="v_"))


# As-of tolerance: a view older than this no longer explains a purchase.
_ASOF_TOL_MS = 3_600_000


@query(
    "c_join_asof_tol",
    oracle=f"""
    WITH v AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
               WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
               WHERE event_type = 'purchase'),
         pairs AS (
           SELECT p.event_id AS purchase_event,
                  v.event_id AS ve, v.ts_ms AS vms,
                  ROW_NUMBER() OVER (PARTITION BY p.event_id
                                     ORDER BY v.ts_ms DESC, v.event_id DESC) AS rn
           FROM p JOIN v ON p.user_id = v.user_id AND v.ts_ms <= p.ts_ms
                        AND v.ts_ms > p.ts_ms - {_ASOF_TOL_MS}),
         m AS (SELECT * FROM pairs WHERE rn = 1)
    SELECT p.event_id AS purchase_event, p.user_id, p.ts_ms AS purchase_ms,
           m.ve AS asof_view_event, m.vms AS asof_view_ms,
           m.ve IS NOT NULL AS matched
    FROM p LEFT JOIN m ON m.purchase_event = p.event_id
    """,
)
def c_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE (pandas merge_asof's `tolerance`,
    QuestDB/kdb's bounded asof): each purchase matches the latest view
    at-or-before it, but only within the trailing hour — staler context
    is no match, and unmatched purchases survive with NULLs (left
    semantics). Composes the generic union+window lowering
    (operators/asof.py, how='left') with a stateless post-filter that
    nulls out matches older than the bound — the tolerance adds ZERO
    shuffles to the as-of plan, which is the point: a range-join
    formulation of the same semantics re-introduces the per-key
    explosion the lowering exists to avoid."""
    from ..operators.asof import asof_join

    t = load(spark, sf_dir)
    v = t.events.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts_ms"
    )
    p = t.events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_ms"
    )
    j = asof_join(
        p, v, on="user_id", t="ts_ms", tiebreak="event_id",
        right_cols=["event_id", "ts_ms"], how="left",
    )
    ok = F.col("asof_ts_ms").isNotNull() & (
        F.col("asof_ts_ms") > F.col("ts_ms") - _ASOF_TOL_MS
    )
    return j.select(
        F.col("event_id").alias("purchase_event"),
        "user_id",
        F.col("ts_ms").alias("purchase_ms"),
        F.when(ok, F.col("asof_event_id")).alias("asof_view_event"),
        F.when(ok, F.col("asof_ts_ms")).alias("asof_view_ms"),
        ok.alias("matched"),
    )


@query(
    "c_join_shj",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_lines,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def c_join_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join — the THIRD physical equi-join strategy,
    completing the set next to c_join_bcast (broadcast) and c_join_smj
    (sort-merge): both sides shuffle on the key, the smaller side
    builds an in-memory hash table per partition, NO sort on either
    side. When it wins at 100 TB: both sides too big to broadcast, and
    one side small enough per partition that skipping two sorts beats
    SMJ (also the strategy AQE picks for skew-join splitting). The
    `shuffle_hash` hint pins the choice; the plan pin in
    tests/test_plans.py asserts ShuffledHashJoin actually appears —
    without the hint Spark prefers SMJ for this size."""
    t = load(spark, sf_dir)
    j = t.orders.hint("shuffle_hash").join(
        t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        (
            F.floor(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("sum_price"),
    )


@query(
    "c_join_nullsafe",
    oracle="""
    WITH dim AS (SELECT n_nationkey, n_name,
                        NULLIF(n_nationkey, 13) AS join_key
                 FROM nation),
         cust AS (SELECT c_custkey, c_acctbal,
                         NULLIF(c_nationkey, 13) AS join_key
                  FROM customer)
    SELECT d.n_name,
           d.join_key,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust,
           FLOOR(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) * 100 + 0.5) / 100
             AS sum_bal
    FROM dim d JOIN cust c ON d.join_key IS NOT DISTINCT FROM c.join_key
    GROUP BY d.n_name, d.join_key
    """,
)
def c_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics MERGE
    statements and dimension lookups with an explicit unknown-member
    row need. Keys are manufactured by NULLIF'ing one nation (13), so
    exactly one dim row and that nation's customers carry NULL and
    must still pair up; a plain equality join would silently drop
    them (the classic null-key data-loss bug this operator exists to
    avoid). Money follows the house DECIMAL rule.

    100 TB: <=> is a REAL equi key to Spark — it hash-partitions on
    the null-safe key (nulls all land in one partition, which is why
    production schemas cap the unknown-member volume) and the 25-row
    dim side broadcasts; no fallback to a nested loop."""
    t = load(spark, sf_dir)
    dim = t.nation.select(
        "n_nationkey", "n_name", F.nullif(F.col("n_nationkey"), F.lit(13)).alias("join_key")
    )
    cust = t.customer.select(
        "c_custkey", "c_acctbal", F.nullif(F.col("c_nationkey"), F.lit(13)).alias("jk")
    )
    return (
        cust.join(F.broadcast(dim), cust.jk.eqNullSafe(dim.join_key))
        .groupBy("n_name", "join_key")
        .agg(
            F.count("c_custkey").cast("long").alias("n_cust"),
            (
                F.floor(
                    F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double") * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("sum_bal"),
        )
    )
