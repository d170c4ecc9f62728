"""§2.D — aggregations: hash agg (partial+final is automatic), exact and
approx distinct, rollup/cube, filtered agg, stats, exact percentiles,
order-stable collect, pivot.

Oracle discipline: double sums are ROUND()ed (2 for money, 6 for stats)
so parallel-accumulation FP noise can't flip the value-hash; integer sums
are CAST in DuckDB (its SUM(BIGINT) returns HUGEINT).

100 TB: groupBy→agg is the canonical two-phase hash aggregate — map-side
partial agg means the shuffle carries one row per (partition x group),
not per input row. High-cardinality groupBys (user_id at billions) spill;
countDistinct expands — prefer approx_count_distinct in dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd
from ..registry import query
from ..tables import load


@query(
    "d_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc,
           FLOOR((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
           FLOOR((AVG(l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_qty,
           FLOOR((AVG(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (sum/avg/count by flag+status)."""
    t = load(spark, sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base"),
            rnd(F.sum(disc), 2).alias("sum_disc"),
            rnd(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 6).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "d_agg_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def d_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark's two-phase expand; exact by design."""
    t = load(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "d_agg_approx",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def d_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB answer to countDistinct:
    mergeable sketch, no expand, bounded memory.

    The raw sketch estimate is engine-specific, so it can't hash-match
    DuckDB; instead the output carries the exact count plus `approx_ok` =
    |approx - exact| <= 5% * exact. HLL++ merge is commutative and the
    hash is data-deterministic, so the boolean is stable across runs and
    partitionings — the oracle asserts it TRUE, which both verifies the
    sketch actually ran and bounds its error."""
    t = load(spark, sf_dir)
    agg = t.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("n_users"))
            <= 0.05 * F.col("n_users")
        ).alias("approx_ok"),
    )


@query(
    "d_agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
           COUNT(*) AS n_cust,
           FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def d_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (r_name, n_name) with grouping_id — hierarchy totals in one
    pass (Spark expands grouping sets before the hash agg)."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_cust"),
            rnd(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .select("r_name", "n_name", "gid", "n_cust", "sum_bal")
    )


@query(
    "d_agg_filtered",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           FLOOR((SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END)) * 100 + 0.5) / 100
             AS open_value
    FROM orders GROUP BY o_orderpriority
    """,
)
def d_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if / sum(CASE WHEN)."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        rnd(
            F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("open_value"),
    )


@query(
    "d_agg_stats",
    oracle="""
    SELECT event_type,
           FLOOR((STDDEV_SAMP(value)) * 1000000 + 0.5) / 1000000 AS sd_value,
           FLOOR((VAR_SAMP(value)) * 1000000 + 0.5) / 1000000 AS var_value,
           FLOOR((CORR(value, CAST(user_id AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS corr_vu,
           FLOOR((COVAR_SAMP(value, CAST(user_id AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS covar_vu,
           FLOOR((MIN(value)) * 1000000 + 0.5) / 1000000 AS min_value,
           FLOOR((MAX(value)) * 1000000 + 0.5) / 1000000 AS max_value
    FROM events GROUP BY event_type
    """,
)
def d_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments + bivariate stats per event_type."""
    t = load(spark, sf_dir)
    u = F.col("user_id").cast("double")
    return t.events.groupBy("event_type").agg(
        rnd(F.stddev_samp("value"), 6).alias("sd_value"),
        rnd(F.var_samp("value"), 6).alias("var_value"),
        rnd(F.corr(F.col("value"), u), 6).alias("corr_vu"),
        rnd(F.covar_samp(F.col("value"), u), 6).alias("covar_vu"),
        rnd(F.min("value"), 6).alias("min_value"),
        rnd(F.max("value"), 6).alias("max_value"),
    )


@query(
    "d_agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           FLOOR((QUANTILE_CONT(o_totalprice, 0.25)) * 10000 + 0.5) / 10000 AS p25,
           FLOOR((QUANTILE_CONT(o_totalprice, 0.5)) * 10000 + 0.5) / 10000 AS p50,
           FLOOR((QUANTILE_CONT(o_totalprice, 0.75)) * 10000 + 0.5) / 10000 AS p75,
           FLOOR((QUANTILE_CONT(o_totalprice, 0.95)) * 10000 + 0.5) / 10000 AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def d_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation) — matches DuckDB
    quantile_cont. The 100 TB path is approx_percentile (t-digest); kept
    exact here because the oracle gate hashes values."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_orderstatus").agg(
        rnd(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        rnd(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        rnd(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        rnd(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
    )


@query(
    "d_agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(LIST(event_id ORDER BY epoch_ms(ts), event_id), ',') AS event_ids,
           COUNT(*) AS n_events
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
)
def d_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-stable collect_list: explicit in-group ordering via
    sort_array over (ts_ms, event_id) structs — the only way a collected
    array can hash-match an engine with ORDER BY-able LIST().

    The final projection serializes the array with concat_ws: the
    driver's canonicalizer sorts result frames row-wise in pandas, and
    ndarray cells are unhashable there — every output column must be
    scalar. The collect/sort plan underneath is unchanged."""
    t = load(spark, sf_dir)
    return (
        t.events.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("ts_ms").alias("ms"), F.col("event_id")))
                    ),
                    lambda s: s.event_id,
                ),
            ).alias("event_ids"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "d_agg_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM events GROUP BY user_id
    """,
)
def d_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into count columns. The value list is FIXED —
    at scale an unlisted pivot triggers an extra distinct-values job."""
    t = load(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    p = t.events.groupBy("user_id").pivot("event_type", kinds).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
    )


@query(
    "d_agg_cube",
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
           CAST(GROUPING(c_mktsegment) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
)
def d_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (segment, status): all 2^2 grouping sets in one pass
    (Spark expands the sets before the hash agg — input is read once)."""
    t = load(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select("c_mktsegment", "o_orderstatus", "gid", "n_orders", "total_value")
    )


@query(
    "d_agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           CAST(GROUPING(c_mktsegment) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
    """,
)
def d_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    for: per-segment totals, per-priority totals, and the grand total in
    ONE scan (Spark's Expand feeds a single hash agg; three separate
    groupBys would read the input three times)."""
    t = load(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupingSets(
            [["c_mktsegment"], ["o_orderpriority"], []],
            "c_mktsegment",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select("c_mktsegment", "o_orderpriority", "gid", "n_orders", "total_value")
    )


@query(
    "d_agg_mode",
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM (SELECT c_mktsegment, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_orderpriority)
    WHERE rk = 1
    """,
)
def d_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: most frequent order priority per
    market segment, ties broken by priority string order (built-in
    mode() leaves ties unspecified — useless under an exact oracle).
    Count agg then a per-group rank over the tiny (segment, priority)
    frequency table: the window runs on |groups| rows, not |orders|."""
    t = load(spark, sf_dir)
    freq = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        freq.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@query(
    "d_agg_approx_quantile",
    oracle="""
    SELECT o_orderstatus,
           FLOOR((QUANTILE_CONT(o_totalprice, 0.5)) * 10000 + 0.5) / 10000
               AS median_exact,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def d_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the mergeable-sketch quantile that replaces
    exact percentile at 100 TB (exact needs per-group sorted value
    collection; the sketch is fixed-size and combines map-side).

    Same oracle pattern as d_agg_approx: the sketch estimate is
    engine-specific, so the row carries the exact median plus
    `approx_ok` = approx lies within the exact [p45, p55] band — a
    rank-space bound, so it holds for any value distribution. The
    boolean is deterministic (the sketch is data-deterministic and
    merge-commutative), and the oracle asserts it TRUE: the sketch ran
    AND its error is bounded."""
    t = load(spark, sf_dir)
    agg = t.orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("apx"),
        F.percentile("o_totalprice", F.lit(0.45)).alias("p45"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.55)).alias("p55"),
    )
    return agg.select(
        "o_orderstatus",
        rnd(F.col("p50"), 4).alias("median_exact"),
        (F.col("apx").between(F.col("p45"), F.col("p55"))).alias("approx_ok"),
    )


@query(
    "d_agg_salted",
    oracle="""
    SELECT event_type,
           FLOOR(SUM(value) * 1000000 + 0.5) / 1000000 AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           FLOOR(SUM(value) / COUNT(*) * 1000000 + 0.5) / 1000000 AS avg_value
    FROM events GROUP BY event_type
    """,
)
def d_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe two-phase aggregate: sum/count/avg of events.value
    per event_type computed through operators/skew.salted_sum_count —
    phase 1 groups on (key, salt-of-event_id) so a viral key fans out
    over 16 tasks, phase 2 merges the 16 partials per key. The oracle is
    the PLAIN direct GROUP BY: salting is semantics-preserving by
    construction (algebraic aggregates compose), and this qid makes that
    equivalence a driver-checked fact rather than a test-only property
    (tests/test_scale_paths.py::test_salted_agg_matches_direct).

    Why it exists: AQE's skew-join splitting cannot split a single
    groupBy partition — one key with 10^9 rows serializes onto one task
    at 100 TB. The cost here is a second (tiny: keys x 16 rows) shuffle;
    the win is bounded fan-in per task regardless of key skew. Sums
    round at 1e-6: the salt changes float accumulation order, which is
    exactly the divergence the portable rounding discipline absorbs."""
    from ..operators.skew import salted_sum_count

    t = load(spark, sf_dir)
    s = salted_sum_count(
        t.events.select("event_type", "value", "event_id"),
        key="event_type",
        value="value",
        uniquifier="event_id",
    )
    return s.select(
        "event_type",
        rnd(F.col("sum_value"), 6).alias("sum_value"),
        "n_rows",
        rnd(F.col("sum_value") / F.col("n_rows"), 6).alias("avg_value"),
    )


@query(
    "d_agg_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
      FROM events GROUP BY user_id)
    SELECT user_id, kind, CAST(n AS BIGINT) AS n
    FROM wide UNPIVOT (n FOR kind IN (n_click, n_purchase, n_view))
    """,
)
def d_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of d_agg_pivot: a wide per-user
    count table back to long (user_id, kind, n) form, the shape every
    metrics store and plotting layer wants. DataFrame.unpivot is a
    zero-shuffle Expand over the already-aggregated frame (3 output
    rows per input row, no exchange); DuckDB's UNPIVOT drops NULL
    cells by default and Spark's keeps them, but COUNT FILTER never
    yields NULL so the semantics coincide here by construction."""
    t = load(spark, sf_dir)
    wide = (
        t.events.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .count()
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("purchase").alias("n_purchase"),
            F.col("view").alias("n_view"),
        )
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_click", "n_purchase", "n_view"],
        variableColumnName="kind",
        valueColumnName="n",
    ).withColumn("n", F.col("n").cast("long"))


@query(
    "d_agg_bitwise",
    oracle="""
    SELECT event_type,
           CAST(bit_or(CAST(1 AS BIGINT) << ((epoch_ms(ts) // 86400000) % 7)) AS BIGINT)
             AS dow_mask,
           CAST(bit_or(CAST(1 AS BIGINT) << (user_id % 32)) AS BIGINT) AS bucket_mask,
           CAST(bit_and(user_id) AS BIGINT) AS and_all,
           CAST(bit_xor(user_id) AS BIGINT) AS xor_all,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def d_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_or / bit_and / bit_xor) — the bitmap
    rollup primitive behind presence masks and cheap set summaries:
    per event type, which weekdays it occurs on (7-bit mask over the
    portable epoch-day mod 7 — NOT dayofweek(), whose origin differs
    between engines) and which of 32 user buckets it touches. All
    integer-exact and fully mergeable (map-side partials combine with
    the same operator), so at 100 TB the shuffle carries one 64-bit
    mask per group per partition."""
    t = load(spark, sf_dir)
    # F.shiftleft only takes a literal bit count in the Python API —
    # column-valued shifts go through the SQL expression; the shifted 1
    # must be BIGINT on BOTH engines (an INT 1 << 31 wraps negative in
    # Spark but promotes unsigned in DuckDB)
    dow = F.expr("shiftleft(CAST(1 AS BIGINT), CAST((ts_ms div 86400000) % 7 AS INT))")
    bucket = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
    return t.events.groupBy("event_type").agg(
        F.bit_or(dow).cast("long").alias("dow_mask"),
        F.bit_or(bucket).cast("long").alias("bucket_mask"),
        F.bit_and("user_id").cast("long").alias("and_all"),
        F.bit_xor("user_id").cast("long").alias("xor_all"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "d_agg_listagg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_orderkey) AS keys_csv,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey < 200
    GROUP BY o_orderstatus
    """,
)
def d_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (ORDER BY ...) — the ANSI ordered
    string aggregation added in Spark 4.0 (before 4.0 this took a
    collect_list + array_sort + concat_ws detour, the d_agg_collect
    pattern). The WITHIN GROUP order makes the result deterministic
    under any partitioning — an UNORDERED listagg over a distributed
    table is nondeterministic by construction and would never
    hash-match. DuckDB twin: string_agg with ORDER BY. Keys capped to
    a small prefix: an unbounded listagg materializes the group in one
    string — at scale cap or pre-aggregate (this is a reporting
    surface, not a data-movement one)."""
    t = load(spark, sf_dir)
    t.orders.where(F.col("o_orderkey") < 200).createOrReplaceTempView("v_la_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY o_orderkey) AS keys_csv,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM v_la_orders
        GROUP BY o_orderstatus
        """
    )


@query(
    "d_agg_bitmap",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT user_id) AS n_users_bitmap
    FROM events GROUP BY event_type
    """,
)
def d_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via Spark 4's BITMAP aggregate family
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg
    / bitmap_count) — the two-level bitmap rollup warehouses use for
    REUSABLE distinct state: unlike COUNT(DISTINCT)'s expand, the
    per-bucket bitmaps are mergeable artifacts you can persist and OR
    across days (the d_agg_approx/HLL tradeoff, but exact). The qid
    computes the same count BOTH ways and the oracle pins them equal
    to DuckDB's COUNT(DISTINCT) — a wrong bit position or bucket
    split shows up as a value mismatch, not a plausible-looking
    estimate. Plan: (type, bucket) partial bitmap agg (32768-bit
    bitmaps cross the shuffle, one per group per partition), then a
    per-type SUM of bucket counts."""
    t = load(spark, sf_dir)
    t.events.createOrReplaceTempView("v_bm_events")
    return spark.sql(
        """
        WITH buckets AS (
          SELECT event_type, bitmap_bucket_number(user_id) AS b,
                 bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))
                   AS cnt
          FROM v_bm_events GROUP BY event_type, bitmap_bucket_number(user_id)),
        bm AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_users_bitmap
               FROM buckets GROUP BY event_type),
        ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_users
               FROM v_bm_events GROUP BY event_type)
        SELECT ex.event_type, ex.n_users, bm.n_users_bitmap
        FROM ex JOIN bm ON ex.event_type = bm.event_type
        """
    )


# GROUP BY ALL / ORDER BY ALL — ONE SQL text, run verbatim on both
# engines (the strongest parity statement this repo can make: there is
# no translation to diverge). Both resolve ALL to the non-aggregate
# select-list positions.
_GROUPALL_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM {orders}
GROUP BY ALL
ORDER BY ALL
"""


@query("d_agg_groupall", oracle=_GROUPALL_SQL.format(orders="orders"))
def d_agg_groupall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL (Spark 4.0 / modern-warehouse SQL
    sugar): every non-aggregate select item becomes a grouping key and
    the full select list the sort order — the de-facto exploratory SQL
    dialect (DuckDB, Snowflake, Databricks all resolve it the same
    way). The oracle runs the IDENTICAL SQL text, so what is pinned is
    the resolution rule itself. DuckDB SUM(BIGINT) returns HUGEINT —
    both sides CAST (the r6 parity rule)."""
    t = load(spark, sf_dir)
    t.orders.createOrReplaceTempView("v_ga_orders")
    return spark.sql(_GROUPALL_SQL.format(orders="v_ga_orders"))


@query(
    "d_agg_argminmax",
    oracle="""
    SELECT o_orderpriority,
           max_by(o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                              * 10000000000 + o_orderkey) AS top_order,
           min_by(o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                              * 10000000000 + o_orderkey) AS bottom_order,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def d_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI max_by / min_by / count_if — the argmax family that replaces
    the self-join-back-to-the-winner anti-pattern with ONE hash
    aggregate (no second scan, no join). Determinism rule: max_by on a
    tied key is engine-arbitrary, so the ordering key is made UNIQUE by
    packing (cents, orderkey) into one exact BIGINT — cents ≤ ~6e7
    times 1e10 stays under 2^63, and both engines compute the identical
    integer. count_if is the standard conditional-count sugar
    (COUNT(*) FILTER in DuckDB terms; identical name works on both).

    100 TB: one shuffle on the 5-value priority key with map-side
    partials; the packed-key trick is the general recipe for
    deterministic argmax over any (score, unique_id) pair at any
    scale."""
    t = load(spark, sf_dir)
    key = (
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        * F.lit(10000000000).cast("long")
        + F.col("o_orderkey")
    )
    return t.orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("top_order"),
        F.min_by("o_orderkey", key).alias("bottom_order"),
        F.count_if(F.col("o_totalprice") > 150000).cast("long").alias("n_big"),
    )


@query(
    "d_transpose",
    oracle="""
    WITH g AS (SELECT lang,
                      CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                      CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                        AS sum_tokens
               FROM documents GROUP BY lang)
    SELECT 'n_docs' AS key,
           MAX(CASE WHEN lang = 'de' THEN n_docs END) AS de,
           MAX(CASE WHEN lang = 'en' THEN n_docs END) AS en,
           MAX(CASE WHEN lang = 'es' THEN n_docs END) AS es,
           MAX(CASE WHEN lang = 'fr' THEN n_docs END) AS fr,
           MAX(CASE WHEN lang = 'zh' THEN n_docs END) AS zh
    FROM g
    UNION ALL
    SELECT 'sum_chars',
           MAX(CASE WHEN lang = 'de' THEN sum_chars END),
           MAX(CASE WHEN lang = 'en' THEN sum_chars END),
           MAX(CASE WHEN lang = 'es' THEN sum_chars END),
           MAX(CASE WHEN lang = 'fr' THEN sum_chars END),
           MAX(CASE WHEN lang = 'zh' THEN sum_chars END)
    FROM g
    UNION ALL
    SELECT 'sum_tokens',
           MAX(CASE WHEN lang = 'de' THEN sum_tokens END),
           MAX(CASE WHEN lang = 'en' THEN sum_tokens END),
           MAX(CASE WHEN lang = 'es' THEN sum_tokens END),
           MAX(CASE WHEN lang = 'fr' THEN sum_tokens END),
           MAX(CASE WHEN lang = 'zh' THEN sum_tokens END)
    FROM g
    """,
)
def d_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4.0, SPARK-47537): rows become
    columns — the report-shaping dual of pivot (pivot turns a VALUE
    domain into columns under aggregation; transpose flips an already-
    aggregated frame so metrics become rows and group keys become
    columns). Semantics pinned by the oracle: the index column's
    values become column names in LEXICOGRAPHIC order, remaining rows
    keep the original COLUMN order under a 'key' column, and all
    non-index columns must share a least-common type (all BIGINT
    here). The column set must be data-stable for the contract — the
    5-language domain holds at every SF (tri-scale checked).

    100 TB: transpose EXECUTES the frame to read the index domain
    (column names are schema, schema is driver-side) — so it belongs
    strictly AFTER aggregation, on k-row results like this 5-lang
    rollup, never on a fact table. The aggregate underneath is one
    map-side-partial shuffle on the 5-value lang key."""
    from ..operators.dedup import tokens_col

    t = load(spark, sf_dir)
    g = (
        t.documents.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.size(tokens_col("text"))).cast("long").alias("sum_tokens"),
        )
    )
    return g.transpose()


@query(
    "d_crosstab",
    oracle="""
    WITH e AS (SELECT event_type,
                      CAST((epoch_ms(ts) // 86400000 + 4) % 7 AS VARCHAR) AS dow
               FROM events)
    SELECT event_type AS event_type_dow,
           CAST(count_if(dow = '0') AS BIGINT) AS "0",
           CAST(count_if(dow = '1') AS BIGINT) AS "1",
           CAST(count_if(dow = '2') AS BIGINT) AS "2",
           CAST(count_if(dow = '3') AS BIGINT) AS "3",
           CAST(count_if(dow = '4') AS BIGINT) AS "4",
           CAST(count_if(dow = '5') AS BIGINT) AS "5",
           CAST(count_if(dow = '6') AS BIGINT) AS "6"
    FROM e GROUP BY event_type
    """,
)
def d_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via DataFrame.stat.crosstab (SPARK-7982): the
    pairwise-frequency EDA surface — one call pivots exact counts of
    (event_type x weekday-class) with zero-filled empty cells and the
    column domain SORTED (pinned by the oracle's hardcoded 0..6).
    The weekday class is (epoch_day + 4) % 7, the engine-portable form
    (dayofweek() origins differ across engines — the house rule).

    100 TB: crosstab is sugar over groupBy(c1).pivot(c2).count() — one
    map-side-partial shuffle on the row key; its contract requires the
    COLUMN domain be small (it becomes schema, collected at the
    driver), which the 7-class weekday satisfies by construction.
    Unlike pivot, crosstab string-ifies values and zero-fills — the
    quick-look tool, with d_agg_pivot as the typed production form."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "event_type",
        ((F.expr("ts_ms div 86400000") + 4) % 7).cast("string").alias("dow"),
    )
    ct = e.stat.crosstab("event_type", "dow")
    cols = ["event_type_dow"] + [str(i) for i in range(7)]
    return ct.select(*[F.col(f"`{c}`").alias(c) if c != "event_type_dow" else F.col(c) for c in cols])
