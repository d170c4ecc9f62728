"""§2.E — window functions: ranking, last-per-group (the APRS flagship
"last position per station"), lag/lead, running/moving frames, analytic
functions, batch sessionization.

All event-time math uses epoch milliseconds (unix_millis ↔ epoch_ms):
the parquet ts is nanosecond-precision and Spark truncates to micros
while DuckDB keeps nanos — raw-ts ordering could tie-break differently.
Every window ordering therefore ends in a unique key (event_id).

100 TB: a window = one shuffle on partitionBy + per-partition sort.
Partition-less windows (global running totals) serialize onto one task —
never ship one; sessionization and last-per-key partition by user/station
and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd
from ..registry import query
from ..tables import load


@query(
    "e_win_rank",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms FROM events)
    SELECT user_id, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn,
           RANK()       OVER (PARTITION BY user_id ORDER BY FLOOR(value / 50)) AS rk,
           DENSE_RANK() OVER (PARTITION BY user_id ORDER BY FLOOR(value / 50)) AS drk,
           NTILE(4)     OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS quartile
    FROM e
    """,
)
def e_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per user. rank orders by a
    bucketed value so ties actually occur (tied rows emit equal ranks —
    deterministic); ntile orders by a unique key (position-dependent)."""
    t = load(spark, sf_dir)
    e = t.events.select("user_id", "event_id", "value", "ts_ms")
    by_time = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    by_bucket = Window.partitionBy("user_id").orderBy(F.floor(F.col("value") / 50))
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(by_time).alias("rn"),
        F.rank().over(by_bucket).alias("rk"),
        F.dense_rank().over(by_bucket).alias("drk"),
        F.ntile(4).over(by_time).alias("quartile"),
    )


@query(
    "e_win_lastpos",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
               FROM events),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts_ms DESC, event_id DESC) AS rn
               FROM e)
    SELECT user_id, event_id, event_type, FLOOR((value) * 100 + 0.5) / 100 AS value, ts_ms
    FROM r WHERE rn = 1
    """,
)
def e_win_lastpos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the flagship APRS query ("where is station
    X now": last position per callsign, aprs.fi-style). row_number over
    (ts DESC, id DESC) = deterministic even under timestamp ties."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )
    return (
        t.events.select(
            "user_id", "event_id", "event_type", "value", "ts_ms"
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", rnd("value", 2).alias("value"), "ts_ms")
    )


@query(
    "e_win_lag",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events)
    SELECT user_id, event_id, ts_ms,
           ts_ms - LAG(ts_ms) OVER w AS gap_ms,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    """,
)
def e_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-event gap per user (inter-position time/speed in
    the APRS track-analytics analog)."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    e = t.events.select("user_id", "event_id", "event_type", "ts_ms")
    return e.select(
        "user_id",
        "event_id",
        "ts_ms",
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "e_win_running",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_date,
             FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS day_rev
      FROM lineitem GROUP BY CAST(l_shipdate AS DATE))
    SELECT ship_date, day_rev,
           FLOOR((SUM(day_rev) OVER (ORDER BY ship_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS cum_rev
    FROM daily
    """,
)
def e_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of daily revenue. NOTE: the outer window has no
    partition — fine for a ~2500-row daily rollup, never for raw rows."""
    t = load(spark, sf_dir)
    daily = (
        t.lineitem.groupBy(F.col("l_shipdate").cast("date").alias("ship_date"))
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "day_rev"
            )
        )
    )
    w = Window.orderBy("ship_date").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "ship_date", "day_rev", rnd(F.sum("day_rev").over(w), 2).alias("cum_rev")
    )


@query(
    "e_win_moving",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_date,
             FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS day_qty
      FROM lineitem GROUP BY CAST(l_shipdate AS DATE))
    SELECT ship_date, day_qty,
           FLOOR((AVG(day_qty) OVER (ORDER BY ship_date
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) * 1000000 + 0.5) / 1000000 AS ma4_rows,
           FLOOR((AVG(day_qty) OVER (ORDER BY epoch_ms(CAST(ship_date AS TIMESTAMP))
                 RANGE BETWEEN 518400000 PRECEDING AND CURRENT ROW)) * 1000000 + 0.5) / 1000000 AS ma7_days
    FROM daily
    """,
)
def e_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving averages: a 4-row frame and a 7-day RANGE frame (range on
    epoch-ms so both engines frame identically; 518400000 = 6 days)."""
    t = load(spark, sf_dir)
    daily = t.lineitem.groupBy(F.col("l_shipdate").cast("date").alias("ship_date")).agg(
        rnd(F.sum("l_quantity"), 2).alias("day_qty")
    )
    w_rows = Window.orderBy("ship_date").rowsBetween(-3, 0)
    w_range = (
        Window.orderBy(F.unix_millis(F.col("ship_date").cast("timestamp")))
        .rangeBetween(-6 * 86400000, 0)
    )
    return daily.select(
        "ship_date",
        "day_qty",
        rnd(F.avg("day_qty").over(w_rows), 6).alias("ma4_rows"),
        rnd(F.avg("day_qty").over(w_range), 6).alias("ma7_days"),
    )


@query(
    "e_win_analytic",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms FROM events
               WHERE user_id < 30)
    SELECT user_id, event_id,
           FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
           LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
           FLOOR((PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)) * 1000000 + 0.5) / 1000000
             AS pct_rank,
           FLOOR((CUME_DIST() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)) * 1000000 + 0.5) / 1000000
             AS cume
    FROM e
    """,
)
def e_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with the full-partition frame pinned (default
    frame makes last_value = current row — classic trap), percent_rank,
    cume_dist."""
    t = load(spark, sf_dir)
    e = t.events.where(F.col("user_id") < 30).select(
        "user_id", "event_id", "value", "ts_ms"
    )
    order = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.first("event_id").over(full).alias("first_event"),
        F.last("event_id").over(full).alias("last_event"),
        rnd(F.percent_rank().over(order), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(order), 6).alias("cume"),
    )


@query(
    "e_win_sessionize",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
         g AS (SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w > 1800000 OR
                                   LAG(ts_ms) OVER w IS NULL
                              THEN 1 ELSE 0 END AS new_session
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
         s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                         ORDER BY ts_ms, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
               FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms
    FROM s GROUP BY user_id, session_id
    """,
)
def e_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session breaks on a >30 min gap; session_id
    is a running sum of break flags. (Streaming twin: session_window —
    streaming/windows.py.)"""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    e = t.events.select("user_id", "event_id", "ts_ms")
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w) > 1800000)
            | F.lag("ts_ms").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(wsum).cast("long"))
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
    )


@query(
    "s_dedup_30s_batch",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
         g AS (SELECT *, LAG(ts_ms) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts_ms, event_id) AS prev_ms
               FROM e)
    SELECT user_id, event_id, event_type, ts_ms
    FROM g WHERE prev_ms IS NULL OR ts_ms - prev_ms > 30000
    """,
)
def s_dedup_30s_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the APRS-IS 30-second duplicate rule (debounce
    flavor: drop a row if its predecessor with the same key is within
    30 s). The true kept-relative streaming semantics live in
    streaming/ingest.dedup_30s (dropDuplicatesWithinWatermark); this
    lag-based variant is the SQL-checkable batch analog on events,
    keyed (user_id, event_type) ≙ (src, payload)."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
    e = t.events.select("user_id", "event_id", "event_type", "ts_ms")
    return (
        e.withColumn("prev_ms", F.lag("ts_ms").over(w))
        .where(F.col("prev_ms").isNull() | (F.col("ts_ms") - F.col("prev_ms") > 30000))
        .drop("prev_ms")
    )


@query(
    "e_win_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST()    OVER w AS cd,
           NTH_VALUE(c_name, 2) OVER w AS second_name
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def e_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value per market segment, ordered by (acctbal, custkey) — the
    unique tiebreak makes every rank deterministic. No rounding needed:
    percent_rank = (rank-1)/(n-1) and cume_dist = k/n are single IEEE
    divisions of small integers, bit-identical on both engines.
    nth_value rides the default RANGE-to-CURRENT-ROW frame (NULL until
    the second row enters), same definition in DuckDB. One c_mktsegment
    exchange; at 100 TB the partition key has enough cardinality that
    no single window partition exceeds an executor (the segment domain
    here is 5 — a real deployment keys distribution stats by a finer
    dimension or computes them per shard)."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_name", 2).over(w).alias("second_name"),
    )


@query(
    "e_win_ignorenulls",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                      CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
               FROM events)
    SELECT user_id, event_id, v,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
           FIRST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_obs
    FROM e
    """,
)
def e_win_ignorenulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation — forward-fill (LOCF) and
    backward-fill as pure window functions: last(v, ignorenulls) over
    an unbounded-preceding frame carries the previous observation
    across a gap, first(v, ignorenulls) over a strictly-following
    frame finds the next one (the lead-ignore-nulls equivalent that
    PySpark's column API can express without SQL text). Nulls are
    manufactured deterministically (every 5th event_id) so both
    engines fill the same gaps; values pass through unmodified, so
    there is no float arithmetic to diverge. This is the per-ROW
    sibling of j_gapfill's per-calendar-day densify+fill.

    100 TB: both fills ride ONE user_id exchange and one sort — frames
    are running, so Spark evaluates them in a single window pass
    without re-scanning the partition per row."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id",
        "event_id",
        "ts_ms",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    order = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    locf = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ahead = order.rowsBetween(1, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(locf).alias("locf"),
        F.first("v", ignorenulls=True).over(ahead).alias("next_obs"),
    )
