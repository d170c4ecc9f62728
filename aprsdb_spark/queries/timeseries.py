"""§2.J additions (r6 continuation) — TIME-SERIES / history operators the
reference's event-analytics surface implies but SQL engines rarely ship
as one primitive, each built from declarative DataFrame ops so Catalyst
keeps the whole plan JVM-side:

- calendar gap-fill + forward-fill (the `time_bucket_gapfill` /
  `locf` pair popularized by the TimescaleDB docs, public): densify a
  per-user daily series onto its min..max calendar grid and carry the
  last observation forward across the manufactured gaps,
- SCD type-2 history build (Kimball's public dimensional-modeling
  pattern): collapse the per-user event stream into contiguous
  attribute runs with [valid_from, valid_to) intervals, a version
  counter, and an is_current flag — the batch form of a streaming
  upsert sink's history table,
- trailing-window anomaly flags: per event-type daily counts scored
  against the PRECEDING 7 days' mean/stddev (the frame excludes the
  current row, so an anomaly cannot suppress its own z-score).

Scale notes per qid in the docstrings; the shared property is that every
shuffle keys on (user_id) or (event_type, day) — bounded-cardinality
keys the engine already hashes well — and no window frame is unbounded
over a raw-event partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd, sql_rnd
from ..registry import query
from ..tables import load

# Trailing frame for anomaly scoring: the 7 days before today, excluding
# today; require >= 3 observed days before emitting a score.
_ANOM_LOOKBACK = 7
_ANOM_MIN_OBS = 3


@query(
    "j_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             FLOOR(AVG(value) * 1000000 + 0.5) / 1000000 AS day_avg
      FROM events GROUP BY 1, 2),
    span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM span)
    SELECT g.user_id, g.day, d.day_avg,
           last_value(d.day_avg IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           d.day_avg IS NULL AS is_gap
    FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    """,
)
def j_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward-fill (LOCF): densify each user's daily
    average onto the full min..max calendar grid, then carry the last
    observation forward so every manufactured day has a value. The grid
    is built with sequence()+explode on the per-user span — one row per
    user in, span-days rows out — NOT a cross join against a global
    calendar, so sparse users don't pay for the corpus's full date range.

    Scale shape: daily agg shuffles on (user_id, day); span agg and the
    ffill window both key on user_id alone — at 100 TB that is one
    repartition by user_id reused across the join and the window (AQE
    coalesces the tiny span side to a broadcast). The ffill frame is
    ROWS UNBOUNDED PRECEDING over ~span-days rows per user, never over
    raw events. day_avg pre-rounds to 1e-6 (parallel float sums) before
    both the join and the fill so the carried value is the compared
    value."""
    t = load(spark, sf_dir)
    daily = (
        t.events.select(
            "user_id",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        .agg(rnd(F.avg("value"), 6).alias("day_avg"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "day_avg",
        F.last("day_avg", ignorenulls=True).over(w).alias("filled"),
        F.col("day_avg").isNull().alias("is_gap"),
    )


@query(
    "j_scd2_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
             CASE WHEN event_type IS DISTINCT FROM
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ms(ts), event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM events),
    -- the running sum MUST order by the same total order as the LAG in
    -- e (ts_ms, event_id): ORDER BY ts_ms alone leaves a ROWS frame
    -- order-nondeterministic under tied per-user timestamps and can
    -- assign run ids differently from the Spark side (ADVICE r6)
    r AS (
      SELECT user_id, event_type, ts_ms,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM e),
    runs AS (
      SELECT user_id, run, MIN(event_type) AS attr,
             MIN(ts_ms) AS valid_from, COUNT(*) AS n_events
      FROM r GROUP BY user_id, run)
    SELECT user_id, attr, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           n_events,
           CAST(run AS BIGINT) AS version,
           LEAD(valid_from) OVER w IS NULL AS is_current
    FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, run)
    """,
)
def j_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build (Kimball's public pattern): collapse each
    user's event stream into contiguous same-attribute runs, emitting
    [valid_from, valid_to) epoch-ms intervals, a per-user version
    counter, and is_current on the open-ended last run — the batch twin
    of what a streaming upsert sink's history table accumulates.

    Run detection is the classic gaps-and-islands pair: a LAG-based
    change flag followed by a running SUM over the same (user_id, order)
    window, so Catalyst evaluates both in ONE Window node and one
    user_id exchange; the run rollup and both LEAD windows reuse that
    partitioning (AQE plans no further shuffle). Every frame is bounded
    by a single user's rows. Timestamps stay epoch-ms longs end-to-end
    (the e_win_lag convention) — no engine-specific timestamp
    canonicalization in the compared values."""
    t = load(spark, sf_dir)
    we = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    chg = (
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(we)), 1
        ).otherwise(0)
    ).alias("chg")
    e = t.events.select("user_id", "event_type", "ts_ms", "event_id", chg)
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = e.select(
        "user_id", "event_type", "ts_ms", F.sum("chg").over(wr).alias("run")
    )
    runs = r.groupBy("user_id", "run").agg(
        F.min("event_type").alias("attr"),
        F.min("ts_ms").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    # (valid_from, run) — valid_from alone ties when two events straddle
    # a run boundary at the same timestamp; run is the per-user total
    # order, mirrored in the oracle's WINDOW clause
    wv = Window.partitionBy("user_id").orderBy("valid_from", "run")
    valid_to = F.lead("valid_from").over(wv)
    return runs.select(
        "user_id",
        "attr",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        F.col("run").cast("long").alias("version"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "j_ts_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT event_type, day, cnt,
             FLOOR(AVG(cnt * 1.0) OVER w * 1000000 + 0.5) / 1000000 AS mu,
             FLOOR(COALESCE(stddev_samp(cnt * 1.0) OVER w, 0) * 1000000 + 0.5)
               / 1000000 AS sd,
             COUNT(*) OVER w AS n_obs
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, cnt, mu, sd,
           CASE WHEN n_obs >= {_ANOM_MIN_OBS}
                THEN FLOOR((cnt - mu) / NULLIF(sd, 0) * 10000 + 0.5) / 10000
           END AS z,
           n_obs >= {_ANOM_MIN_OBS} AND sd > 0
             AND abs((cnt - mu) / NULLIF(sd, 0)) > 3 AS is_anomaly
    FROM scored
    """,
)
def j_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection on the daily event-count series:
    each (event_type, day) count is z-scored against the mean/stddev of
    the PRECEDING {lookback} days — the frame ends at 1 PRECEDING, so a
    spike cannot inflate its own baseline — and flagged beyond 3 sigma.
    Days with fewer than {min_obs} prior observations emit NULL z (cold
    start), and a zero stddev yields NULL z / false flag via NULLIF.

    mu and sd are pre-rounded to 1e-6 and z to 1e-4 before the threshold
    comparison (the j_embed_outlier convention): window stddev over
    integer counts is deterministic per engine but accumulation details
    differ across engines. Scale shape: one (event_type, day) count agg,
    then one window keyed on event_type over ~days-per-type rows — the
    raw-event shuffle happens once, in the agg, map-side combined."""
    t = load(spark, sf_dir)
    daily = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_ANOM_LOOKBACK, -1)
    )
    cntd = F.col("cnt").cast("double")
    scored = daily.select(
        "event_type",
        "day",
        "cnt",
        rnd(F.avg(cntd).over(w), 6).alias("mu"),
        rnd(F.coalesce(F.stddev_samp(cntd).over(w), F.lit(0.0)), 6).alias("sd"),
        F.count("*").over(w).alias("n_obs"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))
    return scored.select(
        "event_type",
        "day",
        "cnt",
        "mu",
        "sd",
        F.when(F.col("n_obs") >= _ANOM_MIN_OBS, rnd(z, 4)).alias("z"),
        (
            (F.col("n_obs") >= _ANOM_MIN_OBS)
            & (F.col("sd") > 0)
            & (F.abs(z) > 3)
        ).alias("is_anomaly"),
    )


j_ts_anomaly.__doc__ = j_ts_anomaly.__doc__.format(
    lookback=_ANOM_LOOKBACK, min_obs=_ANOM_MIN_OBS
)


# Incremental-view-maintenance split point: orders before this date are
# the materialized state, at-or-after are the new delta batch.
_IVM_CUTOVER = "1999-01-01"


@query(
    "j_incremental_agg",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS revenue
    FROM orders GROUP BY 1
    """,
)
def j_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (IVM): the daily-revenue rollup is
    maintained as STATE (the pre-aggregated partial for orders before
    the cutover) merged with a DELTA batch (raw orders at-or-after it) —
    and the oracle is the FULL recompute, so 'merging partials equals
    recomputing' is a driver-checked fact, the algebraic-aggregate
    contract every foreachBatch sink and materialized view relies on.

    Plan: state side aggregates once (in a deployment it is already on
    disk — here it is built inline to stay self-contained), delta side
    aggregates its own days, and the merge is a (day)-keyed re-agg of
    the UNION of partials — (day, count, sum) rows only, never raw rows
    twice. Money sums run in DECIMAL end-to-end (the c_join_smj rule:
    float partial sums are order-dependent and a 1-ulp drift flips a
    cent at the .005 boundary); the cast to DOUBLE happens on the final
    rounded output. At 100 TB this is exactly the nightly-compaction
    shape: touch the delta, not the history."""
    t = load(spark, sf_dir)
    cut = F.lit(_IVM_CUTOVER).cast("timestamp")
    day = F.col("o_orderdate").cast("date").alias("day")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    partial = lambda df: df.groupBy(day).agg(  # noqa: E731
        F.count("*").cast("long").alias("n"),
        F.sum(dec).alias("s"),
    )
    state = partial(t.orders.where(F.col("o_orderdate") < cut))
    delta = partial(t.orders.where(F.col("o_orderdate") >= cut))
    return (
        state.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.expr("FLOOR(CAST(SUM(s) AS DOUBLE) * 100 + 0.5) / 100").alias(
                "revenue"
            ),
        )
    )


# EWMA: dyadic alpha=1/2 over a 16-row trailing window; value on the
# cent grid so the weighted sum is integer-exact.
_EWMA_W = 16

# Interval-overlap: each event holds a resource for this long.
_OVL_HOLD_MS = 300_000


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE(LAG(vs, {k}) OVER w * {1 << (_EWMA_W - 1 - k)}, 0)"
        for k in range(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN LAG(vs, {k}) OVER w IS NOT NULL"
        f" THEN {1 << (_EWMA_W - 1 - k)} ELSE 0 END"
        for k in range(_EWMA_W)
    )
    return f"""
    WITH v AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vs
      FROM events),
    e AS (
      SELECT user_id, ts_ms, event_id, value,
             ({num}) AS num, ({den}) AS den
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
    SELECT user_id, ts_ms, event_id, value,
           FLOOR(num * 100.0 / den + 0.5) / 10000 AS ewma
    FROM e
    """


@query("j_ts_ewma", oracle=_ewma_sql())
def j_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (adjusted EWMA, alpha=1/2)
    of events.value per user over a 16-row trailing window — the
    smoothing primitive of monitoring/feature pipelines. The float
    discipline makes it engine-exact END-TO-END: values floor to the
    cent grid (BIGINT), the weights are powers of two (2^15..2^0), so
    numerator and denominator are exact 64-bit integers at any
    evaluation order, and the single num/den division happens once on
    identical operands. The 16 LAG terms all share ONE window spec —
    Catalyst evaluates them in a single Window node on a single
    user_id exchange (the j_scd2_history pattern); the truncated-tail
    windowing (den sums only the available weights) is the standard
    'adjusted' EWMA initialization, so early rows are exact too."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    vs = F.floor(F.col("value") * 100 + 0.5).cast("long")
    v = t.events.select("user_id", "ts_ms", "event_id", "value", vs.alias("vs"))
    num = sum(
        F.coalesce(
            F.lag("vs", k).over(w) * F.lit(1 << (_EWMA_W - 1 - k)), F.lit(0)
        )
        for k in range(_EWMA_W)
    )
    den = sum(
        F.when(
            F.lag("vs", k).over(w).isNotNull(), F.lit(1 << (_EWMA_W - 1 - k))
        ).otherwise(0)
        for k in range(_EWMA_W)
    )
    e = v.select("user_id", "ts_ms", "event_id", "value", num.alias("num"), den.alias("den"))
    return e.select(
        "user_id",
        "ts_ms",
        "event_id",
        "value",
        (F.floor(F.col("num") * 100.0 / F.col("den") + 0.5) / 10000).alias("ewma"),
    )


@query(
    "j_interval_overlap",
    oracle=f"""
    WITH b AS (
      SELECT event_type, epoch_ms(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, epoch_ms(ts) + {_OVL_HOLD_MS}, -1 FROM events),
    g AS (SELECT event_type, t, CAST(SUM(d) AS BIGINT) AS delta
          FROM b GROUP BY event_type, t),
    c AS (SELECT event_type, t,
                 SUM(delta) OVER (PARTITION BY event_type ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS conc
          FROM g),
    m AS (SELECT event_type, CAST(MAX(conc) AS BIGINT) AS max_concurrent
          FROM c GROUP BY event_type),
    n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals
          FROM events GROUP BY event_type)
    SELECT c.event_type, m.max_concurrent, MIN(c.t) AS at_ms, n.n_intervals
    FROM c
    JOIN m ON c.event_type = m.event_type AND c.conc = m.max_concurrent
    JOIN n ON n.event_type = c.event_type
    GROUP BY c.event_type, m.max_concurrent, n.n_intervals
    """,
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum interval overlap (sweep line): treat each event as
    holding a resource for {hold} ms and report, per event_type, the
    peak concurrency and the first instant it is reached — the classic
    capacity question (max simultaneous sessions / connections / GPU
    leases). Half-open [s, e) semantics: boundaries COLLAPSE per
    (type, instant) first (+1s and -1s at the same instant net out),
    which both removes the end-before-start tie ambiguity and makes
    the running sum's ROWS frame deterministic — after the collapse,
    t is unique within each partition.

    Plan: one union of two projections of the same scan (no self
    join), one (type, t) hash agg, ONE type-keyed window for the
    running concurrency, then a broadcast-joined max lookup. Shuffle
    weight: 2 boundary rows per event collapsing to |distinct
    instants| — at 100 TB the sweep parallelizes over the partition
    key exactly like every other window family here."""
    t = load(spark, sf_dir)
    up = t.events.select("event_type", F.col("ts_ms").alias("t"), F.lit(1).alias("d"))
    down = t.events.select(
        "event_type",
        (F.col("ts_ms") + _OVL_HOLD_MS).alias("t"),
        F.lit(-1).alias("d"),
    )
    g = (
        up.unionByName(down)
        .groupBy("event_type", "t")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.select("event_type", "t", F.sum("delta").over(w).alias("conc"))
    m = c.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("max_concurrent")
    )
    n = t.events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_intervals")
    )
    return (
        c.join(
            F.broadcast(m),
            (c.event_type == m.event_type) & (c.conc == F.col("max_concurrent")),
        )
        .drop(m.event_type)
        .join(F.broadcast(n), "event_type")
        .groupBy("event_type", "max_concurrent", "n_intervals")
        .agg(F.min("t").alias("at_ms"))
        .select("event_type", "max_concurrent", "at_ms", "n_intervals")
    )


j_interval_overlap.__doc__ = j_interval_overlap.__doc__.replace(
    "{hold}", str(_OVL_HOLD_MS)
)


# Rolling correlation: trailing window (days) and minimum observations.
_RCORR_WIN = 14
_RCORR_MIN = 5


@query(
    "j_rolling_corr",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS x,
             CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    w AS (
      SELECT day, x, y,
             CAST(SUM(x) OVER f AS BIGINT) AS sx,
             CAST(SUM(y) OVER f AS BIGINT) AS sy,
             CAST(SUM(x * y) OVER f AS BIGINT) AS sxy,
             CAST(SUM(x * x) OVER f AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER f AS BIGINT) AS syy,
             CAST(COUNT(*) OVER f AS BIGINT) AS n
      FROM d
      WINDOW f AS (ORDER BY day ROWS BETWEEN {_RCORR_WIN - 1} PRECEDING
                   AND CURRENT ROW))
    SELECT day, x, y, n,
           CASE WHEN n >= {_RCORR_MIN}
                 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN FLOOR((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
                           * 1000000 + 0.5) / 1000000
           END AS corr_roll
    FROM w
    """,
)
def j_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between two event streams' daily
    counts (click vs view) over a {W}-day trailing window — the
    co-movement monitor of metric pipelines. Spark has corr() as an
    aggregate but NOT as a window function; the window form decomposes
    into the five exact sufficient statistics (Σx, Σy, Σxy, Σx², Σy² —
    all BIGINT window sums of integer counts, order-independent), so
    the only float ops are ONE sqrt and ONE division on identical
    exact operands per row, floored to 1e-6. Degenerate windows (< {M}
    observations or zero variance) yield NULL, not a boundary-sensitive
    0/0.

    Plan: one (day) hash agg collapses the table to |days| rows; the
    five stats share ONE window spec over that tiny relation (the
    single-partition global-order window is |days| rows — the pinned
    'offset table' class, never raw events). At 100 TB add a coarse
    partition key (year) exactly as the other calendar windows here."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
            "event_type",
        )
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("x"),
            F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("y"),
        )
    )
    f = Window.orderBy("day").rowsBetween(-(_RCORR_WIN - 1), 0)
    w = d.select(
        "day",
        "x",
        "y",
        F.sum("x").over(f).cast("long").alias("sx"),
        F.sum("y").over(f).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(f).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(f).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).cast("long").alias("syy"),
        F.count("*").over(f).cast("long").alias("n"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = F.floor(
        num / F.sqrt(vx * 1.0 * vy) * 1000000 + F.lit(0.5)
    ) / 1000000
    return w.select(
        "day",
        "x",
        "y",
        "n",
        F.when((F.col("n") >= _RCORR_MIN) & (vx > 0) & (vy > 0), corr).alias(
            "corr_roll"
        ),
    )


j_rolling_corr.__doc__ = j_rolling_corr.__doc__.replace("{W}", str(_RCORR_WIN)).replace(
    "{M}", str(_RCORR_MIN)
)


# Point-in-time feature snapshot: the as-of cutoff and epoch-ms bounds
# (events span 2024-01-01 .. 2024-01-30; the cutoff sits inside, with
# 20 days of history behind it and real out-of-window data after).
_FS_CUT_MS = 1_705_795_200_000  # 2024-01-21T00:00:00Z
_FS_7D = _FS_CUT_MS - 7 * 86_400_000
_FS_30D = _FS_CUT_MS - 14 * 86_400_000


@query(
    "j_feature_snapshot",
    oracle=f"""
    WITH h AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, value
      FROM events WHERE epoch_ms(ts) <= {_FS_CUT_MS})
    SELECT user_id,
           CAST(COUNT(CASE WHEN ts_ms > {_FS_7D} THEN 1 END) AS BIGINT) AS n_7d,
           CAST(COUNT(CASE WHEN ts_ms > {_FS_30D} THEN 1 END) AS BIGINT) AS n_14d,
           CAST(SUM(CASE WHEN ts_ms > {_FS_30D}
                         THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) / 100.0 AS value_14d,
           CAST((({_FS_CUT_MS}) - MAX(ts_ms)) // 86400000 AS BIGINT)
             AS days_since_last,
           CAST(COUNT(*) AS BIGINT) AS n_lifetime
    FROM h GROUP BY user_id
    """,
)
def j_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature-store snapshot: per user, trailing 7/14-day
    activity counts, 14-day value sum, recency, and lifetime count —
    all AS OF a fixed cutoff (2024-01-21), the leakage-safe shape a
    training pipeline joins onto labels (features may only see history
    <= the label's as-of time; the cutoff filter IS that guarantee).
    Distinct from the calendar-series qids (gapfill/ewma): this is one
    row per entity at one instant, not a series.

    Exactness: counts are BIGINT; the value sum floors each value to
    the cent grid FIRST and sums in exact integer arithmetic (the 4l
    rule — a double sum of 14 days of values would be
    accumulation-order-dependent), with one exact /100.0 for display;
    recency is integer epoch-day arithmetic. Plan: the cutoff filter
    pushes to the scan, then ONE user-keyed conditional aggregate —
    every window is a CASE inside the same agg, so the table is read
    once and shuffled once. At 100 TB the cutoff prunes date
    partitions before the scan."""
    t = load(spark, sf_dir)
    h = t.events.where(F.col("ts_ms") <= _FS_CUT_MS)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return h.groupBy("user_id").agg(
        F.count(F.when(F.col("ts_ms") > _FS_7D, 1)).cast("long").alias("n_7d"),
        F.count(F.when(F.col("ts_ms") > _FS_30D, 1)).cast("long").alias("n_14d"),
        (
            F.sum(F.when(F.col("ts_ms") > _FS_30D, cents).otherwise(0)).cast("long")
            / 100.0
        ).alias("value_14d"),
        F.expr(f"CAST(({_FS_CUT_MS} - MAX(ts_ms)) div 86400000 AS BIGINT)").alias(
            "days_since_last"
        ),
        F.count("*").cast("long").alias("n_lifetime"),
    )


# OHLC bar width: 6 hours of epoch-ms; day length for hour-of-day math.
_BAR_MS = 21600000
_DAY_MS = 86400000


@query(
    "j_ts_ohlc",
    oracle=f"""
    WITH e AS (SELECT event_type, event_id, value, epoch_ms(ts) AS ts_ms
               FROM events),
    k AS (SELECT event_type, value,
                 ts_ms // {_BAR_MS} AS bar,
                 (ts_ms % {_BAR_MS}) * 1000000000 + event_id AS ord
          FROM e)
    SELECT event_type, bar,
           arg_min(value, ord) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ord) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS volume_s
    FROM k GROUP BY event_type, bar
    """,
)
def j_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the candlestick/bar aggregation every
    time-series store ships as a primitive: per (series, 6h bar),
    first/last/extreme values plus tick count and scaled volume.
    Open/close are argmin/argmax over a key that packs
    (offset-in-bar, event_id) into ONE exact BIGINT — the bar-relative
    offset (< 2.16e7) times 1e9 plus the id stays under 2^63 and both
    engines compute the identical integer, making the tie-broken
    endpoints deterministic (the d_agg_argminmax packed-key recipe;
    a raw ts_ms·1e9 key would overflow). High/low/open/close pass
    value doubles through unmodified; volume follows the scaled-BIGINT
    integer-sum rule.

    100 TB: ONE hash aggregate on (event_type, bar) — max_by/min_by
    carry (value, key) pairs as map-side partial state, so bars
    downsample without any window sort; the bar key is also the
    natural write-partition for append-only tick stores."""
    t = load(spark, sf_dir)
    ord_key = (F.col("ts_ms") % _BAR_MS) * F.lit(1000000000).cast("long") + F.col(
        "event_id"
    )
    return (
        t.events.select(
            "event_type",
            "value",
            (F.col("ts_ms") / _BAR_MS).cast("long").alias("bar"),
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "bar")
        .agg(
            F.min_by("value", F.col("ord")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("ord")).alias("close"),
            F.count("*").cast("long").alias("n_ticks"),
            F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("volume_s"),
        )
    )


@query(
    "j_ts_seasonality",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      (epoch_ms(ts) % {_DAY_MS}) // 3600000 AS hour,
                      CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_s
               FROM events),
    hourly AS (SELECT event_type, hour,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(v_s) AS BIGINT) AS sum_s
               FROM e GROUP BY 1, 2),
    tot AS (SELECT event_type,
                   CAST(SUM(n) AS BIGINT) AS tot_n,
                   CAST(SUM(sum_s) AS BIGINT) AS tot_s
            FROM hourly GROUP BY 1)
    SELECT h.event_type, h.hour, h.n,
           FLOOR(h.sum_s * 1.0 / h.n / 100.0 + 0.5) / 10000 AS hour_mean,
           FLOOR((h.sum_s * 1.0 / h.n) / (t.tot_s * 1.0 / t.tot_n) * 1000000 + 0.5)
             / 1000000 AS ratio_to_mean
    FROM hourly h JOIN tot t ON h.event_type = t.event_type
    """,
)
def j_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: each hour's mean
    value and its ratio to the series mean (the diurnal-load curve
    behind traffic shaping and anomaly baselines — j_ts_anomaly's
    trailing z-score assumes stationarity; this measures how false
    that is per hour). Float discipline: per-row values floor to the
    1e-6 scaled-BIGINT grid, all sums are exact integers, and the
    display mean/ratio derive from those integer sums through an
    IDENTICAL division sequence on both engines (each step one IEEE
    op on equal operands — the 4l rule). Hour = epoch-ms modulo-day,
    timezone-free.

    100 TB: one (type, hour) hash agg — ≤ 24·|types| groups, map-side
    partials; the per-type totals derive from the hourly relation
    (never a second events scan) and broadcast back."""
    t = load(spark, sf_dir)
    hourly = (
        t.events.select(
            "event_type",
            ((F.col("ts_ms") % _DAY_MS) / 3600000).cast("long").alias("hour"),
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("v_s"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v_s").cast("long").alias("sum_s"),
        )
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.sum("sum_s").cast("long").alias("tot_s"),
    )
    hour_mean = F.floor(F.col("sum_s") * 1.0 / F.col("n") / 100.0 + F.lit(0.5)) / 10000
    ratio = (
        F.floor(
            (F.col("sum_s") * 1.0 / F.col("n"))
            / (F.col("tot_s") * 1.0 / F.col("tot_n"))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return hourly.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour",
        "n",
        hour_mean.alias("hour_mean"),
        ratio.alias("ratio_to_mean"),
    )


@query(
    "j_ts_changepoint",
    oracle="""
    WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms, event_id,
                      CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vs
               FROM events),
    m AS (SELECT event_type,
                 CAST(SUM(vs) AS BIGINT) // COUNT(*) AS mu,
                 CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY event_type),
    k AS (SELECT e.event_type, e.ts_ms, e.event_id, e.vs - m.mu AS d,
                 CAST(SUM(abs(e.vs - m.mu)) OVER (PARTITION BY e.event_type)
                      AS BIGINT) // MAX(m.n) OVER (PARTITION BY e.event_type)
                   AS madev
          FROM e JOIN m USING (event_type)),
    c AS (SELECT event_type, ts_ms, event_id, madev,
                 CAST(SUM(d - madev // 2) OVER w AS BIGINT) AS cum_hi,
                 CAST(SUM(-d - madev // 2) OVER w AS BIGINT) AS cum_lo
          FROM k
          WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id
                       ROWS UNBOUNDED PRECEDING)),
    s AS (SELECT event_type, ts_ms, event_id, madev,
                 cum_hi - LEAST(MIN(cum_hi) OVER w, 0) AS s_hi,
                 cum_lo - LEAST(MIN(cum_lo) OVER w, 0) AS s_lo
          FROM c
          WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id
                       ROWS UNBOUNDED PRECEDING))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MAX(GREATEST(s_hi, s_lo)) AS BIGINT) AS max_score,
           CAST(COUNT(*) FILTER (WHERE GREATEST(s_hi, s_lo) > 8 * madev)
                AS BIGINT) AS n_alarm_points,
           CAST(MIN(CASE WHEN GREATEST(s_hi, s_lo) > 8 * madev
                         THEN ts_ms END) AS BIGINT) AS first_alarm_ms
    FROM s GROUP BY event_type
    """,
)
def j_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change detection (Page 1954, public) per
    event-type series, ENTIRELY in exact integer arithmetic: values
    floor to a 1e-6 grid, the per-type mean and mean-absolute-deviation
    are integer divisions, the slack is madev/2, and the recursive
    CUSUM S_i = max(0, S_{i-1} + d_i) lowers to the WINDOW-EXPRESSIBLE
    identity S_i = cum_i - min(0, cum_1..i) (the virtual empty prefix
    supplies the 0) — a running sum minus its
    running minimum, two frames over ONE exchange, instead of an
    unexpressible per-row recursion. Alarms fire where either side
    exceeds 8x madev; the relation reports per-type alarm mass and
    first-alarm time (bounded output at any series length).

    Parity precondition (r9 ADVICE): the integer divisions use Spark
    `div` (truncation toward zero) while the oracle uses DuckDB `//`
    (floor) — identical ONLY for non-negative numerators. SUM(vs) ≥ 0
    holds because FIXTURES.md pins events.value in (0, ~500); feeding
    a series with negative values requires switching both engines to
    the shared sign-safe floor form floordiv()/sql_floordiv()
    (functions/exprs.py) — j_kanon_check is the lowered example.

    100 TB: one shuffle keyed by the series id carries scaled BIGINTs;
    per-series state is the window sort, so billions of independent
    series parallelize perfectly (the skew risk is one giant series,
    where the gapfill/range-bucket split applies). Integer end-to-end
    means no accumulation-order ulp exists on either engine."""
    t = load(spark, sf_dir)
    vs = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    e = t.events.select(
        "event_type", "ts_ms", "event_id", vs.alias("vs")
    )
    m = e.groupBy("event_type").agg(
        F.expr("CAST(SUM(vs) AS BIGINT) div COUNT(*)").alias("mu"),
        F.count("*").cast("long").alias("n"),
    )
    k = (
        e.join(F.broadcast(m), "event_type")
        .select("event_type", "ts_ms", "event_id", (F.col("vs") - F.col("mu")).alias("d"))
    )
    k = k.withColumn(
        "madev",
        F.expr(
            "CAST(SUM(abs(d)) OVER (PARTITION BY event_type) AS BIGINT) div "
            "COUNT(*) OVER (PARTITION BY event_type)"
        ).cast("long"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = k.select(
        "event_type",
        "ts_ms",
        "event_id",
        "madev",
        F.sum(F.col("d") - F.expr("madev div 2")).over(w).cast("long").alias("cum_hi"),
        F.sum(-F.col("d") - F.expr("madev div 2")).over(w).cast("long").alias("cum_lo"),
    )
    s = c.select(
        "event_type",
        "ts_ms",
        "event_id",
        "madev",
        (F.col("cum_hi") - F.least(F.min("cum_hi").over(w), F.lit(0))).alias("s_hi"),
        (F.col("cum_lo") - F.least(F.min("cum_lo").over(w), F.lit(0))).alias("s_lo"),
    )
    score = F.greatest(F.col("s_hi"), F.col("s_lo"))
    alarm = score > 8 * F.col("madev")
    return s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_points"),
        F.max(score).cast("long").alias("max_score"),
        F.count(F.when(alarm, 1)).cast("long").alias("n_alarm_points"),
        F.min(F.when(alarm, F.col("ts_ms"))).cast("long").alias("first_alarm_ms"),
    )


@query(
    "j_ts_trend",
    oracle="""
    WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms,
                      CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
               FROM events),
    t0 AS (SELECT event_type, CAST(MIN(ts_ms) AS BIGINT) AS tmin
           FROM e GROUP BY event_type),
    xy AS (SELECT e.event_type, (e.ts_ms - t0.tmin) // 1000 AS x, e.y
           FROM e JOIN t0 USING (event_type)),
    s AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM xy GROUP BY event_type)
    SELECT event_type, n,
           FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 86400 * 1000000 + 0.5) / 1000000 AS slope_cents_per_day,
           FLOOR((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) * 100 + 0.5) / 100 AS intercept_cents
    FROM s
    """,
)
def j_ts_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS linear trend (slope + intercept) with EXACT
    integer sufficient statistics: time re-centers to seconds since
    the series start, values floor to cents, and n/Sx/Sy/Sxy/Sxx are
    BIGINT sums — so the five statistics are accumulation-order-free,
    and the closed-form slope (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) is a
    fixed sequence of IEEE double ops on identical operands in both
    engines. The re-centering is what keeps x^2 sums in 64-bit range
    (raw epoch-ms squared overflows); at 10^4x series length the
    statistics upgrade to DECIMAL(38) sums, same shape.

    Plan: one tiny min-per-type aggregate broadcast back, then ONE
    map-side-partial hash agg — two corpus scans, zero windows, zero
    sorts. The trend/intercept land as the drift features of
    j_feature_snapshot-style training sets, and at 100 TB the same
    two-pass shape holds per (series x day) partition."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "event_type",
        "ts_ms",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    t0 = e.groupBy("event_type").agg(F.min("ts_ms").cast("long").alias("tmin"))
    xy = e.join(F.broadcast(t0), "event_type").select(
        "event_type",
        F.expr("(ts_ms - tmin) div 1000").alias("x"),
        "y",
    )
    s = xy.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    intercept = (syd - slope * sxd) / nd
    return s.select(
        "event_type",
        "n",
        rnd(slope * 86400, 6).alias("slope_cents_per_day"),
        rnd(intercept, 2).alias("intercept_cents"),
    )


@query(
    "j_burstiness",
    oracle=f"""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY event_type, CAST(ts AS DATE)),
    s AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(n) AS BIGINT) AS s1,
                 CAST(SUM(n * n) AS BIGINT) AS s2
          FROM daily GROUP BY event_type)
    SELECT event_type, n_days, s1 AS n_events,
           {sql_rnd("s1 * 1.0 / n_days", 6)} AS mean_daily,
           CAST((num // den) * 1000000
                + ((num % den) * 1000000) // den AS BIGINT) / 1000000.0 AS fano
    FROM (SELECT *,
                 CAST(n_days AS HUGEINT) * s2
                   - CAST(s1 AS HUGEINT) * s1 AS num,
                 CAST(n_days AS HUGEINT) * s1 AS den
          FROM s)
    """,
)
def j_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type traffic burstiness: the Fano factor Var/Mean of the
    daily event count (Fano 1947, public; index-of-dispersion in queue
    audits). Poisson arrivals sit at 1.0; bot storms and batch
    replays push it far above — the load-shape statistic capacity
    planning and anomaly thresholds start from, complementing
    j_ts_anomaly's pointwise z-scores with one per-series scalar.

    Exact-integer identity: with D observed days, S1 = Σn, S2 = Σn²,
    Fano = (D·S2 − S1²)/(D·S1) — the numerator is ≥ 0 by
    Cauchy–Schwarz, so the scaled floor-divisions are sign-safe
    (`div` == `//`), and S1/S2 are BIGINT sums a map-side partial agg
    computes exactly at any order. The products run in 128-bit space
    (Spark DECIMAL(38,0), DuckDB HUGEINT — r10 ADVICE: BIGINT wrapped
    silently once S1 ≈ 3e9), and the ×1e6 scaling is split into
    integer + remainder parts, (num div den)·1e6 + (num mod den)·1e6
    div den, so no intermediate exceeds ~1e25 — exact over the FULL
    BIGINT domain of S1/S2 rather than up to a documented cliff.
    Days with zero events are outside
    the observed-day frame by construction (documented: this is the
    conditional-on-activity Fano; a zero-padded variant would join
    the j_gapfill day spine first).

    Plan: two hash aggs — (type, day) then type — both with map-side
    partials; output is |types| rows at any scale."""
    t = load(spark, sf_dir)
    daily = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("n"))
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    nd = s.withColumns(
        {
            "num": F.expr(
                "CAST(n_days AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1"
            ),
            "den": F.expr("CAST(n_days AS DECIMAL(38,0)) * s1"),
        }
    )
    return nd.select(
        "event_type",
        "n_days",
        F.col("s1").alias("n_events"),
        rnd(F.col("s1") * 1.0 / F.col("n_days"), 6).alias("mean_daily"),
        (
            F.expr("(num div den) * 1000000 + ((num % den) * 1000000) div den")
            .cast("long")
            / F.lit(1000000.0)
        ).alias("fano"),
    )


@query(
    "j_drift_timeslices",
    oracle=f"""
    WITH ev AS (SELECT epoch_ms(ts) // 86400000 AS day_idx,
                       CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v6
                FROM events),
    mm AS (SELECT CAST(MIN(v6) AS BIGINT) AS lo, CAST(MAX(v6) AS BIGINT) AS hi,
                  CAST(COUNT(*) AS BIGINT) AS big_n
           FROM ev),
    eb AS (SELECT day_idx,
                  ((v6 - mm.lo) * 10) // (mm.hi - mm.lo + 1) AS bucket
           FROM ev CROSS JOIN mm),
    g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS gc FROM eb GROUP BY bucket),
    dtot AS (SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS nd
             FROM eb GROUP BY day_idx),
    o AS (SELECT day_idx, bucket, CAST(COUNT(*) AS BIGINT) AS oc
          FROM eb GROUP BY day_idx, bucket),
    grid AS (SELECT d.day_idx, d.nd, g.bucket, g.gc, COALESCE(o.oc, 0) AS oc,
                    mm.big_n
             FROM dtot d CROSS JOIN g
             LEFT JOIN o ON o.day_idx = d.day_idx AND o.bucket = g.bucket
             CROSS JOIN mm),
    terms AS (SELECT day_idx, nd, bucket, gc, oc, big_n,
                     CAST(FLOOR(
                       CAST((CAST(oc AS HUGEINT) * big_n - CAST(nd AS HUGEINT) * gc)
                            * (CAST(oc AS HUGEINT) * big_n - CAST(nd AS HUGEINT) * gc)
                            AS DOUBLE)
                       / CAST(CAST(nd AS HUGEINT) * gc * big_n AS DOUBLE)
                       * 1000000 + 0.5) AS BIGINT) AS term6,
                     ABS(CAST(oc AS HUGEINT) * big_n - CAST(nd AS HUGEINT) * gc) AS dev
              FROM grid),
    ranked AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY day_idx
                                         ORDER BY dev DESC, bucket) AS rk
               FROM terms)
    SELECT t.day_idx, t.nd AS n_events,
           CAST(SUM(t.term6) AS BIGINT) / 1000000.0 AS chi2,
           MIN(r.bucket) AS top_bucket,
           {sql_rnd("MIN(ABS(r.oc * 1.0 / r.nd - r.gc * 1.0 / r.big_n))", 6)}
             AS top_dev
    FROM terms t
    JOIN ranked r ON r.day_idx = t.day_idx AND r.rk = 1
    GROUP BY t.day_idx, t.nd
    """,
)
def j_drift_timeslices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distribution drift of the event `value` column against
    the whole-corpus distribution — the ingestion-monitoring twin of
    j_ks_lengths (which compares SOURCES): a day whose χ² spikes is a
    collector change, an outage backfill, or an upstream schema shift,
    caught before it contaminates a training snapshot. Bins are ten
    global equi-WIDTH buckets over the 1e-6-quantized value grid (not
    equi-depth: boundaries derive from MIN/MAX — two exact BIGINTs —
    so no corpus-wide quantile window exists anywhere in the plan).

    EXACT pipeline: per-value quantize → integer bucket assignment
    (pure BIGINT floor-div; operands non-negative) → χ² per (day,
    bucket) as (oN − n·g)²/(n·g·N) with the square in
    DECIMAL(38,0)/HUGEINT (oN ~ 10²² at petabyte counts), each term
    floored to the 1e-6 grid as a deterministic double, summed in
    exact integer arithmetic (the order-free-sum convention), one
    scaled division at display. `top_bucket` is the max-|deviation|
    bucket under a total order (dev DESC, bucket) — no engine
    arg_max tie behavior.

    Plan: one narrow scan map (quantize + day index) + a broadcast
    2-value MIN/MAX agg; bucket counts collapse map-side to ≤10 rows
    per day per task; the day×bucket grid, χ² terms, and the ranked
    deviation window all run on |days|·10 metadata rows. Nothing
    wider than (day, bucket) ever shuffles."""
    t = load(spark, sf_dir)
    ev = t.events.select(
        F.expr("ts_ms div 86400000").alias("day_idx"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("v6"),
    )
    mm = F.broadcast(
        ev.agg(F.min("v6").alias("lo"), F.max("v6").alias("hi"))
    )
    eb = ev.crossJoin(mm).select(
        "day_idx",
        F.expr("((v6 - lo) * 10) div (hi - lo + 1)").alias("bucket"),
    )
    o = eb.groupBy("day_idx", "bucket").agg(F.count("*").cast("long").alias("oc"))
    return drift_from_counts(o)


def drift_from_counts(o: DataFrame) -> DataFrame:
    """The j_drift_timeslices rollup from the (day_idx, bucket, oc)
    count matrix — factored out so the streaming drift monitor
    (streaming/ingest.drift_monitor_sink) can serve the IDENTICAL
    relation from its accumulated state: global bucket masses, day
    totals, and the corpus total are all re-aggs of the matrix, so
    the streamed view and the batch audit share every line of the
    chi-square arithmetic by construction."""
    # the count matrix feeds four re-aggs and the grid left-join; it is
    # metadata-scale (|days|x10) and its subtree contains the corpus
    # shuffle — exactly the SCALE.md 4r cache rule's persist case
    o = o.persist()
    g = F.broadcast(o.groupBy("bucket").agg(F.sum("oc").cast("long").alias("gc")))
    dtot = o.groupBy("day_idx").agg(F.sum("oc").cast("long").alias("nd"))
    tot = F.broadcast(o.agg(F.sum("oc").cast("long").alias("big_n")))
    grid = (
        dtot.crossJoin(g)
        .join(o, ["day_idx", "bucket"], "left")
        .crossJoin(tot)
        .select(
            "day_idx",
            "nd",
            "bucket",
            "gc",
            F.coalesce(F.col("oc"), F.lit(0)).cast("long").alias("oc"),
            "big_n",
        )
    )
    dec = "decimal(38,0)"
    # widen BEFORE the multiply: oc*N overflows BIGINT past ~10^19 and
    # Spark would wrap where DuckDB errors — the operands go to decimal
    # first so both engines run the identical exact arithmetic
    num = F.col("oc").cast(dec) * F.col("big_n") - F.col("nd").cast(dec) * F.col("gc")
    terms = grid.select(
        "day_idx",
        "nd",
        "bucket",
        "gc",
        "oc",
        "big_n",
        F.floor(
            (num * num).cast("double")
            / (F.col("nd").cast(dec) * F.col("gc") * F.col("big_n")).cast("double")
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("term6"),
        F.abs(
            F.col("oc").cast(dec) * F.col("big_n")
            - F.col("nd").cast(dec) * F.col("gc")
        ).alias("dev"),
    )
    ranked = terms.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("day_idx").orderBy(F.col("dev").desc(), F.col("bucket"))
        )
        .alias("rk"),
    ).where(F.col("rk") == 1)
    r = ranked.select(
        F.col("day_idx").alias("r_day"),
        F.col("bucket").alias("top_bucket"),
        rnd(
            F.abs(
                F.col("oc") * 1.0 / F.col("nd") - F.col("gc") * 1.0 / F.col("big_n")
            ),
            6,
        ).alias("top_dev"),
    )
    return (
        terms.groupBy("day_idx", "nd")
        .agg(F.sum("term6").cast("long").alias("s6"))
        .join(r, F.col("day_idx") == F.col("r_day"))
        .select(
            "day_idx",
            F.col("nd").alias("n_events"),
            (F.col("s6") / F.lit(1000000.0)).alias("chi2"),
            "top_bucket",
            "top_dev",
        )
    )


@query(
    "j_ts_autocorr",
    oracle="""
    WITH ev AS (SELECT event_type,
                       CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS x,
                       LEAD(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                         OVER (PARTITION BY event_type
                               ORDER BY epoch_ms(ts), event_id) AS y
                FROM events),
    p AS (SELECT event_type, x, y FROM ev WHERE y IS NOT NULL),
    m AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM p GROUP BY event_type),
    d AS (SELECT event_type, n,
                 n * sxy - CAST(sx AS HUGEINT) * sy AS num,
                 n * sxx - CAST(sx AS HUGEINT) * sx AS d1,
                 n * syy - CAST(sy AS HUGEINT) * sy AS d2
          FROM m)
    SELECT event_type, n AS n_pairs,
           CASE WHEN d1 > 0 AND d2 > 0
                THEN FLOOR(CAST(num AS DOUBLE)
                           / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000
                ELSE NULL END AS autocorr
    FROM d
    """,
)
def j_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the event value series per event_type —
    the memory/whiteness diagnostic that decides whether j_ts_ewma's
    smoothing and j_ts_anomaly's trailing windows are even meaningful
    (white-noise values make both vacuous; high lag-1 memory makes the
    anomaly thresholds too tight). Completes the correlation-recipe
    family into time series: j_feature_corr correlates two FEATURES,
    j_rolling_corr two SERIES, this a series with its own shifted
    self.

    EXACT: values quantize to the 1e-6 grid BEFORE pairing (order-free
    integers from there); the lag pairing is a lead() over the
    (ts_ms, event_id) total order; moments in DECIMAL(38,0)/HUGEINT
    (n·Σx² passes 2^63 near 10⁹ events/type); r = IEEE sqrt + one
    floored division on identical integers.

    Plan: ONE event_type-keyed exchange serves the lead window AND the
    moment agg (same partitioning); output is |event_types| rows."""
    t = load(spark, sf_dir)
    v6 = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts_ms", "event_id")
    ev = t.events.select(
        "event_type", v6.alias("x"), F.lead(v6).over(w).alias("y")
    ).where(F.col("y").isNotNull())
    dec = "decimal(38,0)"
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sxx"),
        F.sum((F.col("y").cast(dec) * F.col("y"))).alias("syy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    d1 = F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    d2 = F.col("n") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy").cast(dec)
    r = (
        F.floor(
            num.cast("double")
            / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double")))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.when((d1 > 0) & (d2 > 0), r).alias("autocorr"),
    )


# Cross-correlation lags 0..L days (click leads, view trails).
_XC_LAGS = 7
_XC_MIN = 5


@query(
    "j_ts_crosscorr",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS x,
             CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    lg AS (SELECT CAST(unnest(range(0, {_XC_LAGS + 1})) AS BIGINT) AS lag),
    p AS (SELECT lg.lag, a.x, b.y
          FROM lg CROSS JOIN d a
          JOIN d b ON b.day = a.day - CAST(lg.lag AS INTEGER)),
    s AS (SELECT lag,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM p GROUP BY lag)
    SELECT lag, n,
           CASE WHEN n >= {_XC_MIN}
                 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN FLOOR((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx) * 1.0
                                  * (n * syy - sy * sy))
                           * 1000000 + 0.5) / 1000000
           END AS xcorr
    FROM s
    """,
)
def j_ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag CROSS-correlation between the click and view daily
    series at lags 0..{L} days (corr(x_t, y_(t-lag)) — does view
    volume LEAD click volume, and by how many days?) — the
    j_rolling_corr sibling along the other axis: rolling corr trends
    co-movement at lag 0 through time; this relation scans the lag
    axis once over the whole span, which is how pipeline monitors
    locate ingestion lag and cause->effect offsets between metric
    streams (public textbook cross-correlation function, e.g. Box &
    Jenkins).

    EXACT: the same five BIGINT sufficient statistics as
    j_rolling_corr, per lag; the lagged pairing is an exact DATE
    equi-join (day - lag), so gapped calendars pair correctly instead
    of sliding over missing rows; ONE sqrt + ONE division on exact
    integers per lag, floored 1e-6; degenerate lags (< {M} pairs or
    zero variance) yield NULL.

    Plan: one (day) hash agg collapses events to |days| rows,
    PERSISTED across its two join legs (the j_cms_sketch two-consumer
    rule — without it each leg re-scans events); the lag grid is
    {L}+1 broadcast rows and every join key is calendar-sized. At
    100 TB the only corpus-touching work is the single day agg."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
            "event_type",
        )
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("x"),
            F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("y"),
        )
    )
    d.persist()  # two consumers below: the x leg and the lagged y leg
    lg = spark.range(0, _XC_LAGS + 1).select(F.col("id").cast("long").alias("lag"))
    a = F.broadcast(lg).crossJoin(
        d.select(F.col("day").alias("day_a"), "x")
    )
    p = a.join(
        d.select(F.col("day").alias("day_b"), "y"),
        F.col("day_b") == F.date_sub(F.col("day_a"), F.col("lag").cast("int")),
    )
    s = p.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = F.floor(num / F.sqrt(vx * 1.0 * vy) * 1000000 + F.lit(0.5)) / 1000000
    return s.select(
        "lag",
        "n",
        F.when((F.col("n") >= _XC_MIN) & (vx > 0) & (vy > 0), corr).alias("xcorr"),
    )


j_ts_crosscorr.__doc__ = j_ts_crosscorr.__doc__.replace("{L}", str(_XC_LAGS)).replace(
    "{M}", str(_XC_MIN)
)


# Ljung-Box over daily total volume, lags 1.._LB_LAGS; chi-square 0.05
# critical values for df = 1..7 (public tables), compared per depth.
_LB_LAGS = 7
_LB_CRIT = (3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067)
_LB_CRIT_SQL = "CASE lag " + " ".join(
    f"WHEN {k + 1} THEN {c!r}" for k, c in enumerate(_LB_CRIT)
) + " END"


@query(
    "j_ljung_box",
    oracle=f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS x
               FROM events GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    lg AS (SELECT CAST(unnest(range(1, {_LB_LAGS + 1})) AS BIGINT) AS lag),
    p AS (SELECT lg.lag, a.x AS x, b.x AS y
          FROM lg CROSS JOIN d a
          JOIN d b ON b.day = a.day - CAST(lg.lag AS INTEGER)),
    s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS np,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM p GROUP BY lag),
    r AS (SELECT lag, np,
                 CASE WHEN np * sxx - CAST(sx AS HUGEINT) * sx > 0
                       AND np * syy - CAST(sy AS HUGEINT) * sy > 0
                      THEN FLOOR(CAST(np * sxy - CAST(sx AS HUGEINT) * sy
                                      AS DOUBLE)
                                 / sqrt(CAST(np * sxx
                                             - CAST(sx AS HUGEINT) * sx
                                             AS DOUBLE)
                                        * (np * syy
                                           - CAST(sy AS HUGEINT) * sy))
                                 * 1000000 + 0.5) / 1000000
                      ELSE 0.0 END AS rho
          FROM s),
    tm AS (SELECT lag, np, rho,
                  CAST(FLOOR(rho * rho * 1000000000000 + 0.5) AS BIGINT)
                    AS t12
           FROM r),
    cm AS (SELECT lag, np, rho,
                  CAST(SUM((t12 * 1000000)
                           // ((SELECT n FROM nn) - lag))
                       OVER (ORDER BY lag) AS BIGINT) AS c18
           FROM tm)
    SELECT lag, np AS n_pairs, rho,
           FLOOR(CAST((SELECT n FROM nn) AS DOUBLE)
                 * ((SELECT n FROM nn) + 2) * c18 / 1e18 * 10000 + 0.5)
             / 10000 AS q_stat,
           FLOOR(CAST((SELECT n FROM nn) AS DOUBLE)
                 * ((SELECT n FROM nn) + 2) * c18 / 1e18 * 10000 + 0.5)
             / 10000 <= {_LB_CRIT_SQL} AS white_noise
    FROM cm
    """,
)
def j_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (public 1978 statistic) on the daily
    total event volume: Q(h) = n(n+2) SUM_{{k<=h}} rho_k^2/(n-k) at
    every depth h = 1..{L}, each compared against its own chi-square
    critical value — the IS-THERE-ANY-STRUCTURE gate that closes the
    serial-dependence shelf (j_ts_autocorr reads lag-1, j_ts_crosscorr
    scans the lead-lag axis, j_runs_test checks sign randomness; Q
    aggregates ALL lags into one white-noise verdict, the standard
    residual diagnostic after any trend/seasonality fit). Gapped-
    calendar variant: each rho_k is the exact-paired correlation over
    the (day, day-k) DATE equi-join (the j_ts_crosscorr device), n is
    the day count.

    EXACT: per-lag sufficient statistics are BIGINT/HUGEINT; rho_k
    pre-rounds 1e-6; each rho^2/(n-k) term becomes the exact integer
    (floor(rho^2*1e12+0.5) * 1e6) div (n-k) summed in BIGINT via ONE
    ordered prefix window (no engine-order float sums); Q rounds 1e-4
    BEFORE the per-depth critical compare.

    Plan: one day agg over the event scan (persisted), then
    everything is the {L}-row lag grid — broadcast joins and one
    unpartitioned {L}-row window."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("x"))
    )
    d.persist()  # consumers: n fold + two join legs per lag
    nn = d.agg(F.count("*").cast("long").alias("n"))
    lg = spark.range(1, _LB_LAGS + 1).select(F.col("id").cast("long").alias("lag"))
    a = F.broadcast(lg).crossJoin(d.select(F.col("day").alias("day_a"), F.col("x")))
    p = a.join(
        d.select(F.col("day").alias("day_b"), F.col("x").alias("y")),
        F.col("day_b") == F.date_sub(F.col("day_a"), F.col("lag").cast("int")),
    )
    dec = "decimal(38,0)"
    s = p.groupBy("lag").agg(
        F.count("*").cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    d1 = F.col("np").cast(dec) * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    d2 = F.col("np").cast(dec) * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")
    num = F.col("np").cast(dec) * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    rho = F.when(
        (d1 > 0) & (d2 > 0),
        F.floor(
            num.cast("double") / F.sqrt(d1.cast("double") * d2.cast("double"))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000,
    ).otherwise(F.lit(0.0))
    tm = s.select(
        "lag",
        "np",
        rho.alias("rho"),
    ).select(
        "lag",
        "np",
        "rho",
        F.floor(F.col("rho") * F.col("rho") * F.lit(1000000000000.0) + F.lit(0.5))
        .cast("long")
        .alias("t12"),
    )
    wc = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    cm = tm.crossJoin(F.broadcast(nn)).select(
        "lag",
        "np",
        "rho",
        "n",
        F.sum(F.expr("(t12 * 1000000) div (n - lag)"))
        .over(wc)
        .cast("long")
        .alias("c18"),
    )
    q = rnd(
        F.col("n").cast("double") * (F.col("n") + 2) * F.col("c18") / F.lit(1e18),
        4,
    )
    crit = F.element_at(
        F.array(*[F.lit(c) for c in _LB_CRIT]), F.col("lag").cast("int")
    )
    return cm.select(
        "lag",
        F.col("np").alias("n_pairs"),
        "rho",
        q.alias("q_stat"),
        (q <= crit).alias("white_noise"),
    )


# Mann-Kendall / Theil-Sen: two-sided 0.05 normal critical value
# (public tables) shared with the runs/z shelf.
_MK_CRIT = 1.96

# z expression shared by the Spark and SQL sides of j_mann_kendall:
# continuity-corrected S over sqrt(Var S), Var S carried as the exact
# integer 18*Var (the tie-corrected Kendall variance numerator).
_MK_Z_SQL = sql_rnd(
    "CAST(CASE WHEN s_stat > 0 THEN s_stat - 1 "
    "          WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS DOUBLE) "
    "/ sqrt(var_s18 / 18.0)",
    6,
)


@query(
    "j_mann_kendall",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 CASE WHEN b.v > a.v THEN 1
                      WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
          FROM d a JOIN d b
            ON b.event_type = a.event_type AND b.day > a.day),
    s AS (SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM p GROUP BY 1),
    tt AS (SELECT event_type,
                  CAST(COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
                    AS tie18
           FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM d GROUP BY 1, 2)
           GROUP BY 1),
    nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM d GROUP BY 1),
    j AS (SELECT nd.event_type, nd.n_days, s.n_pairs, s.s_stat,
                 nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                   - tt.tie18 AS var_s18
          FROM nd JOIN s ON s.event_type = nd.event_type
                 JOIN tt ON tt.event_type = nd.event_type)
    SELECT event_type, n_days, n_pairs, s_stat, var_s18,
           CASE WHEN var_s18 > 0 THEN {_MK_Z_SQL} END AS z_score,
           CASE WHEN var_s18 > 0 THEN ABS({_MK_Z_SQL}) >= {_MK_CRIT} END
             AS trending
    FROM j
    """,
)
def j_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945 / Kendall 1975, public) on
    each event type's daily-volume series — the nonparametric IS-IT-
    MONOTONE gate beside the shelf's descriptive fits: j_ts_trend
    reports an OLS slope, j_runs_test checks sign independence, and MK
    asks the significance question a 100 TB volume dashboard actually
    needs answered before alerting on "traffic is drifting". S sums
    sign(v_j - v_i) over all day pairs i<j; Var S carries the standard
    tie correction SUM t(t-1)(2t+5); z applies the +/-1 continuity
    correction.

    EXACT: daily volumes are BIGINT counts, S / n / tie terms are pure
    integer arithmetic, and Var S is carried as the exact integer
    18*Var (var_s18) to the one IEEE z sequence, rounded 1e-6 BEFORE
    the |z| >= 1.96 compare; NULL when the variance degenerates (all
    days tied).

    Plan: ONE (event_type, day) hash agg collapses the corpus to a
    |types| x |days| relation (persisted — four consumers); the pair
    "join" is a broadcast hash self-join on event_type filtered to
    day_b > day_a (calendar-squared rows, metadata-scale), and the
    sign / tie / day-count rollups plus the final 5-row joins never
    touch the corpus again. At 100 TB only the first agg scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    d.persist()  # consumers: both pair-join legs, tie histogram, day count
    p = (
        d.select("event_type", F.col("day").alias("day_a"), F.col("v").alias("va"))
        .join(
            F.broadcast(
                d.select(
                    "event_type", F.col("day").alias("day_b"), F.col("v").alias("vb")
                )
            ),
            "event_type",
        )
        .where(F.col("day_b") > F.col("day_a"))
    )
    sgn = (
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
    )
    s = p.groupBy("event_type").agg(
        F.sum(sgn).cast("long").alias("s_stat"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    c = F.col("c")
    tt = (
        d.groupBy("event_type", "v")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("event_type")
        .agg(
            F.coalesce(F.sum(c * (c - 1) * (2 * c + 5)), F.lit(0))
            .cast("long")
            .alias("tie18")
        )
    )
    nd = d.groupBy("event_type").agg(F.count("*").cast("long").alias("n_days"))
    n = F.col("n_days")
    j = (
        nd.join(F.broadcast(s), "event_type")
        .join(F.broadcast(tt), "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            "s_stat",
            (n * (n - 1) * (2 * n + 5) - F.col("tie18")).alias("var_s18"),
        )
    )
    adj = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(F.lit(0))
    )
    z = rnd(adj.cast("double") / F.sqrt(F.col("var_s18") / F.lit(18.0)), 6)
    ok = F.col("var_s18") > 0
    return j.select(
        "event_type",
        "n_days",
        "n_pairs",
        "s_stat",
        "var_s18",
        F.when(ok, z).alias("z_score"),
        F.when(ok, F.abs(z) >= _MK_CRIT).alias("trending"),
    )


@query(
    "j_sen_slope",
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 CAST(FLOOR(CAST(b.v - a.v AS DOUBLE) * 1000000.0
                            / (b.day - a.day) + 0.5) AS BIGINT) AS slope6
          FROM d a JOIN d b
            ON b.event_type = a.event_type AND b.day > a.day),
    r AS (SELECT event_type, slope6,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY slope6) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS k
          FROM p)
    SELECT event_type,
           CAST(MAX(k) AS BIGINT) AS n_pairs,
           CAST(MAX(CASE WHEN rn = (k + 1) // 2 THEN slope6 END) AS BIGINT)
             AS med_lo,
           CAST(MAX(CASE WHEN rn = (k + 2) // 2 THEN slope6 END) AS BIGINT)
             AS med_hi,
           (MAX(CASE WHEN rn = (k + 1) // 2 THEN slope6 END)
            + MAX(CASE WHEN rn = (k + 2) // 2 THEN slope6 END))
             / 2000000.0 AS sen_slope
    FROM r GROUP BY 1
    """,
)
def j_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope estimator (Theil 1950 / Sen 1968, public) per
    event type: the median of all pairwise day-to-day slopes
    (v_j - v_i)/(day_j - day_i) — the robust trend MAGNITUDE that
    partners j_mann_kendall's significance verdict (MK says WHETHER
    volume drifts, Sen says HOW FAST, immune to the outlier days that
    bend j_ts_trend's least-squares line). Median of an even pair
    count averages the two middle order statistics.

    EXACT: each slope is pinned to the 1e-6 grid as the integer
    floor(dv * 1e6 / ddays + 0.5) — dv, ddays are exact BIGINTs, the
    scale/divide/floor is one fixed IEEE sequence — so ranking,
    median selection, and the final (med_lo + med_hi) / 2e6 are exact
    integer arithmetic plus one deterministic division; no rounding
    of an accumulated float anywhere.

    Plan: the j_mann_kendall skeleton — ONE (event_type, day) corpus
    agg, a broadcast hash self-join onto the calendar-squared pair
    grid, then ONE rank window per event_type over its ~|days|^2/2
    slopes (metadata-scale partitions) and a 5-row conditional-agg
    median pick. At 100 TB only the first agg scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    p = (
        d.select("event_type", F.col("day").alias("day_a"), F.col("v").alias("va"))
        .join(
            F.broadcast(
                d.select(
                    "event_type", F.col("day").alias("day_b"), F.col("v").alias("vb")
                )
            ),
            "event_type",
        )
        .where(F.col("day_b") > F.col("day_a"))
        .select(
            "event_type",
            F.floor(
                (F.col("vb") - F.col("va")).cast("double")
                * F.lit(1000000.0)
                / F.datediff(F.col("day_b"), F.col("day_a"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("slope6"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope6")
    ww = Window.partitionBy("event_type")
    r = p.select(
        "event_type",
        "slope6",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(ww).alias("k"),
    )
    lo = F.max(F.when(F.col("rn") == F.expr("(k + 1) div 2"), F.col("slope6")))
    hi = F.max(F.when(F.col("rn") == F.expr("(k + 2) div 2"), F.col("slope6")))
    return r.groupBy("event_type").agg(
        F.max("k").cast("long").alias("n_pairs"),
        lo.cast("long").alias("med_lo"),
        hi.cast("long").alias("med_hi"),
        ((lo + hi) / F.lit(2000000.0)).alias("sen_slope"),
    )


@query(
    "j_kaplan_meier",
    oracle="""
    WITH u AS (SELECT user_id,
                      CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE))
                           AS BIGINT) AS dur,
                      MAX(CAST(ts AS DATE)) AS ld
               FROM events GROUP BY 1),
    g AS (SELECT MAX(ld) AS gmax, CAST(COUNT(*) AS BIGINT) AS tot FROM u),
    e AS (SELECT dur,
                 CAST(SUM(CASE WHEN ld < gmax THEN 1 ELSE 0 END) AS BIGINT)
                   AS d,
                 CAST(SUM(CASE WHEN ld < gmax THEN 0 ELSE 1 END) AS BIGINT)
                   AS c,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(MAX(tot) AS BIGINT) AS tot
          FROM u CROSS JOIN g GROUP BY 1),
    r AS (SELECT dur, d, c,
                 tot - CAST(COALESCE(SUM(cnt) OVER (ORDER BY dur
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS n_risk
          FROM e),
    t AS (SELECT *,
                 CASE WHEN d > 0 AND d < n_risk
                      THEN CAST(FLOOR(LN(CAST(n_risk - d AS DOUBLE) / n_risk)
                                      * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END AS ln6,
                 CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS z0
          FROM r),
    s AS (SELECT *,
                 CAST(SUM(ln6) OVER (ORDER BY dur) AS BIGINT) AS l6,
                 CAST(MAX(z0) OVER (ORDER BY dur) AS BIGINT) AS anyzero
          FROM t)
    SELECT dur AS dur_days, n_risk, d AS n_events, c AS n_censored,
           CASE WHEN anyzero = 1 THEN 0.0
                ELSE FLOOR(EXP(l6 / 1000000.0) * 1000000 + 0.5) / 1000000
           END AS survival
    FROM s
    """,
)
def j_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958, public) over USER LIFETIMES: duration = days between a
    user's first and last event, right-censored when the last event
    falls on the global final observed day (the user may still be
    alive past the window). The retention curve every event pipeline
    eventually asks for — S(t) = P(lifetime > t) with the censoring
    handled correctly, which a naive histogram of lifetimes gets
    wrong. S(t) = PROD_{t_i <= t, d_i > 0} (1 - d_i / n_i) with n_i
    the at-risk count (users whose duration >= t_i).

    EXACT: durations / death / censor / at-risk counts are pure
    integer arithmetic (the at-risk column is total minus an exact
    preceding-frame cumulative count); each log-survival factor
    ln((n-d)/n) is floored ONCE to a 1e-6-grid BIGINT, the cumulative
    product is an exact integer window SUM of those grid points, and
    the displayed survival is one exp + round on the integer sum —
    the scaled-BIGINT summation convention, so no engine-order float
    accumulation anywhere. d_i = n_i (everyone at risk dies) pins
    survival to exactly 0.0 from that duration on via a cumulative
    flag, never through exp(ln(0)).

    Plan: ONE (user_id) corpus hash agg collapses events to |users|
    rows; the global max-day/total fold is a 1-row broadcast; the
    duration table is <= |distinct lifetimes| (calendar-bounded, <=
    31 rows here) so the unpartitioned windows run on a metadata-
    scale relation. At 100 TB only the user agg scales — and it is
    the same (user_id) shuffle class every sessionization qid already
    pays."""
    t = load(spark, sf_dir)
    day = F.timestamp_millis(F.col("ts_ms")).cast("date")
    u = (
        t.events.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("day"), F.min("day")).cast("long").alias("dur"),
            F.max("day").alias("ld"),
        )
    )
    u.persist()  # consumers: the 1-row gmax/total fold and the duration agg
    return km_from_lifetimes(u)


def km_from_lifetimes(u: DataFrame) -> DataFrame:
    """The j_kaplan_meier rollup over a per-user (dur long, ld DATE)
    lifetime relation — shared verbatim with the streaming lifetime
    monitor's km_current_view (the drift_from_counts pattern)."""
    g = u.agg(F.max("ld").alias("gmax"), F.count("*").cast("long").alias("tot"))
    e = (
        u.crossJoin(F.broadcast(g))
        .groupBy("dur")
        .agg(
            F.sum((F.col("ld") < F.col("gmax")).cast("long"))
            .cast("long")
            .alias("d"),
            F.sum((F.col("ld") >= F.col("gmax")).cast("long"))
            .cast("long")
            .alias("c"),
            F.count("*").cast("long").alias("cnt"),
            F.max("tot").cast("long").alias("tot"),
        )
    )
    wp = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    r = e.select(
        "dur",
        "d",
        "c",
        (F.col("tot") - F.coalesce(F.sum("cnt").over(wp), F.lit(0)))
        .cast("long")
        .alias("n_risk"),
    )
    ln6 = (
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.floor(
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")
                )
                * 1000000.0
                + F.lit(0.5)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("ln6")
    )
    z0 = (F.col("d") >= F.col("n_risk")).cast("long").alias("z0")
    wc = Window.orderBy("dur")
    s = r.select("dur", "d", "c", "n_risk", ln6, z0).select(
        "dur",
        "d",
        "c",
        "n_risk",
        F.sum("ln6").over(wc).cast("long").alias("l6"),
        F.max("z0").over(wc).cast("long").alias("anyzero"),
    )
    return s.select(
        F.col("dur").alias("dur_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("anyzero") == 1, F.lit(0.0))
        .otherwise(rnd(F.exp(F.col("l6") / F.lit(1000000.0)), 6))
        .alias("survival"),
    )


# Durbin-Watson: dw < _DW_POS is the conventional "worth a look"
# positive-autocorrelation screen (exact bounds depend on n and k;
# the fixed literal is documented as a heuristic, not a table lookup).
_DW_POS = 1.5


@query(
    "j_durbin_watson",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    x0 AS (SELECT event_type, MIN(day) AS d0 FROM d GROUP BY 1),
    xd AS (SELECT d.event_type, CAST(d.day - x0.d0 AS BIGINT) AS x, v, d.day
           FROM d JOIN x0 ON x0.event_type = d.event_type),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(v) AS BIGINT) AS sy,
                 CAST(SUM(x * v) AS BIGINT) AS sxy
          FROM xd GROUP BY 1),
    b AS (SELECT event_type, n, sx, sy,
                 (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta
          FROM s),
    b2 AS (SELECT event_type, n, beta,
                  (CAST(sy AS DOUBLE) - beta * sx) / n AS alpha
           FROM b),
    e AS (SELECT xd.event_type, xd.day, b2.n, b2.beta,
                 CAST(FLOOR((CAST(v AS DOUBLE) - (alpha + beta * x))
                            * 10000.0 + 0.5) AS BIGINT) AS e4
          FROM xd JOIN b2 ON b2.event_type = xd.event_type),
    l AS (SELECT event_type, n, beta, e4,
                 LAG(e4) OVER (PARTITION BY event_type ORDER BY day) AS p4
          FROM e),
    f AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
                 MAX(beta) AS beta,
                 CAST(SUM(CASE WHEN p4 IS NOT NULL
                               THEN (e4 - p4) * (e4 - p4) ELSE 0 END)
                      AS BIGINT) AS num,
                 CAST(SUM(e4 * e4) AS BIGINT) AS den
          FROM l GROUP BY 1)
    SELECT event_type, n_days,
           {sql_rnd("beta", 6)} AS slope,
           CASE WHEN den > 0
                THEN {sql_rnd("CAST(num AS DOUBLE) / den", 6)} END AS dw_stat,
           CASE WHEN den > 0
                THEN {sql_rnd("1.0 - CAST(num AS DOUBLE) / den / 2.0", 6)} END
             AS rho_lag1,
           CASE WHEN den > 0
                THEN {sql_rnd("CAST(num AS DOUBLE) / den", 6)} < {_DW_POS} END
             AS positive_autocorr
    FROM f
    """,
)
def j_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order autocorrelation statistic (Durbin &
    Watson 1950, public) on the RESIDUALS of each event type's daily-
    volume OLS trend line — the are-my-regression-errors-independent
    audit that belongs beside j_ts_trend (which fits the line but
    never checks its own assumption) and j_runs_test (which tests raw
    sign order, not detrended residuals). DW = SUM(e_t - e_(t-1))^2 /
    SUM(e_t^2) in time order; ~2 means independent, << 2 positive
    autocorrelation; rho_lag1 ~ 1 - DW/2 is the conventional reading.

    EXACT: the OLS line comes from five exact BIGINT sufficient sums
    (factors cast double separately); each residual is floored ONCE
    to a 1e-4-grid BIGINT, so the lag-difference numerator and the
    denominator are EXACT integer window/agg arithmetic (1e-4 keeps
    30 squared residuals < 2^63 with head-room) and DW is one IEEE
    division rounded 1e-6 before the < {_DW_POS} screen-compare.
    NULL when the fit is exact (den = 0: the statistic is undefined).

    Plan: ONE (event_type, day) corpus hash agg (the j_mann_kendall
    shuffle class); the per-type min-day and sufficient-sum folds are
    |types|-row broadcasts back onto the calendar-sized relation; the
    lag runs in ONE per-type window over <= 31 rows. At 100 TB only
    the first agg scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    d.persist()  # consumers: min-day fold, sufficient sums, residual pass
    x0 = d.groupBy("event_type").agg(F.min("day").alias("d0"))
    xd = d.join(F.broadcast(x0), "event_type").select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        "v",
        "day",
    )
    s = xd.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("v").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("v")).cast("long").alias("sxy"),
    )
    beta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    # alpha needs sy/sx alongside beta: carry them through one select
    b2 = s.select(
        "event_type",
        "n",
        beta.alias("beta"),
        "sx",
        "sy",
    ).select(
        "event_type",
        "n",
        "beta",
        ((F.col("sy").cast("double") - F.col("beta") * F.col("sx")) / F.col("n"))
        .alias("alpha"),
    )
    e = xd.join(F.broadcast(b2), "event_type").select(
        "event_type",
        "day",
        "n",
        "beta",
        F.floor(
            (F.col("v").cast("double") - (F.col("alpha") + F.col("beta") * F.col("x")))
            * 10000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("e4"),
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    l = e.select(
        "event_type", "n", "beta", "e4", F.lag("e4").over(wl).alias("p4")
    )
    f = l.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("beta").alias("beta"),
        F.sum(
            F.when(
                F.col("p4").isNotNull(),
                (F.col("e4") - F.col("p4")) * (F.col("e4") - F.col("p4")),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("num"),
        F.sum(F.col("e4") * F.col("e4")).cast("long").alias("den"),
    )
    ok = F.col("den") > 0
    dw_raw = F.col("num").cast("double") / F.col("den")
    return f.select(
        "event_type",
        "n_days",
        rnd(F.col("beta"), 6).alias("slope"),
        F.when(ok, rnd(dw_raw, 6)).alias("dw_stat"),
        F.when(ok, rnd(F.lit(1.0) - dw_raw / 2.0, 6)).alias("rho_lag1"),
        F.when(ok, rnd(dw_raw, 6) < _DW_POS).alias("positive_autocorr"),
    )


# CUSUM: conventional drift alarm at 4 standard deviations.
_CUSUM_H = 4.0


@query(
    "j_cusum_drift",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS s1,
                 CAST(SUM(v * v) AS BIGINT) AS s2
          FROM d GROUP BY 1),
    x AS (SELECT d.event_type, d.day, s.n, s.s1, s.s2,
                 d.v * s.n - s.s1 AS dev
          FROM d JOIN s ON s.event_type = d.event_type),
    p AS (SELECT event_type, day, n, s1, s2,
                 CAST(SUM(dev) OVER (PARTITION BY event_type ORDER BY day)
                      AS BIGINT) AS cp
          FROM x),
    w AS (SELECT event_type, day, n, s1, s2, cp,
                 cp - CAST(MIN(cp) OVER (PARTITION BY event_type ORDER BY day)
                           AS BIGINT) AS sp,
                 CAST(MAX(cp) OVER (PARTITION BY event_type ORDER BY day)
                      AS BIGINT) - cp AS sn
          FROM p),
    m AS (SELECT event_type, day, n, s1, s2, sp, sn,
                 CAST(MAX(sp) OVER (PARTITION BY event_type) AS BIGINT) AS msp,
                 CAST(MAX(sn) OVER (PARTITION BY event_type) AS BIGINT) AS msn
          FROM w),
    f AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
                 CAST(MAX(s1) AS BIGINT) AS s1, CAST(MAX(s2) AS BIGINT) AS s2,
                 CAST(MAX(msp) AS BIGINT) AS msp,
                 CAST(MAX(msn) AS BIGINT) AS msn,
                 MIN(CASE WHEN sp = msp THEN day END) AS peak_day
          FROM m GROUP BY 1),
    g AS (SELECT event_type, n_days, msp, msn, peak_day,
                 CAST(s1 AS DOUBLE) / n_days AS mu,
                 sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)) / n_days AS sd
          FROM f)
    SELECT event_type, n_days,
           {sql_rnd("mu", 6)} AS mean_daily,
           {sql_rnd("sd", 6)} AS sd_daily,
           CASE WHEN sd > 0 THEN
             {sql_rnd("CAST(msp AS DOUBLE) / n_days / sd", 6)} END AS cusum_pos_sd,
           CASE WHEN sd > 0 THEN
             {sql_rnd("CAST(msn AS DOUBLE) / n_days / sd", 6)} END AS cusum_neg_sd,
           peak_day,
           CASE WHEN sd > 0 THEN
             {sql_rnd("CAST(msp AS DOUBLE) / n_days / sd", 6)} > {_CUSUM_H}
             OR {sql_rnd("CAST(msn AS DOUBLE) / n_days / sd", 6)} > {_CUSUM_H}
           END AS drift
    FROM g
    """,
)
def j_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detector (Page 1954, public) on each event
    type's daily-volume series — the batch twin of the streaming
    drift monitor: the classic control chart that accumulates
    deviations from the series mean and flags a sustained shift long
    before any single day trips a z-score (the j_ts_anomaly
    complement: that flags spikes, CUSUM flags drifts). Uses the
    prefix-sum identity S+_t = P_t - min_(i<=t) P_i (and the mirror
    for S-), so the classic recursive chart becomes two plain
    windows.

    EXACT: deviations are pre-scaled by n (dev = v*n - S1, exact
    BIGINT — no float mean subtraction), so every prefix sum,
    running extreme and maximum is exact integer arithmetic; the
    normalized drift magnitudes divide ONCE by (n * sd) in a fixed
    IEEE sequence rounded 1e-6 before the > {_CUSUM_H} sd alarm
    compare; the peak day is the MIN day attaining the max (a
    deterministic tie-break). NULL stats when the series is
    constant.

    Plan: ONE (event_type, day) corpus hash agg (the j_mann_kendall
    shuffle class) + a |types|-row moment fold broadcast back; all
    windows run per-type over <= 31 rows. At 100 TB only the first
    agg scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    d.persist()  # consumers: the moment fold and the deviation pass
    return cusum_from_daily(d)


def cusum_from_daily(d: DataFrame) -> DataFrame:
    """The j_cusum_drift rollup over a (event_type, day DATE, v long)
    daily-count relation — shared verbatim with the streaming volume
    monitor's cusum_current_view so streamed ≡ batch is an identity
    over equal count matrices, not a reimplementation (the
    drift_from_counts pattern)."""
    s = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
    )
    x = d.join(F.broadcast(s), "event_type").select(
        "event_type",
        "day",
        "n",
        "s1",
        "s2",
        (F.col("v") * F.col("n") - F.col("s1")).alias("dev"),
    )
    wc = Window.partitionBy("event_type").orderBy("day")
    p = x.select(
        "event_type",
        "day",
        "n",
        "s1",
        "s2",
        F.sum("dev").over(wc).cast("long").alias("cp"),
    )
    w = p.select(
        "event_type",
        "day",
        "n",
        "s1",
        "s2",
        (F.col("cp") - F.min("cp").over(wc).cast("long")).alias("sp"),
        (F.max("cp").over(wc).cast("long") - F.col("cp")).alias("sn"),
    )
    wt = Window.partitionBy("event_type")
    m = w.select(
        "event_type",
        "day",
        "n",
        "s1",
        "s2",
        "sp",
        "sn",
        F.max("sp").over(wt).cast("long").alias("msp"),
        F.max("sn").over(wt).cast("long").alias("msn"),
    )
    f = m.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("s1").cast("long").alias("s1"),
        F.max("s2").cast("long").alias("s2"),
        F.max("msp").cast("long").alias("msp"),
        F.max("msn").cast("long").alias("msn"),
        F.min(F.when(F.col("sp") == F.col("msp"), F.col("day"))).alias("peak_day"),
    )
    mu = F.col("s1").cast("double") / F.col("n_days")
    sd = (
        F.sqrt((F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
        / F.col("n_days")
    )
    g = f.select("event_type", "n_days", "msp", "msn", "peak_day",
                 mu.alias("mu"), sd.alias("sd"))
    pos = rnd(F.col("msp").cast("double") / F.col("n_days") / F.col("sd"), 6)
    neg = rnd(F.col("msn").cast("double") / F.col("n_days") / F.col("sd"), 6)
    ok = F.col("sd") > 0
    return g.select(
        "event_type",
        "n_days",
        rnd(F.col("mu"), 6).alias("mean_daily"),
        rnd(F.col("sd"), 6).alias("sd_daily"),
        F.when(ok, pos).alias("cusum_pos_sd"),
        F.when(ok, neg).alias("cusum_neg_sd"),
        "peak_day",
        F.when(ok, (pos > _CUSUM_H) | (neg > _CUSUM_H)).alias("drift"),
    )


# EWMA control chart: classic lambda = 0.2, 3-sigma limits.
_EWMA_L = 0.2


@query(
    "j_ewma_chart",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, day, v,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY day) AS BIGINT) AS rn
          FROM d),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS s1,
                 CAST(SUM(v * v) AS BIGINT) AS s2
          FROM d GROUP BY 1),
    pr AS (SELECT a.event_type, a.day, a.v, a.rn, s.n, s.s1, s.s2,
                  CAST(SUM(CAST(FLOOR({_EWMA_L} * POWER(1.0 - {_EWMA_L},
                                          a.rn - b.rn) * b.v
                                      * 1000000.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS w6
           FROM r a JOIN r b
             ON b.event_type = a.event_type AND b.rn <= a.rn
           JOIN s ON s.event_type = a.event_type
           GROUP BY 1, 2, 3, 4, 5, 6, 7),
    e AS (SELECT event_type, day, v, rn, n, s1, s2,
                 (w6 + CAST(FLOOR(POWER(1.0 - {_EWMA_L}, rn)
                                  * (CAST(s1 AS DOUBLE) / n)
                                  * 1000000.0 + 0.5) AS BIGINT))
                   / 1000000.0 AS ewma,
                 CAST(s1 AS DOUBLE) / n AS mu,
                 sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n AS sd
          FROM pr),
    f AS (SELECT event_type, day, v, ewma, mu, sd,
                 sd * sqrt({_EWMA_L} / (2.0 - {_EWMA_L})
                           * (1.0 - POWER((1.0 - {_EWMA_L})
                                          * (1.0 - {_EWMA_L}), rn))) AS sg
          FROM e)
    SELECT event_type, day, v AS n_events,
           {sql_rnd("ewma", 6)} AS ewma,
           {sql_rnd("mu + 3.0 * sg", 6)} AS ucl,
           {sql_rnd("mu - 3.0 * sg", 6)} AS lcl,
           {sql_rnd("ewma", 6)} > {sql_rnd("mu + 3.0 * sg", 6)}
             OR {sql_rnd("ewma", 6)} < {sql_rnd("mu - 3.0 * sg", 6)} AS anomaly
    FROM f
    """,
)
def j_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959, public) on each event type's
    daily volume, lambda = {_EWMA_L}, 3-sigma limits around the
    series mean — the small-persistent-shift monitor between
    j_ts_anomaly's single-day z flags and j_cusum_drift's cumulative
    alarm; the time-varying sigma_t = sd sqrt(lambda/(2-lambda)
    (1-(1-lambda)^2t)) keeps early days honest instead of borrowing
    the asymptotic band. The chart centers on the series mean (a
    retrospective audit, the control-chart convention for phase-I
    analysis).

    EXACT: the recursion is unrolled into its closed form EWMA_t =
    sum_i lambda (1-lambda)^(t-i) v_i + (1-lambda)^t mu over the
    per-type pair grid; each term (POWER the only libm call) is
    floored ONCE to a 1e-6-grid BIGINT and summed in exact integer
    arithmetic (the scaled-summation convention), so the chart value
    is engine-order-free; limits are one IEEE sequence rounded 1e-6,
    and the anomaly compare reads the ROUNDED chart vs the ROUNDED
    limits.

    Plan: ONE (event_type, day) corpus hash agg; the unrolled
    recursion is a broadcast pair self-join on the <= 31-row
    calendar relation (the j_mann_kendall grid device) grouped back
    to one row per day — metadata-scale everywhere past the first
    agg. At 100 TB only that agg scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    d.persist()  # consumers: both pair-join legs and the moment fold
    return ewma_from_daily(d)


def ewma_from_daily(d: DataFrame) -> DataFrame:
    """The j_ewma_chart rollup over a (event_type, day DATE, v long)
    daily-count relation — shared verbatim with the streaming volume
    monitor's ewma_current_view (the drift_from_counts pattern)."""
    wr = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type", "day", "v", F.row_number().over(wr).cast("long").alias("rn")
    )
    s = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
    )
    lam = float(_EWMA_L)
    term6 = F.floor(
        F.lit(lam)
        * F.pow(F.lit(1.0 - lam), F.col("rn") - F.col("rn_b"))
        * F.col("v_b")
        * 1000000.0
        + F.lit(0.5)
    ).cast("long")
    pr = (
        r.join(
            F.broadcast(
                r.select(
                    "event_type",
                    F.col("rn").alias("rn_b"),
                    F.col("v").alias("v_b"),
                )
            ),
            "event_type",
        )
        .where(F.col("rn_b") <= F.col("rn"))
        .groupBy("event_type", "day", "v", "rn")
        .agg(F.sum(term6).cast("long").alias("w6"))
        .join(F.broadcast(s), "event_type")
    )
    base6 = F.floor(
        F.pow(F.lit(1.0 - lam), F.col("rn"))
        * (F.col("s1").cast("double") / F.col("n"))
        * 1000000.0
        + F.lit(0.5)
    ).cast("long")
    e = pr.select(
        "event_type",
        "day",
        "v",
        "rn",
        "n",
        "s1",
        "s2",
        ((F.col("w6") + base6) / F.lit(1000000.0)).alias("ewma"),
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
        (
            F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
            / F.col("n")
        ).alias("sd"),
    )
    sg = F.col("sd") * F.sqrt(
        F.lit(lam / (2.0 - lam))
        * (F.lit(1.0) - F.pow(F.lit((1.0 - lam) * (1.0 - lam)), F.col("rn")))
    )
    f = e.select("event_type", "day", "v", "ewma", "mu", sg.alias("sg"))
    ew = rnd(F.col("ewma"), 6)
    ucl = rnd(F.col("mu") + 3.0 * F.col("sg"), 6)
    lcl = rnd(F.col("mu") - 3.0 * F.col("sg"), 6)
    return f.select(
        "event_type",
        "day",
        F.col("v").alias("n_events"),
        ew.alias("ewma"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((ew > ucl) | (ew < lcl)).alias("anomaly"),
    )


@query(
    "j_seasonal_decompose",
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    x0 AS (SELECT event_type, MIN(day) AS d0 FROM d GROUP BY 1),
    xd AS (SELECT d.event_type, CAST(d.day - x0.d0 AS BIGINT) AS x, v, d.day,
                  CAST(d.day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
           FROM d JOIN x0 ON x0.event_type = d.event_type),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(v) AS BIGINT) AS sy,
                 CAST(SUM(x * v) AS BIGINT) AS sxy
          FROM xd GROUP BY 1),
    b AS (SELECT event_type,
                 (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
                 n, sx, sy
          FROM s),
    b2 AS (SELECT event_type, beta,
                  (CAST(sy AS DOUBLE) - beta * sx) / n AS alpha
           FROM b),
    e AS (SELECT xd.event_type, xd.dow, xd.v,
                 CAST(FLOOR((CAST(v AS DOUBLE) - (alpha + beta * x))
                            * 1000000.0 + 0.5) AS BIGINT) AS dt6
          FROM xd JOIN b2 ON b2.event_type = xd.event_type),
    g AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(dt6) AS BIGINT) AS sd6
          FROM e GROUP BY 1, 2),
    f AS (SELECT event_type, dow, n_days,
                 FLOOR(CAST(sv AS DOUBLE) / n_days * 1000000 + 0.5) / 1000000
                   AS mean_volume,
                 FLOOR(CAST(sd6 AS DOUBLE) / n_days / 1000000.0
                       * 1000000 + 0.5) / 1000000 AS seasonal_idx
          FROM g)
    SELECT event_type, dow, n_days, mean_volume, seasonal_idx,
           seasonal_idx = MAX(seasonal_idx)
             OVER (PARTITION BY event_type) AS is_peak
    FROM f
    """,
)
def j_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend + weekly-seasonal decomposition of each event type's
    daily volume (the classical additive decomposition, public:
    detrend by the OLS line, average the residuals per day-of-week)
    — the is-Monday-really-different panel behind every traffic
    dashboard, and the batch ground truth a forecasting pipeline
    subtracts before modeling. seasonal_idx(dow) = mean over that
    weekday of (v - trend); is_peak marks the strongest weekday.

    EXACT: the OLS line reuses the j_durbin_watson five-BIGINT-sums
    device; each detrended residual is floored ONCE to a 1e-6-grid
    BIGINT so the per-weekday means are exact integer sums with one
    IEEE division; day-of-week is the arithmetic (day - epoch) % 7
    (0 = Thursday), immune to engine locale conventions; the peak
    flag compares ROUNDED indexes (deterministic). OLS residuals sum
    to ~0 by construction — the conservation property the test pins.

    Plan: ONE (event_type, day) corpus hash agg; |types|-row OLS
    folds broadcast back; one (type, dow) 35-row agg and a |dow|
    window per type. At 100 TB only the first agg scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    d.persist()  # consumers: min-day fold, OLS sums, residual pass
    x0 = d.groupBy("event_type").agg(F.min("day").alias("d0"))
    xd = d.join(F.broadcast(x0), "event_type").select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        "v",
        (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).cast("long") % 7)
        .alias("dow"),
    )
    s = xd.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("v").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("v")).cast("long").alias("sxy"),
    )
    beta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    b2 = s.select("event_type", beta.alias("beta"), "n", "sx", "sy").select(
        "event_type",
        "beta",
        ((F.col("sy").cast("double") - F.col("beta") * F.col("sx")) / F.col("n"))
        .alias("alpha"),
    )
    e = xd.join(F.broadcast(b2), "event_type").select(
        "event_type",
        "dow",
        "v",
        F.floor(
            (F.col("v").cast("double") - (F.col("alpha") + F.col("beta") * F.col("x")))
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dt6"),
    )
    g = e.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("v").cast("long").alias("sv"),
        F.sum("dt6").cast("long").alias("sd6"),
    )
    f = g.select(
        "event_type",
        "dow",
        "n_days",
        rnd(F.col("sv").cast("double") / F.col("n_days"), 6).alias("mean_volume"),
        rnd(
            F.col("sd6").cast("double") / F.col("n_days") / F.lit(1000000.0), 6
        ).alias("seasonal_idx"),
    )
    wt = Window.partitionBy("event_type")
    return f.select(
        "event_type",
        "dow",
        "n_days",
        "mean_volume",
        "seasonal_idx",
        (F.col("seasonal_idx") == F.max("seasonal_idx").over(wt)).alias("is_peak"),
    )


# Hurst R/S curve: block-size grid over the 30-day series.
_HURST_KS = (5, 10, 15, 30)


@query(
    "j_hurst_exponent",
    oracle=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, day, v,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY day) AS BIGINT) AS rn
          FROM d),
    g AS (SELECT r.*, ks.k FROM r
          CROSS JOIN (VALUES (5), (10), (15), (30)) ks(k)),
    b AS (SELECT event_type, k, (rn - 1) // k AS blk, rn, v FROM g),
    w AS (SELECT event_type, k, blk, rn, v,
                 CAST(SUM(v) OVER (PARTITION BY event_type, k, blk
                                   ORDER BY rn) AS BIGINT) AS cum,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type, k, blk
                                         ORDER BY rn) AS BIGINT) AS j,
                 CAST(SUM(v) OVER (PARTITION BY event_type, k, blk)
                      AS BIGINT) AS s1b
          FROM b),
    s AS (SELECT event_type, k, blk,
                 CAST(COUNT(*) AS BIGINT) AS nb,
                 CAST(MAX(s1b) AS BIGINT) AS s1b,
                 CAST(SUM(v * v) AS BIGINT) AS s2b,
                 CAST(MAX(k * cum - j * s1b) AS BIGINT) AS pmax,
                 CAST(MIN(k * cum - j * s1b) AS BIGINT) AS pmin
          FROM w GROUP BY 1, 2, 3),
    t AS (SELECT event_type, k,
                 CAST(FLOOR(LN((pmax - pmin)
                               / sqrt(CAST(k * s2b - s1b * s1b AS DOUBLE)))
                            * 1000000.0 + 0.5) AS BIGINT) AS l6
          FROM s
          WHERE nb = k AND k * s2b - s1b * s1b > 0 AND pmax > pmin),
    c AS (SELECT event_type, k, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                 CAST(FLOOR(CAST(SUM(l6) AS DOUBLE) / COUNT(*) + 0.5)
                      AS BIGINT) AS y6,
                 CAST(FLOOR(LN(CAST(k AS DOUBLE)) * 1000000.0 + 0.5)
                      AS BIGINT) AS x6
          FROM t GROUP BY 1, 2),
    h AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n4,
                 CAST(SUM(x6) AS BIGINT) AS hx,
                 CAST(SUM(y6) AS BIGINT) AS hy,
                 CAST(SUM(x6 * x6) AS BIGINT) AS hxx,
                 CAST(SUM(x6 * y6) AS BIGINT) AS hxy
          FROM c GROUP BY 1)
    SELECT c.event_type, c.k AS block_size, c.n_blocks,
           c.y6 / 1000000.0 AS log_rs,
           CASE WHEN h.n4 >= 2 THEN
             {sql_rnd("(CAST(h.n4 AS DOUBLE) * h.hxy - CAST(h.hx AS DOUBLE) * h.hy) / (CAST(h.n4 AS DOUBLE) * h.hxx - CAST(h.hx AS DOUBLE) * h.hx)", 6)}
           END AS hurst
    FROM c JOIN h ON h.event_type = c.event_type
    """,
)
def j_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951 /
    Mandelbrot-Wallis 1969, public) on each event type's daily-volume
    series — the long-range-dependence number that separates
    mean-reverting (H < 0.5), random-walk (H = 0.5) and trending
    (H > 0.5) traffic, fitted as the log-log slope of mean R/S over
    the block-size grid {_HURST_KS} (the sizing-curve discipline of
    j_cms_width_curve: the CURVE is the output, the exponent rides
    every row of its type).

    EXACT: within each full block the cumulative deviation is the
    exact integer k*cum_j - j*S1 (deviations pre-scaled by k — the
    j_cusum_drift device), so the range R and the variance
    denominator are exact BIGINTs and R/S is ONE IEEE sequence;
    each ln(R/S) is floored ONCE to a 1e-6-grid BIGINT, block means
    use one deterministic divide+floor, the grid x = ln(k) is floored
    to the same grid, and the final OLS slope runs on exact integer
    sums over <= 4 grid points. Degenerate blocks (constant, or
    short tail blocks) are excluded by construction; H is NULL below
    2 usable grid points.

    Plan: ONE (event_type, day) corpus hash agg; the 4-row literal
    block-size spine cross-joins the <= 31-row calendar relation
    (metadata-scale), and every window/fold past the first agg runs
    per (type, k, block) on <= 30 rows. At 100 TB only the first agg
    scales."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    wr = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type", "day", "v", F.row_number().over(wr).cast("long").alias("rn")
    )
    ks = spark.createDataFrame([(k,) for k in _HURST_KS], "k long")
    g = r.crossJoin(F.broadcast(ks))
    b = g.select(
        "event_type", "k", F.expr("(rn - 1) div k").alias("blk"), "rn", "v"
    )
    wb = Window.partitionBy("event_type", "k", "blk").orderBy("rn")
    wf = Window.partitionBy("event_type", "k", "blk")
    w = b.select(
        "event_type",
        "k",
        "blk",
        "v",
        F.sum("v").over(wb).cast("long").alias("cum"),
        F.row_number().over(wb).cast("long").alias("j"),
        F.sum("v").over(wf).cast("long").alias("s1b"),
    )
    p = F.col("k") * F.col("cum") - F.col("j") * F.col("s1b")
    s = w.groupBy("event_type", "k", "blk").agg(
        F.count("*").cast("long").alias("nb"),
        F.max("s1b").cast("long").alias("s1b"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2b"),
        F.max(p).cast("long").alias("pmax"),
        F.min(p).cast("long").alias("pmin"),
    )
    sden = F.col("k") * F.col("s2b") - F.col("s1b") * F.col("s1b")
    tt = s.where(
        (F.col("nb") == F.col("k")) & (sden > 0) & (F.col("pmax") > F.col("pmin"))
    ).select(
        "event_type",
        "k",
        F.floor(
            F.log((F.col("pmax") - F.col("pmin")) / F.sqrt(sden.cast("double")))
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("l6"),
    )
    c = tt.groupBy("event_type", "k").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.floor(F.sum("l6").cast("double") / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("y6"),
    ).select(
        "event_type",
        "k",
        "n_blocks",
        "y6",
        F.floor(F.log(F.col("k").cast("double")) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("x6"),
    )
    h = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n4"),
        F.sum("x6").cast("long").alias("hx"),
        F.sum("y6").cast("long").alias("hy"),
        F.sum(F.col("x6") * F.col("x6")).cast("long").alias("hxx"),
        F.sum(F.col("x6") * F.col("y6")).cast("long").alias("hxy"),
    )
    hurst = (
        F.col("n4").cast("double") * F.col("hxy")
        - F.col("hx").cast("double") * F.col("hy")
    ) / (
        F.col("n4").cast("double") * F.col("hxx")
        - F.col("hx").cast("double") * F.col("hx")
    )
    return c.join(F.broadcast(h), "event_type").select(
        "event_type",
        F.col("k").alias("block_size"),
        "n_blocks",
        (F.col("y6") / F.lit(1000000.0)).alias("log_rs"),
        F.when(F.col("n4") >= 2, rnd(hurst, 6)).alias("hurst"),
    )


# PACF: unrolled Durbin-Levinson depth and large-n significance.
_PACF_LAGS = 3


@query(
    "j_pacf",
    oracle=f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS x
               FROM events GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    lg AS (SELECT CAST(unnest(range(1, {_PACF_LAGS + 1})) AS BIGINT) AS lag),
    p AS (SELECT lg.lag, a.x AS x, b.x AS y
          FROM lg CROSS JOIN d a
          JOIN d b ON b.day = a.day - CAST(lg.lag AS INTEGER)),
    s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS np,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM p GROUP BY lag),
    r AS (SELECT lag, np,
                 CASE WHEN np * sxx - CAST(sx AS HUGEINT) * sx > 0
                       AND np * syy - CAST(sy AS HUGEINT) * sy > 0
                      THEN FLOOR(CAST(np * sxy - CAST(sx AS HUGEINT) * sy
                                      AS DOUBLE)
                                 / sqrt(CAST(np * sxx
                                             - CAST(sx AS HUGEINT) * sx
                                             AS DOUBLE)
                                        * (np * syy
                                           - CAST(sy AS HUGEINT) * sy))
                                 * 1000000 + 0.5) / 1000000
                      ELSE 0.0 END AS rho
          FROM s),
    w AS (SELECT MAX(CASE WHEN lag = 1 THEN rho END) AS r1,
                 MAX(CASE WHEN lag = 2 THEN rho END) AS r2,
                 MAX(CASE WHEN lag = 3 THEN rho END) AS r3
          FROM r),
    f AS (SELECT r1, r2, r3, 1.0 - r1 * r1 AS den2 FROM w),
    f2 AS (SELECT r1, r2, r3, den2,
                  CASE WHEN den2 > 0
                       THEN (r2 - r1 * r1) / den2 END AS p2,
                  CASE WHEN den2 > 0
                       THEN r1 * (1.0 - r2) / den2 END AS phi21
           FROM f),
    f3 AS (SELECT *,
                  CASE WHEN den2 > 0
                        AND ABS(1.0 - phi21 * r1 - p2 * r2) > 0
                       THEN (r3 - phi21 * r2 - p2 * r1)
                            / (1.0 - phi21 * r1 - p2 * r2) END AS p3
           FROM f2)
    SELECT r.lag, r.np AS n_pairs, r.rho,
           CASE r.lag WHEN 1 THEN r.rho
                WHEN 2 THEN {sql_rnd("f3.p2", 6)}
                ELSE {sql_rnd("f3.p3", 6)} END AS pacf,
           ABS(CASE r.lag WHEN 1 THEN r.rho
                    WHEN 2 THEN {sql_rnd("f3.p2", 6)}
                    ELSE {sql_rnd("f3.p3", 6)} END)
             > {sql_rnd("1.96 / sqrt(CAST(nn.n AS DOUBLE))", 6)} AS significant
    FROM r CROSS JOIN f3 CROSS JOIN nn
    """,
)
def j_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation function at lags 1..{L} of the daily
    total event volume, by the Durbin-Levinson recursion unrolled to
    its closed forms (public: Durbin 1960; Box-Jenkins order
    identification) — the AR-ORDER dial that completes the serial-
    dependence shelf: j_ts_autocorr reads raw correlation,
    j_ljung_box aggregates it into a white-noise verdict, PACF says
    WHICH lag carries direct structure once shorter lags are
    partialed out. phi_11 = rho_1; phi_22 = (rho_2 - rho_1^2) /
    (1 - rho_1^2); phi_33 from the unrolled level-3 recursion.
    Significance uses the standard +/- 1.96/sqrt(n) band.

    EXACT: each gapped-calendar rho_k is the exact-paired DATE
    equi-join device of j_ljung_box (BIGINT/HUGEINT sufficient sums,
    pre-rounded 1e-6), so every pacf is ONE IEEE sequence on
    identical rounded inputs, rounded 1e-6 before the band compare
    (the band itself rounds through the same grid); NULL when a
    denominator degenerates.

    Plan: one day agg over the event scan (persisted), then a {L}-row
    lag grid with broadcast DATE equi-joins, a 1-row pivot fold and
    the {L}-row unpivot — everything past the first agg is
    metadata-scale."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("x"))
    )
    d.persist()  # consumers: n fold + two join legs per lag
    nn = d.agg(F.count("*").cast("long").alias("n"))
    lg = spark.range(1, _PACF_LAGS + 1).select(F.col("id").cast("long").alias("lag"))
    a = F.broadcast(lg).crossJoin(d.select(F.col("day").alias("day_a"), F.col("x")))
    p = a.join(
        d.select(F.col("day").alias("day_b"), F.col("x").alias("y")),
        F.col("day_b") == F.date_sub(F.col("day_a"), F.col("lag").cast("int")),
    )
    dec = "decimal(38,0)"
    s = p.groupBy("lag").agg(
        F.count("*").cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    d1 = F.col("np").cast(dec) * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    d2 = F.col("np").cast(dec) * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")
    num = F.col("np").cast(dec) * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    rho = F.when(
        (d1 > 0) & (d2 > 0),
        F.floor(
            num.cast("double") / F.sqrt(d1.cast("double") * d2.cast("double"))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000,
    ).otherwise(F.lit(0.0))
    r = s.select("lag", "np", rho.alias("rho"))
    r.persist()  # consumers: the pivot fold and the final unpivot join
    w = r.agg(
        F.max(F.when(F.col("lag") == 1, F.col("rho"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("rho"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("rho"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    f = w.select("r1", "r2", "r3", (F.lit(1.0) - r1 * r1).alias("den2"))
    ok2 = F.col("den2") > 0
    f2 = f.select(
        "r1",
        "r2",
        "r3",
        "den2",
        F.when(ok2, (r2 - r1 * r1) / F.col("den2")).alias("p2"),
        F.when(ok2, r1 * (F.lit(1.0) - r2) / F.col("den2")).alias("phi21"),
    )
    den3 = F.lit(1.0) - F.col("phi21") * r1 - F.col("p2") * r2
    f3 = f2.select(
        "r1",
        "r2",
        "r3",
        "den2",
        "p2",
        "phi21",
        F.when(
            ok2 & (F.abs(den3) > 0),
            (r3 - F.col("phi21") * r2 - F.col("p2") * r1) / den3,
        ).alias("p3"),
    )
    pacf = (
        F.when(F.col("lag") == 1, F.col("rho"))
        .when(F.col("lag") == 2, rnd(F.col("p2"), 6))
        .otherwise(rnd(F.col("p3"), 6))
    )
    band = rnd(F.lit(1.96) / F.sqrt(F.col("n").cast("double")), 6)
    return (
        r.crossJoin(F.broadcast(f3))
        .crossJoin(F.broadcast(nn))
        .select(
            "lag",
            F.col("np").alias("n_pairs"),
            "rho",
            pacf.alias("pacf"),
            (F.abs(pacf) > band).alias("significant"),
        )
    )


j_pacf.__doc__ = j_pacf.__doc__.replace("{L}", str(_PACF_LAGS))
