"""Behavioral analytics over the `events` stream table — the classic
product-analytics operators (retention cohorts, conversion funnels) a
query engine serving event data must cover. Both are single-shuffle-
family plans keyed on user_id; event-time math runs on epoch-ms longs
(`ts_ms`, tables.py) so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_DAY_MS = 86400000


@query(
    "j_retention_cohort",
    oracle=f"""
    WITH ev AS (SELECT user_id, epoch_ms(ts) // {_DAY_MS} AS day FROM events),
         first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
    SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM ev e JOIN first f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def j_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix: users grouped by first-seen day, counted
    on each later day they return (the day-N retention triangle).

    Plan: one agg for first-seen (shuffle on user_id), join back to the
    event stream on user_id — both sides hash on the same key, so the
    join reuses the aggregation's partitioning — then a hash agg on
    (cohort_day, day_offset), whose distinct-count is per-user and
    partially aggregated map-side. first-seen is |users| rows, far
    smaller than |events|; at 100 TB AQE picks broadcast when the user
    dimension fits, else the co-partitioned SMJ. Day arithmetic is
    integer division on epoch-ms — no timezone, no timestamp type."""
    t = load(spark, sf_dir)
    ev = t.events.select("user_id", F.expr(f"ts_ms div {_DAY_MS}").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@query(
    "j_funnel_stages",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
         s1 AS (SELECT user_id, MIN(ts_ms) AS t1 FROM e
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT e.user_id, MIN(ts_ms) AS t2 FROM e JOIN s1 USING (user_id)
                WHERE event_type = 'view' AND ts_ms >= t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, MIN(ts_ms) AS t3 FROM e JOIN s2 USING (user_id)
                WHERE event_type = 'click' AND ts_ms >= t2 GROUP BY e.user_id),
         s4 AS (SELECT e.user_id, MIN(ts_ms) AS t4 FROM e JOIN s3 USING (user_id)
                WHERE event_type = 'purchase' AND ts_ms >= t3 GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM s4) AS BIGINT) AS n_purchase
    """,
)
def j_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → click → purchase:
    a user converts stage k only with an event at-or-after their stage
    k-1 conversion time (strict min-chain semantics).

    Plan: four chained window minimums over the SAME window spec
    (partitionBy user_id) — Spark stacks same-spec Window operators on
    one Exchange+Sort, so the whole per-user chain costs a single
    shuffle regardless of funnel depth, then a 1-row global agg. The
    SQL formulation needs one self-join per stage; the window form is
    the scale-correct lowering (no |events|-sized join per stage)."""
    t = load(spark, sf_dir)
    return funnel_counts(
        t.events.select("user_id", "event_type", "ts_ms"),
        [("signup", "n_signup"), ("view", "n_view"),
         ("click", "n_click"), ("purchase", "n_purchase")],
    )


def funnel_counts(events: DataFrame, stages: list[tuple[str, str]]) -> DataFrame:
    """Strict-order funnel over (user_id, event_type, ts_ms): stage k
    counts users with a stage-k event at-or-after their stage k-1
    conversion time. One shuffle total (stacked same-spec windows)."""
    w = Window.partitionBy("user_id")

    def stage_min(event_type: str, after_col: str | None) -> Column:
        cond = F.col("event_type") == event_type
        if after_col is not None:
            cond = cond & (F.col("ts_ms") >= F.col(after_col))
        return F.min(F.when(cond, F.col("ts_ms"))).over(w)

    staged, prev = events, None
    for i, (etype, _) in enumerate(stages):
        staged = staged.withColumn(f"t{i}", stage_min(etype, prev))
        prev = f"t{i}"
    tcols = [f"t{i}" for i in range(len(stages))]
    per_user = staged.groupBy("user_id").agg(
        *[F.max(c).alias(c) for c in tcols]
    )
    return per_user.agg(
        *[
            F.count(c).cast("long").alias(out)
            for c, (_, out) in zip(tcols, stages)
        ]
    )
