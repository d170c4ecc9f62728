"""§2.A — scans. Pushdown and pruning are Catalyst's job; these queries
exist to *verify* (via .explain: PushedFilters / ReadSchema) that the
declarative form reaches the parquet reader, and to anchor the bench.

100 TB note: at scale these scans hit a date/src-partitioned layout;
predicate + partition pruning means a 1-day query reads ~1/365th of the
data. Nothing in the query text changes — that is the point of staying
declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "a_scan_parquet",
    oracle="SELECT * FROM lineitem",
)
def a_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of lineitem (SURVEY.md §2.A)."""
    return load(spark, sf_dir).lineitem


@query(
    "a_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_extendedprice, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def a_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan: 3 of 11 columns, date filter.

    .explain('formatted') must show PushedFilters: [GreaterThanOrEqual(
    l_shipdate,...)] and ReadSchema with only the 3 columns.
    """
    t = load(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_extendedprice",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


@query(
    "a_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT)
             AS revenue_cents,
           CAST(MIN(l_shipdate) AS DATE) AS first_ship,
           CAST(MAX(l_shipdate) AS DATE) AS last_ship
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def a_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass pipeline telemetry via DataFrame.observe
    (SPARK-34806): named aggregate metrics ride the SAME physical scan
    as the production action — here the filtered lineitem pass runs to
    a zero-cost noop sink, and row count / exact DECIMAL-cents revenue
    / ship-date bounds are harvested from the Observation listener
    with NO second scan. This is how a 100 TB curation job reports
    "rows kept, value shipped, freshness window" for free: the
    alternative (a separate .agg pass) doubles the I/O; observe adds a
    per-partition accumulator merge instead. The returned relation is
    the 1-row metrics record (driver-side k-row state, the
    j_embed_centroid discipline); its oracle recomputes the same
    aggregates relationally, pinning that listener-side accumulation
    is value-identical to the declarative aggregate — integer cents,
    so no accumulation-order ulp can differ."""
    from pyspark.sql import Observation

    t = load(spark, sf_dir)
    obs = Observation("sg_scan_metrics")
    piped = (
        t.lineitem.where(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
            F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
            F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
        )
    )
    piped.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["revenue_cents"], m["first_ship"], m["last_ship"])],
        "n_rows long, revenue_cents long, first_ship date, last_ship date",
    )
