"""Skew-handling primitives for hot keys (the viral station / hot user
problem at 100 TB).

Joins: AQE's skew-join splitting handles most cases (enabled in
session.py). What AQE can NOT split is a single window/groupBy partition
— one key with 10^9 rows serializes onto one task. The fix is salting:

- salted_agg: two-phase aggregate — phase 1 groups on (key, salt) so the
  hot key fans out over N tasks; phase 2 merges the N partials. Works
  for any algebraic aggregate (sum/count/min/max, and avg via sum+count).
- salted_topk: top-k per key via (key, salt) local top-k then global
  top-k — the window-function equivalent of the same trick.

Salt is derived deterministically (pmod of a hash of a uniquifier), so
results are reproducible and the transform is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, uniquifier: str, buckets: int = 16) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(uniquifier)), F.lit(buckets)))


def salted_sum_count(
    df: DataFrame, key: str, value: str, uniquifier: str, buckets: int = 16
) -> DataFrame:
    """sum/count/avg per key, hot-key safe: (key, salt) partial -> key
    final. Identical results to a direct groupBy — the salt only splits
    the partial-aggregation fan-in."""
    partial = (
        with_salt(df, uniquifier, buckets)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_s"), F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("sum_value"),
        F.sum("_c").cast("long").alias("n_rows"),
        (F.sum("_s") / F.sum("_c")).alias("avg_value"),
    )


def salted_topk(
    df: DataFrame, key: str, order: list[Column], select: list[str], k: int,
    uniquifier: str, buckets: int = 16,
) -> DataFrame:
    """Top-k rows per key without a single-task hot partition: local
    top-k within (key, salt), then exact top-k over the <= buckets*k
    survivors per key."""
    salted = with_salt(df, uniquifier, buckets)
    w_local = Window.partitionBy(key, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w_final = Window.partitionBy(key).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w_final))
        .where(F.col("rk") <= k)
        .select(*select, "rk")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    uniquifier: str,
    buckets: int = 8,
) -> DataFrame:
    """Semantics-preserving salted equi join: the fact side gains a
    deterministic salt in [0, buckets); the dim side is replicated once
    per salt value (explode of a literal array); the join runs on
    (key, salt), so a hot key's rows spread over `buckets` tasks
    instead of serializing onto one.

    Result set is IDENTICAL to fact.join(dim, key) — the salt is an
    equi-partition refinement, never a filter. Cost: dim is scanned
    buckets× (it must be small enough to replicate but may be too big /
    too hot to broadcast outright). When to reach for this instead of
    AQE: OptimizeSkewedJoin splits oversized SORT-MERGE partitions at
    runtime, but does not apply to stream-static joins (no AQE in
    Structured Streaming) and cannot split a build-side hot key in a
    shuffled hash join; the salting rewrite handles both and is engine-
    version independent."""
    f = fact.withColumn(
        "_fsalt", F.pmod(F.xxhash64(F.col(uniquifier)), F.lit(buckets))
    )
    d = dim.withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return (
        f.join(
            d,
            (F.col(fact_key) == F.col(dim_key)) & (F.col("_fsalt") == F.col("_dsalt")),
        )
        .drop("_fsalt", "_dsalt")
    )
