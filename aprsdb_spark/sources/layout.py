"""Table layout for the 100 TB deployment.

The collector's event tables (packets / events) are append-only and
time-keyed; the layout that keeps every query in this engine fast is:

- partition by event DATE (coarse: one directory per day) — partition
  pruning turns "last 24h" into reading 1/365th of the table;
- optionally bucket by the entity key (src / user_id) inside each
  partition — co-locates each station's data for windows and joins;
- sort within files by (entity, time) — row-group min/max stats then
  prune *within* a day for single-entity lookups.

`write_partitioned` / `read_partitioned` implement it; the pruning
proof lives in tests/test_scale_paths.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_ms_col: str = "ts_ms",
    entity_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` date-partitioned (plus in-file sort by entity, time).

    maxRecordsPerFile bounds file size instead of repartition(N): the
    writer scales with data volume without a hand-tuned constant.
    """
    staged = df.withColumn("p_date", F.to_date(F.timestamp_millis(F.col(ts_ms_col))))
    sort_cols = [c for c in (entity_col, ts_ms_col) if c]
    if sort_cols:
        staged = staged.sortWithinPartitions("p_date", *sort_cols)
    (
        staged.write.mode(mode)
        .option("maxRecordsPerFile", 5_000_000)
        .partitionBy("p_date")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout back; p_date filters prune directories before any
    IO (PartitionFilters in the scan node)."""
    return spark.read.parquet(path)
