"""As-of join — "value as of time T" — lowered to union + window.

Spark has no native ASOF JOIN (pandas-on-Spark ``merge_asof`` lowers to a
similar plan). The classic scalable lowering, used here:

1. Tag left rows (side=1) and right rows (side=0), union by name.
2. One shuffle: window partitioned by the equi-key, ordered by
   ``(t, side, tiebreak)`` — right rows sort *before* left rows at equal
   t, so a right row at exactly t matches ("at or before").
3. ``last(right_payload, ignorenulls=True)`` over rows unboundedPreceding
   → current row carries the most recent right payload forward.
4. Keep left rows; inner semantics drop rows with no match.

Scale: ONE hash shuffle on the key + a per-partition sort. No join
explosion, no range-condition nested loop — at 100 TB this is the
difference between a sort within each key partition and an O(n*m)
per-key blowup. Skewed keys behave like any window (AQE cannot split a
single window partition — salt the key upstream if one key dominates).

Determinism: ties among right rows at the same ``t`` are broken by the
ascending ``tiebreak`` column — the LARGEST tiebreak wins (it sorts last,
and ``last()`` picks it), matching the oracle's
``ROW_NUMBER() ... ORDER BY t DESC, tiebreak DESC = 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    t: str,
    tiebreak: str,
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the latest right row with ``right.t <= left.t``
    within the same ``on`` key.

    ``left`` and ``right`` must both carry columns ``on``, ``t``,
    ``tiebreak``; right payload columns are returned as ``asof_<col>``.
    """
    l_tag = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"asof_{c}", F.lit(None).cast(right.schema[c].dataType))

    r_tag = right.select(
        on,
        t,
        tiebreak,
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    # Right rows carry nulls for left payload columns via unionByName.
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(t).asc(), F.col("_side").asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"asof_{c}"), ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in right_cols
        ],
    )
    out = filled.where(F.col("_side") == 1).drop("_side")
    for c in right_cols:
        out = out.drop(f"asof_{c}").withColumnRenamed(f"_filled_{c}", f"asof_{c}")
    if how == "inner":
        out = out.where(F.col(f"asof_{right_cols[0]}").isNotNull())
    return out
