"""As-of join — "value as of time T" — lowered to union + window.

Spark has no native ASOF JOIN (pandas-on-Spark ``merge_asof`` lowers to a
similar plan). The classic scalable lowering, used here:

1. Tag left rows (side=1) and right rows (side=0), union by name.
2. One shuffle: window partitioned by the equi-key, ordered by
   ``(t, side, tiebreak)`` — right rows sort *before* left rows at equal
   t, so a right row at exactly t matches ("at or before").
3. ``last(payload_struct, ignorenulls=True)`` over rows
   unboundedPreceding → current row carries the most recent right
   payload forward. The payload is a single STRUCT (non-null wrapper,
   nullable fields) so a right row whose payload values are NULL still
   wins the as-of race instead of leaking an older row's values.
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
    # Payload travels as ONE struct, not N independent columns: the
    # struct wrapper is non-null for every right row even when payload
    # FIELDS are null, so last(_, ignorenulls=True) always picks the
    # true latest right row — with per-column fill, a legitimately-NULL
    # payload value on the latest right row would leak the value from an
    # OLDER row forward. Bonus: one window expression instead of N, and
    # "matched" is simply "struct is non-null" (independent of which
    # fields happen to be null).
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r_tag = right.select(on, t, tiebreak, payload.alias("_asof_p")).withColumn(
        "_side", F.lit(0)
    )
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof_p", F.lit(None).cast(r_tag.schema["_asof_p"].dataType)
    )
    # Right rows carry nulls for left payload columns via unionByName.
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(t).asc(), F.col("_side").asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", F.last(F.col("_asof_p"), ignorenulls=True).over(w).alias("_filled")
    )
    out = filled.where(F.col("_side") == 1).drop("_side", "_asof_p")
    if how == "inner":
        out = out.where(F.col("_filled").isNotNull())
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col("_filled").getField(c))
    return out.drop("_filled")
