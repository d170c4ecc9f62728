"""Telemetry engineering-unit decoding (APRS101 §13).

Raw `T#seq,v1..v5,bits` frames carry ADC counts; the scaling
coefficients arrive separately as EQNS *messages*
(`:CALL     :EQNS.a1,b1,c1,...,a5,b5,c5`, value = a·v² + b·v + c), so
producing engineering units is a JOIN between two packet subsets —
exactly the shape SURVEY.md §1.1 calls out.

Everything is expressions: EQNS parse = regexp+split+chunked transform;
application = zip_with over the 5 channels. The defs side is tiny (one
row per station) — always broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eqns_definitions(packets: DataFrame) -> DataFrame:
    """Extract per-station EQNS coefficients from definition messages:
    (station, eqns: array<struct<a,b,c>> length 5). The message's
    addressee names the telemetry station."""
    eq = packets.where(
        F.col("msg").isNotNull() & F.col("msg.text").rlike(r"^EQNS\.")
    ).select(
        F.col("msg.addressee").alias("station"),
        F.split(F.regexp_replace(F.col("msg.text"), r"^EQNS\.", ""), ",").alias("_raw"),
        F.col("recv_ts"),
    )
    triple = lambda i: F.struct(  # noqa: E731
        F.try_element_at(F.col("_raw"), F.lit(3 * i + 1)).try_cast("double").alias("a"),
        F.try_element_at(F.col("_raw"), F.lit(3 * i + 2)).try_cast("double").alias("b"),
        F.try_element_at(F.col("_raw"), F.lit(3 * i + 3)).try_cast("double").alias("c"),
    )
    defs = eq.select(
        "station", "recv_ts", F.array(*[triple(i) for i in range(5)]).alias("eqns")
    )
    # latest definition per station wins (stations re-send defs)
    return defs.groupBy("station").agg(F.max_by("eqns", "recv_ts").alias("eqns"))


def apply_eqns(packets: DataFrame, defs: DataFrame) -> DataFrame:
    """Join telemetry frames to their station's EQNS and scale each
    channel: value = a·v² + b·v + c (identity 0,1,0 when no defs)."""
    tel = packets.where(F.col("telemetry").isNotNull()).select(
        "src",
        "recv_ts",
        F.col("telemetry.seq").alias("seq"),
        F.col("telemetry.vals").alias("vals"),
        F.col("telemetry.bits").alias("bits"),
    )
    joined = tel.join(F.broadcast(defs), tel.src == defs.station, "left").drop("station")
    scaled = F.zip_with(
        F.col("vals"),
        F.coalesce(
            F.col("eqns"),
            F.array_repeat(
                F.struct(
                    F.lit(0.0).alias("a"), F.lit(1.0).alias("b"), F.lit(0.0).alias("c")
                ),
                5,
            ),
        ),
        lambda v, e: e.a * v * v + e.b * v + e.c,
    )
    return joined.select(
        "src", "recv_ts", "seq", "vals", scaled.alias("eng_vals"), "bits"
    )
