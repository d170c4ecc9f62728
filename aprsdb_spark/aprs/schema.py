"""Canonical parsed-packet schema (FIXTURES.md §B) — a superset of the
aprslib.parse() dict, declared as an explicit StructType: production
ingest never relies on schema inference.

Entity tables (packets / stations / positions / weather / telemetry /
messages — SURVEY.md §1.1) are *views/filters* over this one wide
struct, not separate parse paths.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WX_SCHEMA = StructType(
    [
        StructField("wind_dir", IntegerType()),
        StructField("wind_speed", DoubleType()),
        StructField("gust", DoubleType()),
        StructField("temp_f", DoubleType()),
        StructField("rain_1h", DoubleType()),
        StructField("rain_24h", DoubleType()),
        StructField("rain_since_midnight", DoubleType()),
        StructField("humidity", IntegerType()),
        StructField("pressure_mb", DoubleType()),
    ]
)

TELEMETRY_SCHEMA = StructType(
    [
        StructField("seq", IntegerType()),
        StructField("vals", ArrayType(DoubleType())),
        StructField("bits", StringType()),
    ]
)

MSG_SCHEMA = StructType(
    [
        StructField("addressee", StringType()),
        StructField("text", StringType()),
        StructField("msg_no", StringType()),
        StructField("is_ack", BooleanType()),
        StructField("is_rej", BooleanType()),
    ]
)

PACKET_SCHEMA = StructType(
    [
        StructField("raw", StringType()),
        StructField("recv_ts", TimestampType()),
        StructField("src", StringType()),
        StructField("dst", StringType()),
        StructField("path", ArrayType(StringType())),
        StructField("q_construct", StringType()),
        StructField("gate", StringType()),
        StructField("dti", StringType()),
        StructField("fmt", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("symbol_table", StringType()),
        StructField("symbol", StringType()),
        StructField("altitude_m", DoubleType()),
        StructField("course_deg", DoubleType()),
        StructField("speed_kmh", DoubleType()),
        StructField("comment", StringType()),
        StructField("wx", WX_SCHEMA),
        StructField("telemetry", TELEMETRY_SCHEMA),
        StructField("msg", MSG_SCHEMA),
        StructField("obj_name", StringType()),
        StructField("obj_alive", BooleanType()),
        StructField("parse_error", StringType()),
    ]
)
