"""transformWithStateInPandas (Spark 4.x) — the modern arbitrary-state
API (successor to applyInPandasWithState, RocksDB-backed, typed state
variables, per-key timers).

ENVIRONMENT NOTE — PERMANENT GATE IN THIS CONTAINER: the tws python
driver worker imports protobuf, which is not installed here and cannot
be (package installs are off-limits per the build constraints), so the
one importorskip in tests/test_streaming.py is a permanent, declared
skip — not a TODO. The operator is implemented and plan-constructed;
streaming/stateful.py (applyInPandasWithState) is the fully-tested
stateful path in this environment, and this module is the drop-in
modern form for protobuf-equipped clusters.

Operator: per-station packet-rate tracker with change detection — emits
a row only when a station's packet count crosses a power-of-two
threshold (1, 2, 4, 8...), i.e. an event-driven reducer that built-in
aggregations can't express (output depends on state *transition*, not
state). The same pattern implements billing meters, anomaly arming,
or "first heard" alerts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("src", StringType()),
        StructField("n_packets", LongType()),
        StructField("threshold_crossed", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("n", LongType())])


class RateThresholdProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n = self._count.get()[0] if self._count.exists() else 0
        emitted = []
        for pdf in rows:
            for _ in range(len(pdf)):
                n += 1
                if n & (n - 1) == 0:  # power of two -> threshold crossing
                    emitted.append((key[0], n, n))
        self._count.update((n,))
        if emitted:
            yield pd.DataFrame(emitted, columns=["src", "n_packets", "threshold_crossed"])

    def close(self) -> None:
        pass


def rate_threshold_stream(parsed: DataFrame) -> DataFrame:
    """Emit (src, count) whenever a station's lifetime packet count hits
    a power of two. Requires the RocksDB state store provider (set by
    the caller's session; see tests)."""
    return (
        parsed.where(parsed.src.isNotNull())
        .select("src", "recv_ts")
        .groupBy("src")
        .transformWithStateInPandas(
            RateThresholdProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
