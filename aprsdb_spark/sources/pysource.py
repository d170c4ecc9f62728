"""Python Data Source API (Spark 4.0, SPARK-44076): a custom batch
source for APRS replay fixture files, registered as
``spark.read.format("aprs_replay")``.

Why this exists: before Spark 4, a custom connector meant a JVM
DataSourceV2 implementation; the Python API makes the connector layer
reachable from this package with REAL partition-parallel reads — each
replay file is one InputPartition, so Spark schedules one task per
file and the reader runs in executor Python workers, not the driver.
The qid consuming it (queries/sources.a_pysrc_replay) proves
byte-fidelity against the committed fixtures via the same
fixture-VALUES oracle machinery as the aprs_* family.

At 100 TB the same class shape points at an object-store listing
(partitions() returns file splits; read() streams one split) — the
API contract is exactly what a production Python connector uses; only
the listing source changes.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Default fixture set — the five deterministic replay files every other
# fixture-backed qid shares.
REPLAY_FILES = (
    "pos_uncompressed.txt",
    "dupes_30s.txt",
    "wx_telemetry.txt",
    "msgs_acks.txt",
    "malformed.txt",
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, fname: str) -> None:
        self.path = path
        self.fname = fname


class AprsReplayReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.dir = options["path"]
        files = options.get("files")
        self.files = files.split(",") if files else list(REPLAY_FILES)

    def partitions(self):  # one task per replay file
        import os

        return [_FilePartition(os.path.join(self.dir, f), f) for f in self.files]

    def read(self, partition: _FilePartition):
        # Hadoop-line-reader splitting (\n / \r\n / lone \r, no row for
        # a trailing newline) — the same rule the fixture-VALUES oracle
        # applies, so the connector and the oracle see identical rows.
        yield from _read_lines(partition.path, partition.fname)


def _read_lines(path: str, fname: str) -> list[tuple]:
    """One replay file -> (fname, recv_ms, raw) tuples under the Hadoop
    line-split rule (shared by the batch reader and the stream reader,
    so both surfaces deliver byte-identical rows)."""
    import re

    with open(path, encoding="utf-8") as f:
        text = f.read()
    lines = re.split(r"\r\n|\r|\n", text)
    if lines and lines[-1] == "":
        lines.pop()
    out = []
    for line in lines:
        ms, _, raw = line.partition("\t")
        out.append((fname, int(ms), raw))
    return out


class AprsReplayStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the connector (Spark 4.0
    ``simpleStreamReader``): each micro-batch delivers ONE replay file,
    the offset is the index into the ordered file list — a dict of
    primitives, exactly what the checkpoint log serializes. Replay
    determinism comes from ``readBetweenOffsets``: failure recovery
    re-reads [start, end) and gets the same rows because the committed
    fixtures are immutable — the property the engine needs from any
    source to deliver exactly-once with an idempotent sink.

    The simple (driver-side) reader variant is the right one here:
    offsets are discovered WITH the data (no separate listing service),
    and the volume per batch is one fixture file. A high-throughput
    deployment implements DataSourceStreamReader instead — same offset
    contract, executor-side partitions — with no change to consumers.
    """

    def __init__(self, options: dict) -> None:
        self.dir = options["path"]
        files = options.get("files")
        self.files = files.split(",") if files else list(REPLAY_FILES)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        import os

        i = int(start["i"])
        if i >= len(self.files):
            return iter([]), {"i": i}
        f = self.files[i]
        return iter(_read_lines(os.path.join(self.dir, f), f)), {"i": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        import os

        for i in range(int(start["i"]), min(int(end["i"]), len(self.files))):
            f = self.files[i]
            yield from _read_lines(os.path.join(self.dir, f), f)


class AprsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "aprs_replay"

    def schema(self) -> str:
        return "fname string, recv_ms bigint, raw string"

    def reader(self, schema):
        return AprsReplayReader(self.options)

    def simpleStreamReader(self, schema):
        return AprsReplayStreamReader(self.options)
