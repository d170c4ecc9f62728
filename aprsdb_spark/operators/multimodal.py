"""Multimodal columns: opaque binary payloads + typed metadata.

The engine's multimodal model: a document row carries
``struct<text string, payload binary, meta map<string,string>>``.
Payload decode / feature-extract runs as Arrow-batched ``mapInPandas``
— the ONLY sanctioned Python hot path, because codecs aren't
expressible as SQL. In this container the image/audio libraries are
absent, so the decode kernel is a clearly-marked deterministic STUB;
the Spark-side plumbing (schema, batch iteration, partitioning) is
real and tested.

100 TB: payloads dominate bytes. Keep them in their own column chunk
(parquet does), never project them except into the decode stage, and
size spark.sql.files.maxPartitionBytes so one task holds a few hundred
payloads, not a few million.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("format", StringType()),
    ]
)


def pack_multimodal(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, mm struct) with the text doubling as a fake
    binary payload (no real media in the fixtures)."""
    return docs.select(
        "doc_id",
        F.struct(
            F.col("text"),
            F.col("text").cast("binary").alias("payload"),
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("meta"),
        ).alias("mm"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: real image decoding needs PIL/libvips, absent here.

    Deterministic fake: pseudo-dimensions derived from payload bytes, so
    tests are stable and the full pipeline shape (binary in → typed
    metadata out) is exercised. Swap body for PIL.Image.open at deploy.
    """
    if not payload:
        raise NotImplementedError("empty payload; real codec not available in this env")
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    fmt = "png" if payload[0] % 2 == 0 else "jpeg"
    return w, h, fmt


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches of (doc_id, payload) →
    DECODED_SCHEMA rows. Vectorized per batch; one python worker per
    partition, payloads never cross the driver."""
    for pdf in it:
        dims = [_decode_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series([d[0] for d in dims], dtype="int64"),
                "height": pd.Series([d[1] for d in dims], dtype="int64"),
                "format": [d[2] for d in dims],
            }
        )


def decode_payloads(mm: DataFrame) -> DataFrame:
    """Run the decode stage over packed multimodal rows."""
    return mm.select("doc_id", F.col("mm.payload").alias("payload")).mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize: a real implementation decodes + rescales via
    PIL/libvips (absent here). Deterministic fake: tile/truncate the
    payload to the target byte budget (w*h//16) so output size tracks
    target dims and tests are stable. Swap body at deploy."""
    budget = max(w * h // 16, 1)
    reps = budget // max(len(payload), 1) + 1
    return (payload * reps)[:budget]


def resize_payloads(mm: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stage: binary in → binary out, target dims carried as
    typed columns. Same partitioning/batching discipline as decode."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int64"),
                    "height": pd.Series([height] * len(pdf), dtype="int64"),
                    "payload": [_resize_stub(p, width, height) for p in pdf["payload"]],
                }
            )

    return mm.select("doc_id", F.col("mm.payload").alias("payload")).mapInPandas(
        kernel, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(mm: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Frame-sampling stage (the video path): one payload row fans out
    to n_frames evenly-spaced fixed-size slices — 1→N inside the Arrow
    batch, no explode shuffle. A real implementation seeks keyframes
    via a codec; the slicing is the deterministic stand-in, the fan-out
    plumbing (schema, row multiplication, batch shape) is real."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, idxs, frames = [], [], []
        for pdf in it:
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                span = max(len(p) - frame_bytes, 0)
                for i in range(n_frames):
                    off = (span * i) // max(n_frames - 1, 1)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(p[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                }
            )
            ids, idxs, frames = [], [], []

    return mm.select("doc_id", F.col("mm.payload").alias("payload")).mapInPandas(
        kernel, FRAMES_SCHEMA
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(mm: DataFrame) -> DataFrame:
    """Feature-extract stage: payload → L2-normalized 16-bin byte
    histogram (high nibble). NOT a stub — byte histograms need no codec,
    so this is a real, deterministic embedding any downstream ANN qid
    can consume. numpy-vectorized per Arrow batch."""
    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                a = np.frombuffer(p, dtype=np.uint8)
                h = np.bincount(a >> 4, minlength=16).astype(np.float64)
                n = float(np.sqrt((h * h).sum()))
                feats.append((h / n).tolist() if n > 0 else h.tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "features": feats}
            )

    return mm.select("doc_id", F.col("mm.payload").alias("payload")).mapInPandas(
        kernel, FEATURES_SCHEMA
    )
