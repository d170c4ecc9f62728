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
