"""Binary-column processors for multimodal data.

Pattern (the part that matters at 100 TB): binary payloads ride in
ordinary parquet ``binary`` columns; decode / feature-extract runs as
``mapInPandas`` — Arrow-batched, zero-copy into pandas, one Python
worker per partition, never a row-at-a-time UDF. Output schemas are
explicit StructTypes so downstream relational ops stay fully typed.

REAL DECODERS ARE STUBBED: this environment has no image/audio libs.
``decode_image_meta(..., fake=True)`` (the default here) derives
deterministic pseudo-metadata from the payload bytes so the plumbing
(batching, schema, partition behavior) is testable end-to-end;
``fake=False`` raises NotImplementedError where PIL would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes here;
    in production this is the raw image/audio blob read from the lake).
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic pseudo image header derived from content bytes —
    stands in for PIL.Image.open(...) which is unavailable here."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mode = ["RGB", "RGBA", "L"][digest[2] % 3]
    return width, height, mode


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Arrow-batched decode of binary payloads → typed metadata rows.

    mapInPandas: each partition arrives as an iterator of pandas
    batches; output conforms to IMAGE_META_SCHEMA. No shuffle — runs
    scan-side wherever the payload partitions already live.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not available in this environment"
                )
            decoded = [_fake_decode(bytes(p)) for p in batch[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in batch[payload_col]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mode": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Frame sampling stub: emit every Nth chunk of the payload as a
    'frame' (stands in for ffmpeg keyframe extraction — one input row
    fans out to many typed frame rows, the real plumbing pattern)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg bindings — not available here"
                )
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(data[off : off + every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(process, FRAME_SCHEMA)


def resize_image(df: DataFrame, width: int = 32, height: int = 32, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Resize stub: emit a fixed-size 'thumbnail' per payload (stands
    in for PIL Image.resize). The fake codec tiles/truncates the
    content bytes to exactly width*height bytes, so output size is
    shape-correct and content-deterministic — the real plumbing
    (Arrow batches, fixed output schema, no shuffle) is exercised."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/libvips — not available here"
                )
            thumbs = []
            for payload in batch[payload_col]:
                data = bytes(payload) or b"\x00"
                reps = -(-n // len(data))  # ceil
                thumbs.append((data * reps)[:n])
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, RESIZED_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Feature-extraction stub: a FEATURE_DIM-float 'embedding' per
    payload (stands in for a vision/audio encoder forward pass). Fake
    path derives unit-interval floats from the md5 digest — stable
    across runs and partitionings, so downstream ANN plumbing
    (array<double> column, similarity joins) is testable end-to-end."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a model runtime — not available here"
                )
            feats = []
            for payload in batch[payload_col]:
                digest = hashlib.md5(bytes(payload)).digest()
                feats.append([digest[i * 2] / 255.0 for i in range(FEATURE_DIM)])
            yield pd.DataFrame({"doc_id": batch[id_col].astype("int64"), "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(process, FEATURE_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def audio_windows(
    df: DataFrame,
    window_bytes: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Overlapping audio-analysis windows (stands in for PCM frame
    windowing — window/stride in bytes instead of samples) with a
    per-window mean-byte energy stub standing in for RMS. Same
    Arrow-batched mapInPandas fan-out pattern as sample_frames, but
    overlapping: each byte lands in window_bytes/stride windows."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real PCM windowing requires audio bindings — not available here"
                )
            ids, idxs, sizes, means = [], [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload)
                for i, off in enumerate(range(0, len(data), stride)):
                    seg = data[off : off + window_bytes]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(len(seg))
                    means.append(sum(seg) / len(seg))
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": idxs, "n_bytes": sizes, "mean_byte": means}
            )

    return df.select(id_col, payload_col).mapInPandas(process, AUDIO_WINDOW_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("is_scene_start", BooleanType()),
    ]
)


def scene_changes(
    df: DataFrame,
    frame_bytes: int = 64,
    threshold: float = 2.0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Scene-change detection stub over tumbling byte frames: a frame
    starts a 'scene' when its mean byte intensity jumps more than
    ``threshold`` from the previous frame (stands in for ffmpeg
    scdet / histogram-difference shot detection). The first frame is
    always a scene start.

    Intensity is exact integer math (sum of <=frame_bytes bytes in a
    double), so unlike the decode stubs this skeleton is fully
    SQL-expressible and the registry entry is hash-ORACLED, not
    rows-only — the strongest check available for mapInPandas
    plumbing.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real scene detection requires ffmpeg bindings — not available here"
                )
            ids, idxs, means, starts = [], [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload)
                prev = None
                for i, off in enumerate(range(0, len(data), frame_bytes)):
                    seg = data[off : off + frame_bytes]
                    m = sum(seg) / len(seg)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    means.append(m)
                    starts.append(prev is None or abs(m - prev) > threshold)
                    prev = m
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "mean_byte": means,
                    "is_scene_start": starts,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, SCENE_SCHEMA)
