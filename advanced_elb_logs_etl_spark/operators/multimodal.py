"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode/feature-extraction kernels themselves are STUBS in this
environment (no image/audio libraries in the container) — clearly marked
below — but everything Spark-side is real and tested: the binary column
schema, the mapInPandas batch shape (pandas DataFrames in/out), the output
StructType, and the partitioning story.

Scale notes:
- Binary payloads ride in the same parquet row groups as their metadata;
  column pruning means metadata-only queries never read payload bytes.
- mapInPandas streams Arrow record batches; peak executor memory is
  O(batch size x payload size) — set spark.sql.execution.arrow
  .maxRecordsPerBatch low (e.g. 64) for multi-MB payloads.
- Decode is CPU-bound and embarrassingly parallel: no shuffle at all; the
  task count equals input file splits.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata schema attached to every multimodal asset.
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — image decode requires an imaging library not present in this
    container. The Spark plumbing around it (binary column -> mapInPandas
    batches -> typed metadata) is real; swap this body for PIL/torchvision
    in a real deployment."""
    raise NotImplementedError("image decode stubbed: no imaging library in container")


def _fake_feature(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a decoded-content feature vector: bytes of
    md5(payload) scaled to [0,1). Lets tests pin exact values end-to-end."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 256.0 for i in range(dim)]


def extract_asset_metadata(
    df: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    modality: str = "image",
) -> DataFrame:
    """Binary payloads -> typed metadata via Arrow-batched mapInPandas.

    Computes size, content hash, and a (stubbed) feature vector per asset.
    This is the template for real decode/resize/frame-sample kernels: same
    batch iterator shape, same output schema discipline.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            # null payloads (failed upstream fetches) emit null metadata
            # instead of killing the stage with a worker TypeError. Explicit
            # None (not Series.where: it fills NaN floats, which break the
            # Arrow list/binary converters).
            payloads = list(batch[payload_col])
            yield pd.DataFrame(
                {
                    "asset_id": batch[id_col],
                    "payload_bytes": pd.array(
                        [len(b) if b is not None else None for b in payloads],
                        dtype="Int64",
                    ),
                    "payload_md5": [
                        hashlib.md5(b).hexdigest() if b is not None else None
                        for b in payloads
                    ],
                    "modality": modality,
                    "feature": pd.Series(
                        [_fake_feature(b) if b is not None else None for b in payloads],
                        dtype="object",
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        process, schema=ASSET_META_SCHEMA
    )


def documents_as_binary_assets(docs: DataFrame) -> DataFrame:
    """Adapter for the synthetic corpus: text bytes as a stand-in payload
    column (real deployments read binary files via `binaryFile` format)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_audio(payload: bytes) -> "object":
    """STUB — audio decode requires an audio library not present in this
    container (same contract as decode_image)."""
    raise NotImplementedError("audio decode stubbed: no audio library in container")


#: Output schema of resize_images.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize kernel plumbing: binary in -> binary out via Arrow-batched
    mapInPandas. The pixel resample itself is STUBBED (no imaging library
    in this container) with a deterministic fake — md5-keyed truncation to
    width*height bytes — so the batch shapes, output schema, and payload
    round-trip are real and testable; swap `_fake_resize` for
    PIL.Image.resize in deployment."""

    def _fake_resize(payload: bytes) -> bytes:
        target = max(1, min(len(payload), width * height))
        return hashlib.md5(payload).digest() + payload[:target]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "asset_id": batch[id_col],
                    "width": width,
                    "height": height,
                    "resized_payload": pd.Series(
                        [
                            _fake_resize(b) if b is not None else None
                            for b in batch[payload_col]
                        ],
                        dtype="object",
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        process, schema=RESIZED_SCHEMA
    )


#: Output schema of sample_frames — one row per sampled frame.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 8,
    max_frames: int = 4,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling plumbing: one input asset -> MANY output rows (the
    1:N expansion a video pipeline needs) via mapInPandas. The container
    demux/decode is STUBBED: the fake treats the payload as fixed-size
    'frames' of 16 bytes and samples every `every_n`-th — deterministic, so
    tests pin exact frames; swap for pyav/ffmpeg demux in deployment."""

    frame_bytes = 16

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, frames = [], [], []
            for asset_id, payload in zip(batch[id_col], batch[payload_col]):
                if payload is None:  # null payload -> no frames, not a crash
                    continue
                n_frames = max(1, len(payload) // frame_bytes)
                for k, frame_i in enumerate(range(0, n_frames, every_n)):
                    if k >= max_frames:
                        break
                    start = frame_i * frame_bytes
                    ids.append(asset_id)
                    idxs.append(frame_i)
                    frames.append(bytes(payload[start:start + frame_bytes]))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        process, schema=FRAME_SCHEMA
    )
