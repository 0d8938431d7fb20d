"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata.

Per the graft brief, the *decode* step is STUBBED (no image/audio libs in
this container): real formats raise NotImplementedError behind a clearly
marked gate, while a deterministic fake format ("ZMK1") exercises the
entire Spark-side pipeline for real — schema, Arrow batch shape,
``mapInPandas`` feature extraction, partitioning, and the .zseq binary
column roundtrip (binary payloads ride the K_BINARY column codec path).

Fake payload layout (deterministic, seed-free):

    magic  b"ZMK1"           4 bytes
    width  u16 LE            2
    height u16 LE            2
    frames u16 LE            2
    body   width*height % 4096 pseudo-pixel bytes (formula of media_id)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"ZMK1"

MEDIA_SPARK_SCHEMA = (
    "media_id long, kind string, payload binary, source string"
)
FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, frames int, "
    "payload_bytes long, body_checksum long"
)

KINDS = ["image", "audio", "video"]


def fake_payload(media_id: int) -> bytes:
    w = 16 + (media_id * 7) % 240
    h = 16 + (media_id * 13) % 120
    frames = 1 + (media_id % 5)
    n = (w * h) % 4096
    body = ((np.arange(n, dtype=np.int64) * (media_id + 1) * 2654435761)
            % 251).astype(np.uint8)
    return MAGIC + struct.pack("<HHH", w, h, frames) + body.tobytes()


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    rows = [
        (i, KINDS[i % 3], fake_payload(i), f"bucket_{i % 4}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SPARK_SCHEMA)


def _decode_payload(kind: str, payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, frames, body_checksum). Real media decoding is
    stubbed: only the deterministic fake format is implemented."""
    if payload[:4] != MAGIC:
        # STUB: real image/audio/video decoding requires PIL/ffmpeg/etc.,
        # which this container does not ship. The Spark-side plumbing
        # (batching, schema, partitioning) is identical either way.
        raise NotImplementedError(
            f"real {kind} decoding not available in this environment; "
            "payloads must be ZMK1 fakes"
        )
    w, h, frames = struct.unpack_from("<HHH", payload, 4)
    body = np.frombuffer(payload, dtype=np.uint8, offset=10)
    checksum = int(body.astype(np.int64).sum())
    return w, h, frames, checksum


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column —
    the mapInPandas pattern a real decoder would use (batch in, batch
    out, no per-row Python calls from the JVM)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [], "height": [], "frames": [],
                "payload_bytes": [], "body_checksum": [],
            }
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                w, h, f, ck = _decode_payload(kind, bytes(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["frames"].append(f)
                out["payload_bytes"].append(len(payload))
                out["body_checksum"].append(ck)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: requires an image library not present in this container."""
    raise NotImplementedError(
        "resize requires PIL/opencv; not available in this environment"
    )


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """STUB: requires a video library not present in this container."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg/pyav; not available in this "
        "environment"
    )
