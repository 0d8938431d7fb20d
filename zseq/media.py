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
    body   width*height*frames pseudo-pixel bytes, frame-major
           (a pure formula of media_id)

resize_images / sample_frames are REAL vectorized numpy kernels over
these planes (the exact index arithmetic a PIL/ffmpeg-decoded array
would get); only the foreign-format decode raises NotImplementedError.
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
    w = 8 + (media_id * 7) % 56
    h = 8 + (media_id * 13) % 40
    frames = 1 + (media_id % 5)
    n = w * h * frames
    body = ((np.arange(n, dtype=np.int64) * (media_id + 1) * 2654435761)
            % 251).astype(np.uint8)
    return MAGIC + struct.pack("<HHH", w, h, frames) + body.tobytes()


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    rows = [
        (i, KINDS[i % 3], fake_payload(i), f"bucket_{i % 4}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SPARK_SCHEMA)


def _decode_planes(kind: str, payload: bytes):
    """(width, height, frames, body[frames, h, w]). Real media decoding
    is stubbed: only the deterministic fake format is implemented."""
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
    if body.size != w * h * frames:
        raise ValueError(
            f"ZMK1: body is {body.size} bytes, header says "
            f"{w}x{h}x{frames}")
    return w, h, frames, body.reshape(frames, h, w)


def _decode_payload(kind: str, payload: bytes) -> tuple[int, int, int, int]:
    w, h, frames, planes = _decode_planes(kind, payload)
    return w, h, frames, int(planes.astype(np.int64).sum())


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
    """Nearest-neighbor resize of every frame to (width, height) —
    mapInPandas, vectorized numpy index arithmetic per payload (exactly
    what a real decoded pixel array would get; only the foreign-format
    decode is stubbed). Emits new ZMK1 payloads in the media schema, so
    resized datasets re-enter every other operator unchanged."""
    if width <= 0 or height <= 0:
        raise ValueError("resize: width/height must be positive")
    if width > 0xFFFF or height > 0xFFFF:
        # ZMK1 stores dims as u16 — refuse on the driver, not as a
        # struct.error inside some executor task
        raise ValueError("resize: width/height exceed the format's "
                         "65535 ceiling")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                w, h, frames, planes = _decode_planes(kind, bytes(payload))
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                res = planes[:, yi][:, :, xi]
                out_payloads.append(
                    MAGIC + struct.pack("<HHH", width, height, frames)
                    + res.tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": out_payloads,
                "source": pdf["source"],
            })

    return df.mapInPandas(fn, MEDIA_SPARK_SCHEMA)


FRAMES_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, frame binary"
)


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """Keep every n-th frame of each payload, one output row per kept
    frame (the fan-out shape a real video pipeline needs: rows explode,
    Spark repartitions downstream on whatever key the consumer picks)."""
    if every_n <= 0:
        raise ValueError("sample_frames: every_n must be positive")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "width": [],
                    "height": [], "frame": []}
            for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, frames, planes = _decode_planes(kind, bytes(payload))
                for idx in range(0, frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["frame"].append(planes[idx].tobytes())
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, FRAMES_SCHEMA)
