"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the decode
step is a clearly-marked deterministic STUB (NotImplementedError for real
codecs); everything Spark-side — schema, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested. Swapping `_decode_stub` for
a real decoder (PIL/ffmpeg) is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "key string, n_bytes long, format string, width int, height int, "
    "feature array<float>"
)


def _sniff_format(head: bytes) -> str:
    """Magic-byte sniffing (real, public magic numbers)."""
    if head.startswith(b"\x89PNG"):
        return "png"
    if head.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if head.startswith(b"RIFF"):
        return "riff"
    if head.startswith(b"<html") or head.startswith(b"<!DOC"):
        return "html"
    return "unknown"


def _decode_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decoder: deterministic pseudo-dimensions + 8-dim feature from a
    sha256 of the payload. A real decoder goes here (PIL.Image.open /
    librosa / pyav); raise for formats a real pipeline must not fake."""
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feat = np.frombuffer(digest[:32], dtype=np.uint8)[:8].astype(np.float32) / 255.0
    return width, height, feat


def extract_media_meta(df: DataFrame, key_col: str, binary_col: str) -> DataFrame:
    """mapInPandas media feature extraction: binary -> typed metadata +
    fixed-width feature vector. Arrow-batched; per-row work is the decoder."""

    def run(batches):
        for pdf in batches:
            keys, sizes, fmts, ws, hs, feats = [], [], [], [], [], []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                keys.append(key)
                sizes.append(len(b))
                fmts.append(_sniff_format(b[:8]))
                w, h, f = _decode_stub(b)
                ws.append(w)
                hs.append(h)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "key": keys,
                    "n_bytes": np.array(sizes, dtype=np.int64),
                    "format": fmts,
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "feature": feats,
                }
            )

    return df.select(key_col, binary_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = (
    "key string, width int, height int, target_w int, target_h int, "
    "resized binary"
)


def _resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize: deterministic bytes derived from (payload digest,
    target dims) — a real implementation decodes, PIL-resizes, re-encodes.
    Output size scales with the target area so downstream size accounting
    is exercised realistically."""
    digest = hashlib.sha256(payload + target_w.to_bytes(4, "big") + target_h.to_bytes(4, "big")).digest()
    reps = max(1, (target_w * target_h) // 32)
    return (digest * reps)[: target_w * target_h]


def resize_media(
    df: DataFrame, key_col: str, binary_col: str,
    target_w: int = 32, target_h: int = 32,
) -> DataFrame:
    """mapInPandas resize: binary -> (original dims, target dims, resized
    bytes). The Spark-side plumbing (Arrow binary round-trip both ways,
    schema, batch shape) is real; the pixel work is the documented stub."""

    def run(batches):
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, _ = _decode_stub(b)
                rows.append(
                    {
                        "key": key,
                        "width": np.int32(w),
                        "height": np.int32(h),
                        "target_w": np.int32(target_w),
                        "target_h": np.int32(target_h),
                        "resized": _resize_stub(b, target_w, target_h),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["key", "width", "height", "target_w", "target_h", "resized"],
            )

    return df.select(key_col, binary_col).mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "key string, frame_idx int, n_frames int, ts_ms long, frame binary, "
    "frame_feature array<float>"
)


def sample_frames(
    df: DataFrame, key_col: str, binary_col: str, n_frames: int = 4
) -> DataFrame:
    """mapInPandas video frame sampling: one input row fans out to
    n_frames output rows (frame_idx, synthetic timestamp, frame bytes,
    per-frame feature). The 1->N Arrow fan-out, the per-frame schema, and
    deterministic frame identity are the real plumbing; frame extraction
    itself is the documented stub (a real implementation seeks with
    pyav/ffmpeg). Pseudo-duration is derived from the payload so
    timestamps are deterministic."""

    def run(batches):
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(b).digest()
                duration_ms = 1000 + int.from_bytes(digest[2:4], "big")
                for i in range(n_frames):
                    ts = (duration_ms * i) // max(n_frames - 1, 1)
                    fdig = hashlib.sha256(b + i.to_bytes(4, "big")).digest()
                    rows.append(
                        {
                            "key": key,
                            "frame_idx": np.int32(i),
                            "n_frames": np.int32(n_frames),
                            "ts_ms": np.int64(ts),
                            "frame": fdig,
                            "frame_feature": (
                                np.frombuffer(fdig[:8], dtype=np.uint8)
                                .astype(np.float32) / 255.0
                            ).tolist(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "frame_idx", "n_frames", "ts_ms", "frame",
                    "frame_feature",
                ],
            )

    return df.select(key_col, binary_col).mapInPandas(run, schema=FRAMES_SCHEMA)
