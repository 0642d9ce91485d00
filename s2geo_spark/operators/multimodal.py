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
