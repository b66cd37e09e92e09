"""Multimodal column conventions + decode plumbing (SURVEY §2.10 D4).

Convention: media is an opaque ``binary`` payload column plus typed
metadata (media_type, n_bytes, content hash). Heavy per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` — the executor processes columnar batches, so Python
overhead is per-batch, not per-row, and the operator scales out with
the partitioning of the payload table.

The container has no image/audio codecs (env constraint), so the codec
call is stubbed: ``_decode_stub`` derives deterministic fake features
from the payload bytes. The Spark-side contract — schema, batch
iterator, binary handling, partition independence — is real and tested.
Swap ``_decode_stub`` for PIL/ffmpeg/torchaudio in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "duration_ms long, feature_norm double"
)

_HAS_REAL_CODECS = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAS_REAL_CODECS = True
except Exception:
    _HAS_REAL_CODECS = False


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode: dimensions/duration derived from byte stats.

    Production implementation would dispatch on media_type to a real
    codec; raising NotImplementedError there keeps the boundary honest.
    """
    if _HAS_REAL_CODECS:
        raise NotImplementedError("real codec path not wired in this environment")
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    return {
        "n_bytes": n,
        "width": 64 + checksum % 512 if media_type == "image/png" else None,
        "height": 64 + (checksum * 7) % 512 if media_type == "image/png" else None,
        "duration_ms": (n * 10) if media_type in ("audio/wav", "video/mp4") else None,
        "feature_norm": round((checksum % 1000) / 1000.0, 4),
    }


def decode_features(payload_df: DataFrame) -> DataFrame:
    """mapInPandas decode: (doc_id, payload binary, media_type) → typed features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[
                ["doc_id", "media_type", "n_bytes", "width", "height", "duration_ms", "feature_norm"]
            ]

    return payload_df.mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, media_type string, width int, height int, payload binary"


def resize_images(payload_df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing (mapInPandas, one row in → one row out).

    Stub transform: deterministic byte-stream resample (stride-sampled /
    zero-padded to width*height bytes) standing in for a real
    interpolating resize; the contract — binary in/out, fixed target
    dims, Arrow batches — is the production shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                b = bytes(p)
                if len(b) >= target:
                    step = max(1, len(b) // target)
                    b = b[::step][:target]
                b = b.ljust(target, b"\0")
                outs.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": width,
                    "height": height,
                    "payload": outs,
                }
            )

    return payload_df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame_payload binary"


def sample_frames(payload_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing (mapInPandas flat-map: one row → many).

    Stub decoder reuses _decode_stub's deterministic duration (10 ms per
    payload byte); each sampled frame carries a deterministic byte slice
    as its payload. Real implementation would seek/decode at ts_ms.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if m != "video/mp4":
                    continue
                b = bytes(p)
                duration = _decode_stub(b, m)["duration_ms"] or 0
                for i, ts in enumerate(range(0, duration, every_ms)):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(ts)
                    off = (ts // 10) % max(1, len(b))
                    frames.append(b[off : off + 16].ljust(16, b"\0"))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame_payload": frames}
            )

    return payload_df.mapInPandas(run, schema=FRAME_SCHEMA)
