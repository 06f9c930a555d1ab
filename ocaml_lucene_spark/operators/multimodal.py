"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as `binary` columns with a typed
metadata struct; the expensive decode/feature steps run as Arrow-batched
pandas functions over mapInPandas so executors stream batches without
materializing a partition of raw media in memory.

The actual media codecs (PIL/ffmpeg/...) are NOT in this container, so
the decode step is STUBBED two ways, clearly marked:
- a deterministic fake decoder for a self-describing synthetic format
  (``FAKEIMG`` header) used by tests — the Spark-side plumbing (schema,
  batch shapes, partitioning, UDF signatures) is real and tested;
- ``decode_real_image`` raising NotImplementedError with the exact
  integration point where PIL/libvips would slot in.

Operators: metadata extraction, resize (fake), frame sampling (fake
video = concatenated frames), feature extraction (deterministic
byte-histogram embedding — a stand-in with the same shape/cost profile
as a vision-encoder call).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "n_bytes long, valid boolean"
)

FAKE_MAGIC = b"FAKEIMG1"


def encode_fake_image(media_id: int, width: int, height: int, n_frames: int = 1, seed: int = 42) -> bytes:
    """Deterministic synthetic media blob: 8-byte magic, 3x int32 LE
    dims, then width*height*n_frames pseudo-pixel bytes."""
    rng = np.random.default_rng(seed + media_id)
    head = FAKE_MAGIC + np.array([width, height, n_frames], dtype="<i4").tobytes()
    return head + rng.integers(0, 256, width * height * n_frames, dtype=np.uint8).tobytes()


def decode_fake_image(blob: bytes) -> tuple[int, int, int, np.ndarray] | None:
    if blob[:8] != FAKE_MAGIC:
        return None
    w, h, f = np.frombuffer(blob[8:20], dtype="<i4")
    px = np.frombuffer(blob[20:], dtype=np.uint8)
    if px.size != w * h * f:
        return None
    return int(w), int(h), int(f), px.reshape(int(f), int(h), int(w))


def decode_real_image(blob: bytes):
    """Integration point for a real decoder (PIL.Image.open(BytesIO(blob))
    / pyAV for video). Not available in this container."""
    raise NotImplementedError(
        "real image/audio/video codecs are not installed in this "
        "environment; wire PIL/libvips/pyAV here"
    )


HEADER_LEN = 20  # 8-byte magic + 3x int32 LE dims


def media_metadata(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """(media_id, kind, width, height, n_frames, n_bytes, valid) via a
    streaming mapInPandas pass — header-only parse, no pixel copy.

    The fixed-size headers of a whole Arrow batch are stacked into one
    (n, 20) uint8 matrix and decoded with a single np.frombuffer view +
    vectorized comparisons — the only per-row Python is slicing 20
    header bytes per blob."""
    magic = np.frombuffer(FAKE_MAGIC, dtype=np.uint8)

    def op(batches):
        for pdf in batches:
            n = len(pdf)
            heads = b"".join(
                bytes(b[:HEADER_LEN]).ljust(HEADER_LEN, b"\0") for b in pdf[blob_col]
            )
            arr = np.frombuffer(heads, dtype=np.uint8).reshape(n, HEADER_LEN)
            n_bytes = np.fromiter(
                (len(b) for b in pdf[blob_col]), dtype=np.int64, count=n
            )
            dims = (
                np.ascontiguousarray(arr[:, 8:HEADER_LEN])
                .view("<i4")
                .reshape(n, 3)
                .astype(np.int64)
            )
            magic_ok = (arr[:, :8] == magic).all(axis=1) if n else np.zeros(0, bool)
            valid = (
                magic_ok
                & (n_bytes >= HEADER_LEN)
                & (n_bytes - HEADER_LEN == dims[:, 0] * dims[:, 1] * dims[:, 2])
            )
            w = np.where(valid, dims[:, 0], 0).astype(np.int32)
            h = np.where(valid, dims[:, 1], 0).astype(np.int32)
            f = np.where(valid, dims[:, 2], 0).astype(np.int32)
            kind = np.where(valid, np.where(f > 1, "video", "image"), "unknown")
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(
                        pdf[id_col].to_numpy(dtype=np.int64), dtype="int64"
                    ),
                    "kind": pd.Series(kind, dtype=object),
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "n_frames": pd.Series(f, dtype="int32"),
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "valid": pd.Series(valid, dtype=bool),
                }
            )

    return df.mapInPandas(op, MEDIA_SCHEMA)


def sample_frames(
    df: DataFrame, every_k: int = 2, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """Explode videos into sampled frames: (media_id, frame_no, frame)
    where frame is a re-encoded single-frame blob. Output rows stream
    per Arrow batch — a partition of video never fully materializes."""

    def op(batches):
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                dec = decode_fake_image(bytes(blob))
                if dec is None:
                    continue
                w, h, f, px = dec
                for fno in range(0, f, every_k):
                    head = FAKE_MAGIC + np.array([w, h, 1], dtype="<i4").tobytes()
                    out_ids.append(int(mid))
                    out_nos.append(fno)
                    out_frames.append(head + px[fno].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_no": pd.Series(out_nos, dtype="int32"),
                    "frame": pd.Series(out_frames, dtype=object),
                }
            )

    return df.mapInPandas(op, "media_id long, frame_no int, frame binary")


def resize_stub(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """Nearest-neighbor 'resize' on the fake format (numpy slicing —
    deterministic stand-in for PIL.resize; same schema contract)."""

    def op(batches):
        for pdf in batches:
            ids, blobs = [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                dec = decode_fake_image(bytes(blob))
                if dec is None:
                    continue
                w, h, f, px = dec
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                res = px[:, yi][:, :, xi]
                head = FAKE_MAGIC + np.array([out_w, out_h, f], dtype="<i4").tobytes()
                ids.append(int(mid))
                blobs.append(head + res.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "blob": pd.Series(blobs, dtype=object),
                }
            )

    return df.mapInPandas(op, "media_id long, blob binary")


def byte_histogram_features(
    df: DataFrame, n_bins: int = 64, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(media_id, features array<float>): normalized byte histogram —
    deterministic stand-in for a vision-encoder embedding, with the
    real operator's shape (binary in, fixed-dim float vector out)."""

    def op(batches):
        for pdf in batches:
            ids, feats = [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                dec = decode_fake_image(bytes(blob))
                if dec is None:
                    continue
                _, _, _, px = dec
                hist, _ = np.histogram(px.ravel(), bins=n_bins, range=(0, 256))
                total = hist.sum() or 1
                ids.append(int(mid))
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "features": pd.Series(feats, dtype=object),
                }
            )

    return df.mapInPandas(op, "media_id long, features array<float>")
