"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as `binary` columns with a typed
metadata struct; the expensive decode/feature steps run as Arrow-batched
pandas functions over mapInPandas so executors stream batches without
materializing a partition of raw media in memory.

Decode support comes in two tiers:
- REAL stdlib-only codecs (operators/image_codecs.py +
  operators/jpeg_codec.py): PNG (zlib DEFLATE + scanline unfiltering
  incl. Paeth), 24-bit BMP, binary PPM/PGM, and baseline sequential
  JPEG (Huffman + dequant + IDCT + YCbCr, T.81) — ``decode_real_image``
  decodes these natively, and ``media_metadata`` /
  ``byte_histogram_features`` accept such blobs alongside the
  synthetic format;
- a deterministic fake decoder for a self-describing synthetic format
  (``FAKEIMG`` header) used by tests and the gate row — the Spark-side
  plumbing (schema, batch shapes, partitioning, UDF signatures) is the
  same either way;
- formats that genuinely need codecs absent from this container
  (progressive/arithmetic JPEG, WebP, video containers) still raise
  NotImplementedError at the marked PIL/libvips/pyAV integration
  point.

Operators: metadata extraction, resize (fake), frame sampling (fake
video = concatenated frames), feature extraction (byte-histogram
embedding over decoded pixels — a stand-in with the same shape/cost
profile as a vision-encoder call).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .image_codecs import decode_image, probe_dims, sniff_format

# everything a malformed-but-magic-matching blob can raise out of the
# stdlib codecs: corrupt DEFLATE (zlib.error), truncated fixed-offset
# slices (struct.error / IndexError), payload/size mismatches
# (ValueError), and the marked progressive-JPEG/WebP/video point
# (NotImplementedError) — an undecodable row must drop, never abort
# the Spark task
_DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    IndexError,
    struct.error,
    zlib.error,
)

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "n_bytes long, valid boolean"
)

FAKE_MAGIC = b"FAKEIMG1"


def _blob_list(col) -> list[bytes]:
    """Arrow binary columns can carry NULLs: a NULL blob is just an
    undecodable row (valid=False in the metadata pass, dropped by the
    feature pass) — never a task abort. Every multimodal op reads its
    blob column through this."""
    return [b"" if b is None else bytes(b) for b in col]


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


def decode_real_image(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a real image blob to (width, height, channels, pixels
    (h, w, c) uint8). PNG/BMP/PPM/PGM/baseline-JPEG decode natively
    with the stdlib (operators/image_codecs.py + jpeg_codec.py);
    anything else raises NotImplementedError at the remaining
    PIL/libvips/pyAV integration point (progressive JPEG, WebP and
    video codecs are not in this container)."""
    return decode_image(bytes(blob))


HEADER_LEN = 20  # 8-byte magic + 3x int32 LE dims


def _parse_headers(blobs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n_bytes, dims (n,3), valid) for a batch of blobs: the fixed-size
    headers are stacked into one (n, 20) uint8 matrix and decoded with
    a single np.frombuffer view + vectorized compares — the only
    per-row Python is slicing 20 header bytes per blob."""
    n = len(blobs)
    heads = b"".join(bytes(b[:HEADER_LEN]).ljust(HEADER_LEN, b"\0") for b in blobs)
    arr = np.frombuffer(heads, dtype=np.uint8).reshape(n, HEADER_LEN)
    n_bytes = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
    dims = (
        np.ascontiguousarray(arr[:, 8:HEADER_LEN]).view("<i4").reshape(n, 3).astype(np.int64)
    )
    magic = np.frombuffer(FAKE_MAGIC, dtype=np.uint8)
    magic_ok = (arr[:, :8] == magic).all(axis=1) if n else np.zeros(0, bool)
    valid = (
        magic_ok
        & (n_bytes >= HEADER_LEN)
        & (n_bytes - HEADER_LEN == dims[:, 0] * dims[:, 1] * dims[:, 2])
    )
    return n_bytes, dims, valid


def _stack_by_dims(blobs, dims: np.ndarray, valid: np.ndarray):
    """Yield (w, h, f, row_indices, pixels (m,f,h,w)) per distinct dim
    triple among the valid blobs: equal-shaped blobs concatenate into
    ONE contiguous buffer and reshape — the heavy per-pixel work then
    runs as a single numpy op per group instead of per row."""
    if not valid.any():
        return
    vidx = np.nonzero(valid)[0]
    keys = dims[vidx]
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    vidx = vidx[order]
    keys = keys[order]
    change = np.nonzero((np.diff(keys, axis=0) != 0).any(axis=1))[0] + 1
    for grp in np.split(np.arange(len(vidx)), change):
        rows = vidx[grp]
        w, h, f = (int(x) for x in dims[rows[0]])
        buf = b"".join(bytes(blobs[int(i)])[HEADER_LEN:] for i in rows)
        px = np.frombuffer(buf, dtype=np.uint8).reshape(len(rows), f, h, w)
        yield w, h, f, rows, px


def media_metadata(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """(media_id, kind, width, height, n_frames, n_bytes, valid) via a
    streaming mapInPandas pass — header-only parse, no pixel copy.

    The fixed-size headers of a whole Arrow batch are stacked into one
    (n, 20) uint8 matrix and decoded with a single np.frombuffer view +
    vectorized comparisons (_parse_headers)."""

    def op(batches):
        for pdf in batches:
            blobs = _blob_list(pdf[blob_col])
            n_bytes, dims, valid = _parse_headers(blobs)
            w = np.where(valid, dims[:, 0], 0).astype(np.int32)
            h = np.where(valid, dims[:, 1], 0).astype(np.int32)
            f = np.where(valid, dims[:, 2], 0).astype(np.int32)
            kind = np.where(valid, np.where(f > 1, "video", "image"), "unknown")
            # real formats (PNG/BMP/PPM/JPEG/GIF): header-only dim
            # probe for the rows that aren't synthetic — same cost
            # class as the 20-byte fake-header slice, no pixel decode.
            # Animated GIFs count frames by a block-length walk (still
            # no LZW decode) and report kind "video" like multi-frame
            # fakes do.
            for i in np.nonzero(~valid)[0]:
                b = bytes(blobs[int(i)])
                pr = probe_dims(b)
                if pr is not None:
                    nf = 1
                    if sniff_format(b) == "gif":
                        from .gif_codec import probe_gif_n_frames

                        nf = probe_gif_n_frames(b) or 0
                        if nf == 0:
                            # dims parsed but no frame: invalid — and
                            # report 0x0 like every other invalid row
                            # (r8 ADVICE: w/h were assigned before this
                            # check)
                            continue
                    w[i], h[i] = pr
                    f[i] = nf
                    kind[i] = "video" if nf > 1 else "image"
                    valid[i] = True
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
    where frame is a re-encoded single-frame blob — the synthetic fake
    format for fake videos, PNG for animated GIFs (the one real
    animation format with a native decoder); both re-encodings are
    decodable by the downstream feature/metadata passes. Output rows
    stream per Arrow batch — a partition of video never fully
    materializes. Fake blobs stay fully vectorized (identical-dim
    stacking, one strided slice per group); GIFs decode per blob (the
    codec-call cost class), composed frames capped at 64 per blob with
    hostile blobs dropped, never aborting the task."""

    def op(batches):
        from .gif_codec import decode_gif_frames
        from .image_codecs import encode_png, sniff_format as _sniff

        for pdf in batches:
            blobs = _blob_list(pdf[blob_col])
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            _, dims, valid = _parse_headers(blobs)
            out_ids, out_nos, out_frames = [], [], []
            for w, h, f, rows, px in _stack_by_dims(blobs, dims, valid):
                sel = np.ascontiguousarray(px[:, ::every_k])  # (m, n_sel, h, w)
                head = FAKE_MAGIC + np.array([w, h, 1], dtype="<i4").tobytes()
                frame_nos = range(0, f, every_k)
                for j, r in enumerate(rows):
                    for sj, fno in enumerate(frame_nos):
                        out_ids.append(int(ids[r]))
                        out_nos.append(fno)
                        out_frames.append(head + sel[j, sj].tobytes())
            for i in np.nonzero(~valid)[0]:
                b = bytes(blobs[int(i)])
                if _sniff(b) != "gif":
                    continue
                try:
                    _w, _h, frames = decode_gif_frames(b, max_frames=64)
                except _DECODE_ERRORS:
                    continue
                for fno in range(0, len(frames), every_k):
                    out_ids.append(int(ids[i]))
                    out_nos.append(fno)
                    out_frames.append(encode_png(frames[fno]))
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
    deterministic stand-in for PIL.resize; same schema contract).
    Vectorized: one fancy-index per identical-dims group over the
    stacked (m, f, h, w) array instead of per-row slicing."""

    def op(batches):
        for pdf in batches:
            in_blobs = _blob_list(pdf[blob_col])
            mids = pdf[id_col].to_numpy(dtype=np.int64)
            _, dims, valid = _parse_headers(in_blobs)
            ids, blobs = [], []
            for w, h, f, rows, px in _stack_by_dims(in_blobs, dims, valid):
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                res = np.ascontiguousarray(px[:, :, yi][:, :, :, xi])
                head = FAKE_MAGIC + np.array([out_w, out_h, f], dtype="<i4").tobytes()
                for j, r in enumerate(rows):
                    ids.append(int(mids[r]))
                    blobs.append(head + res[j].tobytes())
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
    real operator's shape (binary in, fixed-dim float vector out).
    Fully vectorized, no dims grouping needed: all valid blobs' pixels
    concatenate into one buffer and a single np.bincount over
    row_index * n_bins + bin computes every histogram at once.

    ``n_bins`` must divide 256: the shift-based binning
    (px * n_bins >> 8) equals np.histogram(range=(0, 256)) bin edges
    only for divisor bin counts — np.histogram's float linspace edges
    can place boundary bytes in the adjacent bin otherwise."""
    if 256 % n_bins != 0:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")

    def op(batches):
        for pdf in batches:
            blobs = _blob_list(pdf[blob_col])
            mids = pdf[id_col].to_numpy(dtype=np.int64)
            n_bytes, dims, valid = _parse_headers(blobs)
            # pixel buffers: fake blobs are header-stripped slices;
            # real formats decode (per-blob by nature — the PIL-call
            # cost class); the histogram pass below stays ONE bincount
            # over everything
            idxs: list[int] = []
            bufs: list[bytes] = []
            for i in np.nonzero(valid)[0]:
                idxs.append(int(i))
                bufs.append(bytes(blobs[int(i)])[HEADER_LEN:])
            for i in np.nonzero(~valid)[0]:
                b = bytes(blobs[int(i)])
                if sniff_format(b) is None:
                    continue
                try:
                    _, _, _, px = decode_image(b)
                except _DECODE_ERRORS:
                    continue
                idxs.append(int(i))
                bufs.append(px.tobytes())
            ids, feats = [], []
            if idxs:
                lens = np.fromiter(
                    (len(b) for b in bufs), dtype=np.int64, count=len(bufs)
                )
                px = np.frombuffer(b"".join(bufs), dtype=np.uint8)
                rows = np.repeat(np.arange(len(bufs), dtype=np.int64), lens)
                # bin edges identical to np.histogram(range=(0,256)):
                # uniform width 256/n_bins -> bin = px * n_bins // 256
                bins = (px.astype(np.int64) * n_bins) >> 8
                hist = np.bincount(
                    rows * n_bins + bins, minlength=len(bufs) * n_bins
                ).reshape(len(bufs), n_bins)
                totals = np.maximum(hist.sum(axis=1), 1)
                norm = (hist / totals[:, None]).astype(np.float32)
                ids = [int(mids[i]) for i in idxs]
                feats = [norm[j].tolist() for j in range(len(bufs))]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "features": pd.Series(feats, dtype=object),
                }
            )

    return df.mapInPandas(op, "media_id long, features array<float>")
