"""FOR (frame-of-reference) bit packing of 128-int blocks, numpy-vectorized.

Semantic parity with the reference (/root/reference/bit_packing/
bit_packing.ml:90-167 and doc/bit_packing.md): a block of 128
non-negative ints, each fitting in ``width`` bits, packs to exactly
``128*width/8 = 16*width`` bytes. Layout differs (we use a flat
little-endian bit stream via np.packbits rather than the reference's
parallel 64-bit-lane zip) — the lane layout is a CPU-vectorization
trick that numpy's bulk packbits already gives us; only size and
round-trip semantics are contracts.

All functions are whole-array numpy ops — no per-element Python. This
is the executor-side hot path that runs inside Arrow/pandas UDFs.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # parity: /root/reference/codec/block_tree_terms_reader.ml:27-28


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack len(values) ints of <= width bits into ceil(n*width/8) bytes."""
    if width == 0:
        return b""
    if width > 64:
        raise ValueError("width > 64 unsupported")
    v = np.ascontiguousarray(values, dtype="<u8")
    if v.size and int(v.max()) >> width:
        raise ValueError(f"value exceeds width {width}")
    # bits[i, j] = bit j of value i (little-endian bit order)
    bits = np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    return np.packbits(bits[:, :width].ravel(), bitorder="little").tobytes()


def unpack(data: bytes, width: int, count: int) -> np.ndarray:
    """Inverse of pack: first ``count`` ints of ``width`` bits."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    bits = bits[: count * width].reshape(count, width)
    full = np.zeros((count, 64), dtype=np.uint8)
    full[:, :width] = bits
    return np.packbits(full, axis=1, bitorder="little").view("<u8").ravel()


def packed_size(width: int, count: int = BLOCK_SIZE) -> int:
    return (count * width + 7) // 8


def encode_block(values: np.ndarray) -> bytes:
    """Self-describing FOR block: 1 width byte + packed payload.

    Width is chosen as the max bit width in the block (Lucene-style FOR
    without min subtraction, per doc/bit_packing.md note).
    """
    v = np.asarray(values, dtype=np.uint64)
    width = int(v.max()).bit_length() if v.size else 0
    return bytes([width]) + pack(v, width)


def decode_block(data: bytes, count: int) -> np.ndarray:
    width = data[0]
    return unpack(data[1:], width, count)
