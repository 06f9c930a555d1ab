"""LEB128 varint/vlong + zigzag codecs.

Semantics parity with the reference's byte-level IO
(/root/reference/data_input/data_input.ml:82-101 read side,
/root/reference/data-output/data_output.ml:13-24 write side,
/root/reference/utils/bit_utils.ml:33-35 zigzag): 7 payload bits per
byte, continuation bit 0x80, little-endian group order.

These are used only for *small metadata* (block headers, exception
counts); bulk integer streams go through the vectorized FOR/PFOR
codecs in bitpack.py/pfor.py, so scalar Python here is not a hot path.
"""

from __future__ import annotations

import numpy as np


def write_vint(value: int, out: bytearray) -> None:
    """Append LEB128 encoding of a non-negative int to ``out``."""
    if value < 0:
        raise ValueError("vint must be non-negative; zigzag first")
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_vint(buf: bytes, pos: int) -> tuple[int, int]:
    """Read LEB128 int at ``pos``; return (value, next_pos)."""
    shift = 0
    value = 0
    while True:
        b = buf[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not (b & 0x80):
            return value, pos
        shift += 7


def zigzag_encode(n: int | np.ndarray) -> int | np.ndarray:
    """Map signed -> unsigned: 0,-1,1,-2,... -> 0,1,2,3,..."""
    if isinstance(n, np.ndarray):
        s = n.astype(np.int64)
        return ((s << 1) ^ (s >> 63)).astype(np.uint64)
    # Python ints are arbitrary precision: arithmetic >> of a negative
    # gives -1 (all-ones), mirroring the int64 sign extension above.
    return ((n << 1) ^ (n >> 63)) & (2**64 - 1)


def zigzag_decode(u: int | np.ndarray) -> int | np.ndarray:
    if isinstance(u, np.ndarray):
        v = u.astype(np.uint64)
        return (v >> np.uint64(1)).astype(np.int64) ^ -(v & np.uint64(1)).astype(np.int64)
    return (u >> 1) ^ -(u & 1)


def msb(n: int) -> int:
    """Bit width of n (index of most significant set bit + 1); msb(0)=0.

    Mirrors /root/reference/utils/bit_utils.ml:48-61.
    """
    return int(n).bit_length()


def bit_widths(values: np.ndarray) -> np.ndarray:
    """Vectorized bit width per element (uint32/uint64 arrays)."""
    v = values.astype(np.uint64)
    out = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # log2 of the top set bit: use float log2 carefully (exact for <2^53;
    # our packed values are <2^32 so this is exact).
    out[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    return out
