"""Lowercase-ASCII 6-bit string compression.

Semantic parity with /root/reference/terms-enumerator/
lowercase_ascii_compression.ml:6-95 (doc/lowercase_ascii_compression.md):
bytes in the exact reference ranges (0x1F,0x3F] and (0x5F,0x7F] shrink
to 6 bits (high bit = range flag), the final quarter of the shrunk
bytes is packed 4->3 into the
spare top-2 bits of the first three quarters, and non-compressible bytes
are recorded as (gap, byte) exception pairs (gap saturates at 255).

Numpy-vectorized; used for term-dictionary suffix blocks that are
almost entirely [a-z0-9] (our tokenizer guarantees that), where it beats
LZ4 on short blocks.
"""

from __future__ import annotations

import numpy as np


def _is_compressible(b: np.ndarray) -> np.ndarray:
    # exact reference ranges (lowercase_ascii_compression.ml:31-32):
    # (0x1F,0x3F] and (0x5F,0x7F]. The +1 shrink wraps the two closed
    # upper bounds (0x3F -> code 0x20, 0x7F -> code 0x00); both codes
    # are unambiguous because the open lower bounds exclude the bytes
    # that would otherwise produce them, and decompress special-cases
    # the pair.
    return ((b > 0x1F) & (b <= 0x3F)) | ((b > 0x5F) & (b <= 0x7F))


def compress(data: bytes) -> bytes:
    raw = np.frombuffer(data, dtype=np.uint8)
    n = raw.size
    b = (raw.astype(np.uint16) + 1).astype(np.uint8)
    shrunk = (b & 0x1F) | ((b & 0x40) >> 1)  # 6-bit code, bit5 = range flag

    pack_len = n // 4
    pack_start = n - pack_len
    out = bytearray()
    if pack_len:
        head = shrunk[: 3 * pack_len].copy()
        tail = shrunk[pack_start:]
        # bits (5,4), (3,2), (1,0) of each tail byte go into the top-2 bits
        # of the 1st, 2nd, 3rd third of head respectively
        for k in range(3):
            seg = head[k * pack_len : (k + 1) * pack_len]
            seg |= ((tail >> (4 - 2 * k)) & 0x3) << 6
        out += head.tobytes()
        out += shrunk[3 * pack_len : pack_start].tobytes()
    else:
        out += shrunk.tobytes()

    # exceptions: positions whose original byte is not compressible; gap
    # counter saturates at 255 (a 255 entry re-writes the byte at that pos)
    exc = bytearray()
    count = 0
    gap = 0
    comp = _is_compressible(raw)
    for i in range(n):
        gap += 1
        if gap == 255 or not comp[i]:
            exc.append(gap)
            exc.append(int(raw[i]))
            count += 1
            gap = 0
    if count > 255:
        raise ValueError("too many exceptions for one block")
    out.append(count)
    out += exc
    return bytes(out)


def decompress(data: bytes, original_len: int) -> bytes:
    n = original_len
    pack_len = n // 4
    pack_start = n - pack_len
    buf = np.zeros(n, dtype=np.uint8)
    buf[:pack_start] = np.frombuffer(data[:pack_start], dtype=np.uint8)
    if pack_len:
        c1 = buf[:pack_len]
        c2 = buf[pack_len : 2 * pack_len]
        c3 = buf[2 * pack_len : 3 * pack_len]
        buf[pack_start:] = ((c1 & 0xC0) >> 2) | ((c2 & 0xC0) >> 4) | (c3 >> 6)
    b = buf & 0x3F
    orig = ((((b & 0x20) << 1) | 0x20 | (b & 0x1F)).astype(np.int16) - 1).astype(np.uint8)
    # wrapped upper-bound codes: 0x3F -> 0x40 -> code 0x20 (flag only),
    # 0x7F -> 0x80 -> code 0x00
    orig[b == 0x20] = 0x3F
    orig[b == 0x00] = 0x7F

    pos = pack_start
    count = data[pos]
    pos += 1
    at = -1
    for _ in range(count):
        at += data[pos]
        orig[at] = data[pos + 1]
        pos += 2
    return orig.tobytes()
