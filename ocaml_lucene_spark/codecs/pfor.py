"""PFOR (patched frame-of-reference) codec for 128-int blocks.

Semantic parity with the reference (/root/reference/bit_packing/
positive_ints.ml:18-64; /root/reference/doc/bit_packing.md "Patching"):

- base width = width of the 8th-largest value, but never more than
  8 bits below the max width (so each exception's high bits fit one byte);
- up to 7 exceptions stored as (index, high_bits) byte pairs;
- token byte = n_exceptions << 5 | base_width;
- special case: base width 0 (all values equal after patching) stores
  the common value as a vint instead of a packed payload.

Layout: token | [vint common OR packed low bits] | exceptions.
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack, packed_size, unpack
from .varint import read_vint, write_vint

MAX_EXCEPTIONS = 7


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return bytes([0, 0])
    vmax = int(v.max())
    out = bytearray()
    # width-0 special case (all values equal, vint payload) — only taken
    # with zero exceptions so decode is unambiguous; with exceptions we
    # fall through to the packed path (the reference's shifted-prefix
    # variant trades that ambiguity for one quirky byte; we don't need
    # byte parity, only round-trip semantics). This is THE hot block
    # shape (tf=1 runs, dense-delta runs), so it's checked first.
    if int(v.min()) == vmax:
        out.append(0)
        write_vint(vmax, out)
        return bytes(out)
    max_w = vmax.bit_length()
    if n <= MAX_EXCEPTIONS + 1 or max_w <= 8:
        # exceptions can't pay for themselves: plain FOR at max width
        # (also skips the per-block widths/partition numpy work — the
        # kernel encodes ~100k blocks per task, so per-block call count
        # matters more than a few saved bits)
        base_w = max_w
        exc_idx = np.zeros(0, dtype=np.int64)
        high = exc_idx
        low = v
    else:
        widths = np.zeros(n, dtype=np.int64)
        nz = v > 0
        widths[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        eighth_w = int(
            np.partition(widths, n - (MAX_EXCEPTIONS + 1))[n - (MAX_EXCEPTIONS + 1)]
        )
        base_w = max(eighth_w, max_w - 8)
        exc_idx = np.nonzero(widths > base_w)[0]
        if exc_idx.size > MAX_EXCEPTIONS:
            raise AssertionError("exception budget exceeded — base width selection bug")
        if base_w == max_w:
            high = np.zeros(0, dtype=np.uint64)
            low = v
        else:
            high = (v[exc_idx] >> np.uint64(base_w)).astype(np.uint64)
            if high.size and int(high.max()) > 0xFF:
                raise AssertionError("exception high bits exceed one byte")
            low = v & np.uint64((1 << base_w) - 1)
    # token byte: 3-bit exception count | 5-bit width (reference parity for
    # widths <= 30); field value 31 escapes to an explicit width byte, since
    # our payloads may be 64-bit (the reference caps at 32-bit postings ints).
    if base_w <= 30:
        out.append((exc_idx.size << 5) | base_w)
    else:
        out.append((exc_idx.size << 5) | 31)
        out.append(base_w)
    out += pack(low, base_w)
    for i, h in zip(exc_idx.tolist(), high.tolist()):
        out.append(i)
        out.append(h)
    return bytes(out)


def decode(data: bytes, count: int) -> np.ndarray:
    return decode_at(data, 0, count)[0]


def decode_at(data: bytes, pos: int, count: int) -> tuple[np.ndarray, int]:
    """Streaming decode: one PFOR block starting at ``pos``; returns
    (values, position after the block). The reader-side primitive for
    byte streams that concatenate blocks (postings .doc framing)."""
    token = data[pos]
    n_exc = token >> 5
    base_w = token & 0x1F
    pos += 1
    if token == 0:  # all-equal vint special case (no exceptions)
        common, pos = read_vint(data, pos)
        return np.full(count, common, dtype=np.uint64), pos
    if base_w == 31:  # wide-width escape
        base_w = data[pos]
        pos += 1
    v = unpack(data[pos : pos + packed_size(base_w, count)], base_w, count).astype(np.uint64)
    pos += packed_size(base_w, count)
    if n_exc:
        exc = np.frombuffer(data[pos : pos + 2 * n_exc], dtype=np.uint8).reshape(-1, 2)
        v[exc[:, 0]] |= exc[:, 1].astype(np.uint64) << np.uint64(base_w)
        pos += 2 * n_exc
    return v, pos
