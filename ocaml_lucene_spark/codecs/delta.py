"""Delta coding of ascending docID runs + packed-stream framing.

Semantic parity with /root/reference/bit_packing/delta_packing.ml:8-27:
ascending ids are stored as positive deltas; a width-0 prefix encodes the
"all deltas equal 1" run (dense docID range) with no payload. The general
path (unimplemented in the reference, `delta_packing.ml:27`) is completed
here: deltas are PFOR-packed (handles the few large gaps in otherwise
dense lists).

Stream framing for variable-length integer sequences (positions stream):
vint count, then per-128-chunk PFOR blocks, last chunk short.
"""

from __future__ import annotations

import numpy as np

from . import pfor
from .bitpack import BLOCK_SIZE
from .varint import read_vint, write_vint


def delta_encode(doc_ids: np.ndarray, base: int = -1) -> bytes:
    """Encode ascending doc_ids relative to ``base`` (exclusive floor).

    Layout: vint count | vint (first - base - 1) | marker | [payload].
    The first id is stored as its own vint so the PFOR payload only
    sees bounded inter-doc gaps (a rare term's first id can be ~N).
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return bytes([0])
    deltas = np.diff(ids)
    if ids[0] <= base or (deltas <= 0).any():
        raise ValueError("doc_ids must be strictly ascending above base")
    out = bytearray()
    write_vint(ids.size, out)
    write_vint(int(ids[0]) - base - 1, out)
    if bool((deltas == 1).all()):
        out.append(0)  # width-0 dense-run marker, parity with delta_packing.ml:8-16
        return bytes(out)
    out.append(1)
    payload = pfor.encode(deltas.astype(np.uint64))
    write_vint(len(payload), out)
    out += payload
    return bytes(out)


def delta_decode(data: bytes, base: int = -1) -> np.ndarray:
    count, pos = read_vint(data, 0)
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    first_off, pos = read_vint(data, pos)
    first = base + 1 + first_off
    marker = data[pos]
    pos += 1
    if marker == 0:
        return first + np.arange(count, dtype=np.int64)
    plen, pos = read_vint(data, pos)
    deltas = pfor.decode(data[pos : pos + plen], count - 1).astype(np.int64)
    out = np.empty(count, dtype=np.int64)
    out[0] = first
    np.cumsum(deltas, out=out[1:])
    out[1:] += first
    return out


def stream_encode(values: np.ndarray) -> bytes:
    """PFOR-pack an arbitrary-length uint sequence in 128-value chunks."""
    v = np.asarray(values, dtype=np.uint64)
    out = bytearray()
    write_vint(v.size, out)
    for start in range(0, v.size, BLOCK_SIZE):
        chunk = v[start : start + BLOCK_SIZE]
        payload = pfor.encode(chunk)
        write_vint(len(payload), out)
        out += payload
    return bytes(out)


def stream_decode(data: bytes) -> np.ndarray:
    count, pos = read_vint(data, 0)
    chunks = []
    remaining = count
    while remaining > 0:
        take = min(remaining, BLOCK_SIZE)
        plen, pos = read_vint(data, pos)
        chunks.append(pfor.decode(data[pos : pos + plen], take))
        pos += plen
        remaining -= take
    if not chunks:
        return np.zeros(0, dtype=np.uint64)
    return np.concatenate(chunks)
