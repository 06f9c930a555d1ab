"""Lucene80 norms (.nvd/.nvm) + SmallFloat int4 length encoding.

The one per-doc input BM25 scoring needs that the postings triple
doesn't carry: real Lucene stores each document's field length as a
lossily-encoded byte (``SmallFloat.intToByte4``) in a NumericDocValues
norms file pair — ``.nvm`` metadata entries + ``.nvd`` fixed-width
values (Lucene80NormsFormat). The reference never reads norms (its
postings path is stubbed before scoring enters the picture —
codec/lucene_84_postings_reader.ml:51-53), so there is no OCaml
analogue here; both directions are implemented from the public wire
format, evidence-pinned the same way as the postings streams:
writer↔reader round-trips + mutation properties (no golden fixture
exists to check against — same caveat as interop/postings_stream.py).

Scope: the DENSE and EMPTY cases (every doc has the field / no doc
does). The sparse case stores an IndexedDISI doc-id bitset + jump
table this repo doesn't implement — reading one raises, a documented
boundary like the unsupported PNG color types. Full-text body fields
are dense in practice (every indexed doc has a body).

Wire notes (all multi-byte meta/data integers BIG-endian, as Lucene
8.x DataOutput writes them — the same order the golden .tmd proved
for the codec magic):

``.nvm`` per field, terminated by field_number == -1:
    int   field_number
    long  docsWithFieldOffset   (-1 dense; -2 empty; >=0 sparse DISI)
    long  docsWithFieldLength   (0 for dense/empty)
    short jumpTableEntryCount   (-1 for dense/empty)
    byte  denseRankPower        (-1 for dense/empty)
    int   numDocsWithField
    byte  bytesPerNorm          (0 = constant, else 1/2/4/8)
    long  normsOffset           (the constant itself when
                                 bytesPerNorm == 0, else the absolute
                                 .nvd offset of numDocsWithField
                                 fixed-width signed values)

SmallFloat int4: values 0..23 exact, then a 3-bit-mantissa/5-bit-shift
float — monotone, decode(encode(x)) <= x, idempotent on decoded
values. BM25 impacts carry the ENCODED byte (competitive (freq, norm)
pairs compare stored norms; monotonicity keeps the pareto order).
"""

from __future__ import annotations

import numpy as np

from .data_input import DataInput
from .segment_meta import CODEC_MAGIC, check_index_header
from ..codecs.varint import write_vint

DATA_CODEC = "Lucene80NormsData"
META_CODEC = "Lucene80NormsMetadata"
VERSION = 0
_EMPTY_SUFFIX = b""  # the default norms format writes no segment suffix
_FOOTER = (~CODEC_MAGIC & 0xFFFFFFFF).to_bytes(4, "big") + bytes(12)


# ------------------------------------------------------------ SmallFloat


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    # keep the 4 most significant bits, drop the implicit leading 1,
    # store shift+1 (0 is reserved for the subnormal 0..7 range)
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24: 0..23 encode exactly


def int_to_byte4(i: int) -> int:
    """SmallFloat.intToByte4: lossy monotone int -> unsigned byte.
    This is what BM25Similarity stores as the norm for a doc of
    field length ``i``."""
    if i < 0:
        raise ValueError(f"only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """SmallFloat.byte4ToInt: decode a stored norm byte back to the
    (quantized) field length. b is the unsigned byte value 0..255."""
    if not 0 <= b <= 255:
        raise ValueError(f"norm byte out of range: {b}")
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


def encode_doc_lengths(doc_lengths: np.ndarray) -> np.ndarray:
    """Per-doc field lengths -> stored norm bytes (int64 array)."""
    dl = np.asarray(doc_lengths, dtype=np.int64)
    return np.array([int_to_byte4(int(x)) for x in dl], dtype=np.int64)


# ------------------------------------------------------------ writer


def _write_header(out: bytearray, codec: str, seg_id: bytes) -> None:
    out += CODEC_MAGIC.to_bytes(4, "big")
    write_vint(len(codec), out)
    out += codec.encode()
    out += VERSION.to_bytes(4, "big")
    out += seg_id
    out.append(len(_EMPTY_SUFFIX))
    out += _EMPTY_SUFFIX


def _be(value: int, width: int) -> bytes:
    return int(value).to_bytes(width, "big", signed=True)


def _bytes_per_norm(lo: int, hi: int) -> int:
    if lo == hi:
        return 0
    if -(2**7) <= lo and hi < 2**7:
        return 1
    if -(2**15) <= lo and hi < 2**15:
        return 2
    if -(2**31) <= lo and hi < 2**31:
        return 4
    return 8


def write_norms(
    fields: list[tuple[int, np.ndarray | None]],
    seg_id: bytes,
    max_doc: int,
) -> tuple[bytes, bytes]:
    """(field_number, per-doc norm values | None) -> (.nvd, .nvm)
    bytes. A values array must cover every doc (dense — length ==
    max_doc); None writes the empty entry (no doc has the field)."""
    nvd = bytearray()
    nvm = bytearray()
    _write_header(nvd, DATA_CODEC, seg_id)
    _write_header(nvm, META_CODEC, seg_id)
    for field_number, values in fields:
        nvm += _be(field_number, 4)
        if values is None:
            nvm += _be(-2, 8)  # docsWithFieldOffset: empty
            nvm += _be(0, 8)
            nvm += _be(-1, 2)
            nvm += _be(-1, 1)
            nvm += _be(0, 4)  # numDocsWithField
            nvm += _be(0, 1)  # bytesPerNorm
            nvm += _be(0, 8)  # normsOffset slot
            continue
        vals = np.asarray(values, dtype=np.int64)
        if len(vals) != max_doc:
            raise ValueError(
                f"dense norms need one value per doc: field "
                f"{field_number} has {len(vals)} for max_doc {max_doc}"
            )
        nvm += _be(-1, 8)  # docsWithFieldOffset: dense
        nvm += _be(0, 8)
        nvm += _be(-1, 2)
        nvm += _be(-1, 1)
        nvm += _be(max_doc, 4)
        lo, hi = int(vals.min()), int(vals.max())
        width = _bytes_per_norm(lo, hi)
        nvm += _be(width, 1)
        if width == 0:
            nvm += _be(lo, 8)  # the constant doubles as normsOffset
        else:
            nvm += _be(len(nvd), 8)
            for v in vals.tolist():
                nvd += _be(v, width)
    nvm += _be(-1, 4)  # field terminator
    nvd += _FOOTER
    nvm += _FOOTER
    return bytes(nvd), bytes(nvm)


# ------------------------------------------------------------ reader


def _read_be(di: DataInput, width: int) -> int:
    return int.from_bytes(di.read_bytes(width), "big", signed=True)


def _check_footer_at_end(data: bytes, what: str) -> None:
    if len(data) < 16 or data[-16:-12] != _FOOTER[:4]:
        raise ValueError(f"{what}: missing or corrupt footer magic")


class NormsReader:
    """Parsed .nvm entries + lazy dense value slices from .nvd."""

    def __init__(self, nvd: bytes, nvm: bytes, seg_id: bytes):
        check_index_header(
            DataInput(nvd), DATA_CODEC, VERSION, VERSION, seg_id, _EMPTY_SUFFIX
        )
        _check_footer_at_end(nvd, ".nvd")
        _check_footer_at_end(nvm, ".nvm")
        di = DataInput(nvm)
        check_index_header(
            di, META_CODEC, VERSION, VERSION, seg_id, _EMPTY_SUFFIX
        )
        self._nvd = nvd
        self.entries: dict[int, dict] = {}
        while True:
            field_number = _read_be(di, 4)
            if field_number == -1:
                break
            entry = {
                "docs_with_field_offset": _read_be(di, 8),
                "docs_with_field_length": _read_be(di, 8),
                "jump_table_entry_count": _read_be(di, 2),
                "dense_rank_power": _read_be(di, 1),
                "num_docs_with_field": _read_be(di, 4),
                "bytes_per_norm": _read_be(di, 1),
                "norms_offset": _read_be(di, 8),
            }
            if entry["bytes_per_norm"] not in (0, 1, 2, 4, 8):
                raise ValueError(
                    f"field {field_number}: invalid bytesPerNorm "
                    f"{entry['bytes_per_norm']}"
                )
            self.entries[field_number] = entry
        if di.pos != len(nvm) - 16:
            raise ValueError(".nvm: trailing bytes before the footer")

    def norms(self, field_number: int, max_doc: int) -> np.ndarray | None:
        """Dense per-doc norm values (int64, length max_doc), or None
        when no doc has the field. Sparse entries raise — the
        IndexedDISI bitset layout is out of scope (module doc)."""
        entry = self.entries.get(field_number)
        if entry is None:
            raise KeyError(f"field {field_number} has no norms entry")
        off = entry["docs_with_field_offset"]
        if off == -2:
            return None
        if off >= 0:
            raise NotImplementedError(
                "sparse norms (IndexedDISI docs-with-field bitset) are "
                "not supported; only dense and empty entries are"
            )
        n = entry["num_docs_with_field"]
        if n != max_doc:
            raise ValueError(
                f"dense norms entry covers {n} docs, segment has {max_doc}"
            )
        width = entry["bytes_per_norm"]
        if width == 0:
            return np.full(max_doc, entry["norms_offset"], dtype=np.int64)
        start = entry["norms_offset"]
        end = start + n * width
        if not (0 <= start <= end <= len(self._nvd) - 16):
            raise ValueError("norms values overrun the .nvd data region")
        raw = np.frombuffer(self._nvd, dtype=np.uint8, count=n * width,
                            offset=start).reshape(n, width)
        out = np.zeros(n, dtype=np.int64)
        for b in range(width):
            out = (out << 8) | raw[:, b].astype(np.int64)
        # sign-extend from the stored width
        sign_bit = np.int64(1) << (8 * width - 1)
        out = (out ^ sign_bit) - sign_bit
        return out


__all__ = [
    "DATA_CODEC",
    "META_CODEC",
    "NUM_FREE_VALUES",
    "NormsReader",
    "byte4_to_int",
    "encode_doc_lengths",
    "int_to_byte4",
    "write_norms",
]
