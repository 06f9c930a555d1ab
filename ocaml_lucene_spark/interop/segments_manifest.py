"""segments_N manifest parse: the top-level Lucene commit point.

Semantics provenance: /root/reference/codec/segments.ml:54-115
(for_data_input + latest) over /root/reference/codec/codec_util.ml and
the OLDER Lucene_data_input module (/root/reference/data_input/
data_input.ml:58-137) — which, unlike data-input-2, reads ints and
longs BIG-endian (read_int = b1<<24|..., read_long = 8-byte BE Int64)
and applies no Int32/63-bit wraps to vints/vlongs. Its
read_list_of_strings shares the cons-evaluation-order quirk (the first
string read lands at the list's TAIL), while assoc lists let-bind and
stay in read order.

Replicated reference quirks (deliberate — parity, not bugs to fix):
- ``read_segments seg_count`` ignores its count and reads exactly ONE
  segment entry (segments.ml:62-90 binds the count but the body never
  recurses), so a 2-segment manifest still yields a 1-element list.
- per-segment ``field_infos_files`` comes back REVERSED from byte
  order (the cons quirk); ``doc_values_updates_files`` values too.

``latest`` diverges from the reference's implementation on purpose:
the reference grabs the FIRST readdir entry starting with "segments"
(segments.ml:106-108), but its own doc comment says "Find the most
recent" — we implement the documented intent (and real Lucene's rule):
pick the segments_N file with the largest base36 generation N.

No golden fixture exists in the reference's data/ for this format, so
tests/test_reference_fixtures.py synthesizes manifest bytes from this
grammar and round-trips them (incl. newest-of-two-generations
selection).
"""

from __future__ import annotations

import os
import re

CODEC_MAGIC = 0x3FD76C17
FOOTER_MAGIC = ~CODEC_MAGIC & 0xFFFFFFFF
FOOTER_LENGTH = 16
ID_LENGTH = 16


class _BEInput:
    """Old-module reader: BIG-endian ints/longs, unwrapped vints."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError(f"wanted {n} bytes at {self.pos}")
        self.pos += n
        return out

    def read_int(self) -> int:
        return int.from_bytes(self.read_bytes(4), "big")

    def read_long(self) -> int:
        v = int.from_bytes(self.read_bytes(8), "big", signed=False)
        return v - (1 << 64) if v >= 1 << 63 else v  # Int64

    def read_vint(self) -> int:
        acc, shift = 0, 0
        while True:
            b = self.read_byte()
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                return acc
            shift += 7

    read_vlong = read_vint  # Int64 accumulate, no wrap — same arithmetic here

    def read_string(self) -> bytes:
        return self.read_bytes(self.read_vint())

    def read_list_of_strings(self) -> list[bytes]:
        n = self.read_vint()
        return [self.read_string() for _ in range(n)][::-1]  # cons quirk

    def read_assoc_list_of_strings(self) -> list[tuple[bytes, bytes]]:
        return [
            (self.read_string(), self.read_string())
            for _ in range(self.read_vint())
        ]


def _read_header(di: _BEInput) -> dict:
    return {
        "magic": di.read_int(),
        "name": di.read_string().decode("ascii"),
        "version": di.read_int(),
        "object_id": di.read_bytes(ID_LENGTH),
        "suffix_bytes": di.read_bytes(di.read_byte()),
    }


def _check_footer(di: _BEInput) -> None:
    if len(di.data) - di.pos != FOOTER_LENGTH:
        raise ValueError("Invalid footer length")
    if di.read_int() != FOOTER_MAGIC:
        raise ValueError("Invalid footer magic")


def _read_lucene_version(di: _BEInput) -> tuple[int, int, int]:
    return (di.read_vint(), di.read_vint(), di.read_vint())


def read_segments_file(data: bytes) -> dict:
    """Parse segments_N bytes to the record segments.ml builds."""
    di = _BEInput(data)
    header = _read_header(di)
    lucene_version = _read_lucene_version(di)
    index_created_major_version = di.read_vint()
    version = di.read_long()
    name_counter = di.read_vlong()
    seg_count = di.read_int()
    ms_lucene_version = _read_lucene_version(di)

    def read_segment() -> dict:
        seg_name = di.read_string().decode("ascii")
        seg_id = di.read_bytes(ID_LENGTH)
        seg_codec = di.read_string().decode("ascii")
        del_gen = di.read_long()
        del_count = di.read_int()
        field_infos_gen = di.read_long()
        doc_values_gen = di.read_long()
        soft_del_count = di.read_int()
        sci_id = di.read_bytes(ID_LENGTH) if di.read_byte() == 1 else None
        field_infos_files = [s.decode() for s in di.read_list_of_strings()]
        dv_updates = [
            (di.read_int(), [s.decode() for s in di.read_list_of_strings()])
            for _ in range(di.read_int())
        ]
        return {
            "seg_name": seg_name,
            "seg_id": seg_id,
            "seg_codec": seg_codec,
            "del_gen": del_gen,
            "del_count": del_count,
            "field_infos_gen": field_infos_gen,
            "doc_values_gen": doc_values_gen,
            "soft_del_count": soft_del_count,
            "sci_id": sci_id,
            "field_infos_files": field_infos_files,
            "doc_values_updates_files": dv_updates,
        }

    # reference quirk: one entry read regardless of seg_count
    segments = [read_segment()]
    user_data = [
        (k.decode(), v.decode()) for k, v in di.read_assoc_list_of_strings()
    ]
    _check_footer(di)
    return {
        "index_header": header,
        "lucene_version": lucene_version,
        "index_created_major_version": index_created_major_version,
        "version": version,
        "name_counter": name_counter,
        "seg_count": seg_count,
        "ms_lucene_version": ms_lucene_version,
        "segments": segments,
        "user_data": user_data,
    }


def latest_segments_file(dir_path: str) -> str:
    """Newest commit point: the segments_N with the largest base36
    generation (the reference's documented intent; its readdir-order
    find-first is a quirk we do NOT replicate — see module docstring)."""
    best, best_gen = None, -1
    for name in os.listdir(dir_path):
        # strictly 'segments' (gen 0) or 'segments_<base36>' — anything
        # else ('segments.gen', 'segments_2.tmp', editor backups) is NOT
        # a commit point and must neither crash the parse nor win
        if name == "segments":
            gen = 0
        elif name.startswith("segments_"):
            suffix = name[len("segments_"):]
            # Lucene emits Long.toString(gen, 36): lowercase base36
            # digits only (int() alone would admit '+1' or '1_0')
            if not re.fullmatch(r"[0-9a-z]+", suffix):
                continue
            gen = int(suffix, 36)
        else:
            continue
        if gen > best_gen:
            best, best_gen = name, gen
    if best is None:
        raise FileNotFoundError(f"no segments file in {dir_path}")
    return best


def read_latest(dir_path: str) -> dict:
    """Segments.latest: parse the newest segments_N in the directory."""
    name = latest_segments_file(dir_path)
    with open(os.path.join(dir_path, name), "rb") as f:
        return read_segments_file(f.read())
