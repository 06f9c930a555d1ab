"""Floor-block pointer decode: Lucene's block-tree FST output bytes.

Semantics provenance: /root/reference/terms-enumerator/block_pointer.ml:9-41
(find_block). In Lucene's block-tree terms dictionary, an FST output is
a byte string encoding the file pointer of the suffix block for a
prefix, plus floor data when the prefix's terms were split across
several blocks ("floor blocks"): a vlong code whose low two bits are
(is_floor, has_terms) and whose remaining bits are the file pointer,
then — if floored — a vint count of follow blocks and, per follow
block, a label byte and a delta-coded (fp_delta << 1 | has_terms)
vlong. ``find_block(output, target_label)`` walks the floor entries to
the last block whose first label is <= target_label, exactly the
reference's loop.

The engine re-expresses floor blocks as parquet zone maps (sanctioned
by SURVEY §2.2); this decoder exists as interop parity evidence — the
reference's three golden pointer byte strings
(/root/reference/test-terms-enumerator/test_block_pointer.ml:8-23)
replay to their expected file pointers in
tests/test_reference_fixtures.py.

OCaml quirk parity: the reference reads the code through its 63-bit
native int (Int64.to_int) and shifts with ``lsr`` (logical shift on
the 63-bit pattern), so the wrapped signed value from
DataInput.read_vlong is re-interpreted as its unsigned 63-bit pattern
before shifting.
"""

from __future__ import annotations

from .data_input import DataInput

OUTPUT_FLAGS_NUM_BITS = 2
_MASK63 = (1 << 63) - 1


def all_blocks(output: bytes) -> list[tuple[int, bool]]:
    """Every (file_pointer, has_terms) a floor-pointer output names:
    the root entry plus each floor follow block (same grammar walk as
    find_block, without the label cut). Importer support — the
    reference only ever selects one block per seek."""
    di = DataInput(output)
    code = di.read_vlong() & _MASK63
    fp = code >> OUTPUT_FLAGS_NUM_BITS
    out = [(fp, code & 2 != 0)]
    if not code & 1:  # not floored
        return out
    n = di.read_vint()
    di.read_byte()  # first follow block's start label
    for i in range(n):
        code = di.read_vlong() & _MASK63
        fp = fp + (code >> 1)
        out.append((fp, code & 1 != 0))
        if i + 1 < n:
            di.read_byte()
    return out


def find_block(output: bytes, target_label: int | str) -> int | None:
    """File pointer of the block expected to hold terms whose
    next-after-prefix character is ``target_label``; None when that
    block has no terms (block_pointer.ml find_block)."""
    if isinstance(target_label, str):
        target_label = ord(target_label)
    di = DataInput(output)
    code = di.read_vlong() & _MASK63  # lsr: logical on the 63-bit pattern
    fp = code >> OUTPUT_FLAGS_NUM_BITS
    has_terms = code & 2 != 0
    is_floor = code & 1 != 0
    if not is_floor:
        return fp if has_terms else None
    n = di.read_vint()
    next_floor_label = di.read_byte()
    if target_label < next_floor_label:
        return fp if has_terms else None
    while True:
        assert n > 0
        code = di.read_vlong() & _MASK63
        fp = fp + (code >> 1)
        has_terms = code & 1 != 0
        if n == 1:
            return fp if has_terms else None
        next_floor_label = di.read_byte()
        if target_label < next_floor_label:
            return fp if has_terms else None
        n -= 1
