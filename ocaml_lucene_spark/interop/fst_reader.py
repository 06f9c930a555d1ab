"""Reader for real Lucene FSTs in the reversed-bytes layout.

The engine's own FST (fst/transducer.py) uses a forward layout — a
documented divergence. This reader covers the REAL layout so the
reference's golden FST fixtures (data/fst-{1..5}.bytes) can be walked
to the same outputs its tests assert.

Semantics provenance: /root/reference/fst/byte_array_fst_reader.ml
(node dispatch on the flags byte: 0x40 = direct addressing with a
presence bit table, 0x20 = fixed-stride binary search, else linear
scan; per-arc flag bits for final / last / target-next / stop /
has-output / has-final-output), reverse_bytes_source.ml (positions
decrement), byte_array_fst_reader_utils.ml (path walk + output fold).

Outputs are pluggable like the reference's Output functors: ``int``
outputs read a vint and add; ``bytes`` outputs read a vint-length
string and concatenate.
"""

from __future__ import annotations

from dataclasses import dataclass

from .data_input import ReverseDataInput

ARCS_FOR_DIRECT_ADDRESSING = 1 << 6
ARCS_FOR_BINARY_SEARCH = 1 << 5
BIT_FINAL_ARC = 1 << 0
BIT_LAST_ARC = 1 << 1
BIT_TARGET_NEXT = 1 << 2
BIT_STOP_NODE = 1 << 3
BIT_ARC_HAS_OUTPUT = 1 << 4
BIT_ARC_HAS_FINAL_OUTPUT = 1 << 5


@dataclass
class Arc:
    label: int
    target: int
    output: object
    final_output: object
    # BIT_FINAL_ARC: the path ending at this arc is a complete key
    # (needed by items() enumeration; lookup() never consults it —
    # the reference's fst_match_term doesn't either)
    final: bool = False


@dataclass
class _DANodeInfo:
    num_arcs: int
    bytes_per_arc: int
    bit_table_start: int
    presence_byte_count: int
    first_label: int
    arc_start: int


class FstReader:
    """Walks one FST. ``output_type`` is 'int' (vint sums, e.g. term
    ordinals) or 'bytes' (concatenated byte strings, e.g. spelling
    corrections)."""

    def __init__(
        self,
        data: bytes,
        start_node: int,
        empty_output,
        output_type: str = "int",
    ):
        self.di = ReverseDataInput(data)
        self.start_node = start_node
        self.empty_output = empty_output
        if output_type not in ("int", "bytes"):
            raise ValueError(output_type)
        self.output_type = output_type

    # -- output algebra (Int_output / String_output) ------------------
    def _zero(self):
        return 0 if self.output_type == "int" else b""

    def _add(self, a, b):
        return a + b

    def _read_output(self):
        if self.output_type == "int":
            return self.di.read_vint()
        return self.di.read_string()

    # -- node/arc decoding -------------------------------------------
    def first_arc(self) -> Arc:
        return Arc(-1, self.start_node, self._zero(), self.empty_output)

    def _read_da_node_info(self) -> _DANodeInfo:
        di = self.di
        num_arcs = di.read_vint()
        bytes_per_arc = di.read_vint()
        bit_table_start = di.pos
        presence_byte_count = (num_arcs + 7) >> 3
        di.skip_bytes(presence_byte_count)
        first_label = di.read_byte()
        return _DANodeInfo(
            num_arcs, bytes_per_arc, bit_table_start, presence_byte_count,
            first_label, di.pos,
        )

    def _presence_byte(self, info: _DANodeInfo, i: int) -> int:
        # byte i of the bit table lives at descending positions from
        # bit_table_start (reversed layout)
        return self.di.data[info.bit_table_start - i]

    def _presence_bit_set(self, info: _DANodeInfo, arc_index: int) -> bool:
        byte = self._presence_byte(info, arc_index >> 3)
        return bool(byte & (1 << (arc_index & 7)))

    def _presence_rank(self, info: _DANodeInfo, arc_index: int) -> int:
        """Number of set presence bits strictly before ``arc_index``."""
        n = sum(
            bin(self._presence_byte(info, i)).count("1")
            for i in range(arc_index >> 3)
        )
        mask = (1 << (arc_index & 7)) - 1
        return n + bin(self._presence_byte(info, arc_index >> 3) & mask).count("1")

    def _presence_total(self, info: _DANodeInfo) -> int:
        return sum(
            bin(self._presence_byte(info, i)).count("1")
            for i in range(info.presence_byte_count)
        )

    def _read_da_arc(self, label: int, info: _DANodeInfo) -> Arc:
        di = self.di
        flags = di.read_byte()
        final = bool(flags & BIT_FINAL_ARC)
        output = self._read_output() if flags & BIT_ARC_HAS_OUTPUT else self._zero()
        final_output = (
            self._read_output() if flags & BIT_ARC_HAS_FINAL_OUTPUT else self._zero()
        )
        if flags & BIT_STOP_NODE:
            return Arc(label, -1 if final else 0, output, final_output, final)
        if flags & BIT_TARGET_NEXT:
            if flags & BIT_LAST_ARC:
                target = di.pos
            else:
                target = info.arc_start - info.bytes_per_arc * self._presence_total(info)
            return Arc(label, target, output, final_output, final)
        return Arc(label, di.read_vlong(), output, final_output, final)

    def _find_da_arc(self, label: int, info: _DANodeInfo) -> Arc | None:
        arc_index = label - info.first_label
        if not (0 <= arc_index < info.num_arcs):
            return None
        if not self._presence_bit_set(info, arc_index):
            return None
        rank = self._presence_rank(info, arc_index)
        self.di.pos = info.arc_start - rank * info.bytes_per_arc
        return self._read_da_arc(label, info)

    def _read_linear_arc(self, flags: int) -> tuple[Arc, bool]:
        """Returns (arc, has_more_arcs). The label byte follows the
        flags byte; outputs follow the label."""
        di = self.di
        label = di.read_byte()
        final = bool(flags & BIT_FINAL_ARC)
        output = self._read_output() if flags & BIT_ARC_HAS_OUTPUT else self._zero()
        final_output = (
            self._read_output() if flags & BIT_ARC_HAS_FINAL_OUTPUT else self._zero()
        )
        more = not (flags & BIT_LAST_ARC)
        if flags & BIT_STOP_NODE:
            return Arc(label, -1 if final else 0, output, final_output, final), more
        if flags & BIT_TARGET_NEXT:
            if flags & BIT_LAST_ARC:
                # the target node is laid out immediately after (i.e. at
                # the current read position in the reversed stream)
                return Arc(label, di.pos, output, final_output, final), more
            raise NotImplementedError(
                "target-next on a non-last linear arc needs a node skip "
                "(unimplemented in the reference too: "
                "byte_array_fst_reader.ml seek_to_next_node)"
            )
        return Arc(label, di.read_vint(), output, final_output, final), more

    def _skip_linear_arc_body(self, flags: int) -> bool:
        """After the label has been read: skip outputs/target, return
        whether more arcs follow (mirrors skip_to_next_arc)."""
        if flags & BIT_ARC_HAS_OUTPUT:
            self._read_output()
        if flags & BIT_ARC_HAS_FINAL_OUTPUT:
            self._read_output()
        if not (flags & BIT_STOP_NODE) and not (flags & BIT_TARGET_NEXT):
            self.di.read_vint()
        return not (flags & BIT_LAST_ARC)

    def _linear_scan(self, label: int, flags: int) -> Arc | None:
        di = self.di
        while True:
            arc_position = di.pos
            arc_label = di.read_byte()
            if arc_label == label:
                di.pos = arc_position
                # re-read through the common path (label + outputs)
                arc, _ = self._read_linear_arc(flags)
                return arc
            has_more = self._skip_linear_arc_body(flags)
            if not has_more:
                return None
            flags = di.read_byte()

    def _binary_search(self, label: int) -> Arc | None:
        di = self.di
        num_arcs = di.read_vint()
        bytes_per_arc = di.read_vint()
        arc_start = di.pos
        low, high = 0, num_arcs
        while low < high:
            mid = (low + high) // 2
            di.pos = arc_start - bytes_per_arc * mid - 1  # skip flags byte
            cur = di.read_byte()
            if cur == label:
                di.pos = arc_start - bytes_per_arc * mid
                flags = di.read_byte()
                arc, _ = self._read_linear_arc(flags)
                return arc
            if cur < label:
                low = mid + 1
            else:
                high = mid
        return None

    def read_next_arc(self, label: int, arc: Arc) -> Arc | None:
        """Follow ``label`` out of the node ``arc`` points at."""
        assert arc.target > 0
        di = self.di
        di.pos = arc.target
        flags = di.read_byte()
        if flags == ARCS_FOR_DIRECT_ADDRESSING:
            info = self._read_da_node_info()
            return self._find_da_arc(label, info)
        if flags == ARCS_FOR_BINARY_SEARCH:
            return self._binary_search(label)
        return self._linear_scan(label, flags)

    # -- whole-node enumeration (fixture tests) -----------------------
    def read_arcs_at_target(self, target: int) -> list[Arc]:
        di = self.di
        di.pos = target
        flags = di.read_byte()
        if flags == ARCS_FOR_DIRECT_ADDRESSING:
            info = self._read_da_node_info()
            out = []
            for n in range(info.num_arcs):
                self.di.pos = info.arc_start + n * info.bytes_per_arc
                arc = self._find_da_arc(info.first_label + n, info)
                if arc is not None:
                    out.append(arc)
            return out
        if flags == ARCS_FOR_BINARY_SEARCH:
            num_arcs = di.read_vint()
            bytes_per_arc = di.read_vint()
            arc_start = di.pos
            out = []
            for n in range(num_arcs):
                di.pos = arc_start - bytes_per_arc * n
                f = di.read_byte()
                out.append(self._read_linear_arc(f)[0])
            return out
        out = []
        while True:
            arc, more = self._read_linear_arc(flags)
            out.append(arc)
            if not more:
                return out
            flags = di.read_byte()

    # -- term lookup (fst_match_term + make_output) -------------------
    def lookup(self, term: bytes):
        """Output for ``term``: fold arc outputs along the path, plus
        the last arc's final output — byte_array_fst_reader_utils.ml
        fst_match_term/make_output semantics (a prefix path's partial
        output if the walk stops early, exactly like the reference)."""
        arc = self.first_arc()
        path = [arc]
        for b in term:
            nxt = self.read_next_arc(b, arc)
            if nxt is None:
                break
            path.append(nxt)
            arc = nxt
        # fold exactly as make_output: sum of outputs along the path
        # plus the final_output of the last arc
        total = self._zero()
        for a in path[:-1]:
            total = self._add(total, a.output)
        return self._add(total, self._add(path[-1].output, path[-1].final_output))

    # -- full enumeration (importer support; no reference analogue —
    #    the reference only ever seeks, terms_enumerator.ml) ----------
    def items(self) -> list[tuple[bytes, object]]:
        """Every (key, output) pair in the FST, in key order: DFS over
        read_arcs_at_target folding outputs exactly like lookup().
        A non-zero empty_output means the empty key is present (in a
        block-tree index FST that is where the root block pointer
        lives when no 1-byte prefix exists)."""
        res: list[tuple[bytes, object]] = []
        zero = self._zero()
        if self.empty_output != zero:
            res.append((b"", self.empty_output))

        def walk(target: int, prefix: bytes, acc) -> None:
            for arc in self.read_arcs_at_target(target):
                key = prefix + bytes([arc.label])
                val = self._add(acc, arc.output)
                if arc.final:
                    res.append((key, self._add(val, arc.final_output)))
                if arc.target > 0:
                    walk(arc.target, key, val)

        if self.start_node > 0:
            walk(self.start_node, b"", zero)
        res.sort(key=lambda kv: kv[0])
        return res
