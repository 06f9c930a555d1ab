"""Writer for the reference's reversed-bytes FST layout.

Closes the §2.9 write-side gap: the engine's own FST
(fst/transducer.py) serializes a forward layout (documented
divergence); this module emits the REAL reversed layout that
interop/fst_reader.py (and the reference's
byte_array_fst_reader.ml) walks — all three node strategies:

- linear scan (per-arc flags byte),
- fixed-stride binary search (ARCS_FOR_BINARY_SEARCH sentinel),
- direct addressing with a presence bit table
  (ARCS_FOR_DIRECT_ADDRESSING sentinel).

Semantics provenance: /root/reference/fst/byte_array_fst_writer.ml
(arc freezing + byte emission), byte_array_fst_compiler.ml:34-53
(node registry / minimality), reverse_bytes_source.ml (the read
direction that dictates the on-disk byte order). Construction reuses
the published Daciuk/Mihov algorithm already implemented in
fst/transducer.py, here frozen into a node GRAPH first so nodes can
be emitted children-before-parents with explicit target addresses.

Layout mechanics: every multi-byte field (vints, output strings) is
encoded FORWARD, fields are concatenated in the exact order the
reader consumes them, and the whole node block is REVERSED before
appending to the buffer — the reader starts at the block's highest
address (the node's address) and walks positions downward, so each
field's bytes come back LSB-first exactly as ReverseDataInput
expects. Binary-search / direct-addressing slots are padded AFTER
their fields in the forward stream, which lands the padding at the
low-address end of each fixed-stride slot where the reader never
looks.

BIT_TARGET_NEXT arc compression (byte_array_fst_writer.ml:10 —
``target_is_next = target = next_node``: the target omitted because
it is the block emitted immediately before this node, i.e. the next
node in the reversed read direction) is emitted exactly where the
fixture-verified READ side can resolve it:

- linear nodes, LAST arc only — the reader resolves it as ``di.pos``
  after the arc's fields, which is the previous block's address only
  when no arcs follow (fst_reader.py:166); the non-last linear skip
  is unimplemented in the reference too (seek_to_next_node);
- direct-addressing nodes, NON-last arcs — the reader computes
  ``arc_start - bytes_per_arc * presence_total`` (fst_reader.py:139),
  the block bottom, valid for any slot; the last-arc branch instead
  trusts ``di.pos`` inside a padded slot, so the writer never sets it
  there (padding would shift the target);
- binary-search nodes: never — the reader reads slots through the
  linear-arc path, which raises on non-last and has the same padded-
  slot hazard on last.

Byte-identity with files produced by real Lucene is NOT a goal;
read-side round-trip identity through the interop reader is.
"""

from __future__ import annotations

from ..codecs.varint import write_vint
from ..fst.outputs import BytesOutput, IntOutput
from .fst_reader import (
    ARCS_FOR_BINARY_SEARCH,
    ARCS_FOR_DIRECT_ADDRESSING,
    BIT_ARC_HAS_FINAL_OUTPUT,
    BIT_ARC_HAS_OUTPUT,
    BIT_FINAL_ARC,
    BIT_LAST_ARC,
    BIT_STOP_NODE,
    BIT_TARGET_NEXT,
)

# -- minimal node graph (Daciuk/Mihov, frozen to tuples) --------------


class _Temp:
    __slots__ = ("arcs", "final", "final_output")

    def __init__(self):
        self.arcs = []  # [label, output, frozen_node | None]
        self.final = False
        self.final_output = None


def _build_graph(items, out_algebra):
    """items: iterable of (bytes key, output) in ascending key order.
    Returns the frozen root: a node is
    (final: bool, final_output, arcs: tuple[(label, output, child)]),
    hash-consed so equal sub-tries are one object (minimality)."""
    register: dict = {}

    def freeze(st: _Temp):
        node = (
            st.final,
            st.final_output if st.final else out_algebra.empty,
            tuple((l, o, c) for l, o, c in st.arcs),
        )
        got = register.get(node)
        if got is None:
            register[node] = node
            got = node
        return got

    path = [_Temp()]
    last_key = b""

    def freeze_tail(down_to: int):
        while len(path) > down_to + 1:
            st = path.pop()
            path[-1].arcs[-1][2] = freeze(st)

    for key, output in items:
        if not isinstance(key, bytes):
            raise TypeError("keys must be bytes")
        if key <= last_key and last_key != b"":
            raise ValueError(f"keys must be ascending: {key!r}")
        if key == b"":
            raise ValueError("empty key: pass it as empty_output instead")
        p = 0
        for a, b in zip(last_key, key):
            if a != b:
                break
            p += 1
        freeze_tail(p)
        rem = output
        for i in range(p):  # push_output redistribution along the prefix
            st = path[i]
            _label, arc_out, _t = st.arcs[-1]
            cp = out_algebra.common(arc_out, rem)
            if cp != arc_out:
                diff = out_algebra.subtract(arc_out, cp)
                child = path[i + 1]
                for arc in child.arcs:
                    arc[1] = out_algebra.add(diff, arc[1])
                if child.final:
                    child.final_output = out_algebra.add(diff, child.final_output)
                st.arcs[-1][1] = cp
            rem = out_algebra.subtract(rem, cp)
        for i in range(p, len(key)):
            path[i].arcs.append(
                [key[i], rem if i == p else out_algebra.empty, None]
            )
            path.append(_Temp())
        leaf = path[-1]
        leaf.final = True
        leaf.final_output = out_algebra.empty
        last_key = key
    freeze_tail(0)
    return freeze(path[0])


# -- reversed-layout emission ----------------------------------------


class ReversedFstWriter:
    """Emit a node graph into the reversed-bytes layout.

    strategy: None picks per node (direct addressing for dense
    multi-arc nodes, binary search for larger sparse ones, linear
    otherwise); 'linear' / 'binary' / 'da' force one — every strategy
    must read back identically (tested)."""

    def __init__(
        self,
        output_type: str = "int",
        strategy: str | None = None,
        use_target_next: bool = True,
    ):
        if output_type not in ("int", "bytes"):
            raise ValueError(output_type)
        self.output_type = output_type
        self.out_algebra = IntOutput if output_type == "int" else BytesOutput
        if strategy not in (None, "linear", "binary", "da"):
            raise ValueError(strategy)
        self.strategy = strategy
        self.use_target_next = use_target_next
        self.n_target_next = 0  # arcs emitted with BIT_TARGET_NEXT (diagnostics)
        self.buf = bytearray(b"\x00")  # address 0 reserved (targets are > 0)
        self._addr: dict[int, int] = {}

    # -- field encoders (forward byte order) --------------------------
    def _enc_output(self, v) -> bytes:
        b = bytearray()
        if self.output_type == "int":
            # the reader consumes int outputs through its Int32-wrapped
            # read_vint (the reference quirk): a value >= 2^31 would
            # silently wrap to negative and corrupt every lookup under
            # it — refuse rather than emit an unreadable FST
            if not (0 <= v < 2**31):
                raise ValueError(
                    f"int output {v} outside the reader's 31-bit range "
                    "[0, 2^31): interop read_vint wraps at Int32"
                )
            write_vint(v, b)
        else:
            write_vint(len(v), b)
            b += v
        return bytes(b)

    def _enc_arc_fields(
        self, label: int | None, output, final_output, child_addr, is_last: bool,
        child_final: bool, stop: bool, target_next: bool = False,
    ) -> bytes:
        """Forward field stream for one arc, in reader consumption
        order: flags, [label], [output], [final_output], [target].
        ``label=None`` omits the label byte (direct-addressing slots
        derive it from the arc index). ``target_next`` omits the
        target vint entirely (BIT_TARGET_NEXT: the target is the
        block emitted just before this node — caller guarantees the
        strategy/position combination the reader can resolve)."""
        zero = self.out_algebra.empty
        flags = 0
        if child_final:
            flags |= BIT_FINAL_ARC
        if is_last:
            flags |= BIT_LAST_ARC
        if stop:
            flags |= BIT_STOP_NODE
        if target_next:
            flags |= BIT_TARGET_NEXT
        if output != zero:
            flags |= BIT_ARC_HAS_OUTPUT
        if final_output != zero:
            flags |= BIT_ARC_HAS_FINAL_OUTPUT
        # a first-arc flags byte equal to a node sentinel would be
        # mis-dispatched; unreachable because HAS_FINAL_OUTPUT (0x20)
        # only ever appears together with BIT_FINAL_ARC (0x01).
        # ValueError, not assert: this guards emitted-format integrity
        # and must survive python -O
        if flags in (ARCS_FOR_BINARY_SEARCH, ARCS_FOR_DIRECT_ADDRESSING):
            raise ValueError(
                f"arc flags byte 0x{flags:02x} collides with a node "
                "sentinel — the reversed layout would mis-dispatch"
            )
        s = bytearray([flags])
        if label is not None:
            s.append(label)
        if flags & BIT_ARC_HAS_OUTPUT:
            s += self._enc_output(output)
        if flags & BIT_ARC_HAS_FINAL_OUTPUT:
            s += self._enc_output(final_output)
        if not stop and not target_next:
            b = bytearray()
            write_vint(child_addr, b)
            s += b
        return bytes(s)

    # -- node emission -------------------------------------------------
    def _append_block(self, forward_stream: bytes) -> int:
        """Reverse the forward stream into the buffer; the node address
        is the block's highest byte (where the reader starts)."""
        self.buf += forward_stream[::-1]
        return len(self.buf) - 1

    def _pick(self, arcs) -> str:
        if self.strategy is not None:
            return self.strategy
        n = len(arcs)
        if n < 2:
            return "linear"
        spread = arcs[-1][0] - arcs[0][0] + 1
        if n >= 5 and spread <= 3 * n:
            return "da"
        if n >= 4:
            return "binary"
        return "linear"

    def _arc_parts(self, arcs, with_label: bool, kind: str):
        """(label, forward_fields) per arc, ascending label order.

        Two phases: emit all children FIRST (so the address of the
        block that will sit just below this node — the target-next
        node in reversed read order — is known), then encode fields.
        BIT_TARGET_NEXT eligibility per the module docstring: linear
        last arc, or direct-addressing non-last arc, whose child IS
        the previously emitted block."""
        arcs = sorted(arcs, key=lambda a: a[0])
        metas = []
        for label, output, child in arcs:
            child_final, child_fout, child_arcs = child
            stop = not child_arcs
            child_addr = 0 if stop else self._emit(child)
            metas.append((label, output, child_final, child_fout, child_addr, stop))
        prev_addr = len(self.buf) - 1  # the block the reader sees "next"
        parts = []
        n = len(metas)
        for i, (label, output, child_final, child_fout, child_addr, stop) in enumerate(
            metas
        ):
            is_last = i == n - 1
            target_next = (
                self.use_target_next
                and not stop
                and child_addr == prev_addr
                and (
                    (kind == "linear" and is_last)
                    or (kind == "da" and not is_last)
                )
            )
            if target_next:
                self.n_target_next += 1
            parts.append(
                (
                    label,
                    self._enc_arc_fields(
                        label if with_label else None,
                        output,
                        child_fout if child_final else self.out_algebra.empty,
                        child_addr,
                        is_last=is_last,
                        child_final=child_final,
                        stop=stop,
                        target_next=target_next,
                    ),
                )
            )
        return parts

    def _emit(self, node) -> int:
        addr = self._addr.get(id(node))
        if addr is not None:
            return addr
        _final, _fout, arcs = node
        assert arcs, "leaf nodes are encoded as stop arcs, never emitted"
        kind = self._pick(arcs)
        if kind == "linear":
            parts = self._arc_parts(arcs, with_label=True, kind=kind)
            stream = b"".join(fields for _l, fields in parts)
        elif kind == "binary":
            parts = self._arc_parts(arcs, with_label=True, kind=kind)
            stride = max(len(f) for _l, f in parts)
            head = bytearray([ARCS_FOR_BINARY_SEARCH])
            write_vint(len(parts), head)
            write_vint(stride, head)
            stream = bytes(head) + b"".join(
                f + b"\x00" * (stride - len(f)) for _l, f in parts
            )
        else:  # direct addressing
            parts = self._arc_parts(arcs, with_label=False, kind=kind)
            first_label = parts[0][0]
            label_range = parts[-1][0] - first_label + 1
            stride = max(len(f) for _l, f in parts)
            presence = bytearray((label_range + 7) >> 3)
            for l, _f in parts:
                idx = l - first_label
                presence[idx >> 3] |= 1 << (idx & 7)
            head = bytearray([ARCS_FOR_DIRECT_ADDRESSING])
            write_vint(label_range, head)
            write_vint(stride, head)
            head += presence
            head.append(first_label)
            stream = bytes(head) + b"".join(
                f + b"\x00" * (stride - len(f)) for _l, f in parts
            )
        addr = self._append_block(stream)
        self._addr[id(node)] = addr
        return addr


def write_reversed_fst(
    items,
    output_type: str = "int",
    strategy: str | None = None,
    empty_output=None,
    use_target_next: bool = True,
):
    """Build a minimal FST over sorted (bytes key, output) pairs and
    emit it in the reference's reversed layout.

    Returns (data: bytes, start_node: int, empty_output) — exactly the
    constructor arguments of interop.fst_reader.FstReader."""
    algebra = IntOutput if output_type == "int" else BytesOutput
    root = _build_graph(items, algebra)
    w = ReversedFstWriter(output_type, strategy, use_target_next=use_target_next)
    if not root[2]:
        raise ValueError("FST needs at least one non-empty key")
    start = w._emit(root)
    return bytes(w.buf), start, (
        empty_output if empty_output is not None else algebra.empty
    )
