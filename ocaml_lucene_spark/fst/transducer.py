"""Minimal acyclic transducer (FST) construction from sorted input.

Re-implements, from the published algorithm (Daciuk/Mihov "Incremental
construction of minimal acyclic finite-state automata", cited by the
reference in doc/constructing_an_acyclic_transducer.md:1-2), the same
capability as /root/reference/fst/acyclic_transducer.ml:84-107 +
byte_array_fst_compiler.ml:34-53 + byte_array_fst_writer.ml:37-63:

- words must arrive in ascending byte order (invariant asserted, parity
  with acyclic_transducer.ml:101-107);
- arc outputs are redistributed so each arc carries the longest common
  prefix of everything below it (push_output, acyclic_transducer.ml:17-26);
- settled suffixes are frozen + hash-consed so equal sub-tries share one
  serialized node (byte_array_fst_compiler.ml:49-52);
- frozen nodes serialize to a flat byte array; lookup walks arcs
  byte-by-byte accumulating outputs (fst_match_term semantics,
  codec/fst.ml:203-223).

Byte layout is our own (forward arc lists, vint-delta targets) — the
reference's reversed node layout is an mmap locality trick we don't
need; lookup semantics and minimality are the contracts.

In the Spark engine this is the per-segment term index: terms ->
integer block pointer, built inside applyInPandas after
sortWithinPartitions('term'). The sorted-parquet zone-map dictionary in
index/segments.py is the default lookup path; the FST is the compact
in-memory variant for hot segments.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .outputs import IntOutput
from ..codecs.varint import read_vint, write_vint


@dataclass
class _TempState:
    arcs: list = field(default_factory=list)  # [label, output, target_addr_or_temp]
    final: bool = False
    final_output: int = 0


class FstBuilder:
    """Incremental minimal FST over sorted (bytes key, int output) pairs."""

    def __init__(self, outputs=IntOutput):
        self.out = outputs
        self.buf = bytearray(b"\x00")  # address 0 reserved as null
        self.register: dict[bytes, int] = {}
        self.path: list[_TempState] = [_TempState()]
        self.last_key = b""
        self.root_addr: int | None = None

    # -- freezing -----------------------------------------------------
    def _serialize(self, st: _TempState) -> bytes:
        """Node payload: flags, [final_output], n_arcs, arcs (label,
        output vint, target addr-delta vint)."""
        body = bytearray()
        flags = 1 if st.final else 0
        if st.final and st.final_output != self.out.empty:
            flags |= 2
        body.append(flags)
        if flags & 2:
            write_vint(st.final_output, body)
        write_vint(len(st.arcs), body)
        for label, output, target in st.arcs:
            body.append(label)
            write_vint(output, body)
            write_vint(target, body)
        return bytes(body)

    def _freeze(self, st: _TempState) -> int:
        payload = self._serialize(st)
        addr = self.register.get(payload)
        if addr is None:
            addr = len(self.buf)
            self.buf += payload
            self.register[payload] = addr
        return addr

    def _freeze_tail(self, down_to: int) -> None:
        """Freeze path states below depth ``down_to`` (deepest first)."""
        while len(self.path) > down_to + 1:
            st = self.path.pop()
            addr = self._freeze(st)
            parent = self.path[-1]
            parent.arcs[-1][2] = addr

    # -- insertion ----------------------------------------------------
    def add(self, key: bytes, output: int) -> None:
        if key <= self.last_key and self.last_key != b"":
            raise ValueError(f"keys must be inserted in ascending order: {key!r}")
        if key == b"":
            raise ValueError("empty key unsupported")
        # common prefix length with previous key
        p = 0
        for a, b in zip(self.last_key, key):
            if a != b:
                break
            p += 1
        self._freeze_tail(p)

        # push outputs along the shared prefix (push_output semantics)
        rem = output
        for i in range(p):
            st = self.path[i]
            label, arc_out, target = st.arcs[-1]
            cp = self.out.common(arc_out, rem)
            if cp != arc_out:
                # move the suffix (arc_out - cp) down into the child state,
                # which is still mutable (it's on the temp path)
                diff = self.out.subtract(arc_out, cp)
                child = self.path[i + 1]
                for arc in child.arcs:
                    arc[1] = self.out.add(diff, arc[1])
                if child.final:
                    child.final_output = self.out.add(diff, child.final_output)
                st.arcs[-1][1] = cp
            rem = self.out.subtract(rem, cp)

        # extend the path with the diverged suffix; the whole remaining
        # output rides on the first new arc
        assert p < len(key), "ascending-order invariant broken"
        for i in range(p, len(key)):
            st = self.path[i]
            st.arcs.append([key[i], rem if i == p else self.out.empty, 0])
            self.path.append(_TempState())
        leaf = self.path[-1]
        leaf.final = True
        leaf.final_output = self.out.empty
        self.last_key = key

    def finish(self) -> "Fst":
        self._freeze_tail(0)
        self.root_addr = self._freeze(self.path[0])
        return Fst(bytes(self.buf), self.root_addr, self.out)


class Fst:
    """Read side: byte-array FST lookup (fst_match_term semantics)."""

    def __init__(self, data: bytes, root: int, outputs=IntOutput):
        self.data = data
        self.root = root
        self.out = outputs

    def _read_node(self, addr: int):
        flags = self.data[addr]
        pos = addr + 1
        final_output = self.out.empty
        if flags & 2:
            final_output, pos = read_vint(self.data, pos)
        n_arcs, pos = read_vint(self.data, pos)
        arcs = []
        for _ in range(n_arcs):
            label = self.data[pos]
            pos += 1
            output, pos = read_vint(self.data, pos)
            target, pos = read_vint(self.data, pos)
            arcs.append((label, output, target))
        return bool(flags & 1), final_output, arcs

    def lookup(self, key: bytes):
        """Exact lookup: accumulated output if key accepted, else None."""
        addr = self.root
        acc = self.out.empty
        for b in key:
            _, _, arcs = self._read_node(addr)
            hit = None
            for label, output, target in arcs:  # arcs sorted by label
                if label == b:
                    hit = (output, target)
                    break
                if label > b:
                    break
            if hit is None:
                return None
            acc = self.out.add(acc, hit[0])
            addr = hit[1]
        final, final_output, _ = self._read_node(addr)
        if not final:
            return None
        return self.out.add(acc, final_output)

    def items(self):
        """In-order (byte-sorted) iteration of (key, output) pairs — the
        terms-dictionary enumeration surface (arcs are label-sorted, so
        a DFS yields keys in ascending byte order). Recursion depth is
        bounded by the longest key."""

        def walk(addr: int, prefix: bytes, acc):
            final, final_output, arcs = self._read_node(addr)
            if final:
                yield prefix, self.out.add(acc, final_output)
            for label, output, target in arcs:
                yield from walk(
                    target, prefix + bytes([label]), self.out.add(acc, output)
                )

        yield from walk(self.root, b"", self.out.empty)

    def prefix_items(self, prefix: bytes):
        """(key, output) pairs for every accepted key starting with
        ``prefix``, in ascending byte order — the terms-dictionary
        prefix scan (Lucene PrefixQuery's rewrite source): walk the
        prefix arcs accumulating output, then enumerate the subtree."""
        addr = self.root
        acc = self.out.empty
        for b in prefix:
            _, _, arcs = self._read_node(addr)
            hit = None
            for label, output, target in arcs:  # arcs sorted by label
                if label == b:
                    hit = (output, target)
                    break
                if label > b:
                    break
            if hit is None:
                return
            acc = self.out.add(acc, hit[0])
            addr = hit[1]

        def walk(a: int, suffix: bytes, out_acc):
            final, final_output, arcs = self._read_node(a)
            if final:
                yield prefix + suffix, self.out.add(out_acc, final_output)
            for label, output, target in arcs:
                yield from walk(
                    target, suffix + bytes([label]), self.out.add(out_acc, output)
                )

        yield from walk(addr, b"", acc)

    def automaton_items(self, nfa):
        """(key, output) for every accepted key the NFA fullmatches —
        the RegexpQuery expansion source (Lucene compiles the regex to
        an automaton and intersects it with the terms FST; see
        fst/regex_nfa.compile_nfa). Same lazy automaton ∩ FST shape as
        levenshtein_items: the DFS carries the NFA state set for the
        decoded prefix and prunes a whole subtree the moment the set
        goes empty; UTF-8 multibyte labels buffer until a codepoint
        boundary before stepping. Yields in ascending byte order."""

        def utf8_need(b0: int) -> int:
            if b0 < 0x80:
                return 1
            if b0 < 0xE0:
                return 2
            if b0 < 0xF0:
                return 3
            return 4

        def walk(addr, prefix: bytes, acc, states, pending: bytes):
            final, final_output, arcs = self._read_node(addr)
            if final and not pending and nfa.accepts(states):
                yield prefix, self.out.add(acc, final_output)
            for label, output, target in arcs:
                nb = pending + bytes([label])
                if len(nb) < utf8_need(nb[0]):
                    nstates, npending = states, nb  # mid-codepoint
                else:
                    nstates = nfa.step(states, nb.decode("utf-8"))
                    npending = b""
                    if not nstates:
                        continue  # dead automaton: prune the subtree
                yield from walk(
                    target,
                    prefix + bytes([label]),
                    self.out.add(acc, output),
                    nstates,
                    npending,
                )

        yield from walk(self.root, b"", self.out.empty, nfa.start_set(), b"")

    def levenshtein_items(self, query: str, k: int):
        """(key, output) for every accepted key within ``k`` Levenshtein
        edits of ``query`` — the FuzzyQuery expansion source (Lucene
        intersects a Levenshtein automaton with the terms FST; ref
        terms_enumerator seek surface). Lazy automaton ∩ FST: a DFS
        carries the banded DP row for the decoded prefix and prunes a
        whole subtree as soon as every row cell exceeds ``k`` — no
        per-term distance computation, sub-linear in vocabulary for
        small k. Edits are UNICODE-CHAR-level (matching DuckDB's
        levenshtein() and the reference scan): the byte walk decodes
        UTF-8 incrementally and only steps the DP on codepoint
        boundaries.

        Yields in ascending byte order (arcs are label-sorted)."""
        q = query
        m = len(q)

        def step(row, c):
            new = [row[0] + 1]
            for j in range(1, m + 1):
                new.append(
                    min(row[j] + 1, new[j - 1] + 1, row[j - 1] + (c != q[j - 1]))
                )
            return new

        def utf8_need(b0: int) -> int:
            if b0 < 0x80:
                return 1
            if b0 < 0xE0:
                return 2
            if b0 < 0xF0:
                return 3
            return 4

        def walk(addr, prefix: bytes, acc, row, pending: bytes):
            final, final_output, arcs = self._read_node(addr)
            if final and not pending and row[m] <= k:
                yield prefix, self.out.add(acc, final_output)
            for label, output, target in arcs:
                nb = pending + bytes([label])
                if len(nb) < utf8_need(nb[0]):
                    nrow, npending = row, nb  # mid-codepoint: row holds
                else:
                    nrow = step(row, nb.decode("utf-8"))
                    npending = b""
                    if min(nrow) > k:
                        continue  # prune the whole subtree
                yield from walk(
                    target,
                    prefix + bytes([label]),
                    self.out.add(acc, output),
                    nrow,
                    npending,
                )

        yield from walk(self.root, b"", self.out.empty, list(range(m + 1)), b"")

    def fuzzy_prefix_items(self, query: str, k: int):
        """(key, output) for every accepted key having SOME char-level
        prefix within ``k`` Levenshtein edits of ``query`` — the
        FuzzyCompletionQuery expansion source (Lucene suggest's
        typo-tolerant autocomplete: the typed prefix may itself
        contain edits, and every completion of a matching dictionary
        prefix qualifies). Same lazy DP-row DFS as levenshtein_items,
        but acceptance is row[m] <= k at ANY codepoint boundary, not
        only at final nodes: the FIRST (shallowest) qualifying node
        emits its ENTIRE subtree — every term below completes a
        qualifying prefix — and the DP stops there, so each term is
        yielded exactly once via its shallowest qualifying ancestor.
        Subtrees prune when min(row) > k (no extension of a row all
        above k can come back down). len(query) <= k makes the ROOT
        qualify (the empty prefix is within k edits) and the whole
        dictionary enumerates, mirroring the exhaustive reference.
        Yields in ascending byte order."""
        q = query
        m = len(q)

        def step(row, c):
            new = [row[0] + 1]
            for j in range(1, m + 1):
                new.append(
                    min(row[j] + 1, new[j - 1] + 1, row[j - 1] + (c != q[j - 1]))
                )
            return new

        def utf8_need(b0: int) -> int:
            if b0 < 0x80:
                return 1
            if b0 < 0xE0:
                return 2
            if b0 < 0xF0:
                return 3
            return 4

        def subtree(addr, prefix: bytes, acc):
            final, final_output, arcs = self._read_node(addr)
            if final:
                yield prefix, self.out.add(acc, final_output)
            for label, output, target in arcs:
                yield from subtree(
                    target, prefix + bytes([label]), self.out.add(acc, output)
                )

        def walk(addr, prefix: bytes, acc, row, pending: bytes):
            if not pending and row[m] <= k:
                yield from subtree(addr, prefix, acc)
                return
            _final, _fo, arcs = self._read_node(addr)
            for label, output, target in arcs:
                nb = pending + bytes([label])
                if len(nb) < utf8_need(nb[0]):
                    nrow, npending = row, nb  # mid-codepoint: row holds
                else:
                    nrow = step(row, nb.decode("utf-8"))
                    npending = b""
                    if min(nrow) > k:
                        continue  # prune the whole subtree
                yield from walk(
                    target,
                    prefix + bytes([label]),
                    self.out.add(acc, output),
                    nrow,
                    npending,
                )

        yield from walk(self.root, b"", self.out.empty, list(range(m + 1)), b"")

    def num_bytes(self) -> int:
        return len(self.data)
