"""Byte-level input primitives matching the reference's readers.

Semantics provenance: /root/reference/data-input-2/data_input.ml (the
primitive grammar: read_int is 4 bytes little-endian int32, read_uint
is 4 bytes big-endian, read_long is 8 bytes little-endian, vint/vlong
accumulate 7-bit groups LSB-first with a high-bit continuation flag,
strings are vint-length-prefixed bytes) and
/root/reference/data-input-2/reverse_bytes_source.ml (the reversed
view used by the FST reader: the position is an index into the
underlying array and every read moves it DOWN; read_bytes returns the
descending-index byte sequence).

The endianness split (read_int LE vs read_uint BE) reproduces the
reference's behavior exactly — its golden-fixture tests assert values
like magic=393008959 (= 0x3FD76C17 byte-swapped), so matching the
fixture-expected records requires matching that quirk.
"""

from __future__ import annotations


class DataInput:
    """Forward reader over a bytes object."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def length(self) -> int:
        return len(self.data)

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError(f"wanted {n} bytes at {self.pos}, got {len(out)}")
        self.pos += n
        return out

    def read_int(self) -> int:
        """4 bytes, LITTLE-endian, signed (data_input.ml read_int)."""
        return int.from_bytes(self.read_bytes(4), "little", signed=True)

    def read_uint(self) -> int:
        """4 bytes, BIG-endian, unsigned (data_input.ml read_uint)."""
        return int.from_bytes(self.read_bytes(4), "big", signed=False)

    def read_long(self) -> int:
        """8 bytes, LITTLE-endian, wrapped to OCaml's 63-bit native int
        (data_input.ml read_long ends in Int64.to_int, which drops the
        top bit — the fixture-expected index_length/terms_length values
        bake that in)."""
        v = int.from_bytes(self.read_bytes(8), "little", signed=True)
        return ((v + (1 << 62)) % (1 << 63)) - (1 << 62)

    def _read_v(self) -> int:
        acc, shift = 0, 0
        while True:
            b = self.read_byte()
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                return acc
            shift += 7

    def read_vint(self) -> int:
        """7-bit groups LSB-first; wrapped through Int32 like the
        reference (its test expects the 0x80000000 vint to read as
        -2147483648)."""
        v = self._read_v()
        return ((v + (1 << 31)) % (1 << 32)) - (1 << 31)

    def read_vlong(self) -> int:
        """Like read_vint but wrapped to OCaml's 63-bit native int
        (Int64 accumulation then Int64.to_int in the reference)."""
        v = self._read_v()
        return ((v + (1 << 62)) % (1 << 63)) - (1 << 62)

    def read_string(self) -> bytes:
        return self.read_bytes(self.read_vint())

    def read_list_of_strings(self) -> list[bytes]:
        """REVERSE of read order: the reference's
        `read_string di :: loop (n - 1)` evaluates cons arguments
        right-to-left (OCaml), so the first string read lands at the
        list's tail — and its fixture tests assert that order. The
        assoc variant let-binds each pair first, so it stays in read
        order."""
        n = self.read_vint()
        return [self.read_string() for _ in range(n)][::-1]

    def read_assoc_list_of_strings(self) -> list[tuple[bytes, bytes]]:
        return [
            (self.read_string(), self.read_string())
            for _ in range(self.read_vint())
        ]


class ReverseDataInput:
    """Reader over a reversed byte view: ``pos`` indexes the underlying
    array and every read DECREMENTS it (reverse_bytes_source.ml). The
    FST writer emits nodes back-to-front, so the reader walks the file
    backwards from the start node."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = len(data) - 1

    def copy(self) -> "ReverseDataInput":
        c = ReverseDataInput(self.data)
        c.pos = self.pos
        return c

    def get_byte(self, i: int) -> int:
        """Random access relative to the current position (used by the
        direct-addressing presence bit table)."""
        return self.data[self.pos - i]

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos -= 1
        return b

    def read_bytes(self, n: int) -> bytes:
        """The n bytes at descending indexes from pos (matching
        reverse read_bytes + rev_bytes: slice then reverse)."""
        out = self.data[self.pos - n + 1 : self.pos + 1][::-1]
        self.pos -= n
        return out

    def skip_bytes(self, n: int) -> None:
        self.pos -= n

    def _read_v(self) -> int:
        acc, shift = 0, 0
        while True:
            b = self.read_byte()
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                return acc
            shift += 7

    def read_vint(self) -> int:
        """Same Int32 wrap as the forward DataInput: the reference
        applies one Make-functor vint implementation to both byte
        sources, so the reversed reader inherits the identical wrap
        quirk (harmless on the golden fixtures, whose values are small,
        but required for quirk parity on values >= 2^31)."""
        v = self._read_v()
        return ((v + (1 << 31)) % (1 << 32)) - (1 << 31)

    def read_vlong(self) -> int:
        """63-bit OCaml-native-int wrap, matching DataInput.read_vlong."""
        v = self._read_v()
        return ((v + (1 << 62)) % (1 << 63)) - (1 << 62)

    def read_string(self) -> bytes:
        return self.read_bytes(self.read_vint())
