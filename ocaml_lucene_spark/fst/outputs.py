"""FST output algebras (monoid with common/subtract/add).

Parity with the reference's functor interface
(/root/reference/fst/output.ml:2-12) and its two instances:
- bytes outputs with longest-common-prefix algebra
  (/root/reference/fst/string_output.ml:3-29)
- int outputs with (min, -, +)
  (/root/reference/fst/int_output.ml:1-9)

Laws (documented in the reference's
doc/constructing_an_acyclic_transducer.md:74-86):
  add(common(a,b), subtract(a, common(a,b))) == a
  subtract(a, a) == empty ; add(a, empty) == a
"""

from __future__ import annotations

import os


class BytesOutput:
    empty = b""

    @staticmethod
    def common(a: bytes, b: bytes) -> bytes:
        return os.path.commonprefix([a, b])

    @staticmethod
    def subtract(a: bytes, prefix: bytes) -> bytes:
        assert a.startswith(prefix)
        return a[len(prefix):]

    @staticmethod
    def add(a: bytes, b: bytes) -> bytes:
        return a + b


class IntOutput:
    """Non-negative int outputs: common=min, subtract=-, add=+ (Lucene-style
    vlong outputs — what our term index uses for block pointers)."""

    empty = 0

    @staticmethod
    def common(a: int, b: int) -> int:
        return min(a, b)

    @staticmethod
    def subtract(a: int, prefix: int) -> int:
        assert a >= prefix
        return a - prefix

    @staticmethod
    def add(a: int, b: int) -> int:
        return a + b
