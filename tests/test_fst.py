"""FST construction + lookup tests.

Mirrors the reference's test strategy:
- adversarial shared-prefix word lists
  (/root/reference/test-fst/test_acyclic_transducer.ml:166-211)
- every inserted word must accept to its output (:151-164)
- dictionary-scale corpus (~4300 pairs, spellings.txt style, :251-267)
"""

import numpy as np
import pytest

from ocaml_lucene_spark.fst.outputs import BytesOutput, IntOutput
from ocaml_lucene_spark.fst.transducer import FstBuilder


def build(pairs):
    b = FstBuilder()
    for k, v in pairs:
        b.add(k, v)
    return b.finish()


class TestOutputAlgebra:
    # monoid laws per doc/constructing_an_acyclic_transducer.md:74-86
    @pytest.mark.parametrize("a,b", [(b"agre", b"agred"), (b"ca", b"co"), (b"", b"x")])
    def test_bytes_laws(self, a, b):
        cp = BytesOutput.common(a, b)
        assert BytesOutput.add(cp, BytesOutput.subtract(a, cp)) == a
        assert BytesOutput.add(cp, BytesOutput.subtract(b, cp)) == b

    def test_int_laws(self):
        assert IntOutput.add(IntOutput.common(5, 7), IntOutput.subtract(7, 5)) == 7


class TestFstBuild:
    def test_simple(self):
        pairs = [(b"cat", 5), (b"cats", 7), (b"dog", 12)]
        fst = build(pairs)
        for k, v in pairs:
            assert fst.lookup(k) == v
        assert fst.lookup(b"ca") is None
        assert fst.lookup(b"catx") is None
        assert fst.lookup(b"zebra") is None

    def test_prefix_of_prefix(self):
        # c / ca / agre / agred / agressively family (reference :166-211)
        pairs = sorted(
            [(b"agre", 3), (b"agred", 1), (b"agressively", 9), (b"c", 100), (b"ca", 2)]
        )
        fst = build(pairs)
        for k, v in pairs:
            assert fst.lookup(k) == v

    def test_output_prefix_redistribution(self):
        # larger output first forces push-down into a final state
        pairs = [(b"c", 7), (b"ca", 5), (b"cb", 6)]
        fst = build(pairs)
        for k, v in pairs:
            assert fst.lookup(k) == v

    def test_rejects_unsorted(self):
        b = FstBuilder()
        b.add(b"bb", 1)
        with pytest.raises(ValueError):
            b.add(b"aa", 2)

    def test_rejects_duplicate(self):
        b = FstBuilder()
        b.add(b"aa", 1)
        with pytest.raises(ValueError):
            b.add(b"aa", 2)

    def test_suffix_sharing_minimality(self):
        # words with a long shared suffix must share serialized nodes:
        # total bytes grow sub-linearly vs the unshared upper bound
        words = sorted(f"{p}ization".encode() for p in
                       ["american", "modern", "global", "general", "normal", "central"])
        fst = build([(w, 1) for w in words])
        unshared = sum(len(w) for w in words) * 3  # per-arc cost bound
        assert fst.num_bytes() < unshared

    def test_dictionary_scale(self):
        # ~4300 deterministic key->output pairs (spellings.txt scale)
        rng = np.random.default_rng(42)
        vocab = set()
        while len(vocab) < 4300:
            n = rng.integers(2, 14)
            vocab.add(bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"), n)))
        pairs = [(w, int(i * 13 + 1)) for i, w in enumerate(sorted(vocab))]
        fst = build(pairs)
        for k, v in pairs:
            assert fst.lookup(k) == v, k
        # absent probes
        assert fst.lookup(b"zzzzzzzzzzzzzzzz") is None
        assert fst.lookup(b"a" * 20) is None
