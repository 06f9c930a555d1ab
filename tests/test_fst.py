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


class TestLevenshteinIntersection:
    """Fuzzy expansion: automaton ∩ FST must equal the exhaustive
    per-term DP filter over the FULL dictionary (incl. multi-byte
    UTF-8 keys, where edits are char-level, not byte-level)."""

    def _build(self, words):
        b = FstBuilder()
        for i, w in enumerate(sorted(set(words))):
            b.add(w.encode("utf-8"), i)
        return b.finish(), sorted(set(words))

    def _check(self, fst, words, query, k):
        from ocaml_lucene_spark.query.term_index import edit_distance_leq

        got = {key.decode("utf-8") for key, _ in fst.levenshtein_items(query, k)}
        expect = {w for w in words if edit_distance_leq(w, query, k)}
        assert got == expect, (query, k, got ^ expect)
        # outputs (ordinals) must ride along correctly
        ords = dict(fst.levenshtein_items(query, k))
        for key, o in ords.items():
            assert words[o] == key.decode("utf-8")

    def test_ascii_dictionary(self):
        import random

        rng = random.Random(11)
        words = ["sort", "short", "sport", "spark", "park", "query", "qery",
                 "a", "ab", "abc"]
        words += ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
                  for _ in range(300)]
        fst, words = self._build(words)
        for q in ["sort", "abc", "dddd", "xyz", "", "qqq", "abcd"]:
            for k in (0, 1, 2, 3):
                self._check(fst, words, q, k)

    def test_multibyte_utf8_char_level_edits(self):
        words = ["cafe", "café", "caffé", "naive", "naïve", "żółć", "zolc",
                 "über", "uber", "日本", "日本語"]
        fst, words = self._build(words)
        for q in ["cafe", "café", "naïve", "żółć", "日本語", "uber"]:
            for k in (0, 1, 2):
                self._check(fst, words, q, k)

    def test_automaton_prunes(self):
        """The walk must visit far fewer nodes than the whole trie for
        a small k (sub-linearity witness)."""
        words = [f"{a}{b}{c}{d}" for a in "abcdefgh" for b in "abcdefgh"
                 for c in "abcdefgh" for d in "abcdefgh"]  # 4096 keys
        fst, words = self._build(words)
        visits = 0
        orig = fst._read_node

        def counting(addr):
            nonlocal visits
            visits += 1
            return orig(addr)

        fst._read_node = counting
        hits = list(fst.levenshtein_items("aaaa", 1))
        fst._read_node = orig
        assert {k.decode() for k, _ in hits} == {
            w for w in words
            if sum(x != y for x, y in zip(w, "aaaa")) <= 1
        }
        # full enumeration would visit every node (~4681); k=1 must
        # prune the overwhelming majority
        assert visits < 1500, visits


class TestRegexIntersection:
    """RegexpQuery expansion: NFA ∩ FST must equal the exhaustive
    re.fullmatch filter over the FULL dictionary, and prune subtrees
    whose automaton dies."""

    def _build(self, words):
        b = FstBuilder()
        for i, w in enumerate(sorted(set(words))):
            b.add(w.encode("utf-8"), i)
        return b.finish(), sorted(set(words))

    def test_matches_python_re_over_dictionary(self):
        import random
        import re

        from ocaml_lucene_spark.fst.regex_nfa import compile_nfa

        rng = random.Random(17)
        words = ["sort", "short", "sport", "spark", "park", "query", "data",
                 "data0", "table", "tables", "the", "that", "thing", "sing",
                 "a", "ab", "abc", "abcc", "abd", "cd"]
        words += ["".join(rng.choice("abcdst01") for _ in range(rng.randint(1, 7)))
                  for _ in range(400)]
        fst, words = self._build(words)
        for pat in ["abc*", "ab|cd", "tables?", "s[aeiou].*", ".*ing",
                    "data[0-9]?", "[a-d]{3,5}", "th(e|at).*", "a(b|c)d",
                    "(ab)*c", "[^ab]c.*", "a.c", "zz.*"]:
            nfa = compile_nfa(pat)
            got = {k.decode() for k, _ in fst.automaton_items(nfa)}
            expect = {w for w in words if re.fullmatch(pat, w)}
            assert got == expect, (pat, got ^ expect)
            # outputs (ordinals) ride along
            for key, o in fst.automaton_items(nfa):
                assert words[o] == key.decode()

    def test_multibyte_utf8(self):
        import re

        from ocaml_lucene_spark.fst.regex_nfa import compile_nfa

        words = ["café", "cafe", "caffé", "naïve", "naive", "日本", "日本語"]
        fst, words = self._build(words)
        for pat in ["caf.*", "ca(fé|fe)", "日本.*", ".*é", "na.ve"]:
            nfa = compile_nfa(pat)
            got = {k.decode() for k, _ in fst.automaton_items(nfa)}
            expect = {w for w in words if re.fullmatch(pat, w)}
            assert got == expect, pat

    def test_dead_automaton_prunes_subtrees(self):
        from ocaml_lucene_spark.fst.regex_nfa import compile_nfa

        words = [f"{a}{b}{c}{d}" for a in "abcdefgh" for b in "abcdefgh"
                 for c in "abcdefgh" for d in "abcdefgh"]  # 4096 keys
        fst, words = self._build(words)
        visits = 0
        orig = fst._read_node

        def counting(addr):
            nonlocal visits
            visits += 1
            return orig(addr)

        fst._read_node = counting
        hits = list(fst.automaton_items(compile_nfa("ab.*|cd.*")))
        fst._read_node = orig
        assert {k.decode() for k, _ in hits} == {
            w for w in words if w.startswith(("ab", "cd"))
        }
        # only the a/c subtrees (and their b/d children) survive the
        # first two steps: ~2/64 of the trie, vs ~4681 full nodes
        assert visits < 400, visits

    def test_unsupported_constructs_raise(self):
        import pytest as _pytest

        from ocaml_lucene_spark.fst.regex_nfa import (
            UnsupportedRegexError,
            compile_nfa,
        )

        for pat in ["^abc", r"a\d", "(?i)x", "a(?=b)", r"(a)\1", "(?s)a.b"]:
            with _pytest.raises(UnsupportedRegexError):
                compile_nfa(pat)


class TestFuzzyPrefixIntersection:
    """FuzzyCompletionQuery expansion: the subtree-emitting automaton ∩
    FST walk (fuzzy_prefix_items) must equal the exhaustive per-term
    some-prefix-within-k DP filter over the FULL dictionary — incl.
    multi-byte UTF-8 keys (char-level edits), the empty query, and
    len(query) <= k (where the root qualifies and the whole dictionary
    enumerates)."""

    def _build(self, words):
        b = FstBuilder()
        for i, w in enumerate(sorted(set(words))):
            b.add(w.encode("utf-8"), i)
        return b.finish(), sorted(set(words))

    def _check(self, fst, words, query, k):
        from ocaml_lucene_spark.query.term_index import _some_prefix_within

        hits = list(fst.fuzzy_prefix_items(query, k))
        got = [key.decode("utf-8") for key, _ in hits]
        expect = [w for w in words if _some_prefix_within(w, query, k)]
        # sorted byte order, each term exactly once, ordinals intact
        assert got == expect, (query, k, set(got) ^ set(expect))
        for key, o in hits:
            assert words[o] == key.decode("utf-8")

    def test_ascii_dictionary(self):
        import random

        rng = random.Random(7)
        words = ["sort", "short", "sport", "spark", "sparkle", "park",
                 "query", "qery", "a", "ab", "abc", "table", "tables",
                 "tablet", "cable"]
        words += ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
                  for _ in range(300)]
        fst, words = self._build(words)
        for q in ["tabl", "tabel", "spark", "xyz", "qqq", "ab", "", "a"]:
            for k in (0, 1, 2):
                self._check(fst, words, q, k)

    def test_multibyte_utf8_char_level_edits(self):
        words = ["cafe", "café", "caffé", "cafeteria", "caféteria",
                 "naive", "naïve", "日本", "日本語", "uber", "über"]
        fst, words = self._build(words)
        for q in ["café", "cafe", "naïv", "日本", "übe"]:
            for k in (0, 1, 2):
                self._check(fst, words, q, k)

    def test_short_query_enumerates_whole_dictionary(self):
        fst, words = self._build(["alpha", "beta", "gamma"])
        # len(query)=1 <= k=1: the EMPTY prefix qualifies for every term
        self._check(fst, words, "x", 1)
        got = [k.decode() for k, _ in fst.fuzzy_prefix_items("x", 1)]
        assert got == words

    def test_each_term_emitted_once_via_shallowest_ancestor(self):
        # "table" has two qualifying prefixes for query "tabl", k=1
        # ("tabl" d=0 and "table" d=1) — must still be emitted once
        fst, words = self._build(["table", "tables", "tab"])
        got = [k.decode() for k, _ in fst.fuzzy_prefix_items("tabl", 1)]
        assert got == ["tab", "table", "tables"]  # "tab" d=1 qualifies too
