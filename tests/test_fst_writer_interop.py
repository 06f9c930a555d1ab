"""Round-trip: reversed-layout FST writer -> interop reader.

The reader was validated against the reference's golden fixtures
(tests/test_reference_fixtures.py); the writer must produce bytes
that the SAME reader walks to the input mapping, under all three
node strategies."""

from __future__ import annotations

import random

import pytest

from ocaml_lucene_spark.interop.fst_reader import FstReader
from ocaml_lucene_spark.interop.fst_writer import write_reversed_fst

STRATEGIES = [None, "linear", "binary", "da"]


def _reader(items, output_type="int", strategy=None):
    data, start, empty = write_reversed_fst(
        items, output_type=output_type, strategy=strategy
    )
    return FstReader(data, start, empty, output_type=output_type)


def _rand_items(n, seed, value=lambda rng: rng.randrange(0, 1 << 20)):
    rng = random.Random(seed)
    keys = sorted(
        {
            bytes(
                rng.choice(b"abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randrange(1, 12))
            )
            for _ in range(n)
        }
    )
    return [(k, value(rng)) for k in keys]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_int_round_trip_random_dictionary(strategy):
    items = _rand_items(2000, seed=5)
    r = _reader(items, "int", strategy)
    for k, v in items:
        assert r.lookup(k) == v, (k, v, strategy)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_bytes_outputs_round_trip(strategy):
    rng = random.Random(11)
    items = _rand_items(
        300,
        seed=7,
        value=lambda rng=rng: bytes(
            rng.randrange(97, 123) for _ in range(rng.randrange(0, 6))
        ),
    )
    r = _reader(items, "bytes", strategy)
    for k, v in items:
        assert r.lookup(k) == v, (k, v, strategy)


def test_prefix_keys_and_shared_suffixes():
    items = [
        (b"do", 7),
        (b"dog", 3),
        (b"dogs", 11),
        (b"dot", 5),
        (b"log", 9),
        (b"logs", 2),
    ]
    for strategy in STRATEGIES:
        r = _reader(items, "int", strategy)
        for k, v in items:
            assert r.lookup(k) == v, (k, strategy)


def test_direct_addressing_with_presence_holes():
    # sparse labels force real presence-bit gaps: a,c,f,k,m,z
    items = [(bytes([b]) + b"x", i + 1) for i, b in enumerate(b"acfkmz")]
    r = _reader(items, "int", "da")
    for k, v in items:
        assert r.lookup(k) == v
    # absent labels inside the range resolve to no arc (walk stops at
    # the root; partial output is the arc-output fold of the empty path)
    assert r.read_next_arc(ord("b"), r.first_arc()) is None
    assert r.read_next_arc(ord("y"), r.first_arc()) is None


def test_node_enumeration_matches_input_labels():
    items = [(bytes([b]), i + 1) for i, b in enumerate(b"aeiou")]
    for strategy in STRATEGIES:
        data, start, empty = write_reversed_fst(items, strategy=strategy)
        r = FstReader(data, start, empty)
        labels = sorted(a.label for a in r.read_arcs_at_target(start))
        assert labels == list(b"aeiou"), strategy


def test_minimality_shares_equal_suffix_nodes():
    # 26 keys all ending in the same 6-byte suffix: a minimal FST emits
    # the suffix chain once; an unshared trie would emit it 26 times
    suffix = b"suffix"
    items = [(bytes([c]) + suffix, 0) for c in b"abcdefghijklmnopqrstuvwxyz"]
    data, _start, _ = write_reversed_fst(items)
    trie_arc_count = sum(len(k) for k, _v in items)
    # every arc costs >= 2 bytes (flags+label); well under the trie bound
    assert len(data) < 2 * trie_arc_count


def test_matches_engine_fst_on_exact_keys():
    from ocaml_lucene_spark.fst.transducer import FstBuilder

    items = _rand_items(800, seed=13)
    b = FstBuilder()
    for k, v in items:
        b.add(k, v)
    engine = b.finish()
    r = _reader(items, "int", None)
    for k, v in items:
        assert r.lookup(k) == engine.lookup(k) == v


def test_target_next_shrinks_and_round_trips():
    """BIT_TARGET_NEXT (byte_array_fst_writer.ml:10): arcs whose target
    is the previously emitted block omit the target vint. Same reader,
    same lookups, strictly smaller bytes; the explicit-target encoding
    stays available (use_target_next=False)."""
    from ocaml_lucene_spark.interop.fst_writer import ReversedFstWriter, _build_graph
    from ocaml_lucene_spark.fst.outputs import IntOutput

    items = _rand_items(2000, seed=5)
    root = _build_graph(items, IntOutput)
    sizes = {}
    for tn in (False, True):
        w = ReversedFstWriter("int", None, use_target_next=tn)
        start = w._emit(root)
        sizes[tn] = len(w.buf)
        if tn:
            assert w.n_target_next > 0
        else:
            assert w.n_target_next == 0
        r = FstReader(bytes(w.buf), start, IntOutput.empty)
        for k, v in items:
            assert r.lookup(k) == v, (tn, k)
    assert sizes[True] < sizes[False]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_target_next_per_strategy_round_trip(strategy):
    # 'binary' must emit zero target-next arcs (the reader's slot path
    # can't resolve them); 'da' compresses non-last arcs only; 'linear'
    # compresses last arcs — all must read back identically
    from ocaml_lucene_spark.interop.fst_writer import ReversedFstWriter, _build_graph
    from ocaml_lucene_spark.fst.outputs import IntOutput

    items = _rand_items(600, seed=23)
    root = _build_graph(items, IntOutput)
    w = ReversedFstWriter("int", strategy, use_target_next=True)
    start = w._emit(root)
    if strategy == "binary":
        assert w.n_target_next == 0
    r = FstReader(bytes(w.buf), start, IntOutput.empty)
    for k, v in items:
        assert r.lookup(k) == v, (strategy, k)


def test_target_next_node_enumeration_and_da_holes():
    # enumeration (read_arcs_at_target) resolves TARGET_NEXT arcs too,
    # and sparse direct-addressing presence gaps stay intact
    items = [(bytes([b]) + b"xy", i + 1) for i, b in enumerate(b"acfkmz")]
    for strategy in STRATEGIES:
        data, start, empty = write_reversed_fst(
            items, strategy=strategy, use_target_next=True
        )
        r = FstReader(data, start, empty)
        labels = sorted(a.label for a in r.read_arcs_at_target(start))
        assert labels == list(b"acfkmz"), strategy
        for k, v in items:
            assert r.lookup(k) == v, (strategy, k)
        if strategy == "da":
            assert r.read_next_arc(ord("b"), r.first_arc()) is None


def test_target_next_bytes_outputs():
    rng = random.Random(31)
    items = _rand_items(
        300,
        seed=17,
        value=lambda rng=rng: bytes(
            rng.randrange(97, 123) for _ in range(rng.randrange(0, 6))
        ),
    )
    data, start, empty = write_reversed_fst(
        items, output_type="bytes", use_target_next=True
    )
    plain, _s2, _e2 = write_reversed_fst(
        items, output_type="bytes", use_target_next=False
    )
    assert len(data) < len(plain)
    r = FstReader(data, start, empty, output_type="bytes")
    for k, v in items:
        assert r.lookup(k) == v


def test_int_output_past_31_bits_refused():
    # the interop reader's Int32-wrapped read_vint would silently wrap
    # an output >= 2^31 to negative; the writer must refuse instead
    import pytest

    from ocaml_lucene_spark.interop.fst_writer import write_reversed_fst

    with pytest.raises(ValueError, match="31-bit"):
        write_reversed_fst([(b"a", 2**31)], output_type="int")
    # boundary value just inside the range still round-trips
    data, start, empty = write_reversed_fst([(b"a", 2**31 - 1)], output_type="int")
    from ocaml_lucene_spark.interop.fst_reader import FstReader

    r = FstReader(data, start, empty)
    assert r.lookup(b"a") == 2**31 - 1
