"""Suffix-block (.tim) interop: synthesized-bytes round-trips for the
reference's seek_exact steps 4-5 (terms_enumerator.ml), plus the FULL
seek composition through the real reversed-FST writer/reader and the
floor-pointer decoder. No golden .tim fixture exists in the
reference's data/ — this is the segments_N-manifest evidence model:
writer grammar -> reader decode -> transparent contract model.

No Spark involved; pure byte-level tests.
"""

from __future__ import annotations

import random

import pytest

from ocaml_lucene_spark.codecs.varint import write_vint
from ocaml_lucene_spark.interop.block_pointer import find_block
from ocaml_lucene_spark.interop.data_input import DataInput
from ocaml_lucene_spark.interop.fst_reader import FstReader
from ocaml_lucene_spark.interop.fst_writer import write_reversed_fst
from ocaml_lucene_spark.interop.terms_block import (
    BlockTermState,
    FieldFlags,
    TermEntry,
    expected_state,
    read_block,
    seek_exact_in_block,
    write_block,
)

FLAGS = FieldFlags()


def _roundtrip(entries, flags=FLAGS, **kw):
    data = write_block(entries, flags=flags, **kw)
    block = read_block(DataInput(data))
    assert block.ent_count == len(entries)
    assert block.suffixes == [e.suffix for e in entries]
    for i in range(len(entries)):
        got = seek_exact_in_block(block, entries[i].suffix, flags)
        assert got == expected_state(entries, i, flags), (i, entries[i])
    assert seek_exact_in_block(block, b"absent-suffix", flags) is None
    return block


def test_plain_terms_with_freqs_roundtrip():
    entries = [
        TermEntry(b"ple", 3, 7, doc_start_fp=100, pos_start_fp=10),
        TermEntry(b"ply", 2, 2, doc_start_fp=140, pos_start_fp=30),
        TermEntry(b"t", 5, 19, doc_start_fp=150, pos_start_fp=55),
    ]
    _roundtrip(entries)


def test_isolated_singleton_uses_plain_token_and_vint_id():
    entries = [
        TermEntry(b"aa", 4, 9, doc_start_fp=0),
        TermEntry(b"bb", 1, 1, doc_start_fp=20, singleton_doc_id=77),
        TermEntry(b"cc", 2, 3, doc_start_fp=20),
    ]
    _roundtrip(entries)


def test_singleton_run_with_shared_fp_and_id_deltas():
    # 3 consecutive singletons: first carries the fp delta + vint id,
    # the next two share the fp and delta their singleton ids
    # (has_doc_start_fp = 0 — the v-reuse branch)
    entries = [
        TermEntry(b"ra", 1, 1, doc_start_fp=64, singleton_doc_id=5),
        TermEntry(b"rb", 1, 1, doc_start_fp=64, singleton_doc_id=9),
        TermEntry(b"rc", 1, 1, doc_start_fp=64, singleton_doc_id=9),
        TermEntry(b"rd", 4, 6, doc_start_fp=80),
    ]
    block = _roundtrip(entries)
    # the run token must actually be in the stats stream: one token
    # (run) + one (plain df) + its freq-delta
    sdi = DataInput(block.stats)
    tok = sdi.read_vint()
    assert tok & 1 == 1 and tok >> 1 == 2  # run of 1 + 2 more


def test_over_128_extras_skip_offset_and_last_pos_block():
    entries = [
        TermEntry(
            b"hot", 200, 900, doc_start_fp=0, pos_start_fp=0,
            last_pos_block_offset=123, skip_offset=456,
        ),
        TermEntry(b"warm", 10, 140, doc_start_fp=64, pos_start_fp=9,
                  last_pos_block_offset=7),
    ]
    _roundtrip(entries)


def test_no_freqs_no_positions_flags():
    flags = FieldFlags(has_freqs=False, has_positions=False)
    entries = [
        # without freqs the reader computes ttf = df (0 + df)
        TermEntry(b"x", 3, 3, doc_start_fp=11),
        TermEntry(b"y", 1, 1, doc_start_fp=30, singleton_doc_id=2),
    ]
    _roundtrip(entries, flags=flags)


def test_offsets_flag_adds_pay_fp_chain():
    flags = FieldFlags(has_offsets=True)
    entries = [
        TermEntry(b"u", 2, 4, doc_start_fp=0, pos_start_fp=5, pay_start_fp=3),
        TermEntry(b"v", 3, 3, doc_start_fp=9, pos_start_fp=8, pay_start_fp=12),
    ]
    _roundtrip(entries, flags=flags)


def test_varied_suffix_lengths_use_vint_stream():
    entries = [
        TermEntry(b"a", 2, 2, doc_start_fp=0),
        TermEntry(b"bcdef", 3, 4, doc_start_fp=10),
    ]
    _roundtrip(entries)


@pytest.mark.parametrize("algo", [0, 1, 2])
def test_compression_algos_roundtrip(algo):
    # lowercase-ascii wants [a-z0-9] suffixes (our tokenizer's
    # guarantee); LZ4 wants repetition
    entries = [
        TermEntry(b"compress", 4, 8, doc_start_fp=0),
        TermEntry(b"compressed", 2, 2, doc_start_fp=11),
        TermEntry(b"compression", 1, 1, doc_start_fp=29, singleton_doc_id=3),
    ]
    _roundtrip(entries, compression=algo)


def test_non_leaf_block_raises_like_reference():
    entries = [TermEntry(b"z", 2, 2, doc_start_fp=0)]
    data = write_block(entries, leaf=False)
    block = read_block(DataInput(data))
    with pytest.raises(NotImplementedError, match="if_leaf_block"):
        seek_exact_in_block(block, b"z", FLAGS)


def test_randomized_roundtrip_all_algos():
    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    for trial in range(30):
        algo = trial % 3
        n = rng.randint(1, 12)
        entries = []
        fp = 0
        pos = 0
        for i in range(n):
            df = rng.choice([1, 1, 1, 2, 3, 50, 200])
            ttf = df if df == 1 else df + rng.randint(0, 300)
            fp += rng.randint(0, 40)
            pos += rng.randint(0, 25)
            entries.append(
                TermEntry(
                    suffix="".join(
                        rng.choice(alpha) for _ in range(rng.randint(1, 9))
                    ).encode() + f"-{i}".encode(),
                    doc_freq=df,
                    total_term_freq=ttf,
                    doc_start_fp=fp,
                    pos_start_fp=pos,
                    singleton_doc_id=rng.randint(0, 99) if df == 1 else None,
                    last_pos_block_offset=rng.randint(0, 500)
                    if ttf > 128
                    else None,
                    skip_offset=rng.randint(0, 500) if df > 128 else None,
                )
            )
        _roundtrip(entries, compression=algo)


# -- full seek_exact composition (steps 1-5 over synthesized .tim) ----


def _pointer(fp, has_terms=True, floors=None):
    """Encode a block-pointer FST output (block_pointer.ml grammar):
    floors = [(label, fp_delta, has_terms), ...] starting at the
    SECOND floor block; the first floor block's start label is the
    next_floor_label byte."""
    out = bytearray()
    if floors is None:
        write_vint((fp << 2) | (2 if has_terms else 0), out)
        return bytes(out)
    write_vint((fp << 2) | (2 if has_terms else 0) | 1, out)
    write_vint(len(floors), out)
    out.append(floors[0][0])
    for i, (label, delta, ht) in enumerate(floors):
        write_vint((delta << 1) | (1 if ht else 0), out)
        if i + 1 < len(floors):
            out.append(floors[i + 1][0])
    return bytes(out)


def test_full_seek_exact_through_fst_floor_and_block(tmp_path):
    """The reference's whole seek_exact pipeline on synthesized data:
    FST prefix walk (real reversed-layout writer + fixture-verified
    reader) -> floor-pointer decode -> block load at the fp ->
    leaf suffix scan -> metadata decode."""
    flags = FLAGS
    # terms: ap{ple,ply,q...} under prefix "ap" (two floor blocks
    # split at label 'q'), ba{t,ts} under prefix "ba" (single block)
    ap1 = [
        TermEntry(b"ple", 3, 7, doc_start_fp=0, pos_start_fp=0),
        TermEntry(b"ply", 1, 1, doc_start_fp=17, singleton_doc_id=4,
                  pos_start_fp=12),
    ]
    ap2 = [
        TermEntry(b"q", 2, 2, doc_start_fp=40, pos_start_fp=31),
        TermEntry(b"qx", 5, 9, doc_start_fp=51, pos_start_fp=44),
    ]
    ba = [
        TermEntry(b"t", 6, 11, doc_start_fp=70, pos_start_fp=60),
        TermEntry(b"ts", 2, 3, doc_start_fp=90, pos_start_fp=77),
    ]
    tim = bytearray(b"\x13\x37")  # arbitrary header the fps skip over
    fps = {}
    for name, block in (("ap1", ap1), ("ap2", ap2), ("ba", ba)):
        fps[name] = len(tim)
        tim += write_block(block, flags=flags)
    # "ap" is floored: first block at fps[ap1] covers labels < 'q',
    # follow block (delta fp) covers 'q'.. ; "ba" is a plain pointer
    items = [
        (b"ap", _pointer(fps["ap1"],
                         floors=[(ord("q"), fps["ap2"] - fps["ap1"], True)])),
        (b"ba", _pointer(fps["ba"])),
    ]
    data, start, empty = write_reversed_fst(items, output_type="bytes")
    fst = FstReader(data, start, empty, output_type="bytes")

    def seek(target: bytes):
        # terms_enumerator.ml seek_exact: prefix walk, build_output,
        # find_block on the char after the prefix, block scan
        arc = fst.first_arc()
        path = [arc]
        for b in target:
            if arc.target <= 0:  # stop arc: no outgoing node
                break
            nxt = fst.read_next_arc(b, arc)
            if nxt is None:
                break
            path.append(nxt)
            arc = nxt
        prefix_length = len(path) - 1
        out = b"".join(a.output for a in path[:-1])
        out += path[-1].output + path[-1].final_output
        target_label = target[prefix_length]
        fp = find_block(out, target_label)
        if fp is None:
            return None
        block = read_block(DataInput(bytes(tim), fp))
        return seek_exact_in_block(block, target[prefix_length:], flags)

    assert seek(b"apple") == expected_state(ap1, 0, flags)
    assert seek(b"apply") == expected_state(ap1, 1, flags)
    assert seek(b"apq") == expected_state(ap2, 0, flags)
    assert seek(b"apqx") == expected_state(ap2, 1, flags)
    assert seek(b"bat") == expected_state(ba, 0, flags)
    assert seek(b"bats") == expected_state(ba, 1, flags)
    # misses: absent suffix in the right block / absent prefix branch
    assert seek(b"apz") is None
    assert seek(b"bax") is None
