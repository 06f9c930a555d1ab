"""Adversarial hardening of the self-certified postings wire grammar
(VERDICT r7 "what's missing #3" / next-round item 6): the reference
stubs its postings read path and ships no .doc/.pos/.pay fixture, so
interop/postings_stream.py is pinned by its own writer↔reader
round-trips — a SHARED writer/reader misreading would survive that.
Two independent attacks narrow the gap:

1. An INDEPENDENT PFOR decoder, written here directly from the
   documented block grammar (codecs/pfor.py module doc: token byte =
   n_exc<<5 | width, width-31 escape byte, all-equal vint special
   case, flat little-endian bit stream, (index, high-byte) exception
   pairs) using pure-int arithmetic — no shared code with the numpy
   unpack path. It must agree with codecs.pfor on every block AND on
   the packed blocks inside a written .doc stream walked purely from
   the documented framing (delta block, freq block, alternating).

2. Bit-flip mutations: flipping any single bit of a valid stream must
   either raise a clean, bounded exception or return STRUCTURALLY
   consistent output (array lengths derived from the .tim state, one
   position run per doc) — never hang, never crash the process, never
   return malformed shapes. Value-level corruption without structural
   damage is detectable only by checksums (Lucene's own position —
   its footer CRC is the integrity layer, not the block codec), so
   the contract here is structural, and header flips — the region
   check_index_header covers — must ALWAYS raise.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ocaml_lucene_spark.codecs import pfor
from ocaml_lucene_spark.interop.data_input import DataInput
from ocaml_lucene_spark.interop.postings_stream import (
    BLOCK_SIZE,
    DocStreamReader,
    read_term_postings,
    read_term_postings_and_positions,
    write_doc_stream,
    write_postings_streams,
)
from ocaml_lucene_spark.interop.segment_meta import read_header
from ocaml_lucene_spark.interop.terms_block import BlockTermState, FieldFlags

SEG_ID = bytes(range(16))
FLAGS = FieldFlags(has_freqs=True, has_positions=True)
DOC_FLAGS = FieldFlags(has_freqs=True, has_positions=False)

# the full set of exceptions a corrupted stream may raise: everything
# here is a clean per-task failure (the importer drops/raises at the
# row level); anything else — MemoryError, segfault, hang — is a bug
CLEAN_ERRORS = (ValueError, IndexError, EOFError, KeyError, OverflowError)


# -- 1a. independent PFOR decoder (pure ints, from the documented
#        grammar; deliberately no numpy and no shared helpers) --------


def independent_pfor_decode(data: bytes, pos: int, count: int):
    token = data[pos]
    pos += 1
    if token == 0:  # all-equal vint special case (zero exceptions)
        v, shift = 0, 0
        while True:
            b = data[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return [v] * count, pos
    n_exc = token >> 5
    width = token & 0x1F
    if width == 31:  # wide-width escape byte
        width = data[pos]
        pos += 1
    nbytes = (count * width + 7) // 8
    big = int.from_bytes(data[pos : pos + nbytes], "little")
    pos += nbytes
    mask = (1 << width) - 1
    vals = [(big >> (i * width)) & mask for i in range(count)]
    for _ in range(n_exc):
        vals[data[pos]] |= data[pos + 1] << width
        pos += 2
    return vals, pos


@st.composite
def pfor_block(draw):
    """Blocks covering every encoder branch: all-equal (vint case),
    small uniform (plain FOR), heavy-tail (exception patching), and
    wide >30-bit values (the width-escape byte)."""
    shape = draw(st.sampled_from(["equal", "small", "tail", "wide"]))
    n = draw(st.sampled_from([128, 64, 7, 1]))
    if shape == "equal":
        v = draw(st.integers(0, 1 << 40))
        return [v] * n
    if shape == "small":
        return draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    if shape == "tail":
        base = draw(st.lists(st.integers(0, 1 << 10), min_size=n, max_size=n))
        n_out = draw(st.integers(1, min(7, n)))
        idx = draw(
            st.lists(
                st.integers(0, n - 1), min_size=n_out, max_size=n_out, unique=True
            )
        )
        for i in idx:
            base[i] = draw(st.integers(1 << 12, 1 << 18))
        return base
    return draw(
        st.lists(st.integers(1 << 31, (1 << 62) - 1), min_size=n, max_size=n)
    )


@settings(max_examples=120, derandomize=True, deadline=None)
@given(values=pfor_block())
def test_independent_pfor_decoder_agrees(values):
    data = b"\xaa" + pfor.encode(np.array(values, dtype=np.uint64)) + b"\xbb"
    ours, end = pfor.decode_at(data, 1, len(values))
    theirs, end2 = independent_pfor_decode(data, 1, len(values))
    assert end == end2 == len(data) - 1
    assert [int(v) for v in ours] == theirs == values


def test_doc_stream_framing_walks_with_independent_decoder():
    """The .doc packed region decodes from the DOCUMENTED framing alone
    (alternating 128-delta / 128-freq PFOR blocks from doc_start_fp)
    with the independent decoder — the read path's structural claims
    hold without sharing any of its code."""
    rng = random.Random(5)
    df = 5 * BLOCK_SIZE + 17
    docs = np.cumsum(
        np.array([rng.randint(1, 50) for _ in range(df)], dtype=np.int64)
    )
    freqs = np.array([rng.randint(1, 30) for _ in range(df)], dtype=np.int64)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID)

    pos = metas[0]["doc_start_fp"]
    got_docs: list[int] = []
    got_freqs: list[int] = []
    last = 0
    for _ in range(df // BLOCK_SIZE):
        deltas, pos = independent_pfor_decode(data, pos, BLOCK_SIZE)
        for d in deltas:
            last += d
            got_docs.append(last)
        fblock, pos = independent_pfor_decode(data, pos, BLOCK_SIZE)
        got_freqs.extend(fblock)
    assert got_docs == docs[: len(got_docs)].tolist()
    assert got_freqs == freqs[: len(got_freqs)].tolist()
    # and the reference reader agrees on the whole list (tail included)
    rd, rf = read_term_postings(
        data,
        BlockTermState(
            doc_freq=df,
            total_term_freq=int(freqs.sum()),
            doc_start_fp=metas[0]["doc_start_fp"],
            skip_offset=metas[0]["skip_offset"],
        ),
        DOC_FLAGS,
    )
    np.testing.assert_array_equal(rd, docs)
    np.testing.assert_array_equal(rf, freqs)


# -- 2. bit-flip mutations --------------------------------------------


def _streams():
    rng = random.Random(13)
    terms = []
    for df in (3 * BLOCK_SIZE + 9, 40, 1):
        docs = np.cumsum(
            np.array([rng.randint(1, 9) for _ in range(df)], dtype=np.int64)
        )
        poss = [
            np.cumsum(
                np.array(
                    [rng.randint(1, 5) for _ in range(rng.randint(1, 4))],
                    dtype=np.int64,
                )
            )
            for _ in range(df)
        ]
        terms.append((docs, poss))
    doc_b, pos_b, metas = write_postings_streams(terms, SEG_ID)
    states = [
        BlockTermState(
            doc_freq=len(t[0]),
            total_term_freq=sum(len(p) for p in t[1]),
            doc_start_fp=m["doc_start_fp"],
            skip_offset=m["skip_offset"],
            singleton_doc_id=m["singleton_doc_id"],
            pos_start_fp=m["pos_start_fp"],
            last_pos_block_offset=m["last_pos_block_offset"],
        )
        for t, m in zip(terms, metas)
    ]
    return doc_b, pos_b, terms, states


DOC_B, POS_B, TERMS, STATES = _streams()


def _flip(data: bytes, bit: int) -> bytes:
    b = bytearray(data)
    b[bit // 8] ^= 1 << (bit % 8)
    return bytes(b)


def _decode_all(doc_b: bytes, pos_b: bytes):
    """Full three-term decode through the header-checking reader —
    the exact composition the importer's executor tasks run."""
    out = []
    doc_data = DocStreamReader(doc_b, SEG_ID).data
    for st_, (docs, poss) in zip(STATES, TERMS):
        d, f, p = read_term_postings_and_positions(
            doc_data, pos_b, st_, FLAGS
        )
        out.append((d, f, p))
    return out


def test_unmutated_baseline_decodes_exactly():
    for (d, f, p), (docs, poss) in zip(_decode_all(DOC_B, POS_B), TERMS):
        np.testing.assert_array_equal(d, docs)
        np.testing.assert_array_equal(
            f, np.array([len(x) for x in poss], dtype=np.int64)
        )
        for g, w in zip(p, poss):
            np.testing.assert_array_equal(g, w)


def test_every_header_bit_flip_raises():
    """check_index_header covers the header region completely: magic,
    codec string, version, object id, suffix — any flip is a clean
    ValueError/IndexError, exactly Lucene's open-time behavior. The
    one lawful exception: a flip INSIDE the version field that lands
    on another version in the accepted [0, 1] range is valid by
    specification (1 -> 0 on the low bit), not corruption."""
    from ocaml_lucene_spark.interop.postings_stream import DOC_CODEC

    di = DataInput(DOC_B)
    read_header(di)
    header_bits = di.pos * 8
    version_off = 4 + 1 + len(DOC_CODEC)  # magic + vint len + name
    for bit in range(header_bits):
        if version_off * 8 <= bit < (version_off + 4) * 8:
            flipped = _flip(DOC_B, bit)
            v = int.from_bytes(flipped[version_off : version_off + 4], "big")
            if 0 <= v <= 1:
                DocStreamReader(flipped, SEG_ID)  # accepted version
                continue
        with pytest.raises(CLEAN_ERRORS):
            DocStreamReader(_flip(DOC_B, bit), SEG_ID)


@settings(max_examples=300, derandomize=True, deadline=None)
@given(data=st.data())
def test_doc_stream_bit_flips_never_break_structure(data):
    """Any single-bit corruption of the .doc payload either raises a
    clean error or yields structurally consistent output (len == the
    .tim doc_freq, one freq per doc, one position run per doc). Value
    corruption without structural damage is checksum territory — and
    the importer's task-local df/ttf invariants catch the sum-visible
    share of it."""
    di = DataInput(DOC_B)
    read_header(di)
    bit = data.draw(st.integers(di.pos * 8, len(DOC_B) * 8 - 1))
    mutated = _flip(DOC_B, bit)
    try:
        results = _decode_all(mutated, POS_B)
    except CLEAN_ERRORS:
        return
    for (d, f, p), st_ in zip(results, STATES):
        assert len(d) == st_.doc_freq
        assert len(f) == st_.doc_freq
        assert len(p) == st_.doc_freq


@settings(max_examples=300, derandomize=True, deadline=None)
@given(data=st.data())
def test_pos_stream_bit_flips_never_break_structure(data):
    di = DataInput(POS_B)
    read_header(di)
    bit = data.draw(st.integers(di.pos * 8, len(POS_B) * 8 - 1))
    mutated = _flip(POS_B, bit)
    try:
        results = _decode_all(DOC_B, mutated)
    except CLEAN_ERRORS:
        return
    for (d, f, p), st_ in zip(results, STATES):
        assert len(d) == st_.doc_freq
        assert len(p) == st_.doc_freq
        for run, fr in zip(p, f):
            assert len(run) == int(fr)
