"""Codec round-trip + property tests.

Mirrors the reference's test style (SURVEY.md §5):
- /root/reference/test-bit_packing/test_bit_packing.ml:5-48 (FOR widths)
- /root/reference/bit_packing/positive_ints.ml:18-45 (PFOR exceptions)
- /root/reference/bit_packing/delta_packing.ml:8-27 (delta runs)
- /root/reference/test-terms-enumerator/test_lz4_compression.ml:14-31
- /root/reference/test-terms-enumerator/test_lowercase_ascii_compression.ml
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocaml_lucene_spark.codecs import bitpack, delta, lowercase_ascii, lz4, pfor
from ocaml_lucene_spark.codecs.blocks import (
    decode_doc_ids,
    decode_positions,
    decode_tfs,
    encode_posting_blocks,
)
from ocaml_lucene_spark.codecs.varint import read_vint, write_vint, zigzag_decode, zigzag_encode

rng = np.random.default_rng(42)


class TestVarint:
    @pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**21, 2**35, 2**62])
    def test_roundtrip(self, v):
        buf = bytearray()
        write_vint(v, buf)
        got, pos = read_vint(bytes(buf), 0)
        assert got == v and pos == len(buf)

    def test_zigzag(self):
        vals = np.array([0, -1, 1, -2, 2, -(2**40), 2**40], dtype=np.int64)
        assert (zigzag_decode(zigzag_encode(vals)) == vals).all()


class TestFOR:
    # widths 2 and 11 mirror test_bit_packing.ml; 0 and 31/33 are edges
    @pytest.mark.parametrize("width", [0, 1, 2, 7, 8, 11, 16, 31, 32, 33, 48])
    def test_roundtrip_128(self, width):
        vals = rng.integers(0, max(2**width, 1), 128, dtype=np.uint64)
        packed = bitpack.pack(vals, width)
        assert len(packed) == bitpack.packed_size(width, 128)
        assert (bitpack.unpack(packed, width, 128) == vals).all()

    def test_self_describing_block(self):
        vals = rng.integers(0, 2**11, 128, dtype=np.uint64)
        assert (bitpack.decode_block(bitpack.encode_block(vals), 128) == vals).all()

    def test_short_block(self):
        vals = np.array([5, 0, 2**20], dtype=np.uint64)
        packed = bitpack.pack(vals, 21)
        assert (bitpack.unpack(packed, 21, 3) == vals).all()


class TestPFOR:
    def test_no_exceptions(self):
        vals = rng.integers(0, 2**7, 128, dtype=np.uint64)
        assert (pfor.decode(pfor.encode(vals), 128) == vals).all()

    @pytest.mark.parametrize("n_exc", [1, 3, 7])
    def test_exceptions(self, n_exc):
        vals = rng.integers(0, 2**6, 128, dtype=np.uint64)
        idx = rng.choice(128, n_exc, replace=False)
        vals[idx] = rng.integers(2**10, 2**13, n_exc, dtype=np.uint64)
        data = pfor.encode(vals)
        # token high 3 bits = exception count (parity: positive_ints.ml:18-45)
        assert data[0] >> 5 == n_exc
        assert (pfor.decode(data, 128) == vals).all()

    def test_all_equal_vint_case(self):
        vals = np.full(128, 77, dtype=np.uint64)
        data = pfor.encode(vals)
        assert data[0] == 0  # width-0 special case
        assert len(data) <= 3
        assert (pfor.decode(data, 128) == vals).all()

    def test_small_count(self):
        vals = np.array([1, 2**30, 3], dtype=np.uint64)
        assert (pfor.decode(pfor.encode(vals), 3) == vals).all()

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**39 - 1), min_size=1, max_size=128))
    def test_property_roundtrip(self, xs):
        vals = np.array(xs, dtype=np.uint64)
        assert (pfor.decode(pfor.encode(vals), len(xs)) == vals).all()


class TestDelta:
    def test_dense_run(self):
        # all-deltas-equal-1 special case (delta_packing.ml:8-16)
        ids = np.arange(1000, 1128, dtype=np.int64)
        data = delta.delta_encode(ids)
        assert len(data) < 6  # count + first + marker only
        assert (delta.delta_decode(data) == ids).all()

    def test_general(self):
        ids = np.cumsum(rng.integers(1, 5000, 128)).astype(np.int64)
        assert (delta.delta_decode(delta.delta_encode(ids)) == ids).all()

    def test_rejects_non_ascending(self):
        with pytest.raises(ValueError):
            delta.delta_encode(np.array([3, 3], dtype=np.int64))

    def test_huge_first_id(self):
        ids = np.array([10**12, 10**12 + 7], dtype=np.int64)
        assert (delta.delta_decode(delta.delta_encode(ids)) == ids).all()

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=2**33), min_size=1, max_size=200),
    )
    def test_property(self, gaps):
        ids = np.cumsum(np.array(gaps, dtype=np.int64)) - 1
        assert (delta.delta_decode(delta.delta_encode(ids)) == ids).all()

    def test_stream(self):
        vals = rng.integers(0, 2**17, 777, dtype=np.uint64)
        assert (delta.stream_decode(delta.stream_encode(vals)) == vals).all()


class TestLZ4:
    def test_reference_string(self):
        # mirrors test_lz4_compression.ml:14-31
        s = b"catamaran and catamarans end"
        c = lz4.compress(s)
        assert lz4.decompress(c) == s
        assert len(c) < len(s) + 2

    def test_incompressible_short(self):
        # <11 bytes: literal-only block (doc/lz4_compression.md:109-117)
        s = b"abcdefg"
        assert lz4.decompress(lz4.compress(s)) == s

    def test_overlapping_match(self):
        s = b"a" * 1000
        c = lz4.compress(s)
        assert lz4.decompress(c) == s
        assert len(c) < 30

    def test_empty(self):
        assert lz4.decompress(lz4.compress(b"")) == b""

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=2000))
    def test_property(self, s):
        assert lz4.decompress(lz4.compress(s)) == s


class TestLowercaseAscii:
    def test_reference_example(self):
        s = b"This is a simple compressible string. It contains a number of capitalized letters."
        c = lowercase_ascii.compress(s)
        assert lowercase_ascii.decompress(c, len(s)) == s
        assert len(c) < len(s)

    def test_pure_lowercase(self):
        s = b"the quick brown fox jumps over the lazy dog 0123456789"
        c = lowercase_ascii.compress(s)
        assert lowercase_ascii.decompress(c, len(s)) == s
        # no exceptions, ~25% shrink from 4->3 packing
        assert len(c) <= len(s) - len(s) // 4 + 1

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=600))
    def test_property(self, s):
        try:
            c = lowercase_ascii.compress(s)
        except ValueError:
            return  # >255 exceptions: caller falls back to LZ4/raw
        assert lowercase_ascii.decompress(c, len(s)) == s


class TestPostingBlocks:
    def test_roundtrip_with_positions(self):
        n = 300  # spans 3 blocks
        ids = np.cumsum(rng.integers(1, 9, n)).astype(np.int64)
        tfs = rng.integers(1, 6, n).astype(np.int64)
        positions = np.concatenate(
            [np.sort(rng.choice(500, int(t), replace=False)) for t in tfs]
        ).astype(np.int64)
        dls = rng.integers(10, 400, n).astype(np.int64)
        blocks = encode_posting_blocks(ids, tfs, positions, dls)
        assert len(blocks) == 3
        got_ids, got_tfs, got_pos = [], [], []
        off = np.concatenate([[0], np.cumsum(tfs)])
        for b in blocks:
            bids = decode_doc_ids(b.doc_bytes)
            btfs = decode_tfs(b.tf_bytes, b.n)
            got_ids.append(bids)
            got_tfs.append(btfs)
            got_pos.extend(decode_positions(b.pos_bytes, btfs))
            assert b.first_doc == bids[0] and b.last_doc == bids[-1]
            assert b.max_tf == btfs.max()
        assert (np.concatenate(got_ids) == ids).all()
        assert (np.concatenate(got_tfs) == tfs).all()
        assert (np.concatenate(got_pos) == positions).all()

    def test_skip_metadata_enables_block_skip(self):
        ids = np.arange(0, 1280, 2, dtype=np.int64)  # 640 docs, 5 blocks
        tfs = np.ones(640, dtype=np.int64)
        blocks = encode_posting_blocks(ids, tfs)
        # find the block containing doc 700 using only skip metadata
        hit = [b for b in blocks if b.first_doc <= 700 <= b.last_doc]
        assert len(hit) == 1
        assert 700 in decode_doc_ids(hit[0].doc_bytes)


class TestZigzagScalar:
    def test_scalar_round_trip_negatives(self):
        from ocaml_lucene_spark.codecs.varint import zigzag_decode, zigzag_encode

        for n in [0, 1, -1, 2, -2, 63, -64, 123456, -123456, 2**62, -(2**62)]:
            assert zigzag_decode(zigzag_encode(n)) == n
        # the canonical mapping 0,-1,1,-2 -> 0,1,2,3
        assert [zigzag_encode(n) for n in (0, -1, 1, -2)] == [0, 1, 2, 3]

    def test_scalar_matches_ndarray_path(self):
        from ocaml_lucene_spark.codecs.varint import zigzag_encode

        vals = np.array([0, 1, -1, 2, -2, 10**12, -(10**12)], dtype=np.int64)
        vec = zigzag_encode(vals)
        assert [int(v) for v in vec] == [zigzag_encode(int(n)) for n in vals]


class TestLowercaseAsciiBoundaries:
    def test_reference_range_boundaries_compress(self):
        """Exact reference ranges (0x1F,0x3F] ∪ (0x5F,0x7F]: the closed
        upper bounds compress; the open lower bounds are exceptions."""
        from ocaml_lucene_spark.codecs.lowercase_ascii import compress, decompress

        for payload in (
            bytes([0x1F, 0x20, 0x3F, 0x40, 0x5F, 0x60, 0x7F]),
            bytes([0x3F] * 16),
            bytes([0x7F] * 16),
            bytes(range(256)),
        ):
            assert decompress(compress(payload), len(payload)) == payload
        # 0x3F and 0x7F are in-range (no exception entries needed)
        blob = compress(bytes([0x3F, 0x7F, 0x61, 0x30]) * 8)
        n = 32
        pack_start = n - n // 4
        assert blob[pack_start] == 0, "expected zero exceptions"
