"""Lucene80 norms (.nvd/.nvm) + SmallFloat int4 — round-trips,
encoding properties, and hostile-input behavior.

Evidence model: same as interop/postings_stream.py — the reference
never reads norms (its postings path is stubbed before scoring,
codec/lucene_84_postings_reader.ml:51-53) and ships no norms fixture,
so the wire grammar is pinned by writer<->reader round-trips plus
meta-region mutation properties (reader raises or visibly diverges,
never silently mis-frames)."""

import numpy as np
import pytest

from ocaml_lucene_spark.interop.norms import (
    NUM_FREE_VALUES,
    NormsReader,
    byte4_to_int,
    encode_doc_lengths,
    int_to_byte4,
    write_norms,
)

SEG_ID = bytes(range(16))


# ------------------------------------------------------------ SmallFloat


def test_smallfloat_small_values_exact():
    # 0..NUM_FREE_VALUES-1 encode as themselves (the "free" range)
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_smallfloat_monotone_and_idempotent():
    prev_b = -1
    for i in list(range(0, 300_000, 7)) + [2**20, 2**25, 2**31 - 1]:
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        assert b >= prev_b, "encode must be monotone non-decreasing"
        prev_b = b
        d = byte4_to_int(b)
        # decode is a lower bound and a fixed point of the codec
        assert d <= i
        assert int_to_byte4(d) == b
        assert byte4_to_int(int_to_byte4(d)) == d


def test_smallfloat_decode_is_tight():
    # the decoded value is the SMALLEST i mapping to that byte:
    # decoding one byte lower gives a strictly smaller value
    for b in range(1, int_to_byte4(2**31 - 1) + 1):
        assert byte4_to_int(b) > byte4_to_int(b - 1)


def test_smallfloat_rejects_negative_and_out_of_range():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        byte4_to_int(-1)
    with pytest.raises(ValueError):
        byte4_to_int(256)


def test_encode_doc_lengths_vector_matches_scalar():
    rng = np.random.default_rng(3)
    dl = rng.integers(0, 10_000, size=500)
    enc = encode_doc_lengths(dl)
    assert enc.dtype == np.int64
    assert enc.tolist() == [int_to_byte4(int(x)) for x in dl]


# ------------------------------------------------------------ round-trips


def _write_read(fields, max_doc, seg_id=SEG_ID):
    nvd, nvm = write_norms(fields, seg_id, max_doc)
    return nvd, nvm, NormsReader(nvd, nvm, seg_id)


def test_dense_round_trip_all_widths():
    max_doc = 64
    rng = np.random.default_rng(11)
    cases = {
        0: np.full(max_doc, 42),                       # constant -> width 0
        1: rng.integers(-100, 100, size=max_doc),      # width 1
        2: rng.integers(-30_000, 30_000, size=max_doc),    # width 2
        3: rng.integers(-(2**30), 2**30, size=max_doc),    # width 4
        4: rng.integers(-(2**62), 2**62, size=max_doc),    # width 8
    }
    # force the extremes so the width choice is exercised at both ends
    cases[1][0], cases[1][1] = -128, 127
    cases[2][0], cases[2][1] = -(2**15), 2**15 - 1
    cases[4][0], cases[4][1] = -(2**62), 2**62 - 1
    _nvd, _nvm, r = _write_read(sorted(cases.items()), max_doc)
    for fn, vals in cases.items():
        got = r.norms(fn, max_doc)
        assert np.array_equal(got, np.asarray(vals, dtype=np.int64)), fn


def test_empty_field_and_missing_field():
    _nvd, _nvm, r = _write_read([(0, np.arange(8)), (3, None)], 8)
    assert r.norms(3, 8) is None
    with pytest.raises(KeyError):
        r.norms(7, 8)


def test_bm25_norm_bytes_round_trip():
    # the actual BM25 usage: per-doc field lengths -> SmallFloat bytes
    # -> .nvd/.nvm -> read back -> decoded quantized lengths
    rng = np.random.default_rng(5)
    dl = rng.integers(1, 50_000, size=300)
    norm_bytes = encode_doc_lengths(dl)
    _nvd, _nvm, r = _write_read([(0, norm_bytes)], 300)
    got = r.norms(0, 300)
    assert np.array_equal(got, norm_bytes)
    decoded = np.array([byte4_to_int(int(b)) for b in got])
    assert np.all(decoded <= dl)
    assert np.array_equal(
        np.array([int_to_byte4(int(x)) for x in decoded]), got
    )


def test_writer_rejects_wrong_length():
    with pytest.raises(ValueError, match="one value per doc"):
        write_norms([(0, np.arange(5))], SEG_ID, 6)


# ------------------------------------------------------------ hostile input


def test_wrong_segment_id_raises():
    nvd, nvm = write_norms([(0, np.arange(4))], SEG_ID, 4)
    with pytest.raises(Exception):
        NormsReader(nvd, nvm, bytes(16))


def test_reader_rejects_sparse_entry():
    nvd, nvm = write_norms([(0, np.arange(4))], SEG_ID, 4)
    # rewrite docsWithFieldOffset (first 8 bytes after the 4-byte
    # field number) to a sparse value >= 0
    di_pos = nvm.find((0).to_bytes(4, "big", signed=True) + (-1).to_bytes(8, "big", signed=True))
    assert di_pos != -1
    mutated = bytearray(nvm)
    mutated[di_pos + 4 : di_pos + 12] = (7).to_bytes(8, "big", signed=True)
    r = NormsReader(nvd, bytes(mutated), SEG_ID)
    with pytest.raises(NotImplementedError, match="sparse"):
        r.norms(0, 4)


def test_reader_rejects_doc_count_mismatch_and_overrun():
    nvd, nvm = write_norms([(0, np.arange(100))], SEG_ID, 100)
    r = NormsReader(nvd, nvm, SEG_ID)
    with pytest.raises(ValueError, match="covers 100 docs"):
        r.norms(0, 99)
    # truncate .nvd so the values region overruns
    with pytest.raises((ValueError, EOFError)):
        short = nvd[:40] + nvd[-16:]
        NormsReader(short, nvm, SEG_ID).norms(0, 100)


def test_reader_rejects_truncated_and_trailing_meta():
    nvd, nvm = write_norms([(0, np.arange(4))], SEG_ID, 4)
    with pytest.raises(Exception):
        NormsReader(nvd, nvm[:-17], SEG_ID)  # cuts into the terminator
    with pytest.raises(ValueError, match="trailing"):
        NormsReader(nvd, nvm[:-16] + b"\x00" + nvm[-16:], SEG_ID)


def test_meta_mutation_never_silently_misframes():
    """Bit-flip every byte of the .nvm metadata region (between the
    header and the footer), one at a time: the reader must either
    raise or produce entries that differ from the original — a flip
    that changes bytes but leaves the parse identical would mean the
    grammar has dead bits it does not check."""
    vals = np.arange(1, 65, dtype=np.int64)
    nvd, nvm = write_norms([(0, vals), (1, None)], SEG_ID, 64)
    base = NormsReader(nvd, nvm, SEG_ID)
    base_state = (
        {k: dict(v) for k, v in base.entries.items()},
        base.norms(0, 64).tolist(),
    )
    # header ends where the first field number starts
    meta_start = nvm.find((0).to_bytes(4, "big", signed=True))
    assert meta_start > 0
    flips = 0
    for pos in range(meta_start, len(nvm) - 16):
        for bit in (0, 3, 7):
            mutated = bytearray(nvm)
            mutated[pos] ^= 1 << bit
            flips += 1
            try:
                r = NormsReader(nvd, bytes(mutated), SEG_ID)
                try:
                    arr = r.norms(0, 64)
                except (ValueError, KeyError, NotImplementedError, EOFError):
                    continue  # raised at value access: acceptable
                # a flip can legally turn the dense entry into the
                # empty one (-1 -> -2): visibly different, acceptable
                got_norms = arr.tolist() if arr is not None else None
                state = (
                    {k: dict(v) for k, v in r.entries.items()},
                    got_norms,
                )
                assert state != base_state, (
                    f"flip at {pos} bit {bit} parsed identically"
                )
            except (
                ValueError,
                KeyError,
                NotImplementedError,
                OverflowError,
                EOFError,
            ):
                continue
    assert flips > 100  # the sweep actually covered the region
