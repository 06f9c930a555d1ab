"""Stdlib-only real image codecs (PNG/BMP/PPM) — the de-stubbed half
of the multimodal decode slot: byte-level round-trips per format
(PNG exercising every scanline filter incl. Paeth), corruption
rejection, and the Spark-side media_metadata / feature passes over
REAL PNG/BMP/PPM bytes mixed with synthetic blobs.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest

from ocaml_lucene_spark.operators import multimodal as mm
from ocaml_lucene_spark.operators.image_codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    probe_dims,
    sniff_format,
)


def _px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


# ------------------------------------------------------------- PNG


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_every_filter_type(channels):
    """10 rows cycling filters 0..4 twice: None, Sub, Up, Average,
    Paeth all exercised for every color type."""
    px = _px(10, 7, channels, seed=channels)
    blob = encode_png(px, row_filters=[y % 5 for y in range(10)])
    w, h, c, got = decode_png(blob)
    assert (w, h, c) == (7, 10, channels)
    np.testing.assert_array_equal(got, px)


def test_png_gradient_paeth_only():
    # smooth gradients are the adversarial input for predictor filters
    y = np.arange(16, dtype=np.uint8)[:, None, None]
    x = np.arange(16, dtype=np.uint8)[None, :, None]
    px = (y * 16 + x + np.arange(3, dtype=np.uint8)[None, None, :]).astype(
        np.uint8
    )
    blob = encode_png(px, row_filters=[4] * 16)
    _, _, _, got = decode_png(blob)
    np.testing.assert_array_equal(got, px)


def test_png_decode_budget_default_and_override():
    """The default decode budget is 32 MiB (CPU bound for the
    sequential Average/Paeth unfilter loops, not just memory): a PNG
    whose scanline payload exceeds it is rejected before inflate, and
    max_decode_bytes= lets a trusting caller widen (or narrow) it."""
    px = _px(8, 8, 4, seed=3)
    blob = encode_png(px, row_filters=[4] * 8)
    # narrow the budget below this image's payload -> rejected
    with pytest.raises(ValueError, match="budget"):
        decode_png(blob, max_decode_bytes=64)
    # explicit widening still decodes
    _, _, _, got = decode_png(blob, max_decode_bytes=1 << 30)
    np.testing.assert_array_equal(got, px)
    # a header claiming > 32 MiB is rejected under the default even
    # though its dims pass the per-dimension plausibility cap
    big = bytearray(encode_png(_px(4, 4, 4)))
    ihdr_at = big.index(b"IHDR")
    big[ihdr_at + 4 : ihdr_at + 12] = struct.pack(">II", 4096, 4096)
    data = bytes(big[ihdr_at : ihdr_at + 4 + 13])
    big[ihdr_at + 17 : ihdr_at + 21] = struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="budget"):
        decode_png(bytes(big))
    # widened, the lying header gets past the budget and fails at the
    # payload-size check instead — proving the budget was the gate
    with pytest.raises(ValueError, match="payload size"):
        decode_png(bytes(big), max_decode_bytes=1 << 30)


def test_png_all_paeth_at_size_roundtrip():
    """256x256 RGBA, every row Paeth-filtered — the worst-case input
    for the inlined list-loop fast path; must stay byte-exact."""
    px = _px(256, 256, 4, seed=7)
    blob = encode_png(px, row_filters=[4] * 256)
    _, _, _, got = decode_png(blob)
    np.testing.assert_array_equal(got, px)
    blob3 = encode_png(px, row_filters=[3] * 256)
    _, _, _, got3 = decode_png(blob3)
    np.testing.assert_array_equal(got3, px)


def test_png_crc_corruption_rejected():
    blob = bytearray(encode_png(_px(4, 4, 3)))
    # flip a byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = blob.index(b"IDAT")
    blob[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_png_unsupported_shapes_raise():
    blob = bytearray(encode_png(_px(4, 4, 3)))
    ihdr_at = blob.index(b"IHDR")
    # bit depth byte is IHDR data offset 8
    depth_at = ihdr_at + 4 + 8
    blob[depth_at] = 16
    # re-stamp the CRC so the depth check is what fires
    data = bytes(blob[ihdr_at : ihdr_at + 4 + 13])
    blob[ihdr_at + 17 : ihdr_at + 21] = struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(blob))


# ------------------------------------------------------------- BMP


@pytest.mark.parametrize("w", [4, 5, 6, 7])  # row padding 0..3 bytes
def test_bmp_roundtrip_row_padding(w):
    px = _px(6, w, 3, seed=w)
    got_w, got_h, c, got = decode_bmp(encode_bmp(px))
    assert (got_w, got_h, c) == (w, 6, 3)
    np.testing.assert_array_equal(got, px)


def test_bmp_rejects_unsupported():
    blob = bytearray(encode_bmp(_px(3, 3, 3)))
    blob[28] = 8  # bpp
    with pytest.raises(NotImplementedError, match="bpp"):
        decode_bmp(bytes(blob))


# --------------------------------------------------------- PPM/PGM


@pytest.mark.parametrize("channels", [1, 3])
def test_ppm_roundtrip(channels):
    px = _px(5, 9, channels, seed=channels)
    w, h, c, got = decode_ppm(encode_ppm(px))
    assert (w, h, c) == (9, 5, channels)
    np.testing.assert_array_equal(got, px)


def test_ppm_header_comments():
    px = _px(2, 3, 3)
    blob = b"P6\n# a comment\n3 2\n# another\n255\n" + px.tobytes()
    w, h, c, got = decode_ppm(blob)
    assert (w, h, c) == (3, 2, 3)
    np.testing.assert_array_equal(got, px)


# ------------------------------------------------- dispatch / probe


def test_decode_image_dispatch_and_probe():
    px = _px(6, 8, 3)
    for blob, fmt in (
        (encode_png(px), "png"),
        (encode_bmp(px), "bmp"),
        (encode_ppm(px), "ppm"),
    ):
        assert sniff_format(blob) == fmt
        assert probe_dims(blob) == (8, 6)
        w, h, c, got = decode_image(blob)
        assert (w, h, c) == (8, 6, 3)
        np.testing.assert_array_equal(got, px)
    # JPEG decodes natively now (tests/test_jpeg_codec.py); the
    # remaining integration point (WebP/video) still raises
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    with pytest.raises(ValueError):  # jpeg magic, garbage body
        mm.decode_real_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_real_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    assert probe_dims(b"garbage") is None


def _corrupt_idat_png(px) -> bytes:
    """A PNG whose chunk CRCs all verify but whose IDAT payload is not
    a DEFLATE stream — decode_png gets past the CRC check and zlib
    raises."""
    blob = bytes(encode_png(px))
    pos = len(b"\x89PNG\r\n\x1a\n")
    out = bytearray(blob[:pos])
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        if ctype == b"IDAT":
            data = b"\xff" * ln  # not zlib; CRC recomputed below
        out += struct.pack(">I", len(data)) + ctype + data
        out += struct.pack(">I", zlib.crc32(ctype + data))
        pos += 12 + ln
    return bytes(out)


def test_probe_dims_is_total_on_hostile_blobs():
    """probe_dims never raises and never reports garbage dims: short
    'BM' blobs used to struct.error out of a Spark task, and longer
    BM-prefixed TEXT probed to ~1.7e9-wide 'images' before the DIB
    header-size check existed."""
    hostile = [
        b"",
        b"B",
        b"BM",
        b"BM123456789",  # short: old code raised struct.error
        b"BMW is a car maker, not an image format, but it starts BM",
        b"P6 garbage that is not a header",
        b"\x89PNG\r\n\x1a\n",  # bare signature, no IHDR
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + b"IHDR" + b"\x00" * 4,  # short IHDR
        b"P6\n999999999 2\n255\n" + b"\x00" * 16,  # implausible width
    ]
    for blob in hostile:
        assert probe_dims(blob) is None, blob[:20]
    # plausibility bound: a CRC-clean header claiming absurd dims is
    # a corrupt header, not a 2-gigapixel-wide image
    huge = bytearray(encode_png(_px(2, 2, 3)))
    huge[16:20] = struct.pack(">I", 1 << 30)  # width field
    assert probe_dims(bytes(huge)) is None


def test_probe_dims_bmp_core_header():
    # BITMAPCOREHEADER (DIB size 12, uint16 dims) probes correctly
    blob = (
        b"BM" + struct.pack("<IHHI", 26 + 6, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 3, 2, 1, 24) + b"\x00" * 6
    )
    assert probe_dims(blob) == (3, 2)


def test_decode_errors_cover_stdlib_codec_failures():
    """Every exception a magic-matching but malformed blob raises out
    of decode_image is in multimodal._DECODE_ERRORS — the contract that
    keeps byte_histogram_features dropping rows instead of aborting
    Spark tasks."""
    bad = [
        _corrupt_idat_png(_px(4, 4, 3)),  # valid CRCs, corrupt DEFLATE
        bytes(encode_png(_px(4, 4, 3)))[:20],  # truncated mid-IHDR
        b"BM" + b"\x00" * 10,  # truncated BMP header
        b"P6\n4 4\n255\n" + b"\x00" * 5,  # PPM payload too short
    ]
    for blob in bad:
        with pytest.raises(mm._DECODE_ERRORS):
            decode_image(blob)


# ------------------------------------------ Spark passes, real bytes


@pytest.fixture(scope="module")
def mixed_media_df(spark):
    png_px = _px(16, 12, 3, seed=1)
    bmp_px = _px(8, 5, 3, seed=2)
    ppm_px = _px(4, 6, 1, seed=3)
    rows = [
        (0, mm.encode_fake_image(0, 32, 16, 1)),
        (1, bytes(encode_png(png_px, row_filters=[y % 5 for y in range(16)]))),
        (2, bytes(encode_bmp(bmp_px))),
        (3, bytes(encode_ppm(ppm_px))),
        (4, b"\xff\xd8\xff\xe0 jpeg-ish garbage"),
        # hostile rows: BM-prefixed text (old probe crashed or reported
        # garbage dims) and a CRC-valid PNG with corrupt DEFLATE (old
        # feature pass let zlib.error abort the task)
        (5, b"BMW is a car maker, not an image format"),
        (6, _corrupt_idat_png(_px(4, 4, 3))),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    return df, {1: png_px, 2: bmp_px, 3: ppm_px}


def test_media_metadata_real_formats(spark, mixed_media_df):
    df, _ = mixed_media_df
    got = {r.media_id: r for r in mm.media_metadata(df).collect()}
    assert got[0].valid and (got[0].width, got[0].height) == (32, 16)
    assert got[1].valid and got[1].kind == "image"
    assert (got[1].width, got[1].height) == (12, 16)
    assert got[2].valid and (got[2].width, got[2].height) == (5, 8)
    assert got[3].valid and (got[3].width, got[3].height) == (6, 4)
    assert got[4].valid is False and got[4].kind == "unknown"
    # BM-prefixed text must not probe to garbage dims (or crash)
    assert got[5].valid is False and got[5].width == 0
    # corrupt IDAT: the header probe still reads IHDR dims (valid
    # header, undecodable payload — the feature pass is what drops it)
    assert (got[6].width, got[6].height) == (4, 4)


def test_features_over_real_png(spark, mixed_media_df):
    df, pixels = mixed_media_df
    feats = {
        r.media_id: np.array(r.features)
        for r in mm.byte_histogram_features(df, n_bins=64).collect()
    }
    assert 4 not in feats  # undecodable stays out
    assert 5 not in feats  # BM-prefixed text: not an image
    assert 6 not in feats  # zlib.error from corrupt IDAT: row drops, task lives
    for mid in (1, 2, 3):
        px = pixels[mid].ravel()
        want, _ = np.histogram(px, bins=64, range=(0, 256))
        want = want / max(px.size, 1)
        np.testing.assert_allclose(feats[mid], want, atol=1e-6)
        assert math.isclose(float(feats[mid].sum()), 1.0, rel_tol=1e-5)


def test_null_blobs_never_abort(spark):
    """NULL cells in the binary column are undecodable rows, not task
    aborts: metadata marks them invalid, features drop them."""
    rows = [
        (0, mm.encode_fake_image(0, 8, 4, 1)),
        (1, None),
        (2, bytes(encode_ppm(_px(2, 2, 3)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r.media_id: r for r in mm.media_metadata(df).collect()}
    assert got[0].valid and got[2].valid
    assert got[1].valid is False and got[1].n_bytes == 0
    feats = {r.media_id for r in mm.byte_histogram_features(df).collect()}
    assert feats == {0, 2}
    # frame sampling over a batch containing the NULL row
    frames = mm.sample_frames(df).collect()
    assert {r.media_id for r in frames} == {0}


def test_bmp_probe_and_decode_agree_on_dib_range():
    """probe_dims accepts every DIB size decode_bmp accepts (44, 52,
    108...), so the metadata and feature passes never contradict each
    other on the same blob; both reject sizes past BITMAPV5HEADER."""
    base = bytearray(encode_bmp(_px(2, 3, 3)))
    for dib in (44, 52, 108, 124):
        blob = bytearray(base)
        blob[14:18] = struct.pack("<I", dib)
        assert probe_dims(bytes(blob)) == (3, 2), dib
        # decode still works: pixel offset comes from the file header
        w, h, c, _ = decode_bmp(bytes(blob))
        assert (w, h, c) == (3, 2, 3)
    blob = bytearray(base)
    blob[14:18] = struct.pack("<I", 200)  # past V5: not a real BMP
    assert probe_dims(bytes(blob)) is None
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(blob))


def test_png_decompression_bomb_rejected():
    """A small PNG whose IDAT inflates far past the IHDR-declared size
    is rejected as a ValueError (row drops) without allocating the
    inflated payload — not a MemoryError task abort."""
    bomb_payload = zlib.compress(b"\x00" * 1_000_000)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 2x2 RGB

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bomb_payload) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(blob)
    # and the short side: IDAT inflating to LESS than declared
    small = zlib.compress(b"\x00" * 3)
    blob2 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", small) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(blob2)


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def test_png_bomb_h0_and_huge_dims_never_inflate():
    """The inflate bound comes from IHDR, i.e. the attacker: h=0 would
    make max_length=0 (UNLIMITED in CPython zlib) and huge declared
    dims would make the 'bound' a multi-GB allocation license. Both
    must be rejected BEFORE any inflation, and the peak allocation
    must stay tiny."""
    import tracemalloc

    bomb = zlib.compress(b"\x00" * (8 << 20))  # 8MB payload, ~8KB blob
    cases = [
        (struct.pack(">IIBBBBB", 2, 0, 8, 2, 0, 0, 0), "zero"),       # h=0
        (struct.pack(">IIBBBBB", 0, 2, 8, 2, 0, 0, 0), "zero"),       # w=0
        (struct.pack(">IIBBBBB", 65500, 65500, 8, 2, 0, 0, 0),
         "implausible|budget"),                                        # huge
        (struct.pack(">IIBBBBB", 1 << 21, 4, 8, 2, 0, 0, 0),
         "implausible"),                                               # > cap
    ]
    for ihdr, match in cases:
        blob = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
        tracemalloc.start()
        with pytest.raises((ValueError, NotImplementedError)):
            decode_png(blob)
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert peak < 4 << 20, (match, peak)  # bomb never inflated


def test_png_overflow_at_exact_bound_rejected():
    """An IDAT whose stream continues past the declared size but whose
    bounded inflate fills the budget exactly: detected via the stream
    state (unconsumed input / not eof), never by an unbounded flush."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # expected 14
    over = zlib.compress(b"\x00" * 14 + b"\x01" * (1 << 20))
    blob = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", over) + _chunk(b"IEND", b""))
    import tracemalloc

    tracemalloc.start()
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(blob)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 1 << 20, peak
