"""Baseline JPEG codec: real-byte round trips (the encoder emits a
genuine T.81 marker stream: DQT/SOF0/DHT/DRI/SOS + stuffed entropy
data; the decoder reads whatever tables the stream declares), hostile
inputs, decode budgets, dispatch integration, and the Spark media
passes over real JPEG bytes — the VERDICT r7 item-4 pattern
(tests/test_image_codecs.py) extended to the format that used to
raise."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

import ocaml_lucene_spark.operators.multimodal as mm
from ocaml_lucene_spark.operators.image_codecs import (
    decode_image,
    probe_dims,
    sniff_format,
)
from ocaml_lucene_spark.operators.jpeg_codec import (
    _C,
    decode_jpeg,
    encode_jpeg,
    probe_jpeg_dims,
)

CLEAN = (ValueError, NotImplementedError, IndexError, struct.error)


def _smooth(h: int, w: int, c: int, seed: int) -> np.ndarray:
    """Block-smooth test image: low-frequency content a quant=1
    round trip reproduces to |err| <= 1 per sample."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (-(-h // 8), -(-w // 8), c)).astype(np.float64)
    big = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(np.round(big), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("sub", [(1, 1), (2, 1), (2, 2)])
@pytest.mark.parametrize("dri", [0, 3])
def test_roundtrip_near_lossless(channels, sub, dri):
    img = _smooth(37, 52, channels, seed=channels * 10 + sub[0])
    blob = encode_jpeg(img, quant=1, subsampling=sub, restart_interval=dri)
    w, h, c, px = decode_jpeg(blob)
    assert (w, h, c) == (52, 37, channels)
    err = np.abs(px.astype(int) - img.astype(int)).max()
    # 4:4:4 / gray: pure DCT round trip (<=1); subsampled chroma adds
    # the box-mean + replication error on Cb/Cr, still tightly bounded
    # on smooth content
    assert err <= (1 if sub == (1, 1) else 3), (channels, sub, dri, err)
    assert probe_jpeg_dims(blob) == (52, 37)


def test_flat_color_is_exact():
    img = np.full((24, 17, 3), 137, dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img, quant=1))
    np.testing.assert_array_equal(px, img)


def test_high_frequency_zrl_path():
    """A DCT-sparse block whose only AC coefficient sits at zigzag
    index 63 forces run-lengths > 15 (ZRL symbols) through both the
    encoder and decoder; a run-handling desync would corrupt the
    block, so a tight round trip pins the path."""
    e = np.zeros((8, 8))
    e[7, 7] = 400.0
    block = np.clip(np.round(_C.T @ e @ _C + 128.0), 0, 255).astype(np.uint8)
    img = np.tile(block, (2, 3))  # 16 x 24, six such blocks
    blob = encode_jpeg(img, quant=8)
    w, h, c, px = decode_jpeg(blob)
    assert (w, h, c) == (24, 16, 1)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 8


def test_lossy_quant_still_structured():
    img = _smooth(32, 32, 3, seed=7)
    blob = encode_jpeg(img, quant=16, subsampling=(2, 2))
    w, h, c, px = decode_jpeg(blob)
    assert (w, h, c) == (32, 32, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 64
    assert len(blob) < len(encode_jpeg(img, quant=1, subsampling=(2, 2)))


def test_dispatch_and_probe_integration():
    img = _smooth(9, 14, 3, seed=3)
    blob = encode_jpeg(img, quant=1)
    assert sniff_format(blob) == "jpeg"
    assert probe_dims(blob) == (14, 9)
    w, h, c, px = decode_image(blob)
    assert (w, h, c) == (14, 9, 3)
    # probe is TOTAL on jpeg-magic garbage
    assert probe_dims(b"\xff\xd8\xff\xe0 jpeg-ish garbage") is None
    with pytest.raises(CLEAN):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish garbage")


def test_decode_budget_bounds_samples():
    img = _smooth(40, 40, 3, seed=5)
    blob = encode_jpeg(img, quant=1)
    decode_jpeg(blob)  # default budget: fine
    with pytest.raises(ValueError, match="decode budget"):
        decode_jpeg(blob, max_samples=1000)
    # a forged SOF claiming huge dims must be rejected BEFORE any
    # allocation: patch the SOF dims of a valid stream
    i = blob.index(b"\xff\xc0")
    forged = bytearray(blob)
    forged[i + 5 : i + 9] = struct.pack(">HH", 60000, 60000)
    with pytest.raises(ValueError, match="decode budget"):
        decode_jpeg(bytes(forged))


def test_unsupported_shapes_raise_cleanly():
    img = _smooth(16, 16, 1, seed=2)
    blob = encode_jpeg(img, quant=1)
    # progressive: rewrite SOF0 -> SOF2
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(prog)
    # 16-bit quant table precision nibble
    i = blob.index(b"\xff\xdb")
    forged = bytearray(blob)
    forged[i + 4] = 0x10
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(forged))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")


def test_truncations_raise_cleanly():
    img = _smooth(24, 24, 3, seed=9)
    blob = encode_jpeg(img, quant=1, subsampling=(2, 2), restart_interval=2)
    for cut in (2, 4, 21, len(blob) // 2, len(blob) - 3):
        with pytest.raises(CLEAN):
            decode_jpeg(blob[:cut])


def test_bit_flip_sweep_never_escapes_clean_errors():
    """Every 13th bit of a valid stream flipped: decode either raises
    a clean error or returns a correctly-shaped frame (value damage
    without structural damage is checksum territory — JPEG has none
    inside the scan)."""
    img = _smooth(16, 16, 3, seed=11)
    blob = encode_jpeg(img, quant=1, restart_interval=2)
    for bit in range(0, len(blob) * 8, 13):
        b = bytearray(blob)
        b[bit // 8] ^= 1 << (bit % 8)
        try:
            w, h, c, px = decode_jpeg(bytes(b), max_samples=1 << 16)
        except CLEAN:
            continue
        assert px.shape == (h, w, c)
        assert px.dtype == np.uint8


def test_spark_media_passes_over_real_jpeg(spark):
    """media_metadata + byte_histogram_features accept real JPEG rows:
    dims from the SOF probe, features = histogram of the DECODED
    pixels (lossy format, so expected comes from decode_jpeg)."""
    img = _smooth(16, 12, 3, seed=13)
    blob = encode_jpeg(img, quant=1, subsampling=(2, 2))
    _w, _h, _c, px = decode_jpeg(blob)
    rows = [
        (0, blob),
        (1, b"\xff\xd8\xff\xe0 jpeg-ish garbage"),
        (2, encode_jpeg(img, quant=4).replace(b"\xff\xc0", b"\xff\xc2", 1)),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r.media_id: r for r in mm.media_metadata(df).collect()}
    assert got[0].valid and (got[0].width, got[0].height) == (12, 16)
    assert got[1].valid is False
    # progressive: the header PROBE reads any SOFn dims (valid header,
    # undecodable payload — the corrupt-IDAT-PNG contract); the
    # FEATURE pass is what drops the row
    assert got[2].valid and (got[2].width, got[2].height) == (12, 16)
    feats = {
        r.media_id: np.array(r.features)
        for r in mm.byte_histogram_features(df, n_bins=64).collect()
    }
    assert set(feats) == {0}
    want, _ = np.histogram(px.ravel(), bins=64, range=(0, 256))
    want = want / px.size
    np.testing.assert_allclose(feats[0], want, atol=1e-6)
    assert math.isclose(float(feats[0].sum()), 1.0, rel_tol=1e-5)
