"""GIF87a/89a codec (operators/gif_codec.py): decoder anchored to a
HAND-DERIVED spec fixture (LZW codes + LSB-first packing computed by
hand from the GIF89a spec, not by this repo's encoder), LZW round
trips across width growth / KwKwK / the 4096-entry reset, frame
compositing (offset, transparency, interlace, local palettes), the
hostile-input contract (malformed blobs raise, probe is total), and
the image_codecs/multimodal dispatch integration."""

from __future__ import annotations

import numpy as np
import pytest

from ocaml_lucene_spark.operators import multimodal as mm
from ocaml_lucene_spark.operators.gif_codec import (
    decode_gif,
    decode_gif_frames,
    deinterlace_rows,
    encode_gif,
    encode_gif_animation,
    lzw_decode,
    lzw_encode,
    probe_gif_dims,
    probe_gif_n_frames,
)
from ocaml_lucene_spark.operators.image_codecs import (
    decode_image,
    probe_dims,
    sniff_format,
)

# 3x1 two-color image, pixels [1, 0, 1], GCT {0: (10,20,30),
# 1: (200,210,220)}. LZW by hand (min code size 2): clear=4, eoi=5;
# code stream 4,1,0,1 at width 3, then 5 at width 4 (the decoder's
# table hits 2^3 after the third data code); LSB-first packing gives
# exactly 0x0C 0x52.
HAND_GIF = (
    b"GIF89a"
    + bytes([3, 0, 1, 0])  # logical screen 3x1
    + bytes([0x80, 0, 0])  # GCT present, 2 entries, bg index 0
    + bytes([10, 20, 30, 200, 210, 220])
    + b"\x2c"
    + bytes([0, 0, 0, 0, 3, 0, 1, 0, 0])  # frame 3x1 at (0,0)
    + bytes([2])  # LZW min code size
    + bytes([2, 0x0C, 0x52, 0])  # one sub-block + terminator
    + b"\x3b"
)


def test_hand_derived_fixture_decodes():
    w, h, c, px = decode_gif(HAND_GIF)
    assert (w, h, c) == (3, 1, 3)
    assert px.tolist() == [[[200, 210, 220], [10, 20, 30], [200, 210, 220]]]


def test_lzw_roundtrip_shapes():
    rng = np.random.default_rng(11)
    cases = [
        (b"\x01" * 50, 2),  # KwKwK self-reference chain
        (b"\x00\x01\x00\x01\x00\x01", 2),
        (rng.integers(0, 4, size=40).astype(np.uint8).tobytes(), 2),
        (rng.integers(0, 16, size=300).astype(np.uint8).tobytes(), 4),
        # enough entropy to walk widths 9..12
        (rng.integers(0, 256, size=30_000).astype(np.uint8).tobytes(), 8),
        # past 4096 table entries: exercises the clear/reset path
        (rng.integers(0, 256, size=60_000).astype(np.uint8).tobytes(), 8),
    ]
    for data, mcs in cases:
        enc = lzw_encode(data, mcs)
        assert bytes(lzw_decode(enc, mcs, len(data))) == data, (len(data), mcs)


def test_lzw_decode_rejects_garbage():
    with pytest.raises(ValueError, match="out of range"):
        # width-3 code 7 with an empty table (only clear consumed)
        lzw_decode(bytes([0b00111_100]), 2, 100)
    good = lzw_encode(b"\x00\x01\x02\x03" * 8, 2)
    with pytest.raises(ValueError, match="exceeds the frame"):
        lzw_decode(good, 2, 5)  # frame claims fewer pixels than data
    with pytest.raises(ValueError, match="min code size"):
        lzw_decode(b"", 1, 10)


def test_deinterlace_is_the_four_pass_permutation():
    inv = deinterlace_rows(13)
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, 13, step)]
    assert sorted(order) == list(range(13))
    for stream_row, actual_row in enumerate(order):
        assert inv[actual_row] == stream_row


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local_palette", [False, True])
def test_encode_decode_roundtrip(interlace, local_palette):
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(17, 23)).astype(np.uint8)
    blob = encode_gif(idx, pal, interlace=interlace, local_palette=local_palette)
    assert sniff_format(blob) == "gif"
    assert probe_dims(blob) == (23, 17)
    w, h, c, px = decode_image(blob)
    assert (w, h, c) == (23, 17, 3)
    np.testing.assert_array_equal(px, pal[idx])


def test_offset_and_transparency_composite_onto_background():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(6, 9)).astype(np.uint8)
    blob = encode_gif(
        idx, pal, screen=(20, 12), offset=(4, 5), transparent=3, bg_index=2
    )
    w, h, c, px = decode_gif(blob)
    assert (w, h) == (20, 12)
    want = np.broadcast_to(pal[2], (12, 20, 3)).copy()
    region = want[5:11, 4:13]
    opaque = idx != 3
    region[opaque] = pal[idx][opaque]
    np.testing.assert_array_equal(px, want)


def test_hostile_inputs_raise_and_probe_is_total():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, size=(5, 5)).astype(np.uint8)
    good = encode_gif(idx, pal)
    hostile = [
        HAND_GIF[:20],  # truncated mid-table
        good[:30],      # truncated sub-block chain
        HAND_GIF.replace(bytes([3, 0, 1, 0]), bytes([0, 0, 1, 0]), 1),  # w=0
        b"GIF89a" + bytes([5, 0, 5, 0]) + bytes([0, 0, 0]) + b"\x3b",  # no frame
        # frame sticking out of the logical screen
        encode_gif(idx, pal, screen=(5, 5), offset=(3, 3)),
        # no color table anywhere
        b"GIF89a" + bytes([5, 0, 5, 0, 0, 0, 0]) + b"\x2c"
        + bytes([0, 0, 0, 0, 5, 0, 5, 0, 0, 2, 1, 0x0C, 0]) + b"\x3b",
    ]
    for blob in hostile:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_gif(blob)
    # pixel count must match the frame exactly (truncated LZW payload)
    short = bytearray(good)
    # the last data sub-block sits right before b"\x00\x3b": halve it
    with pytest.raises(ValueError):
        decode_gif(bytes(short[: len(short) // 2]) + b"\x00\x3b")
    assert probe_gif_dims(b"GIF89a\x03") is None
    assert probe_gif_dims(b"not a gif") is None
    assert probe_dims(b"GIF89a") is None
    # decode budget: absurd screen dims rejected before any allocation
    huge = (
        b"GIF89a"
        + np.array([50_000, 50_000], dtype="<u2").tobytes()
        + bytes([0, 0, 0])
        + b"\x3b"
    )
    with pytest.raises(ValueError, match="budget|implausible"):
        decode_gif(huge)
    # probe reports the claimed dims; the plausibility cut is
    # image_codecs' _plausible (shared with every other format)
    assert probe_dims(huge) == (50_000, 50_000)


def _animation():
    """Five frames exercising every disposal mode, plus the numpy
    reference canvases computed with an independent walk."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [9, 9, 9], [7, 7, 7], [1, 2, 3]],
        dtype=np.uint8,
    )
    rng = np.random.default_rng(4)
    f0 = rng.integers(0, 8, size=(10, 12)).astype(np.uint8)
    f1 = rng.integers(0, 8, size=(4, 5)).astype(np.uint8)
    f2 = rng.integers(0, 8, size=(3, 3)).astype(np.uint8)
    f3 = rng.integers(0, 8, size=(6, 6)).astype(np.uint8)
    f4 = rng.integers(0, 8, size=(2, 2)).astype(np.uint8)
    blob = encode_gif_animation(
        [
            {"indices": f0, "disposal": 1},
            {"indices": f1, "offset": (2, 3), "disposal": 1},
            {"indices": f2, "offset": (7, 1), "disposal": 2},
            {"indices": f3, "offset": (4, 2), "transparent": 5, "disposal": 3},
            {"indices": f4},
        ],
        pal,
        screen=(12, 10),
    )
    bg = pal[0]
    canvas = np.broadcast_to(bg, (10, 12, 3)).copy()
    want = []
    canvas[0:10, 0:12] = pal[f0]
    want.append(canvas.copy())
    canvas[3:7, 2:7] = pal[f1]
    want.append(canvas.copy())
    canvas[1:4, 7:10] = pal[f2]
    want.append(canvas.copy())
    canvas[1:4, 7:10] = bg  # disposal 2: region back to background
    before = canvas.copy()
    region = canvas[2:8, 4:10]
    opaque = f3 != 5
    region[opaque] = pal[f3][opaque]
    want.append(canvas.copy())
    canvas = before  # disposal 3: canvas back to pre-frame state
    canvas[0:2, 0:2] = pal[f4]
    want.append(canvas.copy())
    return blob, want


def test_animation_frames_follow_disposal_semantics():
    blob, want = _animation()
    assert probe_gif_n_frames(blob) == 5
    sw, sh, frames = decode_gif_frames(blob)
    assert (sw, sh, len(frames)) == (12, 10, 5)
    for k, (got, exp) in enumerate(zip(frames, want)):
        np.testing.assert_array_equal(got, exp, err_msg=f"frame {k}")
    # decode_gif is exactly frame 0; max_frames stops the walk early
    _w, _h, _c, px = decode_gif(blob)
    np.testing.assert_array_equal(px, want[0])
    _sw, _sh, two = decode_gif_frames(blob, max_frames=2)
    assert len(two) == 2
    np.testing.assert_array_equal(two[1], want[1])


def test_animation_budget_and_probe_totality():
    blob, _want = _animation()
    # without max_frames the TOTAL frame output is budget-bounded
    with pytest.raises(ValueError, match="decode budget"):
        decode_gif_frames(blob, max_decode_bytes=10 * 12 * 3 * 3)
    # the frame-count probe never raises
    assert probe_gif_n_frames(b"GIF89a\x00\x00\x00") is None
    assert probe_gif_n_frames(blob[: len(blob) // 2]) is None
    rng = np.random.default_rng(1)
    single = encode_gif(
        rng.integers(0, 4, size=(3, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(4, 3)).astype(np.uint8),
    )
    assert probe_gif_n_frames(single) == 1


def test_multimodal_video_surfaces_over_animated_gif(spark):
    """media_metadata reports animated GIFs as multi-frame video
    (block-walk frame count, no pixel decode); sample_frames decodes,
    composes, and re-encodes every k-th frame as PNG — byte-decodable
    downstream and pixel-identical to the disposal reference."""
    from ocaml_lucene_spark.operators.image_codecs import decode_image

    blob, want = _animation()
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"GIF89a" + b"\x02" * 9))],
        "media_id long, blob binary",
    )
    meta = {r.media_id: r for r in mm.media_metadata(df).collect()}
    assert meta[0].kind == "video" and meta[0].n_frames == 5
    assert (meta[0].width, meta[0].height) == (12, 10)
    assert not meta[1].valid

    frames = {
        (r.media_id, r.frame_no): bytes(r.frame)
        for r in mm.sample_frames(df, every_k=2).collect()
    }
    assert set(frames) == {(0, 0), (0, 2), (0, 4)}
    for fno in (0, 2, 4):
        w, h, c, px = decode_image(frames[(0, fno)])
        assert (w, h, c) == (12, 10, 3)
        np.testing.assert_array_equal(px, want[fno], err_msg=f"frame {fno}")


def test_multimodal_metadata_and_features_over_gif(spark):
    """The batch media surfaces treat GIF as a first-class decodable
    format now: metadata probes dims, the feature pass decodes pixels
    (and hostile GIFs still just drop)."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(11, 7)).astype(np.uint8)
    good = encode_gif(idx, pal)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"GIF89a" + b"\x01" * 8))],
        "media_id long, blob binary",
    )
    meta = {r.media_id: r for r in mm.media_metadata(df).collect()}
    assert meta[0].valid and (meta[0].width, meta[0].height) == (7, 11)
    feats = {
        r.media_id: np.array(r.features)
        for r in mm.byte_histogram_features(df).collect()
    }
    want = np.zeros(64)
    np.add.at(want, (pal[idx].reshape(-1).astype(np.int64) * 64) >> 8, 1.0)
    want /= want.sum()
    np.testing.assert_allclose(feats[0], want, atol=1e-6)
    assert 1 not in feats  # the hostile row dropped, task survived


def test_animation_budget_binds_even_with_max_frames():
    """r9 (r8 ADVICE): the total-output budget must bound frame count
    and bytes together even when max_frames caps the walk — a KB-sized
    GIF with a large logical screen and many tiny descriptors must not
    expand to max_frames full-canvas snapshots."""
    blob, _ = _animation()
    with pytest.raises(ValueError, match="decode budget"):
        # budget covers fewer canvases than the animation has frames
        decode_gif_frames(blob, max_frames=64, max_decode_bytes=10 * 12 * 3 * 2)
    # within budget, max_frames still caps the walk normally
    _w, _h, frames = decode_gif_frames(blob, max_frames=1)
    assert len(frames) == 1
