"""GIF87a/GIF89a codec, stdlib+numpy only — the third native decoder
behind operators/image_codecs.py's dispatch (after PNG and baseline
JPEG), covering the last stdlib-feasible web-crawl image format.

Wire format implemented from the public GIF89a specification
(CompuServe, 1990; also W3C's archived copy): 6-byte version header,
logical screen descriptor (LE uint16 dims, packed global-color-table
byte, background index), optional global color table of 3·2^(n+1)
bytes, then a block stream — 0x21 extensions (sub-block chains; the
0xF9 graphic control extension carries the transparency index),
0x2C image descriptors (LE uint16 offset+dims, packed local-color-
table/interlace byte, optional local table, LZW minimum code size,
length-prefixed data sub-blocks), 0x3B trailer. Image data is
variable-width LZW, LSB-first bit packing, codes 3..12 bits wide,
clear/EOI codes, table capped at 4096 entries.

Decode contract (mirrors what PIL reports for frame 0): the FIRST
image descriptor composited onto the logical screen — canvas filled
with the background color (the global table's background index, else
black), frame pixels mapped through the local-else-global color
table, transparent pixels (GCE flag) left as background, interlaced
frames de-interlaced via the 4-pass row order. Later frames are
ignored; ``probe_gif_dims`` reports the logical screen.

Hostile-input hardening (same contract as decode_png): dimensions are
validated BEFORE any allocation they license (zero / implausible dims
raise; canvas bytes bounded by the decode budget), the LZW output is
bounded to exactly the frame's pixel count (over- and under-runs
raise), sub-block walks are bounds-checked, and a frame that falls
outside the logical screen raises. A malformed blob raises ValueError
/ NotImplementedError — multimodal's batch wrappers drop such rows,
never abort tasks.

The encoder exists for test fixtures (grammar-inverse, like the
interop writers): real dictionary-building LZW whose emitted code
widths are driven by a SIMULATED DECODER table (the late-change rule:
width bumps when the decoder's table reaches 2^width), so round-trips
exercise width growth, the KwKwK self-reference case, and the
4096-entry clear/reset path.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_VERSIONS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH


# -------------------------------------------------------------- LZW


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF variable-width LZW: LSB-first codes over ``data`` (the
    concatenated sub-block payload) -> palette indices. Output is
    bounded by ``max_pixels`` (one frame's exact pixel count — more
    raises). Stops at EOI or when the bits run out."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0  # LSB-first bit accumulator
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # bits exhausted before EOI: tolerated
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = base + [b"", b""]  # clear/EOI placeholders
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if not table:
            raise ValueError("GIF LZW code before any clear code")
        if code < len(table) and code != clear and code != eoi:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        if len(out) + len(entry) > max_pixels:
            raise ValueError("GIF LZW output exceeds the frame size")
        out += entry
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Dictionary-building GIF LZW encoder (fixture writer). Emits an
    initial clear code; code widths follow a simulated decoder table
    (late change); emits clear + resets when the table would pass
    4096 entries; ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    dec_len = eoi + 1  # the decoder's table length, simulated

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def bump_after_decoder_add() -> None:
        """The decoder adds one entry per consumed code after the
        first-after-clear; keep its simulated width in lockstep."""
        nonlocal dec_len, width
        if dec_len < _TABLE_CAP:
            dec_len += 1
            if dec_len == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1

    emit(clear)
    book: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    emitted = 0  # data codes since the last clear

    def emit_data(code: int) -> None:
        """Emit a data code and mirror the decoder: it adds a table
        entry on every consumed data code after the first since
        clear, and bumps its width when that table hits 2^width."""
        nonlocal emitted
        emit(code)
        emitted += 1
        if emitted >= 2:
            bump_after_decoder_add()

    for k in indices:
        wk = w + bytes([k])
        if wk in book:
            w = wk
            continue
        emit_data(book[w])
        book[wk] = next_code
        next_code += 1
        w = bytes([k])
        if next_code == _TABLE_CAP:
            # table full: flush the pending symbol, clear, start over
            # (the decoder caps its adds at 4096 too — lockstep holds)
            emit_data(book[w])
            emit(clear)
            width = min_code_size + 1
            dec_len = eoi + 1
            book = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            w = b""
            emitted = 0
    if w:
        emit_data(book[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- decode


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def deinterlace_rows(h: int) -> np.ndarray:
    """row_in_stream -> actual row: the GIF 4-pass interlace order."""
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    inv = np.empty(h, dtype=np.int64)
    inv[order] = np.arange(h)
    return inv


def _color_table(blob: bytes, pos: int, size_bits: int) -> tuple[np.ndarray, int]:
    n = 3 * (1 << (size_bits + 1))
    table = blob[pos : pos + n]
    if len(table) != n:
        raise ValueError("GIF color table truncated")
    return np.frombuffer(table, dtype=np.uint8).reshape(-1, 3), pos + n


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a length-prefixed sub-block chain; returns
    (payload, position after the 0 terminator)."""
    parts = []
    while True:
        if pos >= len(blob):
            raise ValueError("GIF sub-block chain truncated")
        ln = blob[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        chunk = blob[pos : pos + ln]
        if len(chunk) != ln:
            raise ValueError("GIF sub-block truncated")
        parts.append(chunk)
        pos += ln


def probe_gif_dims(blob: bytes) -> tuple[int, int] | None:
    """Logical-screen (width, height) from the fixed header — TOTAL
    (returns None on anything short or non-GIF), the probe_dims
    contract."""
    if blob[:6] not in GIF_VERSIONS or len(blob) < 10:
        return None
    w, h = struct.unpack("<HH", blob[6:10])
    return (w, h)


def decode_gif_frames(
    blob: bytes,
    max_frames: int | None = None,
    max_decode_bytes: int | None = None,
) -> tuple[int, int, list[np.ndarray]]:
    """(width, height, frames): every frame of the GIF as the COMPOSED
    logical-screen canvas at display time ((h, w, 3) uint8 each),
    with full GIF89a disposal semantics between frames — 0/1 leave the
    canvas, 2 restores the frame's rectangle to the background color,
    3 restores the canvas to its pre-frame state. ``max_frames`` stops
    the walk early (the rest of the stream is not validated); without
    it the TOTAL frame output is bounded by the decode budget
    (canvas_bytes * n_frames <= budget, raises past it)."""
    from .image_codecs import _MAX_DECODE_BYTES, _MAX_PROBE_DIM

    budget = _MAX_DECODE_BYTES if max_decode_bytes is None else max_decode_bytes
    if blob[:6] not in GIF_VERSIONS:
        raise ValueError("not a GIF")
    if len(blob) < 13:
        raise ValueError("GIF header truncated")
    sw, sh = struct.unpack("<HH", blob[6:10])
    packed, bg_index, _aspect = blob[10], blob[11], blob[12]
    if sw == 0 or sh == 0:
        raise ValueError("GIF zero dimension")
    if sw > _MAX_PROBE_DIM or sh > _MAX_PROBE_DIM:
        raise ValueError("GIF implausible dimensions")
    canvas_bytes = sw * sh * 3
    if canvas_bytes > budget:
        raise ValueError("GIF decoded size exceeds the decode budget")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(blob, pos, packed & 0x07)

    # the background color is defined against the GLOBAL table (a
    # frame's palette may be a local one)
    if gct is not None and bg_index < gct.shape[0]:
        bg = gct[bg_index]
    else:
        bg = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(blob):
            if frames:
                break  # tolerated like a truncated LZW tail would not be
            raise ValueError("GIF ended without an image descriptor")
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF has no image descriptor")
            break
        if block == 0x21:  # extension
            if pos >= len(blob):
                raise ValueError("GIF extension truncated")
            label = blob[pos]
            pos += 1
            payload, pos = _sub_blocks(blob, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                disposal = (payload[0] >> 2) & 0x07
                transparent = payload[3] if payload[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")

        if pos + 9 > len(blob):
            raise ValueError("GIF image descriptor truncated")
        left, top, fw, fh = struct.unpack("<HHHH", blob[pos : pos + 8])
        ipacked = blob[pos + 8]
        pos += 9
        if fw == 0 or fh == 0:
            raise ValueError("GIF zero frame dimension")
        if left + fw > sw or top + fh > sh:
            raise ValueError("GIF frame exceeds the logical screen")
        lct = None
        if ipacked & 0x80:
            lct, pos = _color_table(blob, pos, ipacked & 0x07)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame has no color table")

        if pos >= len(blob):
            raise ValueError("GIF image data truncated")
        min_code_size = blob[pos]
        pos += 1
        data, pos = _sub_blocks(blob, pos)
        idx = lzw_decode(data, min_code_size, fw * fh)
        if len(idx) != fw * fh:
            raise ValueError(
                f"GIF frame decoded {len(idx)} of {fw * fh} pixels"
            )
        indices = np.frombuffer(bytes(idx), dtype=np.uint8).reshape(fh, fw)
        if int(indices.max()) >= palette.shape[0]:
            raise ValueError("GIF pixel index outside the color table")
        if ipacked & 0x40:  # interlaced
            indices = indices[deinterlace_rows(fh)]

        # total-output budget holds with OR without max_frames: each
        # composed frame is a full canvas snapshot, so a KB-sized
        # hostile GIF (large screen, many tiny descriptors) must not
        # expand to max_frames * canvas copies — the cap bounds frame
        # count and total bytes together (r8 ADVICE).
        if (len(frames) + 1) * canvas_bytes > budget:
            raise ValueError("GIF frame total exceeds the decode budget")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        frame_px = palette[indices]
        if transparent is not None:
            opaque = indices != transparent
            region[opaque] = frame_px[opaque]
        else:
            region[:] = frame_px
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            break
        # disposal applies AFTER display, shaping the next frame's base
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3:
            canvas = before
        transparent = None
        disposal = 0
    return sw, sh, frames


def decode_gif(
    blob: bytes, max_decode_bytes: int | None = None
) -> tuple[int, int, int, np.ndarray]:
    """(width, height, 3, RGB pixels (h, w, 3) uint8): the FIRST frame
    composited onto the logical screen (module docstring); later
    blocks are not walked."""
    sw, sh, frames = decode_gif_frames(
        blob, max_frames=1, max_decode_bytes=max_decode_bytes
    )
    return sw, sh, 3, frames[0]


def probe_gif_n_frames(blob: bytes, max_scan: int = 4096) -> int | None:
    """Frame count by walking the block graph WITHOUT LZW decode
    (color tables and sub-block chains skip by length) — the
    metadata-pass primitive beside probe_gif_dims. TOTAL: returns None
    on malformed/truncated streams, and stops counting at ``max_scan``
    frames (hostile megaframe blobs)."""
    if blob[:6] not in GIF_VERSIONS or len(blob) < 13:
        return None
    try:
        pos = 13
        if blob[10] & 0x80:
            pos += 3 * (1 << ((blob[10] & 0x07) + 1))
        count = 0
        while pos < len(blob):
            block = blob[pos]
            pos += 1
            if block == 0x3B:
                return count
            if block == 0x21:
                pos += 1
                _payload, pos = _sub_blocks(blob, pos)
                continue
            if block != 0x2C:
                return None
            if pos + 9 > len(blob):
                return None
            ipacked = blob[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (1 << ((ipacked & 0x07) + 1))
            if pos >= len(blob):
                return None
            pos += 1  # LZW min code size
            _data, pos = _sub_blocks(blob, pos)
            count += 1
            if count >= max_scan:
                return count
        return count if count else None
    except (ValueError, IndexError):
        return None


# ----------------------------------------------------------- encode


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    *,
    screen: tuple[int, int] | None = None,
    offset: tuple[int, int] = (0, 0),
    interlace: bool = False,
    transparent: int | None = None,
    local_palette: bool = False,
    bg_index: int = 0,
    version: bytes = b"GIF89a",
) -> bytes:
    """Test-fixture encoder: (h, w) uint8 palette indices + (n, 3)
    palette -> one-frame GIF bytes. ``screen`` (w, h) defaults to the
    frame; ``offset`` is (left, top); ``local_palette`` moves the
    table onto the image descriptor (no global table, so the canvas
    background is black); ``transparent`` writes a GCE."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    left, top = offset
    sw, sh = screen if screen is not None else (left + w, top + h)
    size_bits = 0
    while (1 << (size_bits + 1)) < palette.shape[0]:
        size_bits += 1
    table = np.zeros((1 << (size_bits + 1), 3), dtype=np.uint8)
    table[: palette.shape[0]] = palette

    out = bytearray(version)
    out += struct.pack("<HH", sw, sh)
    if local_palette:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | size_bits, bg_index, 0])
        out += table.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    out += bytes([(0x80 | size_bits if local_palette else 0) | (0x40 if interlace else 0)])
    if local_palette:
        out += table.tobytes()
    rows = indices
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        rows = indices[order]
    min_code_size = max(2, size_bits + 1)
    out.append(min_code_size)
    data = lzw_encode(rows.tobytes(), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int],
    bg_index: int = 0,
) -> bytes:
    """Multi-frame test-fixture encoder. Each frame dict: ``indices``
    ((h, w) uint8, required) plus optional ``offset`` (left, top),
    ``disposal`` (0..3) and ``transparent`` index — a GCE is written
    per frame, exactly what decode_gif_frames' disposal walk reads."""
    palette = np.asarray(palette, dtype=np.uint8)
    sw, sh = screen
    size_bits = 0
    while (1 << (size_bits + 1)) < palette.shape[0]:
        size_bits += 1
    table = np.zeros((1 << (size_bits + 1), 3), dtype=np.uint8)
    table[: palette.shape[0]] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | size_bits, bg_index, 0])
    out += table.tobytes()
    min_code_size = max(2, size_bits + 1)
    for f in frames:
        indices = np.asarray(f["indices"], dtype=np.uint8)
        h, w = indices.shape
        left, top = f.get("offset", (0, 0))
        transparent = f.get("transparent")
        disposal = f.get("disposal", 0)
        gce_flags = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_flags, 0, 0, transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
        out += b"\x00"  # no local table, not interlaced
        out.append(min_code_size)
        data = lzw_encode(indices.tobytes(), min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
