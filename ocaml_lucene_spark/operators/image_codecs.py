"""Real image codecs, stdlib-only: PNG (via ``zlib``), BMP (24-bit),
PPM/PGM, and (dispatched to sibling modules) baseline sequential JPEG
(operators/jpeg_codec.py) and GIF87a/89a (operators/gif_codec.py) —
the de-stubbed multimodal decode slot (operators/multimodal.py
``decode_real_image``). No third-party media
libraries exist in this environment; these formats need none:
PNG's DEFLATE stream is Python's ``zlib``, scanline unfiltering and
the uncompressed formats are numpy reshapes, and baseline JPEG is
Huffman + IDCT numpy/stdlib work.

Wire formats implemented from their public specifications (PNG: RFC
2083 / W3C PNG spec — 8-byte signature, length/type/data/CRC chunks,
IHDR geometry, concatenated IDAT zlib stream, per-scanline filters
0-4 incl. the Paeth predictor; BMP: BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes; PPM/PGM: the
netpbm P6/P5 ASCII header + raw samples).

Encoders exist for test fixtures (grammar-inverse, like the interop
writers): ``encode_png`` can force a specific filter type per row so
round-trip tests exercise every unfilter branch.

Everything here runs inside Arrow-batched pandas ops on executors —
decode is inherently per-blob work (same cost class as a PIL call);
the batch-level plumbing around it stays vectorized
(multimodal.byte_histogram_features histograms all decoded pixels in
one bincount).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit depth only; palette type 3 unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
# hard ceiling on any single decode's inflated payload (32 MiB —
# ~2900x2900 RGBA): the per-dimension plausibility cap alone still
# licenses w*h*c in the terabytes. The bound is CPU as much as memory:
# Average/Paeth unfiltering is inherently sequential per byte, and the
# inlined list loop floors at ~3 MB/s, so the worst-case stall a
# hostile-but-valid all-Paeth PNG can force on one executor task is
# ~10 s at this default (measured; was ~hours under the old 1 GiB cap
# with numpy element indexing). Callers that trust their corpus pass
# max_decode_bytes explicitly to decode_png/decode_image.
_MAX_DECODE_BYTES = 1 << 25


# ------------------------------------------------------------------ PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters: rows of (1 filter byte + stride
    bytes). Up (2) is a whole-row vector op; Sub (1) is a per-lane
    cumsum; Average (3) and Paeth (4) carry a true sequential
    dependency byte-to-byte, so they run as plain-Python list loops
    with the Paeth predictor inlined — ~5-10x faster than numpy
    element indexing, which is what bounds the worst-case CPU a
    hostile all-Paeth PNG can burn under _MAX_DECODE_BYTES."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        if ft == 0:
            out[y] = rows[y, 1:]
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            cur = rows[y, 1:].astype(np.int64)
            for k in range(bpp):
                cur[k::bpp] = np.cumsum(cur[k::bpp]) % 256
            out[y] = cur.astype(np.uint8)
        elif ft == 2:  # Up (uint8 addition wraps mod 256)
            out[y] = rows[y, 1:] + out[y - 1] if y else rows[y, 1:]
        elif ft == 3:  # Average
            line = rows[y, 1:].tolist()
            prev = out[y - 1].tolist() if y else [0] * stride
            cur = [0] * stride
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
            out[y] = cur
        elif ft == 4:  # Paeth (predictor inlined in the hot loop)
            line = rows[y, 1:].tolist()
            prev = out[y - 1].tolist() if y else [0] * stride
            cur = [0] * stride
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                p = a + b - c
                pa = p - a
                if pa < 0:
                    pa = -pa
                pb = p - b
                if pb < 0:
                    pb = -pb
                pc = p - c
                if pc < 0:
                    pc = -pc
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[i] = (line[i] + pr) & 255
            out[y] = cur
        else:
            raise ValueError(f"PNG filter type {ft}")
    return out


def decode_png(
    blob: bytes, max_decode_bytes: int | None = None
) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, pixels (h, w, c) uint8). 8-bit
    non-interlaced gray/RGB/gray-alpha/RGBA only; chunk CRCs are
    verified with zlib.crc32. max_decode_bytes overrides the module
    default decode budget (memory AND unfilter-CPU bound) for callers
    that trust their corpus."""
    budget = _MAX_DECODE_BYTES if max_decode_bytes is None else max_decode_bytes
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = channels = None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            if comp or filt:
                raise ValueError("bad IHDR compression/filter method")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    # the inflate bound below comes from IHDR, i.e. from the attacker:
    # it must be validated BEFORE it is trusted. h=0 would make
    # max_length=0, which CPython zlib treats as UNLIMITED; huge dims
    # would make the "bound" itself a multi-GB allocation license.
    if w == 0 or h == 0:
        raise ValueError("PNG zero dimension")
    if w > _MAX_PROBE_DIM or h > _MAX_PROBE_DIM:
        raise ValueError("PNG implausible dimensions")
    stride = w * channels
    expected = h * (1 + stride)
    if expected > budget:
        raise ValueError("PNG decoded size exceeds the decode budget")
    # bounded inflate: a decompression-bomb IDAT (small input, huge
    # inflated payload) is rejected without allocating past the now-
    # validated expected size. Overflow shows up as unprocessed input
    # (unconsumed_tail) or an unfinished stream (not eof) — never probe
    # with flush(), whose output buffer is unbounded.
    d = zlib.decompressobj()
    raw_b = d.decompress(bytes(idat), expected)
    if len(raw_b) != expected or d.unconsumed_tail or not d.eof:
        raise ValueError("PNG scanline payload size mismatch")
    raw = np.frombuffer(raw_b, dtype=np.uint8)
    px = _unfilter(raw, h, stride, channels).reshape(h, w, channels)
    return w, h, channels, px


def encode_png(
    px: np.ndarray, row_filters: list[int] | None = None
) -> bytes:
    """Test-fixture encoder: (h, w, c) uint8 -> PNG bytes, optionally
    forcing a filter type per row (default all 0) so decode tests
    exercise Sub/Up/Average/Paeth."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = row_filters if row_filters is not None else [0] * h
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int64)
    out_rows = bytearray()
    for y in range(h):
        ft = filters[y]
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int64)
        if ft == 0:
            enc = line
        elif ft == 1:
            a = np.concatenate([np.zeros(c, np.int64), line[:-c]])
            enc = (line - a) % 256
        elif ft == 2:
            enc = (line - prev) % 256
        elif ft == 3:
            a = np.concatenate([np.zeros(c, np.int64), line[:-c]])
            enc = (line - (a + prev) // 2) % 256
        elif ft == 4:
            enc = np.empty(stride, np.int64)
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                pc = int(prev[i - c]) if i >= c else 0
                enc[i] = (line[i] - _paeth(a, int(prev[i]), pc)) % 256
        else:
            raise ValueError(f"filter {ft}")
        out_rows.append(ft)
        out_rows += enc.astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out_rows)))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ BMP


def decode_bmp(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """24-bit uncompressed BITMAPINFOHEADER BMP -> (w, h, 3, RGB
    pixels (h, w, 3)); rows are stored bottom-up, BGR, padded to 4
    bytes."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", blob[10:14])
    dib, w, h, planes, bpp, compression = struct.unpack(
        "<IiihhI", blob[14:34]
    )
    if dib < 40 or dib > _BMP_DIB_MAX:
        raise NotImplementedError(f"BMP DIB header size {dib}")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3
    px = np.frombuffer(
        blob[data_off : data_off + row * h], dtype=np.uint8
    ).reshape(h, row)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px[:, :, ::-1])  # BGR -> RGB


def encode_bmp(px: np.ndarray) -> bytes:
    px = np.asarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp wants (h, w, 3) RGB")
    row = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = px[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    pad = bytes(row - w * 3)
    for y in range(h):
        body += bgr[y].tobytes() + pad
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40
    )
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


# ------------------------------------------------------------- PPM/PGM


def decode_ppm(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """netpbm binary P6 (RGB) / P5 (gray), maxval <= 255."""
    channels = 3 if blob[:2] == b"P6" else 1
    w, h, maxval, pos = decode_ppm_header_only(blob)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm")
    px = np.frombuffer(
        blob[pos : pos + w * h * channels], dtype=np.uint8
    )
    if px.size != w * h * channels:
        raise ValueError("netpbm payload size mismatch")
    return w, h, channels, px.reshape(h, w, channels)


def encode_ppm(px: np.ndarray) -> bytes:
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    magic = {1: b"P5", 3: b"P6"}[c]
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


# ------------------------------------------------------------ dispatch


def sniff_format(blob: bytes) -> str | None:
    """Cheap magic-byte probe (header bytes only, no decode)."""
    if blob[:8] == PNG_SIG:
        return "png"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] in (b"P6", b"P5"):
        return "ppm"
    if blob[:3] == b"\xff\xd8\xff":  # SOI + first marker byte
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# DIB header size range a real BMP can carry: 12 (BITMAPCOREHEADER,
# uint16 dims) or 16..124 (OS/2 v2 variants through BITMAPV5HEADER,
# int32 dims) — rejecting other values is what keeps arbitrary
# "BM"-prefixed bytes (text, other formats) from probing to garbage.
# decode_bmp's accepted range (40..124) is a subset, so a blob the
# decoder accepts always probes to the same dims.
_BMP_DIB_MAX = 124
_MAX_PROBE_DIM = 1 << 20  # dims past 2^20 px/side are corrupt headers


def _plausible(w: int, h: int) -> tuple[int, int] | None:
    return (w, h) if 0 < w <= _MAX_PROBE_DIM and 0 < h <= _MAX_PROBE_DIM else None


def probe_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from fixed header offsets without decoding
    pixels — the metadata-pass primitive. TOTAL: returns None (never
    raises) on short, truncated, or implausible headers, so a batch
    probe over arbitrary blobs can't abort a Spark task."""
    fmt = sniff_format(blob)
    if fmt == "png":
        if len(blob) < 24 or blob[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", blob[16:24])
        return _plausible(w, h)
    if fmt == "bmp":
        if len(blob) < 26:
            return None
        dib = struct.unpack("<I", blob[14:18])[0]
        if dib == 12:  # BITMAPCOREHEADER: uint16 dims
            w, h = struct.unpack("<HH", blob[18:22])
        elif 16 <= dib <= _BMP_DIB_MAX:
            w, h = struct.unpack("<ii", blob[18:26])
        else:
            return None
        return _plausible(w, abs(h))
    if fmt == "ppm":
        try:
            w, h, _, _ = decode_ppm_header_only(blob)
        except (ValueError, IndexError):
            return None
        return _plausible(w, h)
    if fmt == "jpeg":
        from .jpeg_codec import probe_jpeg_dims

        dims = probe_jpeg_dims(blob)
        return _plausible(*dims) if dims else None
    if fmt == "gif":
        from .gif_codec import probe_gif_dims

        dims = probe_gif_dims(blob)
        return _plausible(*dims) if dims else None
    return None


def decode_ppm_header_only(blob: bytes) -> tuple[int, int, int, int]:
    """(w, h, maxval, payload_pos) — the ASCII header scan shared by
    probe and decode."""
    if blob[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(blob[start:pos]))
    return vals[0], vals[1], vals[2], pos + 1


def decode_image(
    blob: bytes, max_decode_bytes: int | None = None
) -> tuple[int, int, int, np.ndarray]:
    """Dispatch on magic: (w, h, channels, pixels (h, w, c) uint8).
    Raises NotImplementedError for formats needing codecs this
    container doesn't have (WebP/video — the remaining PIL/pyAV
    integration point; baseline JPEG decodes natively via
    jpeg_codec.py, progressive/arithmetic JPEG raises there).
    max_decode_bytes widens/narrows the PNG decode budget and (scaled
    to samples) the JPEG one (BMP/PPM payloads are bounded by the blob
    itself)."""
    fmt = sniff_format(blob)
    if fmt == "png":
        return decode_png(blob, max_decode_bytes=max_decode_bytes)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "ppm":
        return decode_ppm(blob)
    if fmt == "jpeg":
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(blob, max_samples=max_decode_bytes)
    if fmt == "gif":
        from .gif_codec import decode_gif

        return decode_gif(blob, max_decode_bytes=max_decode_bytes)
    raise NotImplementedError(
        "unsupported media format (PNG/BMP/PPM/baseline-JPEG/GIF "
        "decode natively; WebP/video need PIL/libvips/pyAV — not in "
        "this container)"
    )
