"""Baseline sequential JPEG (JFIF) codec, stdlib+numpy only — the
dominant real-crawl image format, previously the marked PIL boundary
in operators/multimodal.py (VERDICT r7 next-round item 4).

Implemented from the public ITU T.81 specification:
- marker stream: SOI, APPn/COM skip, DQT (8-bit precision tables in
  zigzag order), SOF0 (baseline DCT: dims, per-component sampling
  factors + quant table ids), DHT (canonical Huffman from the
  BITS/HUFFVAL arrays), DRI restart intervals, SOS, entropy-coded
  scan with 0xFF00 byte stuffing and RSTn markers, EOI;
- entropy decode: canonical Huffman (any tables the stream declares —
  Annex K or custom), DC category + EXTEND magnitude coding, AC
  run/size with ZRL and EOB;
- block pipeline: dequant in zigzag order, de-zigzag, exact
  orthonormal 2-D IDCT (matrix form, float64), level shift + clamp;
- color: grayscale (1 component) and YCbCr (3 components) with
  integer-ratio chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), JFIF
  YCbCr -> RGB.

NOT implemented (all raise NotImplementedError, never mis-decode):
progressive (SOF2) and every non-baseline SOF, arithmetic coding,
12-bit precision, 16-bit quant tables, fractional sampling ratios.

Hostile-input contract (the image_codecs.py discipline): every
allocation is bounded by header fields VALIDATED first — dims capped,
a total-samples budget bounds both memory and the per-coefficient
Python Huffman loop's CPU (~10 s worst-case at the default; decode
here is inherently sequential bit work, the same cost class as a
libjpeg call but ~100x slower — per-blob decode cost, batch plumbing
around it stays vectorized). Truncated/corrupt streams raise clean
ValueErrors; the multimodal operators drop such rows, never abort
tasks.

The encoder is a grammar-inverse test-fixture writer (like the
interop writers and encode_png): real marker stream, canonical DHT it
derives programmatically, FDCT + quant. With the flat all-ones quant
table the DCT round-trip is near-lossless (max |error| <= 1 per
sample), which is what the round-trip tests pin.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# total decoded samples (sum over components of 64 * blocks) one blob
# may decode: bounds memory AND the Python-loop entropy-decode CPU
# (~0.3 ms per 64-sample block -> ~20 s worst case at this default)
_MAX_JPEG_SAMPLES = 1 << 22

_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _diag = [(_i, _s - _i) for _i in range(8) if 0 <= _s - _i < 8]
    if _s % 2 == 0:
        _diag.reverse()  # even diagonals run bottom-left -> top-right
    _ZIGZAG.extend(_diag)

# orthonormal DCT-II basis: C[k, n] = a_k cos((2n+1) k pi / 16)
_C = np.array(
    [
        [
            (math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8))
            * math.cos((2 * n + 1) * k * math.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ],
    dtype=np.float64,
)


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` raw magnitude bits to a signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------- huffman


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) -> symbol, per T.81 annex C code generation."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing
    0xFF00 byte stuffing; any other marker mid-stream raises (RSTn are
    consumed explicitly at restart boundaries via expect_rst)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xff{nxt:02x} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def expect_rst(self, which: int) -> None:
        """Byte-align and consume the next RSTn marker."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG truncated at restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + which:
            raise ValueError(
                f"expected RST{which}, got "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2


# -------------------------------------------------------------- decode


def _parse_segments(blob: bytes):
    """Yield (marker, payload_start, payload_len) for every non-scan
    segment; stops at SOS (entropy data follows) or EOI."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while True:
        if pos + 2 > len(blob):
            raise ValueError("JPEG truncated between segments")
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(blob):
            raise ValueError("JPEG truncated in segment length")
        (ln,) = struct.unpack(">H", blob[pos : pos + 2])
        if ln < 2 or pos + ln > len(blob):
            raise ValueError("JPEG segment overruns blob")
        yield marker, pos + 2, ln - 2
        pos += ln
        if marker == 0xDA:  # SOS: entropy-coded data follows
            return


def decode_jpeg(
    blob: bytes, max_samples: int | None = None
) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, pixels (h, w, c) uint8) for a
    baseline sequential JFIF stream. ``max_samples`` overrides the
    module decode budget (memory and entropy-decode CPU bound)."""
    budget = _MAX_JPEG_SAMPLES if max_samples is None else max_samples
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    sof = None
    dri = 0
    scan = None
    scan_pos = None

    for marker, off, ln in _parse_segments(blob):
        seg = blob[off : off + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                if p + 65 > len(seg):
                    raise ValueError("DQT truncated")
                qts[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                if p + 17 + n > len(seg):
                    raise ValueError("DHT truncated")
                symbols = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _canonical_codes(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. seq.
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xff{marker:02x}: "
                "progressive/lossless/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i : 3 + 2 * i]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 15})
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            if ss != 0 or se != 63 or ahl != 0:
                raise NotImplementedError("JPEG spectral selection scan")
            scan_pos = off + ln

    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    w, h, comps = sof
    if w == 0 or h == 0 or w > (1 << 16) or h > (1 << 16):
        raise ValueError("JPEG implausible dimensions")
    if len(scan) != len(comps):
        raise NotImplementedError("JPEG multi-scan ordering")
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        if s["id"] not in by_id:
            raise ValueError("SOS names a component missing from SOF")
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"JPEG with {len(comps)} components")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError("fractional JPEG sampling ratios")
        if c["tq"] not in qts:
            raise ValueError(f"missing quant table {c['tq']}")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total = sum(64 * mcux * mcuy * c["h"] * c["v"] for c in comps)
    if total > budget:
        raise ValueError("JPEG decoded size exceeds the decode budget")

    planes = {
        c["id"]: np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    order = [by_id[s["id"]] for s in scan]
    tables = {s["id"]: s for s in scan}
    for s in scan:
        if (0, s["dc"]) not in huff or (1, s["ac"]) not in huff:
            raise ValueError("SOS names a missing Huffman table")

    br = _BitReader(blob, scan_pos)
    preds = {c["id"]: 0 for c in comps}
    rst = 0
    zz_rows = np.array([i for i, _j in _ZIGZAG])
    zz_cols = np.array([j for _i, j in _ZIGZAG])
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            br.expect_rst(rst)
            rst = (rst + 1) & 7
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_t = huff[(0, tables[c["id"]]["dc"])]
            ac_t = huff[(1, tables[c["id"]]["ac"])]
            qt = qts[c["tq"]]
            for bv in range(c["v"]):
                for bh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.float64)
                    size = br.read_huff(dc_t)
                    if size > 11:
                        raise ValueError("JPEG DC category > 11")
                    preds[c["id"]] += _extend(br.read_bits(size), size)
                    zz[0] = preds[c["id"]] * int(qt[0])
                    k = 1
                    while k < 64:
                        rs = br.read_huff(ac_t)
                        r, s_ = rs >> 4, rs & 15
                        if s_ == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(br.read_bits(s_), s_) * int(qt[k])
                        k += 1
                    coef = np.zeros((8, 8), dtype=np.float64)
                    coef[zz_rows, zz_cols] = zz
                    block = _C.T @ coef @ _C + 128.0
                    y0 = (my * c["v"] + bv) * 8
                    x0 = (mx * c["h"] + bh) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
    del order

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # integer-ratio replication upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        px = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, px[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
    return w, h, 3, px


def probe_jpeg_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the SOF segment without entropy decode —
    TOTAL like image_codecs.probe_dims (returns None, never raises)."""
    try:
        for marker, off, ln in _parse_segments(blob):
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if ln < 5:
                    return None
                _prec, h, w = struct.unpack(">BHH", blob[off : off + 5])
                if 0 < w <= 1 << 16 and 0 < h <= 1 << 16:
                    return (w, h)
                return None
    except (ValueError, struct.error, IndexError):
        return None
    return None


# -------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


# encoder Huffman tables, derived programmatically (canonical prefix
# codes; the decoder reads whatever DHT declares, so these need to be
# VALID, not Annex-K-identical): all 12 DC categories at 4 bits
# (Kraft 12/16), all run/size AC symbols + ZRL/EOB at 9 bits
# (176/512)
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0}
)
_AC_COUNTS = [0] * 16
_AC_COUNTS[8] = len(_AC_SYMBOLS)  # all at length 9


def _encode_table(counts: list[int], symbols: list[int]) -> dict:
    """symbol -> (code, length), inverse view of _canonical_codes."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(counts, symbols).items()
    }


_DC_ENC = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _encode_table(_AC_COUNTS, _AC_SYMBOLS)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int
) -> int:
    """FDCT + quant + entropy-encode one 8x8 block; returns the new DC
    predictor."""
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    zz = coef[[i for i, _ in _ZIGZAG], [j for _, j in _ZIGZAG]]
    q = np.round(zz / qt.astype(np.float64)).astype(np.int64)
    diff = int(q[0]) - pred
    size = int(abs(diff)).bit_length()
    code, ln = _DC_ENC[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = _AC_ENC[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = _AC_ENC[0x00]  # EOB
        bw.write(code, ln)
    return int(q[0])


def encode_jpeg(
    px: np.ndarray,
    quant: int = 1,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Test-fixture encoder: (h, w[, c]) uint8 -> baseline JFIF bytes.
    ``quant`` is a flat quantization value (1 = near-lossless, the
    round-trip-test setting); ``subsampling`` = luma (h, v) sampling
    factors relative to chroma ((2, 2) = 4:2:0). Emits real DQT / SOF0
    / DHT / optional DRI / SOS segments."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg wants gray or RGB")
    sh, sv = subsampling
    if c == 1:
        sh = sv = 1
    qt = np.full(64, quant, dtype=np.int32)

    if c == 3:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [(y, sh, sv), (cb, 1, 1), (cr, 1, 1)]
    else:
        planes = [(px[:, :, 0].astype(np.float64), 1, 1)]

    mcux = -(-w // (8 * sh))
    mcuy = -(-h // (8 * sv))
    prepped = []
    for plane, ph, pv in planes:
        if (ph, pv) != (sh, sv):  # chroma: box-mean downsample
            ry, rx = sv // pv, sh // ph
            ph_pad = -(-plane.shape[0] // ry) * ry
            pw_pad = -(-plane.shape[1] // rx) * rx
            padded = np.pad(
                plane,
                ((0, ph_pad - plane.shape[0]), (0, pw_pad - plane.shape[1])),
                mode="edge",
            )
            plane = padded.reshape(
                ph_pad // ry, ry, pw_pad // rx, rx
            ).mean(axis=(1, 3))
        th, tw = mcuy * pv * 8, mcux * ph * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        prepped.append((plane, ph, pv))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + qt.astype(np.uint8).tobytes())
    nc = len(prepped)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_p, ph, pv) in enumerate(prepped):
        sof += bytes([i + 1, (ph << 4) | pv, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS))
    seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + rst]))
            rst = (rst + 1) & 7
            preds = [0] * nc
        my, mx = divmod(m, mcux)
        for i, (plane, ph, pv) in enumerate(prepped):
            for bv in range(pv):
                for bh in range(ph):
                    y0 = (my * pv + bv) * 8
                    x0 = (mx * ph + bh) * 8
                    preds[i] = _encode_block(
                        bw, plane[y0 : y0 + 8, x0 : x0 + 8], qt, preds[i]
                    )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
