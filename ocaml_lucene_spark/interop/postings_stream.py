"""Lucene84 ``.doc`` postings-stream framing: the read path the
reference STUBS (/root/reference/codec/lucene_84_postings_reader.ml:51-53
is a commented-out ``postings`` — only the header ``create`` exists),
finished here in Python and paired with a grammar-inverse writer for
round-trips (the accepted segments_N/.tim evidence model: the
reference ships no golden ``.doc`` fixture, so the wire grammar is
pinned by writer->reader round-trip plus the composed seek->postings
walk in tests/test_postings_stream.py).

Grammar (public Lucene 8.4 ``Lucene84PostingsWriter``; BLOCK = 128):

- file header: the same index-header framing every sibling file uses
  (segment/header.ml:58-110), codec name ``Lucene84PostingsWriterDoc``
  version 0..1 — exactly what the reference's ``create`` checks
  (lucene_84_postings_reader.ml:24-28).
- per term with doc_freq = df documents, starting at the term state's
  ``doc_start_fp`` (decoded from .tim by interop/terms_block.py):
  - df == 1 with a ``singleton_doc_id``: no bytes in .doc at all
    (the id lives in the term metadata).
  - df // 128 full blocks: PFOR-packed doc-id DELTAS (128 values),
    then — when the field has freqs — a PFOR-packed block of the 128
    freqs (codecs/pfor.py; token | payload | patches, streaming
    ``decode_at``).
  - df % 128 tail docs, vint-coded: with freqs each doc is
    ``(delta << 1) | (freq == 1)`` followed by ``vint freq`` only
    when freq > 1 (the Lucene tail trick); without freqs a plain
    ``vint delta``.
  - when df > 128 (exactly the condition under which .tim carries a
    ``skip_offset`` — terms_block.decode_metadata), a multi-level
    skip list follows the postings at
    ``doc_start_fp + skip_offset``.

Skip list (MultiLevelSkipListWriter framing; interval 128, level
multiplier 8, <= 10 levels): one level-0 point per completed block
that has a SUCCESSOR in the stream — Lucene buffers a block's skip
point lazily when the next block starts, so the final block never
gets one and the point count is (df - 1) // 128 on both the write
and read side. Every 8th point is promoted one level up.
Levels are written top-down; every level ABOVE 0 is prefixed with a
vlong byte length; level 0 runs to the end. An entry carries
``vint doc-delta`` (last doc id of the covered block, delta within
the level), ``vlong doc-fp-delta`` (bytes from the previous point at
this level to the start of the next block), and on levels > 0 a
``vlong child pointer`` (byte offset of the matching entry inside
the level below). Lucene 8.4 additionally interleaves per-span score
IMPACTS here — the ranking accelerator whose role the engine plays
with the block-max pareto frontier (query/wand.py, ub_tfs/ub_dls):
a ``vint`` impact byte count, then the span's COMPETITIVE (freq,
norm) pairs — the pareto set where no other doc in the span has both
freq >= and norm <= (CompetitiveImpactAccumulator semantics; sorted
the set is strictly ascending in both) — delta-coded as
``vint ((freq_delta - 1) << 1 | 1)`` when the norm delta is exactly 1,
else ``vint ((freq_delta - 1) << 1)`` + ``zigzag vlong
(norm_delta - 1)`` (Lucene84SkipWriter.writeImpacts). A level-0 entry
covers its own block; a level-L entry covers its 8^L level-0 blocks,
and its pair set equals the competitive union of its children — the
reader verifies this cross-level invariant. Impacts are written when
the writer is given per-doc ``norms`` (as Lucene reads them from the
norms producer); without norms the entry carries a ``vint 0`` empty
set, which is also what this module's earlier revisions emitted.

``.pos`` stream (codec ``Lucene84PostingsWriterPos`` — the file the
reference opens when the field ``has_prox``,
lucene_84_postings_reader.ml:29-33, with its header-check-on-doc_in
quirk, and likewise never iterates):

- per term: the term's position DELTAS for all docs concatenated in
  doc order, each doc's run restarting from 0 (so the first delta of
  a doc is its absolute first position — per-doc decode needs no
  cross-doc context); ttf // 128 PFOR-packed blocks then a vint tail.
- the term state's ``pos_start_fp`` points at the term's first byte;
  ``last_pos_block_offset`` (present exactly when ttf > 128 — the
  same condition terms_block decode/encode pins from
  terms_enumerator.ml:154-157) is the fp of the vint tail relative
  to ``pos_start_fp``.
``.pay`` stream (codec ``Lucene84PostingsWriterPay`` — the third and
last file the reference's ``create`` opens,
lucene_84_postings_reader.ml:36-44, under its has_prox quirk and its
header-check-on-doc_in quirk; content read semantics were never
defined there — this module finishes them from the public Lucene 8.4
``Lucene84PostingsWriter`` grammar, pinned by writer->reader
round-trips like the .doc/.pos paths):

- per term with payloads and/or offsets, starting at the term state's
  ``pay_start_fp`` (delta-chained through .tim exactly when the field
  has_positions and (has_payloads or has_offsets) —
  terms_block.decode_metadata), one RECORD per FULL .pos block, in
  block order:
  - if has_payloads: a PFOR block of the 128 payload lengths, a
    ``vint total_bytes``, then the block's payload bytes concatenated
    raw;
  - if has_offsets: a PFOR block of the 128 offset START DELTAS
    (start - previous start, resetting per doc like positions) then a
    PFOR block of the 128 offset LENGTHS (end - start).
- TAIL positions (the ttf % 128 leftovers) carry their payload/offset
  data inline in the .pos vint tail instead (see below) — the .pay
  stream holds full-block records only.

With payloads/offsets the .pos vint tail interleaves, per position:
``vint (pos_delta << 1 | len_changed)`` (+ ``vint payload_len`` when
changed, then the payload bytes raw) when has_payloads — the
last-length chain resets at tail start so the first tail position
always carries its length; then ``vint (start_delta << 1 |
olen_changed)`` (+ ``vint offset_len`` when changed) when
has_offsets. Without payloads the position vint is the plain
``vint pos_delta`` grammar above.

When the field has positions, every skip entry additionally carries
(in Lucene84SkipWriter's field order, between the doc fp and the
impact placeholder) a ``vint pos-fp-delta`` (bytes from the previous
point at this level to the pos-stream resume fp) and an absolute
``vint pos-buffer-upto`` (values already consumed inside the resume
block) — exactly the state a reader needs to resume position decoding
at a skipped-to doc block without touching earlier pos blocks. With
payloads/offsets two more fields follow (same Lucene84SkipWriter
order): an absolute ``vint payload-byte-upto`` (payload bytes already
consumed inside the resume block's raw-bytes region; present only
when has_payloads) and a ``vint pay-fp-delta`` (bytes from the
previous point at this level to the .pay resume record).

Driver-side, metadata-sized reads plus O(df/128) block decodes — the
same access pattern Lucene pays; nothing here sits on a Spark per-row
path (the engine queries its own parquet segments,
docs/SEGMENT_FORMAT.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codecs.pfor import decode_at as pfor_decode_at
from ..codecs.pfor import encode as pfor_encode
from ..codecs.varint import read_vint, write_vint, zigzag_decode, zigzag_encode
from .segment_meta import CODEC_MAGIC, check_index_header
from .data_input import DataInput
from .terms_block import BlockTermState, FieldFlags

BLOCK_SIZE = 128
SKIP_MULTIPLIER = 8
MAX_SKIP_LEVELS = 10
DOC_CODEC = "Lucene84PostingsWriterDoc"
POS_CODEC = "Lucene84PostingsWriterPos"
PAY_CODEC = "Lucene84PostingsWriterPay"
_SUFFIX = b"Lucene84_0"


# ---------------------------------------------------------------- write


def _write_header(out: bytearray, seg_id: bytes, codec: str = DOC_CODEC) -> None:
    # big-endian, as real Lucene writes it (CodecUtil.writeHeader) —
    # the r8 mutation property exposed that this writer used to emit
    # it little-endian, a byte-order divergence no round-trip could
    # see while nothing validated the magic
    out += CODEC_MAGIC.to_bytes(4, "big")
    write_vint(len(codec), out)
    out += codec.encode()
    out += (1).to_bytes(4, "big")  # version_current
    out += seg_id
    out.append(len(_SUFFIX))
    out += _SUFFIX


def competitive_pairs(
    freqs: np.ndarray | list, norms: np.ndarray | list
) -> list[tuple[int, int]]:
    """CompetitiveImpactAccumulator: the pareto set of (freq, norm)
    pairs — max freq per norm, then drop pairs dominated by a pair
    with freq >= and norm <=. Sorted, the survivors are strictly
    ascending in BOTH freq and norm (the invariant Lucene asserts
    before serializing)."""
    best: dict[int, int] = {}
    for f, n in zip(freqs, norms):
        f, n = int(f), int(n)
        if f > best.get(n, 0):
            best[n] = f
    out: list[tuple[int, int]] = []
    for n in sorted(best):
        f = best[n]
        if not out or f > out[-1][0]:
            out.append((f, n))
    return out


def _merge_competitive(pair_lists: list[list[tuple[int, int]]]):
    flat = [p for pl in pair_lists for p in pl]
    if not flat:
        return []
    return competitive_pairs(*zip(*flat))


def _write_impacts(pairs: list[tuple[int, int]], out: bytearray) -> None:
    """Lucene84SkipWriter.writeImpacts: delta-coded competitive pairs,
    low bit set when the norm delta is exactly 1 (saves the zlong)."""
    buf = bytearray()
    prev_f = 0
    prev_n = 0
    for f, n in pairs:
        fd = f - prev_f - 1
        nd = n - prev_n - 1
        if nd == 0:
            write_vint((fd << 1) | 1, buf)
        else:
            write_vint(fd << 1, buf)
            write_vint(zigzag_encode(nd), buf)
        prev_f, prev_n = f, n
    write_vint(len(buf), out)
    out += buf


def _read_impacts(buf: bytes, p: int, end: int) -> list[tuple[int, int]]:
    pairs: list[tuple[int, int]] = []
    f = 0
    n = 0
    while p < end:
        code, p = read_vint(buf, p)
        f += (code >> 1) + 1
        if code & 1:
            n += 1
        else:
            z, p = read_vint(buf, p)
            n += int(zigzag_decode(z)) + 1
        pairs.append((f, n))
    if p != end:
        raise ValueError("impact bytes overrun the declared length")
    return pairs


def _n_skip_levels(n_points: int) -> int:
    n_levels = 1
    while (
        n_levels < MAX_SKIP_LEVELS
        and n_points >= SKIP_MULTIPLIER ** n_levels
    ):
        n_levels += 1
    return n_levels


def _write_skip_list(
    last_docs: list[int],
    block_end_fps: list[int],
    pos_fps: list[int] | None = None,
    pos_uptos: list[int] | None = None,
    pay_fps: list[int] | None = None,
    pay_uptos: list[int] | None = None,
    has_payloads: bool = False,
    block_impacts: list[list[tuple[int, int]]] | None = None,
) -> bytes:
    """Level buffers built bottom-up (child pointers into the
    just-written level below), emitted top-down with vlong length
    prefixes on levels > 0. Entry j at level L covers level-0 point
    index (j+1)*8^L - 1; its child pointer is the offset of the FIRST
    UNCONSUMED entry in level L-1 after that shared point (end of
    buffer when the lower level is exhausted) — deltas stay consistent
    across levels because entries at the same point index share the
    same cumulative (doc, fp).

    ``pos_fps``/``pos_uptos`` (fields with positions): per point, the
    pos-stream resume fp relative to pos_start_fp (delta-coded within
    a level, like the doc fp) and the absolute in-block value offset
    (Lucene84SkipWriter writes curPosBufferUpto absolute)."""
    n_levels = _n_skip_levels(len(last_docs))
    levels: list[bytearray] = []
    entry_offsets: list[list[int]] = []
    for lvl in range(n_levels):
        buf = bytearray()
        offsets = []
        step = SKIP_MULTIPLIER ** lvl
        prev_doc = 0
        prev_fp = 0
        prev_pos_fp = 0
        prev_pay_fp = 0
        for j, i in enumerate(range(step - 1, len(last_docs), step)):
            offsets.append(len(buf))
            write_vint(last_docs[i] - prev_doc, buf)
            write_vint(block_end_fps[i] - prev_fp, buf)
            if pos_fps is not None:
                write_vint(pos_fps[i] - prev_pos_fp, buf)
                write_vint(pos_uptos[i], buf)
                prev_pos_fp = pos_fps[i]
                if pay_fps is not None:
                    if has_payloads:
                        write_vint(pay_uptos[i], buf)
                    write_vint(pay_fps[i] - prev_pay_fp, buf)
                    prev_pay_fp = pay_fps[i]
            if block_impacts is not None:
                # entry covers level-0 points i-step+1 .. i (its own
                # block at level 0; the competitive union of its 8^L
                # children above)
                _write_impacts(
                    _merge_competitive(block_impacts[i - step + 1 : i + 1]),
                    buf,
                )
            else:
                write_vint(0, buf)  # empty impact set (no norms given)
            if lvl > 0:
                below = entry_offsets[lvl - 1]
                child_idx = (j + 1) * SKIP_MULTIPLIER
                child = (
                    below[child_idx]
                    if child_idx < len(below)
                    else len(levels[lvl - 1])
                )
                write_vint(child, buf)
            prev_doc = last_docs[i]
            prev_fp = block_end_fps[i]
        levels.append(buf)
        entry_offsets.append(offsets)
    out = bytearray()
    for lvl in range(n_levels - 1, 0, -1):
        write_vint(len(levels[lvl]), out)
        out += levels[lvl]
    out += levels[0]
    return bytes(out)


def _write_term_docs(
    out: bytearray,
    docs: np.ndarray,
    f: np.ndarray,
    has_freqs: bool,
    pos_skip: tuple[list[int], list[int]] | None,
    pay_skip: tuple[list[int], list[int]] | None = None,
    has_payloads: bool = False,
    norms: np.ndarray | None = None,
) -> dict:
    """One term's .doc bytes: blocks, vint tail, skip list. ``pos_skip``
    (per level-0 point (pos_fp, pos_upto) columns, fields with
    positions) and ``pay_skip`` ((pay_fp, pay_upto) columns, fields
    with payloads/offsets) ride into the skip entries. With per-doc
    ``norms``, each skip entry carries its span's competitive (freq,
    norm) impact pairs (see module doc)."""
    df = int(docs.size)
    if df == 1:
        return {
            "doc_start_fp": len(out),
            "skip_offset": None,
            "singleton_doc_id": int(docs[0]),
        }
    start_fp = len(out)
    deltas = np.diff(docs, prepend=np.int64(0))
    n_blocks = df // BLOCK_SIZE
    last_docs = []
    block_end_fps = []
    for b in range(n_blocks):
        sl = slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE)
        out += pfor_encode(deltas[sl].astype(np.uint64))
        if has_freqs:
            out += pfor_encode(f[sl].astype(np.uint64))
        last_docs.append(int(docs[sl][-1]))
        block_end_fps.append(len(out) - start_fp)
    for i in range(n_blocks * BLOCK_SIZE, df):
        d = int(deltas[i])
        if has_freqs:
            fr = int(f[i])
            write_vint((d << 1) | (1 if fr == 1 else 0), out)
            if fr != 1:
                write_vint(fr, out)
        else:
            write_vint(d, out)
    skip_offset = None
    if df > BLOCK_SIZE:
        # the final block never gets a skip point (Lucene buffers a
        # point lazily when the NEXT block starts): (df-1)//128 points,
        # the count the reader derives from doc_freq
        n_points = (df - 1) // BLOCK_SIZE
        skip_offset = len(out) - start_fp
        block_impacts = None
        if norms is not None:
            block_impacts = [
                competitive_pairs(
                    f[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE],
                    norms[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE],
                )
                for b in range(n_points)
            ]
        out += _write_skip_list(
            last_docs[:n_points],
            block_end_fps[:n_points],
            pos_fps=pos_skip[0] if pos_skip else None,
            pos_uptos=pos_skip[1] if pos_skip else None,
            pay_fps=pay_skip[0] if pay_skip else None,
            pay_uptos=pay_skip[1] if pay_skip else None,
            has_payloads=has_payloads,
            block_impacts=block_impacts,
        )
    return {
        "doc_start_fp": start_fp,
        "skip_offset": skip_offset,
        "singleton_doc_id": None,
    }


def write_doc_stream(
    terms: list[tuple[np.ndarray, np.ndarray | None]],
    seg_id: bytes,
    has_freqs: bool = True,
    norms: list[np.ndarray] | None = None,
) -> tuple[bytes, list[dict]]:
    """Grammar-inverse writer: per-term (sorted doc_ids, freqs) pairs
    to one .doc byte stream, positions-less fields. Returns (bytes,
    per-term metadata dicts with the .tim-side fields: doc_start_fp,
    skip_offset, singleton_doc_id). With per-term per-doc ``norms``
    (as Lucene reads from the norms producer), skip entries carry real
    competitive impact pairs instead of the empty set."""
    out = bytearray()
    _write_header(out, seg_id)
    metas = []
    for t, (doc_ids, freqs) in enumerate(terms):
        docs = np.asarray(doc_ids, dtype=np.int64)
        if docs.size and np.any(np.diff(docs) <= 0):
            raise ValueError("doc ids must be strictly ascending")
        f = (
            np.asarray(freqs, dtype=np.int64)
            if has_freqs
            else np.ones(docs.size, dtype=np.int64)
        )
        if has_freqs and np.any(f < 1):
            raise ValueError("freqs must be >= 1")
        nm = None
        if norms is not None:
            nm = np.asarray(norms[t], dtype=np.int64)
            if nm.size != docs.size:
                raise ValueError("one norm per doc required")
            if nm.size and np.any(nm < 1):
                raise ValueError("norms must be >= 1")
        metas.append(_write_term_docs(out, docs, f, has_freqs, None, norms=nm))
    return bytes(out), metas


# shared by the positions-only and payloads/offsets writers: the doc/
# position validation, delta flattening, pos-block packing, and skip-
# column derivation must stay byte-identical between the two grammars
# (the reader is common), so they exist exactly once


def _validate_term_docs(doc_ids, positions) -> np.ndarray:
    docs = np.asarray(doc_ids, dtype=np.int64)
    if docs.size and np.any(np.diff(docs) <= 0):
        raise ValueError("doc ids must be strictly ascending")
    if len(positions) != docs.size:
        raise ValueError("one position array per doc required")
    return docs


def _flatten_position_deltas(positions) -> tuple[np.ndarray, np.ndarray]:
    """(freqs, flat per-doc-resetting position deltas)."""
    delta_runs = []
    for p in positions:
        p = np.asarray(p, dtype=np.int64)
        if p.size == 0:
            raise ValueError("every doc needs >= 1 position")
        if p[0] < 0 or np.any(np.diff(p) <= 0):
            raise ValueError("positions must be ascending and >= 0")
        delta_runs.append(np.diff(p, prepend=np.int64(0)))
    f = np.array([r.size for r in delta_runs], dtype=np.int64)
    flat = (
        np.concatenate(delta_runs) if delta_runs else np.empty(0, np.int64)
    )
    return f, flat


def _pack_pos_blocks(
    pos_out: bytearray, flat: np.ndarray, pos_start_fp: int
) -> tuple[int, list[int]]:
    """PFOR-pack the full blocks; returns (n_pblocks, byte offset
    after each block relative to pos_start_fp)."""
    n_pblocks = int(flat.size) // BLOCK_SIZE
    pblock_end_fps = []
    for b in range(n_pblocks):
        sl = slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE)
        pos_out += pfor_encode(flat[sl].astype(np.uint64))
        pblock_end_fps.append(len(pos_out) - pos_start_fp)
    return n_pblocks, pblock_end_fps


def _pos_skip_columns(
    f: np.ndarray, pblock_end_fps: list[int], n_doc_blocks: int
) -> tuple[list[int], list[int], list[int]]:
    """Per level-0 doc-skip point: the pos resume state (Lucene84Skip-
    Writer's curPosPointer/curPosBufferUpto at each block end). Also
    returns the resume block indexes (``fulls``) the .pay columns
    derive from; pos_uptos doubles as the in-block value offsets."""
    cum_pos = np.cumsum(f)
    pos_fps: list[int] = []
    pos_uptos: list[int] = []
    fulls: list[int] = []
    for i in range(n_doc_blocks):
        consumed = int(cum_pos[(i + 1) * BLOCK_SIZE - 1])
        full = consumed // BLOCK_SIZE
        pos_fps.append(pblock_end_fps[full - 1] if full else 0)
        pos_uptos.append(consumed % BLOCK_SIZE)
        fulls.append(full)
    return pos_fps, pos_uptos, fulls


def _term_norms(norms, t: int) -> np.ndarray | None:
    return np.asarray(norms[t], dtype=np.int64) if norms is not None else None


def write_postings_streams(
    terms: list[tuple[np.ndarray, list[np.ndarray]]],
    seg_id: bytes,
    norms: list[np.ndarray] | None = None,
) -> tuple[bytes, bytes, list[dict]]:
    """Grammar-inverse writer for a field WITH positions: per-term
    (sorted doc_ids, per-doc ascending position arrays) to a .doc and
    a .pos stream. Freqs are derived (freq = len(positions[d])).
    Returns (doc_bytes, pos_bytes, per-term metas carrying every
    .tim-side field: doc_start_fp, skip_offset, singleton_doc_id,
    pos_start_fp, last_pos_block_offset)."""
    doc_out = bytearray()
    pos_out = bytearray()
    _write_header(doc_out, seg_id)
    _write_header(pos_out, seg_id, POS_CODEC)
    metas = []
    for t, (doc_ids, positions) in enumerate(terms):
        docs = _validate_term_docs(doc_ids, positions)
        f, flat = _flatten_position_deltas(positions)
        ttf = int(flat.size)

        pos_start_fp = len(pos_out)
        n_pblocks, pblock_end_fps = _pack_pos_blocks(pos_out, flat, pos_start_fp)
        tail_fp = len(pos_out) - pos_start_fp
        for i in range(n_pblocks * BLOCK_SIZE, ttf):
            write_vint(int(flat[i]), pos_out)
        last_pos_block_offset = tail_fp if ttf > BLOCK_SIZE else None

        pos_fps, pos_uptos, _fulls = _pos_skip_columns(
            f, pblock_end_fps, docs.size // BLOCK_SIZE
        )
        meta = _write_term_docs(
            doc_out, docs, f, True, (pos_fps, pos_uptos),
            norms=_term_norms(norms, t),
        )
        meta["pos_start_fp"] = pos_start_fp
        meta["last_pos_block_offset"] = last_pos_block_offset
        metas.append(meta)
    return bytes(doc_out), bytes(pos_out), metas


def write_postings_streams_full(
    terms: list[tuple],
    seg_id: bytes,
    has_payloads: bool = True,
    has_offsets: bool = True,
    norms: list[np.ndarray] | None = None,
) -> tuple[bytes, bytes, bytes, list[dict]]:
    """Grammar-inverse writer for a field with positions AND
    payloads/offsets: per-term ``(sorted doc_ids, per-doc ascending
    position arrays, per-doc payload lists (one bytes per position; or
    None), per-doc (starts, ends) offset arrays (or None))`` to .doc,
    .pos, and .pay streams. Returns (doc_bytes, pos_bytes, pay_bytes,
    per-term metas incl. pay_start_fp — the field .tim carries exactly
    when has_positions and (has_payloads or has_offsets),
    terms_block.decode_metadata)."""
    if not (has_payloads or has_offsets):
        raise ValueError("use write_postings_streams for plain positions")
    doc_out = bytearray()
    pos_out = bytearray()
    pay_out = bytearray()
    _write_header(doc_out, seg_id)
    _write_header(pos_out, seg_id, POS_CODEC)
    _write_header(pay_out, seg_id, PAY_CODEC)
    metas = []
    for t, (doc_ids, positions, payloads, offsets) in enumerate(terms):
        docs = _validate_term_docs(doc_ids, positions)
        if has_payloads and (
            payloads is None
            or len(payloads) != docs.size
            or any(len(pl) != len(p) for pl, p in zip(payloads, positions))
        ):
            raise ValueError("one payload per position required")
        if has_offsets and (
            offsets is None or len(offsets) != docs.size
        ):
            raise ValueError("one (starts, ends) pair per doc required")

        # flatten, per-doc delta chains resetting like positions
        f, flat = _flatten_position_deltas(positions)
        ttf = int(flat.size)
        flat_sdelta = flat_olen = None
        if has_offsets:
            sdelta_runs = []
            olen_runs = []
            for d, p in enumerate(positions):
                starts = np.asarray(offsets[d][0], dtype=np.int64)
                ends = np.asarray(offsets[d][1], dtype=np.int64)
                if starts.size != len(p) or ends.size != len(p):
                    raise ValueError("one offset pair per position required")
                if starts.size and (
                    starts[0] < 0
                    or np.any(np.diff(starts) < 0)
                    or np.any(ends < starts)
                ):
                    raise ValueError(
                        "offset starts must be non-decreasing >= 0, end >= start"
                    )
                sdelta_runs.append(np.diff(starts, prepend=np.int64(0)))
                olen_runs.append(ends - starts)
            flat_sdelta = np.concatenate(sdelta_runs)
            flat_olen = np.concatenate(olen_runs)
        flat_pay: list[bytes] = (
            [bytes(b) for pl in payloads for b in pl] if has_payloads else []
        )
        flat_plen = (
            np.array([len(b) for b in flat_pay], dtype=np.int64)
            if has_payloads
            else np.zeros(ttf, dtype=np.int64)
        )
        cum_plen = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(flat_plen)]
        )

        pos_start_fp = len(pos_out)
        pay_start_fp = len(pay_out)
        n_pblocks, pblock_end_fps = _pack_pos_blocks(pos_out, flat, pos_start_fp)
        pay_record_fps = []  # start of pay record b, rel pay_start_fp
        for b in range(n_pblocks):
            sl = slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE)
            pay_record_fps.append(len(pay_out) - pay_start_fp)
            if has_payloads:
                pay_out += pfor_encode(flat_plen[sl].astype(np.uint64))
                total = int(flat_plen[sl].sum())
                write_vint(total, pay_out)
                pay_out += b"".join(
                    flat_pay[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
                )
            if has_offsets:
                pay_out += pfor_encode(flat_sdelta[sl].astype(np.uint64))
                pay_out += pfor_encode(flat_olen[sl].astype(np.uint64))
        packed_pay_end = len(pay_out) - pay_start_fp
        tail_fp = len(pos_out) - pos_start_fp
        last_plen = -1
        last_olen = -1
        for i in range(n_pblocks * BLOCK_SIZE, ttf):
            d = int(flat[i])
            if has_payloads:
                plen = int(flat_plen[i])
                if plen == last_plen:
                    write_vint(d << 1, pos_out)
                else:
                    write_vint((d << 1) | 1, pos_out)
                    write_vint(plen, pos_out)
                    last_plen = plen
                pos_out += flat_pay[i]
            else:
                write_vint(d, pos_out)
            if has_offsets:
                sd = int(flat_sdelta[i])
                ol = int(flat_olen[i])
                if ol == last_olen:
                    write_vint(sd << 1, pos_out)
                else:
                    write_vint((sd << 1) | 1, pos_out)
                    write_vint(ol, pos_out)
                    last_olen = ol
        last_pos_block_offset = tail_fp if ttf > BLOCK_SIZE else None

        # per level-0 doc-skip point: pos + pay resume state
        pos_fps, pos_uptos, fulls = _pos_skip_columns(
            f, pblock_end_fps, docs.size // BLOCK_SIZE
        )
        pay_fps: list[int] = []
        pay_uptos: list[int] = []
        for full, upto in zip(fulls, pos_uptos):
            if full < n_pblocks:
                pay_fps.append(pay_record_fps[full])
                # payload bytes already consumed inside the resume
                # record's raw region
                base = int(cum_plen[full * BLOCK_SIZE])
                pay_uptos.append(int(cum_plen[full * BLOCK_SIZE + upto]) - base)
            else:
                # resume lands in the vint tail: payloads are inline
                # there, no pay record is partially consumed
                pay_fps.append(packed_pay_end)
                pay_uptos.append(0)

        meta = _write_term_docs(
            doc_out, docs, f, True,
            (pos_fps, pos_uptos), (pay_fps, pay_uptos),
            has_payloads=has_payloads,
            norms=_term_norms(norms, t),
        )
        meta["pos_start_fp"] = pos_start_fp
        meta["last_pos_block_offset"] = last_pos_block_offset
        meta["pay_start_fp"] = pay_start_fp
        metas.append(meta)
    return bytes(doc_out), bytes(pos_out), bytes(pay_out), metas


# ----------------------------------------------------------------- read


@dataclass(frozen=True)
class SkipPoint:
    """One level-0 skip point: everything needed to resume decoding at
    the NEXT block."""

    last_doc: int  # last doc id covered by blocks up to this point
    next_block_fp: int  # fp (relative to doc_start_fp) of the next block
    block_index: int  # index of the next block
    # position resume state (fields with positions; None otherwise):
    # fp of the pos block holding the next doc's first position
    # (relative to pos_start_fp) and the values already consumed
    # inside it
    pos_fp: int | None = None
    pos_upto: int | None = None
    # payload/offset resume state (fields with payloads/offsets):
    # fp of the .pay record for the resume pos block (relative to
    # pay_start_fp) and the payload bytes already consumed inside that
    # record's raw-bytes region (0 for offsets-only fields)
    pay_fp: int | None = None
    pay_upto: int | None = None


class SkipListReader:
    """Parses every level eagerly (in-memory bytes, O(df/128) vints),
    verifying the cross-level grammar as it goes — upper-level entries
    must agree with level 0 on cumulative (doc, fp) at shared points,
    and child pointers must land exactly on a lower-level entry
    boundary or its end. ``advance`` then walks the levels top-down
    (MultiLevelSkipListReader semantics: consume entries while their
    boundary doc < target, descend via the last consumed entry's child
    pointer)."""

    def __init__(
        self, data: bytes, pos: int, n_points: int,
        has_positions: bool = False,
        has_pay_data: bool = False,
        has_payloads: bool = False,
    ):
        n_levels = _n_skip_levels(n_points)
        raw: list[bytes] = [b""] * n_levels
        for lvl in range(n_levels - 1, 0, -1):
            ln, pos = read_vint(data, pos)
            raw[lvl] = data[pos : pos + ln]
            pos += ln
        # level 0 has no byte-length prefix: it is bounded by its ENTRY
        # COUNT (n_points — known from doc_freq), never by end-of-file.
        # In a multi-term stream the next term's bytes start right after
        # the last level-0 entry; parsing past the count would read them
        # as garbage skip entries.
        raw[0] = data[pos:]
        self.n_points = n_points
        self.has_positions = has_positions
        # entries[lvl][j] = (last_doc, next_block_fp, pos_fp, pos_upto,
        # pay_fp, pay_upto, child_offset) as cumulative values (pos/pay
        # fields None when the field lacks them); offsets[lvl][j] =
        # byte offset of entry j
        self.entries: list[
            list[tuple[int, int, int | None, int | None, int | None,
                       int | None, int | None]]
        ] = []
        self.offsets: list[list[int]] = []
        self.level_lens: list[int] = []
        # impacts[lvl][j]: the entry's competitive (freq, norm) pairs
        # ([] when the writer had no norms)
        self.impacts: list[list[list[tuple[int, int]]]] = []
        for lvl in range(n_levels):
            buf = raw[lvl]
            expected = n_points // (SKIP_MULTIPLIER ** lvl)
            p = 0
            doc = fp = pos_fp = pay_fp = 0
            ents: list = []
            offs: list[int] = []
            imps: list[list[tuple[int, int]]] = []
            while len(ents) < expected:
                offs.append(p)
                dd, p = read_vint(buf, p)
                fd, p = read_vint(buf, p)
                pos_upto = None
                pay_upto = None
                if has_positions:
                    pfd, p = read_vint(buf, p)
                    pos_fp += pfd
                    pos_upto, p = read_vint(buf, p)
                    if has_pay_data:
                        pay_upto = 0
                        if has_payloads:
                            pay_upto, p = read_vint(buf, p)
                        payd, p = read_vint(buf, p)
                        pay_fp += payd
                impact_len, p = read_vint(buf, p)
                imps.append(_read_impacts(buf, p, p + impact_len))
                p += impact_len
                child = None
                if lvl > 0:
                    child, p = read_vint(buf, p)
                doc += dd
                fp += fd
                ents.append(
                    (
                        doc,
                        fp,
                        pos_fp if has_positions else None,
                        pos_upto,
                        pay_fp if (has_positions and has_pay_data) else None,
                        pay_upto,
                        child,
                    )
                )
            if lvl > 0 and p != len(buf):
                raise ValueError(
                    f"skip level {lvl}: {len(buf) - p} bytes past the "
                    f"last of {expected} entries"
                )
            self.entries.append(ents)
            self.offsets.append(offs)
            self.impacts.append(imps)
            # true byte length of this level's entries (for level 0,
            # raw[0] runs to end-of-file — only the parsed prefix is
            # skip data; an exhausted-lower-level child pointer from
            # the level above equals THIS length)
            self.level_lens.append(p)
        # grammar checks: level L entry j == level 0 entry (j+1)*8^L - 1,
        # and child pointers hit entry boundaries of the level below
        for lvl in range(1, n_levels):
            step = SKIP_MULTIPLIER ** lvl
            for j, (doc, fp, pos_fp, pos_upto, pay_fp, pay_upto, child) in (
                enumerate(self.entries[lvl])
            ):
                base = self.entries[0][(j + 1) * step - 1]
                if (doc, fp, pos_fp, pos_upto, pay_fp, pay_upto) != base[:6]:
                    raise ValueError(
                        f"skip level {lvl} entry {j} disagrees with level 0"
                    )
                below_offs = self.offsets[lvl - 1]
                if child not in below_offs and child != self.level_lens[lvl - 1]:
                    raise ValueError(
                        f"skip level {lvl} entry {j}: child pointer "
                        f"{child} is not an entry boundary"
                    )
                # a level-L entry's impact set is the competitive union
                # of its 8^L children's (CompetitiveImpactAccumulator
                # accumulate-up semantics)
                want = _merge_competitive(
                    self.impacts[0][j * step : (j + 1) * step]
                )
                if self.impacts[lvl][j] != want:
                    raise ValueError(
                        f"skip level {lvl} entry {j}: impacts are not "
                        f"the competitive union of the covered blocks"
                    )

    def advance(self, target: int) -> SkipPoint | None:
        """Largest level-0 point with last_doc < target, or None when
        decoding must start at the first block."""
        n_levels = len(self.entries)
        best: SkipPoint | None = None
        start_j = 0  # first unconsumed entry index at the current level
        for lvl in range(n_levels - 1, -1, -1):
            step = SKIP_MULTIPLIER ** lvl
            child: int | None = None
            j = start_j
            while j < len(self.entries[lvl]):
                doc, fp, pos_fp, pos_upto, pay_fp, pay_upto, ch = (
                    self.entries[lvl][j]
                )
                if doc >= target:
                    break
                best = SkipPoint(
                    last_doc=doc,
                    next_block_fp=fp,
                    block_index=(j + 1) * step,
                    pos_fp=pos_fp,
                    pos_upto=pos_upto,
                    pay_fp=pay_fp,
                    pay_upto=pay_upto,
                )
                child = ch
                j += 1
            if lvl == 0:
                break
            if child is None:
                # nothing consumed here: lower level continues from the
                # entry matching the already-consumed prefix
                start_j = start_j * SKIP_MULTIPLIER
            else:
                start_j = (
                    self.offsets[lvl - 1].index(child)
                    if child in self.offsets[lvl - 1]
                    else len(self.entries[lvl - 1])
                )
        return best


def _advance_point(
    data: bytes, state: BlockTermState, flags: FieldFlags, target: int
) -> SkipPoint | None:
    """Parse the term's skip list and advance to ``target`` (None when
    decoding must start at the first block)."""
    n_points = (state.doc_freq - 1) // BLOCK_SIZE
    sk = SkipListReader(
        data,
        state.doc_start_fp + state.skip_offset,
        n_points,
        has_positions=flags.has_positions,
        has_pay_data=flags.has_positions
        and (flags.has_payloads or flags.has_offsets),
        has_payloads=flags.has_payloads,
    )
    return sk.advance(target)


_UNRESOLVED = object()  # sentinel: "advance not yet computed"


def read_term_postings(
    data: bytes,
    state: BlockTermState,
    flags: FieldFlags,
    target: int | None = None,
    _decode_counter: list | None = None,
    _point=_UNRESOLVED,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Decode one term's postings from a .doc stream (header already
    framed; fps in ``state`` are absolute file positions). With
    ``target`` set, uses the skip list (when present) to start at the
    first block that can contain ``target`` and returns only docs from
    that block on — the reference's ``advance`` contract.
    ``_decode_counter`` (a list to append per-block markers to) lets
    tests prove skipped blocks are never decoded."""
    df = state.doc_freq
    if state.singleton_doc_id is not None:
        docs = np.array([state.singleton_doc_id], dtype=np.int64)
        freqs = (
            np.array([state.total_term_freq], dtype=np.int64)
            if flags.has_freqs
            else None
        )
        return docs, freqs
    pos = state.doc_start_fp
    n_blocks = df // BLOCK_SIZE
    first_block = 0
    doc_base = 0
    if target is not None and state.skip_offset is not None:
        # a caller that already advanced (the composed doc+pos walk)
        # passes its point through; otherwise compute it here
        pt = (
            _advance_point(data, state, flags, target)
            if _point is _UNRESOLVED
            else _point
        )
        if pt is not None:
            first_block = pt.block_index
            doc_base = pt.last_doc
            pos = state.doc_start_fp + pt.next_block_fp
    docs_out = []
    freqs_out = []
    for b in range(first_block, n_blocks):
        deltas, pos = pfor_decode_at(data, pos, BLOCK_SIZE)
        if _decode_counter is not None:
            _decode_counter.append(b)
        block_docs = doc_base + np.cumsum(deltas.astype(np.int64))
        doc_base = int(block_docs[-1])
        docs_out.append(block_docs)
        if flags.has_freqs:
            f, pos = pfor_decode_at(data, pos, BLOCK_SIZE)
            freqs_out.append(f.astype(np.int64))
    tail = df - n_blocks * BLOCK_SIZE
    if tail:
        t_docs = np.empty(tail, dtype=np.int64)
        t_freqs = np.empty(tail, dtype=np.int64)
        for i in range(tail):
            if flags.has_freqs:
                code, pos = read_vint(data, pos)
                doc_base += code >> 1
                if code & 1:
                    t_freqs[i] = 1
                else:
                    t_freqs[i], pos = read_vint(data, pos)
            else:
                d, pos = read_vint(data, pos)
                doc_base += d
            t_docs[i] = doc_base
        docs_out.append(t_docs)
        if flags.has_freqs:
            freqs_out.append(t_freqs)
    docs = (
        np.concatenate(docs_out) if docs_out else np.empty(0, dtype=np.int64)
    )
    freqs = (
        np.concatenate(freqs_out).astype(np.int64)
        if flags.has_freqs and freqs_out
        else (np.empty(0, dtype=np.int64) if flags.has_freqs else None)
    )
    return docs, freqs


def read_term_positions(
    pos_data: bytes,
    state: BlockTermState,
    freqs: np.ndarray,
    point: SkipPoint | None = None,
    _decode_counter: list | None = None,
) -> list[np.ndarray]:
    """Per-doc position arrays from a .pos stream. ``freqs`` are the
    freqs of the docs being decoded — the FULL postings when ``point``
    is None, or the exact suffix returned by the matching skipped
    ``read_term_postings`` call (the skip entry's (pos_fp, pos_upto)
    is the resume state for precisely that suffix's first doc). Packed
    pos blocks before the resume block are never decoded
    (``_decode_counter`` proves it, one marker per packed decode)."""
    ttf = state.total_term_freq
    n_pblocks = ttf // BLOCK_SIZE
    tail_start = state.last_pos_block_offset  # None when ttf <= BLOCK
    if point is None:
        pos = state.pos_start_fp
        discard = 0
    else:
        if point.pos_fp is None:
            raise ValueError("skip point carries no position resume state")
        pos = state.pos_start_fp + point.pos_fp
        discard = point.pos_upto
    need = discard + int(np.asarray(freqs, dtype=np.int64).sum())
    vals: list[np.ndarray] = []
    got = 0
    # packed region: bounded by the tail fp when the term has one, by
    # the block count otherwise (ttf <= BLOCK or exact multiple)
    decoded_blocks = 0
    while got < need:
        rel = pos - state.pos_start_fp
        in_packed = (
            rel < tail_start
            if tail_start is not None
            else decoded_blocks < n_pblocks and point is None
        )
        if not in_packed:
            break
        block, pos = pfor_decode_at(pos_data, pos, BLOCK_SIZE)
        decoded_blocks += 1
        if _decode_counter is not None:
            _decode_counter.append(rel)
        vals.append(block.astype(np.int64))
        got += BLOCK_SIZE
    while got < need:
        v, pos = read_vint(pos_data, pos)
        vals.append(np.array([v], dtype=np.int64))
        got += 1
    flat = (
        np.concatenate(vals)[discard:need]
        if vals
        else np.empty(0, dtype=np.int64)
    )
    out: list[np.ndarray] = []
    at = 0
    for fr in np.asarray(freqs, dtype=np.int64):
        run = flat[at : at + int(fr)]
        out.append(np.cumsum(run))  # per-doc reset: first delta absolute
        at += int(fr)
    return out


def read_term_positions_full(
    pos_data: bytes,
    pay_data: bytes,
    state: BlockTermState,
    freqs: np.ndarray,
    flags: FieldFlags,
    point: SkipPoint | None = None,
    _decode_counter: list | None = None,
) -> tuple[list[np.ndarray], list[list[bytes]] | None, list[tuple] | None]:
    """Per-doc (positions, payloads, (starts, ends) offsets) from a
    .pos + .pay stream pair (fields with has_payloads/has_offsets —
    the interleaved-tail grammar; see module doc). ``freqs`` follows
    the read_term_positions contract: the freqs of exactly the docs
    being decoded. Packed pos blocks and their .pay records before the
    resume block are never decoded (``_decode_counter`` marks one entry
    per packed pos-block decode)."""
    has_pay = flags.has_payloads
    has_off = flags.has_offsets
    if not (has_pay or has_off):
        raise ValueError("field has no payloads or offsets")
    ttf = state.total_term_freq
    n_pblocks = ttf // BLOCK_SIZE
    tail_start = state.last_pos_block_offset
    if point is None:
        pos = state.pos_start_fp
        pay = state.pay_start_fp
        discard = 0
        pay_discard = 0
    else:
        if point.pos_fp is None or point.pay_fp is None:
            raise ValueError("skip point carries no pay resume state")
        pos = state.pos_start_fp + point.pos_fp
        pay = state.pay_start_fp + point.pay_fp
        discard = point.pos_upto
        pay_discard = point.pay_upto
    need = discard + int(np.asarray(freqs, dtype=np.int64).sum())
    dvals: list[np.ndarray] = []
    plens: list[np.ndarray] = []
    praws: list[bytes] = []  # concatenated payload bytes per block
    sdvals: list[np.ndarray] = []
    olvals: list[np.ndarray] = []
    got = 0
    decoded_blocks = 0
    first = True
    while got < need:
        rel = pos - state.pos_start_fp
        in_packed = (
            rel < tail_start
            if tail_start is not None
            else decoded_blocks < n_pblocks and point is None
        )
        if not in_packed:
            break
        block, pos = pfor_decode_at(pos_data, pos, BLOCK_SIZE)
        decoded_blocks += 1
        if _decode_counter is not None:
            _decode_counter.append(rel)
        dvals.append(block.astype(np.int64))
        if has_pay:
            lens, pay = pfor_decode_at(pay_data, pay, BLOCK_SIZE)
            lens = lens.astype(np.int64)
            total, pay = read_vint(pay_data, pay)
            if total != int(lens.sum()):
                raise ValueError("pay record: byte total != sum of lengths")
            praws.append(pay_data[pay : pay + total])
            pay += total
            plens.append(lens)
            if first and point is not None:
                # the skip entry's absolute payload-byte-upto must
                # agree with the lengths of the discarded positions
                if int(lens[:discard].sum()) != pay_discard:
                    raise ValueError(
                        "skip point payload-byte-upto disagrees with "
                        "the resume record's length block"
                    )
        if has_off:
            sd, pay = pfor_decode_at(pay_data, pay, BLOCK_SIZE)
            ol, pay = pfor_decode_at(pay_data, pay, BLOCK_SIZE)
            sdvals.append(sd.astype(np.int64))
            olvals.append(ol.astype(np.int64))
        got += BLOCK_SIZE
        first = False
    # vint tail: interleaved payload/offset fields, chains reset at
    # tail start (self-contained — a resume landing here needs no
    # earlier context)
    tail_plens: list[int] = []
    tail_praw = bytearray()
    last_plen = -1
    last_olen = -1
    while got < need:
        code, pos = read_vint(pos_data, pos)
        if has_pay:
            if code & 1:
                last_plen, pos = read_vint(pos_data, pos)
            dvals.append(np.array([code >> 1], dtype=np.int64))
            tail_plens.append(last_plen)
            tail_praw += pos_data[pos : pos + last_plen]
            pos += last_plen
        else:
            dvals.append(np.array([code], dtype=np.int64))
        if has_off:
            ocode, pos = read_vint(pos_data, pos)
            if ocode & 1:
                last_olen, pos = read_vint(pos_data, pos)
            sdvals.append(np.array([ocode >> 1], dtype=np.int64))
            olvals.append(np.array([last_olen], dtype=np.int64))
        got += 1
    if tail_plens:
        plens.append(np.array(tail_plens, dtype=np.int64))
        praws.append(bytes(tail_praw))

    flat_d = np.concatenate(dvals) if dvals else np.empty(0, np.int64)
    fr = np.asarray(freqs, dtype=np.int64)
    out_pos: list[np.ndarray] = []
    out_pay: list[list[bytes]] | None = [] if has_pay else None
    out_off: list[tuple] | None = [] if has_off else None
    if has_pay:
        flat_plen = np.concatenate(plens) if plens else np.empty(0, np.int64)
        raw = b"".join(praws)
        # byte offset of each position's payload within raw
        starts_b = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(flat_plen)]
        )
        flat_pay = [
            raw[int(starts_b[i]) : int(starts_b[i + 1])]
            for i in range(discard, need)
        ]
    if has_off:
        flat_sd = np.concatenate(sdvals) if sdvals else np.empty(0, np.int64)
        flat_ol = np.concatenate(olvals) if olvals else np.empty(0, np.int64)
    at = discard
    pay_at = 0
    for k in fr:
        k = int(k)
        run = flat_d[at : at + k]
        out_pos.append(np.cumsum(run))
        if has_pay:
            out_pay.append(flat_pay[pay_at : pay_at + k])
        if has_off:
            starts = np.cumsum(flat_sd[at : at + k])
            out_off.append((starts, starts + flat_ol[at : at + k]))
        at += k
        pay_at += k
    return out_pos, out_pay, out_off


def read_term_postings_positions_payloads(
    doc_data: bytes,
    pos_data: bytes,
    pay_data: bytes,
    state: BlockTermState,
    flags: FieldFlags,
    target: int | None = None,
    _pos_decode_counter: list | None = None,
):
    """The full composed walk for payload/offset fields: ONE skip
    advance shared by all three streams (the .doc entry's pos AND pay
    resume fields position the .pos/.pay reads), returning (docs,
    freqs, per-doc positions, per-doc payloads | None, per-doc
    (starts, ends) offsets | None) for the same doc suffix."""
    if not flags.has_positions:
        raise ValueError("field has no positions")
    point = None
    if target is not None and state.skip_offset is not None:
        point = _advance_point(doc_data, state, flags, target)
    docs, freqs = read_term_postings(
        doc_data, state, flags, target=target, _point=point
    )
    positions, payloads, offsets = read_term_positions_full(
        pos_data, pay_data, state, freqs, flags,
        point=point, _decode_counter=_pos_decode_counter,
    )
    return docs, freqs, positions, payloads, offsets


def read_term_postings_and_positions(
    doc_data: bytes,
    pos_data: bytes,
    state: BlockTermState,
    flags: FieldFlags,
    target: int | None = None,
    _pos_decode_counter: list | None = None,
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """The composed doc+pos walk: one skip advance shared by both
    streams (the .doc entry's pos resume fields position the .pos
    read), returning (docs, freqs, per-doc positions) for the same
    doc suffix."""
    if not flags.has_positions:
        raise ValueError("field has no positions")
    point = None
    if target is not None and state.skip_offset is not None:
        point = _advance_point(doc_data, state, flags, target)
    docs, freqs = read_term_postings(
        doc_data,
        state,
        flags,
        target=target,
        # ONE advance shared by both streams: the resolved point feeds
        # the doc-side walk directly (no second skip-list parse)
        _point=point,
    )
    positions = read_term_positions(
        pos_data, state, freqs, point=point, _decode_counter=_pos_decode_counter
    )
    return docs, freqs, positions


class DocStreamReader:
    """An opened .doc file: header checked exactly as the reference's
    ``create`` does (lucene_84_postings_reader.ml:24-28), then per-term
    reads driven by .tim term states."""

    def __init__(self, data: bytes, seg_id: bytes):
        self.data = data
        check_index_header(
            DataInput(data), DOC_CODEC, 0, 1, seg_id, _SUFFIX
        )

    def postings(
        self,
        state: BlockTermState,
        flags: FieldFlags,
        target: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        return read_term_postings(self.data, state, flags, target=target)


class PosStreamReader:
    """An opened .pos file, header checked against the POS codec — the
    check the reference MEANS to do at lucene_84_postings_reader.ml:32
    (its quirk: it verifies the header bytes of doc_in again while
    holding pos_in; we check the actual pos stream)."""

    def __init__(self, data: bytes, seg_id: bytes):
        self.data = data
        check_index_header(
            DataInput(data), POS_CODEC, 0, 1, seg_id, _SUFFIX
        )

    def positions(
        self,
        state: BlockTermState,
        freqs: np.ndarray,
        point: SkipPoint | None = None,
    ) -> list[np.ndarray]:
        return read_term_positions(self.data, state, freqs, point=point)


class PayStreamReader:
    """An opened .pay file, header checked against the PAY codec — the
    reference opens this file too (lucene_84_postings_reader.ml:36-44,
    under its has_prox quirk) and, like .pos, verifies doc_in's header
    in its place; we check the actual pay stream. Content reads go
    through read_term_positions_full with the doc/pos readers."""

    def __init__(self, data: bytes, seg_id: bytes):
        self.data = data
        check_index_header(
            DataInput(data), PAY_CODEC, 0, 1, seg_id, _SUFFIX
        )
