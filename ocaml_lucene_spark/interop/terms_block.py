"""Suffix-block load + metadata decode of the block-tree terms
dictionary (.tim) — the reference's seek_exact steps 4-5, the last
§2.2 machinery without an executable counterpart.

Semantics provenance (/root/reference/codec/terms_enumerator.ml):
- block framing + suffix decompression dispatch   :233-258
- read_suffixes                                    :106-117
- decode_metadata (stats stream, singleton runs)   :173-196
- decode_postings_term (delta-chained fps)         :126-171
- leaf-block suffix scan + state assembly          :259-277
- compression dispatch (/root/reference/terms-enumerator/
  compression_algorithms.ml:20-23): 0 = none, 1 = lowercase-ascii,
  2 = LZ4 — the two nontrivial codecs are this repo's
  codecs/lowercase_ascii.py and codecs/lz4.py, already byte-exact
  against the reference's golden streams.

No golden .tim block exists in the reference's data/ (the r4
adjudicated gap), so parity evidence is synthesized-bytes
round-trips — the same approach the accepted segments_N manifest
interop used: ``write_block`` emits bytes per the reader grammar and
tests/test_terms_block.py replays every branch (singleton runs vs
plain df=1 tokens, >128 doc_freq/total_term_freq extras, all-equal
suffix lengths, all three compression algos) plus the FULL seek_exact
composition through the real reversed-FST writer/reader and the
floor-pointer decoder.

OCaml quirk parity: the reference passes vlong codes through its
63-bit native int (``Int64.to_int`` then ``lsr``), so reads mask to
the 63-bit pattern before shifting — the interop/block_pointer
convention.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from ..codecs import lowercase_ascii, lz4
from ..codecs.varint import write_vint
from .data_input import DataInput

_MASK63 = (1 << 63) - 1


@dataclass(frozen=True)
class FieldFlags:
    """The Field_infos predicates decode_metadata consults
    (terms_enumerator.ml:141-189)."""

    has_freqs: bool = True
    has_positions: bool = True
    has_offsets: bool = False
    has_payloads: bool = False


@dataclass(frozen=True)
class BlockTermState:
    """terms_enumerator.ml Block_term_state (:21-43)."""

    doc_freq: int = 0
    total_term_freq: int = 0
    metadata_upto: int = 0
    doc_start_fp: int = 0
    pos_start_fp: int = 0
    pay_start_fp: int = 0
    singleton_doc_id: int | None = None
    last_pos_block_offset: int | None = None
    skip_offset: int | None = None


@dataclass(frozen=True)
class TermsBlock:
    ent_count: int
    is_leaf: bool
    suffixes: list[bytes]
    stats: bytes
    postings: bytes


def _lz4_decompress_stream(di: DataInput, out_len: int) -> bytes:
    """codecs/lz4.decompress against a DataInput, consuming exactly
    the sequences needed to produce ``out_len`` bytes (the reference
    decompressor is length-driven)."""
    out = bytearray()
    while len(out) < out_len:
        token = di.read_byte()
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = di.read_byte()
                lit_len += b
                if b != 255:
                    break
        out += di.read_bytes(lit_len)
        if len(out) >= out_len:
            break
        off_bytes = di.read_bytes(2)
        offset = off_bytes[0] | (off_bytes[1] << 8)
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = di.read_byte()
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        for j in range(match_len):
            out.append(out[start + j])
    return bytes(out[:out_len])


def _read_suffix_bytes(di: DataInput, algo: int, out_len: int) -> bytes:
    if algo == 0:
        return di.read_bytes(out_len)
    if algo == 1:
        # lowercase-ascii stream: pack_start payload bytes, an
        # exception count byte, then 2 bytes per exception
        pack_start = out_len - out_len // 4
        payload = di.read_bytes(pack_start)
        count = di.read_byte()
        exc = di.read_bytes(2 * count)
        return lowercase_ascii.decompress(
            payload + bytes([count]) + exc, out_len
        )
    if algo == 2:
        return _lz4_decompress_stream(di, out_len)
    raise ValueError(f"unknown compression algo {algo}")


def read_block(di: DataInput) -> TermsBlock:
    """Parse one suffix block at the DataInput's position
    (terms_enumerator.ml:233-258)."""
    code = di.read_vint()
    ent_count = code >> 1
    if ent_count <= 0:
        raise ValueError("empty suffix block")
    code = di.read_vlong() & _MASK63
    is_leaf = code & 4 != 0
    algo = code & 3
    num_suffix_bytes = code >> 3
    suffix_bytes = _read_suffix_bytes(di, algo, num_suffix_bytes)
    code = di.read_vint()
    num_len_bytes = code >> 1
    all_equal = code & 1 != 0
    if all_equal:
        length_bytes = bytes([di.read_byte()]) * num_len_bytes
    else:
        length_bytes = di.read_bytes(num_len_bytes)
    sdi = DataInput(suffix_bytes)
    ldi = DataInput(length_bytes)
    suffixes = [sdi.read_bytes(ldi.read_vint()) for _ in range(ent_count)]
    stats = di.read_string()
    postings = di.read_string()
    return TermsBlock(ent_count, is_leaf, suffixes, stats, postings)


def _decode_postings_term(
    postings: DataInput, flags: FieldFlags, state: BlockTermState
) -> BlockTermState:
    """terms_enumerator.ml decode_postings_term (:126-171)."""
    code = postings.read_vlong() & _MASK63
    v = code >> 1
    has_doc_start_fp = code & 1 == 0
    doc_start_fp = state.doc_start_fp + (v if has_doc_start_fp else 0)
    if has_doc_start_fp:
        singleton = postings.read_vint() if state.doc_freq == 1 else None
    else:
        singleton = (
            None
            if state.singleton_doc_id is None
            else state.singleton_doc_id + v
        )
    pos_start_fp = state.pos_start_fp + (
        postings.read_vlong() if flags.has_positions else 0
    )
    pay_start_fp = state.pay_start_fp + (
        postings.read_vlong()
        if flags.has_positions and (flags.has_offsets or flags.has_payloads)
        else 0
    )
    last_pos_block_offset = (
        postings.read_vlong() if state.total_term_freq > 128 else None
    )
    skip_offset = postings.read_vlong() if state.doc_freq > 128 else None
    return replace(
        state,
        doc_start_fp=doc_start_fp,
        singleton_doc_id=singleton,
        pos_start_fp=pos_start_fp,
        pay_start_fp=pay_start_fp,
        last_pos_block_offset=last_pos_block_offset,
        skip_offset=skip_offset,
    )


def _iter_states(stats: DataInput, postings: DataInput, flags: FieldFlags):
    """Yield each successive term's folded BlockTermState from a
    block's stats/postings streams (the shared loop of decode_metadata
    and decode_all_states)."""
    state = BlockTermState()
    singleton_run_length = 0
    n = 0
    while True:
        if singleton_run_length > 0:
            singleton_run_length -= 1
            doc_freq, total_term_freq = 1, 1
        else:
            token = stats.read_vint()
            if token & 1:
                singleton_run_length = token >> 1
                doc_freq, total_term_freq = 1, 1
            else:
                doc_freq = token >> 1
                total_term_freq = (
                    stats.read_vint() if flags.has_freqs else 0
                ) + doc_freq
        state = replace(
            state,
            doc_freq=doc_freq,
            total_term_freq=total_term_freq,
            metadata_upto=n + 1,
        )
        state = _decode_postings_term(postings, flags, state)
        yield state
        n += 1


def decode_metadata(
    limit: int, stats: DataInput, postings: DataInput, flags: FieldFlags
) -> BlockTermState:
    """Fold per-term metadata for terms 0..limit inclusive
    (terms_enumerator.ml decode_metadata :173-196): the stats stream
    yields (df, ttf) — with low-bit tokens opening singleton runs of
    run_length+1 terms — and every term consumes one
    decode_postings_term record (deltas accumulate across skipped
    terms, which is the point of decoding from the block head)."""
    it = _iter_states(stats, postings, flags)
    for _ in range(limit):
        next(it)
    return next(it)


def decode_all_states(block: TermsBlock, flags: FieldFlags) -> list[BlockTermState]:
    """Every term's BlockTermState of a LEAF block, in suffix order —
    one fold over the stats/postings streams (importer support; the
    reference only ever decodes up to one sought term)."""
    if not block.is_leaf:
        raise NotImplementedError("if_leaf_block = false")
    it = _iter_states(DataInput(block.stats), DataInput(block.postings), flags)
    return [next(it) for _ in range(block.ent_count)]


def seek_exact_in_block(
    block: TermsBlock, target_suffix: bytes, flags: FieldFlags
) -> BlockTermState | None:
    """Scan a LEAF block's suffix list for the target and decode its
    metadata (terms_enumerator.ml:259-277). Non-leaf blocks raise,
    mirroring the reference's Assert.check_implemented."""
    if not block.is_leaf:
        raise NotImplementedError("if_leaf_block = false")
    try:
        limit = block.suffixes.index(target_suffix)
    except ValueError:
        return None
    return decode_metadata(
        limit, DataInput(block.stats), DataInput(block.postings), flags
    )


# -- writer (synthesized-bytes parity evidence; no golden fixture) -----


@dataclass(frozen=True)
class TermEntry:
    """One term's target state, writer-side: absolute file pointers;
    the writer derives the delta/run encodings the reader undoes."""

    suffix: bytes
    doc_freq: int
    total_term_freq: int
    doc_start_fp: int
    pos_start_fp: int = 0
    pay_start_fp: int = 0
    singleton_doc_id: int | None = None
    last_pos_block_offset: int | None = None
    skip_offset: int | None = None


def _compress_suffix_bytes(raw: bytes, algo: int) -> bytes:
    if algo == 0:
        return raw
    if algo == 1:
        return lowercase_ascii.compress(raw)
    if algo == 2:
        return lz4.compress(raw)
    raise ValueError(f"unknown compression algo {algo}")


def write_block(
    entries: list[TermEntry],
    flags: FieldFlags = FieldFlags(),
    compression: int = 0,
    leaf: bool = True,
    last_in_floor: bool = False,
) -> bytes:
    """Emit one suffix block in the exact grammar read_block parses.
    Singleton runs of length >= 2 use the run token; isolated df=1
    terms use a plain token (so both reader branches stay exercised);
    doc fps must be non-decreasing and a term sharing its predecessor's
    doc fp with both singleton ids present emits the
    singleton-delta form (has_doc_start_fp = 0)."""
    if not entries:
        raise ValueError("empty suffix block")
    out = bytearray()
    write_vint((len(entries) << 1) | (1 if last_in_floor else 0), out)

    raw_suffix = b"".join(e.suffix for e in entries)
    comp = _compress_suffix_bytes(raw_suffix, compression)
    code = (len(raw_suffix) << 3) | (4 if leaf else 0) | compression
    write_vint(code, out)  # vlong and vint share the LEB128 writer
    out += comp

    lengths = [len(e.suffix) for e in entries]
    if len(set(lengths)) == 1 and lengths[0] < 128:
        write_vint((len(entries) << 1) | 1, out)
        out.append(lengths[0])
    else:
        lstream = bytearray()
        for l in lengths:
            write_vint(l, lstream)
        write_vint((len(lstream) << 1), out)
        out += lstream

    stats = bytearray()
    i = 0
    n = len(entries)
    while i < n:
        e = entries[i]
        if e.doc_freq == 1 and e.total_term_freq == 1:
            j = i
            while (
                j < n
                and entries[j].doc_freq == 1
                and entries[j].total_term_freq == 1
            ):
                j += 1
            run = j - i
            if run >= 2:
                write_vint(((run - 1) << 1) | 1, stats)
                i = j
                continue
            write_vint(1 << 1, stats)
            if flags.has_freqs:
                write_vint(0, stats)
            i += 1
        else:
            write_vint(e.doc_freq << 1, stats)
            if flags.has_freqs:
                write_vint(e.total_term_freq - e.doc_freq, stats)
            i += 1

    postings = bytearray()
    prev = BlockTermState()
    for e in entries:
        share_fp = (
            e.doc_start_fp == prev.doc_start_fp
            and e.singleton_doc_id is not None
            and prev.singleton_doc_id is not None
            and e.singleton_doc_id >= prev.singleton_doc_id
        )
        if share_fp:
            write_vint(
                ((e.singleton_doc_id - prev.singleton_doc_id) << 1) | 1,
                postings,
            )
        else:
            delta = e.doc_start_fp - prev.doc_start_fp
            if delta < 0:
                raise ValueError("doc fps must be non-decreasing")
            write_vint(delta << 1, postings)
            if e.doc_freq == 1:
                if e.singleton_doc_id is None:
                    raise ValueError("df=1 with has_doc_start_fp needs a singleton id")
                write_vint(e.singleton_doc_id, postings)
        if flags.has_positions:
            d = e.pos_start_fp - prev.pos_start_fp
            if d < 0:
                raise ValueError("pos fps must be non-decreasing")
            write_vint(d, postings)
        if flags.has_positions and (flags.has_offsets or flags.has_payloads):
            d = e.pay_start_fp - prev.pay_start_fp
            if d < 0:
                raise ValueError("pay fps must be non-decreasing")
            write_vint(d, postings)
        if e.total_term_freq > 128:
            if e.last_pos_block_offset is None:
                raise ValueError("ttf > 128 needs last_pos_block_offset")
            write_vint(e.last_pos_block_offset, postings)
        if e.doc_freq > 128:
            if e.skip_offset is None:
                raise ValueError("df > 128 needs skip_offset")
            write_vint(e.skip_offset, postings)
        prev = replace(
            prev,
            doc_start_fp=e.doc_start_fp,
            pos_start_fp=e.pos_start_fp,
            pay_start_fp=e.pay_start_fp,
            # the reader decodes singleton_doc_id = None for df > 1
            # terms, so the delta chain can only continue from a df=1
            # predecessor — mirror that or the deltas desync
            singleton_doc_id=e.singleton_doc_id if e.doc_freq == 1 else None,
        )

    write_vint(len(stats), out)
    out += stats
    write_vint(len(postings), out)
    out += postings
    return bytes(out)


def expected_state(
    entries: list[TermEntry], limit: int, flags: FieldFlags
) -> BlockTermState:
    """Transparent model of what seek at entries[limit] must return —
    written directly from the reader's CONTRACT (absolute fps of the
    target term; run/delta encodings are the wire's business), so the
    round-trip test is writer grammar -> reader decode -> this."""
    e = entries[limit]
    return BlockTermState(
        doc_freq=e.doc_freq,
        total_term_freq=e.total_term_freq,
        metadata_upto=limit + 1,
        doc_start_fp=e.doc_start_fp,
        pos_start_fp=e.pos_start_fp if flags.has_positions else 0,
        pay_start_fp=e.pay_start_fp
        if flags.has_positions and (flags.has_offsets or flags.has_payloads)
        else 0,
        singleton_doc_id=e.singleton_doc_id if e.doc_freq == 1 else None,
        last_pos_block_offset=e.last_pos_block_offset
        if e.total_term_freq > 128
        else None,
        skip_offset=e.skip_offset if e.doc_freq > 128 else None,
    )
