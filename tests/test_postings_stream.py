"""Lucene84 .doc postings-stream interop: grammar-inverse round-trips
for the read path the reference stubs
(codec/lucene_84_postings_reader.ml:51-53), skip-list advance proofs
(blocks before the target block are never decoded), and the composed
seek -> postings walk over a full synthesized directory.

No Spark involved; pure byte-level tests.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ocaml_lucene_spark.interop.data_input import DataInput
from ocaml_lucene_spark.interop.open_index import open_index
from ocaml_lucene_spark.interop.postings_stream import (
    BLOCK_SIZE,
    DocStreamReader,
    PosStreamReader,
    SkipListReader,
    read_term_positions,
    read_term_postings,
    read_term_postings_and_positions,
    write_doc_stream,
    write_postings_streams,
)
from ocaml_lucene_spark.interop.segment_meta import check_index_header
from ocaml_lucene_spark.interop.terms_block import (
    BlockTermState,
    FieldFlags,
    TermEntry,
)
from test_open_index import SEG_ID, TITLE_FLAGS, _synth_dir

FLAGS = FieldFlags(has_freqs=True, has_positions=False)
NO_FREQS = FieldFlags(has_freqs=False, has_positions=False)


def _gen_postings(rng: random.Random, df: int, max_doc_gap: int = 50):
    deltas = np.array(
        [rng.randint(1, max_doc_gap) for _ in range(df)], dtype=np.int64
    )
    docs = np.cumsum(deltas)
    freqs = np.array(
        [1 if rng.random() < 0.6 else rng.randint(2, 400) for _ in range(df)],
        dtype=np.int64,
    )
    return docs, freqs


def _state(meta: dict, docs, freqs, flags=FLAGS) -> BlockTermState:
    return BlockTermState(
        doc_freq=int(len(docs)),
        total_term_freq=int(freqs.sum()) if flags.has_freqs else int(len(docs)),
        doc_start_fp=meta["doc_start_fp"],
        skip_offset=meta["skip_offset"],
        singleton_doc_id=meta["singleton_doc_id"],
    )


@pytest.mark.parametrize(
    "df",
    [1, 2, 5, 127, 128, 129, 256, 300, 600, 1024, 2000, 8192, 9000],
    # 9000 docs = 70 skip points -> a 2-level list; 2000 -> 15 points.
    # 256/1024/8192 pin the EXACT-multiple-of-128 contract: the final
    # block has no skip point, so the counts are 1/7/63 — NOT 2/8/64
    # (8 and 64 cross a power-of-8 and would change the level count,
    # desyncing writer and reader; regression for that bug)
)
def test_doc_stream_roundtrip(df):
    rng = random.Random(df)
    docs, freqs = _gen_postings(rng, df)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID)
    check_index_header(
        DataInput(data), "Lucene84PostingsWriterDoc", 0, 1, SEG_ID,
        b"Lucene84_0",
    )
    got_docs, got_freqs = read_term_postings(
        data, _state(metas[0], docs, freqs), FLAGS
    )
    np.testing.assert_array_equal(got_docs, docs)
    np.testing.assert_array_equal(got_freqs, freqs)
    # skip data present exactly when df > 128 (the .tim skip_offset
    # presence contract, terms_block.decode_metadata)
    assert (metas[0]["skip_offset"] is not None) == (df > BLOCK_SIZE)
    assert (metas[0]["singleton_doc_id"] is not None) == (df == 1)


def test_doc_stream_roundtrip_no_freqs():
    rng = random.Random(7)
    docs, _ = _gen_postings(rng, 500)
    data, metas = write_doc_stream([(docs, None)], SEG_ID, has_freqs=False)
    got_docs, got_freqs = read_term_postings(
        data, _state(metas[0], docs, np.ones(500, dtype=np.int64), NO_FREQS),
        NO_FREQS,
    )
    np.testing.assert_array_equal(got_docs, docs)
    assert got_freqs is None


def test_multi_term_stream_fps_are_independent():
    rng = random.Random(3)
    terms = [_gen_postings(rng, df) for df in (300, 1, 40, 129)]
    data, metas = write_doc_stream(terms, SEG_ID)
    for (docs, freqs), meta in zip(terms, metas):
        got_docs, got_freqs = read_term_postings(
            data, _state(meta, docs, freqs), FLAGS
        )
        np.testing.assert_array_equal(got_docs, docs)
        np.testing.assert_array_equal(got_freqs, freqs)


def test_skip_advance_decodes_only_needed_blocks():
    rng = random.Random(42)
    df = 2000  # 15 full blocks + tail, one skip level
    docs, freqs = _gen_postings(rng, df)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID)
    state = _state(metas[0], docs, freqs)
    # target inside block 11: blocks 0..10 must never be decoded
    target = int(docs[11 * BLOCK_SIZE + 17])
    decoded = []
    got_docs, got_freqs = read_term_postings(
        data, state, FLAGS, target=target, _decode_counter=decoded
    )
    assert decoded and min(decoded) == 11
    # result = exact suffix of the full postings from block 11 on
    np.testing.assert_array_equal(got_docs, docs[11 * BLOCK_SIZE :])
    np.testing.assert_array_equal(got_freqs, freqs[11 * BLOCK_SIZE :])


def test_skip_advance_multi_level_fuzz():
    """9000-doc term -> 70 points -> 2 levels; random targets must
    always produce the exact block-aligned suffix."""
    rng = random.Random(9)
    df = 9000
    docs, freqs = _gen_postings(rng, df)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID)
    state = _state(metas[0], docs, freqs)
    for trial in range(25):
        i = rng.randrange(df)
        target = int(docs[i]) + rng.choice([0, 1, -1])
        got_docs, _ = read_term_postings(data, state, FLAGS, target=target)
        # expected start: skip every full block whose last doc < target
        n_full = df // BLOCK_SIZE
        first_block = 0
        while (
            first_block < n_full
            and int(docs[(first_block + 1) * BLOCK_SIZE - 1]) < target
        ):
            first_block += 1
        np.testing.assert_array_equal(
            got_docs, docs[first_block * BLOCK_SIZE :], err_msg=f"trial {trial}"
        )
        # the advance contract: every doc >= target survives the skip
        if target <= int(docs[-1]):
            j = int(np.searchsorted(got_docs, target))
            assert int(got_docs[j]) >= target


@pytest.mark.parametrize("df", [1024, 8192])
def test_skip_advance_exact_block_multiple(df):
    """df an exact multiple of 128 whose block count crosses a power
    of 8 (1024 -> 8 blocks, 8192 -> 64): the final block carries no
    skip point, so the reader's (df-1)//128 sizing matches the writer.
    Targeted reads — including past the last skip point — must return
    the exact block-aligned suffix (the old writer emitted df//128
    points here, which flipped the level count and made every targeted
    read misparse)."""
    rng = random.Random(df)
    docs, freqs = _gen_postings(rng, df)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID)
    state = _state(metas[0], docs, freqs)
    n_blocks = df // BLOCK_SIZE
    for i in (0, 5, df // 2, df - 129, df - 1):
        target = int(docs[i])
        got_docs, got_freqs = read_term_postings(data, state, FLAGS, target=target)
        first_block = 0
        while (
            first_block < n_blocks - 1
            and int(docs[(first_block + 1) * BLOCK_SIZE - 1]) < target
        ):
            first_block += 1
        np.testing.assert_array_equal(got_docs, docs[first_block * BLOCK_SIZE :])
        np.testing.assert_array_equal(got_freqs, freqs[first_block * BLOCK_SIZE :])


def test_skip_advance_mid_stream_term():
    """The level-0 bound: a term's skip list is bounded by its ENTRY
    COUNT, never end-of-file. For a term followed by more terms in the
    same .doc stream, a targeted read past its last skip point must not
    parse the next term's bytes as skip entries (the old reader ran
    level 0 to EOF and silently returned garbage doc ids here)."""
    rng = random.Random(17)
    terms = [_gen_postings(rng, df) for df in (300, 400, 1024, 600)]
    data, metas = write_doc_stream(terms, SEG_ID)
    for (docs, freqs), meta in zip(terms, metas):
        df = len(docs)
        state = _state(meta, docs, freqs)
        n_blocks = df // BLOCK_SIZE
        # targets landing in every block, incl. the last doc (past the
        # final skip point) and beyond the term entirely
        targets = [int(docs[b * BLOCK_SIZE]) for b in range(n_blocks)]
        targets += [int(docs[-1]), int(docs[-1]) + 1]
        for target in targets:
            got_docs, got_freqs = read_term_postings(
                data, state, FLAGS, target=target
            )
            first_block = 0
            while (
                first_block < n_blocks
                and (first_block + 1) * BLOCK_SIZE <= df
                and int(docs[(first_block + 1) * BLOCK_SIZE - 1]) < target
            ):
                first_block += 1
            first_block = min(first_block, max(n_blocks - 1, 0) if df % BLOCK_SIZE == 0 else n_blocks)
            np.testing.assert_array_equal(
                got_docs, docs[first_block * BLOCK_SIZE :],
                err_msg=f"df={df} target={target}",
            )
            np.testing.assert_array_equal(
                got_freqs, freqs[first_block * BLOCK_SIZE :]
            )


def test_skip_list_grammar_checks_reject_corruption():
    rng = random.Random(13)
    docs, freqs = _gen_postings(rng, 9000)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID)
    skip_pos = metas[0]["doc_start_fp"] + metas[0]["skip_offset"]
    n_points = (9000 - 1) // BLOCK_SIZE
    SkipListReader(data, skip_pos, n_points)  # clean parse
    corrupted = bytearray(data)
    # flip a byte inside the top level's first entry (doc delta vint)
    ln_pos = skip_pos
    from ocaml_lucene_spark.codecs.varint import read_vint

    _ln, first_entry = read_vint(corrupted, ln_pos)
    corrupted[first_entry] ^= 0x01
    with pytest.raises(ValueError, match="skip level"):
        SkipListReader(bytes(corrupted), skip_pos, n_points)


def test_writer_rejects_bad_input():
    with pytest.raises(ValueError, match="ascending"):
        write_doc_stream(
            [(np.array([5, 5, 9]), np.array([1, 1, 1]))], SEG_ID
        )
    with pytest.raises(ValueError, match="freqs"):
        write_doc_stream(
            [(np.array([1, 2]), np.array([1, 0]))], SEG_ID
        )


def test_doc_stream_reader_checks_header():
    rng = random.Random(1)
    docs, freqs = _gen_postings(rng, 10)
    data, _ = write_doc_stream([(docs, freqs)], SEG_ID)
    DocStreamReader(data, SEG_ID)
    with pytest.raises(ValueError, match="segment id mismatch"):
        DocStreamReader(data, bytes(16))


# -- composed: seek_exact -> .doc walk over a full directory ----------


def test_open_index_seek_then_postings(tmp_path):
    """The read path the reference's app never reached: open the
    directory, seek each term to its Block_term_state, then walk its
    .doc postings — singleton, tail-only, one-block+tail, and
    skip-listed terms all through the same composition."""
    rng = random.Random(21)
    names = [b"apple", b"apply", b"apq", b"apqx", b"bat", b"bats"]
    dfs = [300, 1, 130, 5, 600, 127]
    postings = {}
    stream_terms = []
    for name, df in zip(names, dfs):
        docs, freqs = _gen_postings(rng, df)
        postings[name] = (docs, freqs)
        stream_terms.append((docs, freqs))
    doc_bytes, metas = write_doc_stream(stream_terms, SEG_ID)

    def entry(i: int, suffix: bytes) -> TermEntry:
        docs, freqs = postings[names[i]]
        ttf = int(freqs.sum())
        return TermEntry(
            suffix,
            doc_freq=len(docs),
            total_term_freq=ttf,
            doc_start_fp=metas[i]["doc_start_fp"],
            singleton_doc_id=metas[i]["singleton_doc_id"],
            skip_offset=metas[i]["skip_offset"],
            # the .tim grammar carries this whenever ttf > 128 (a pos-
            # stream fp; opaque to the .doc walk — reference quirk
            # pinned in terms_block._decode_postings_term)
            last_pos_block_offset=0 if ttf > 128 else None,
        )

    blocks = (
        [entry(0, b"ple"), entry(1, b"ply")],
        [entry(2, b"q"), entry(3, b"qx")],
        [entry(4, b"t"), entry(5, b"ts")],
    )
    d = _synth_dir(tmp_path, blocks=blocks, doc_bytes=doc_bytes)
    index = open_index(d)
    for name in names:
        hits = index.postings("title", name)
        assert len(hits) == 1
        seg_name, docs, freqs = hits[0]
        assert seg_name == "_0"
        np.testing.assert_array_equal(docs, postings[name][0])
        np.testing.assert_array_equal(freqs, postings[name][1])
    # targeted walk through the skip list of the 600-doc term
    docs, _ = postings[b"bat"]
    target = int(docs[3 * 128 + 5])
    (_, got, _), = index.postings("title", b"bat", target=target)
    np.testing.assert_array_equal(got, docs[3 * 128 :])
    assert index.postings("title", b"nothere") == []


# -- .pos stream: the positions read path (same stub, same model) -----


PFLAGS = FieldFlags(has_freqs=True, has_positions=True)


def _gen_positions(rng: random.Random, df: int, max_per_doc: int):
    docs = np.cumsum(
        [rng.randint(1, 50) for _ in range(df)]
    ).astype(np.int64)
    positions = [
        np.cumsum(
            [rng.randint(1, 30) for _ in range(rng.randint(1, max_per_doc))]
        ).astype(np.int64)
        for _ in range(df)
    ]
    return docs, positions


def _pos_state(meta: dict, df: int, ttf: int) -> BlockTermState:
    return BlockTermState(
        doc_freq=df,
        total_term_freq=ttf,
        doc_start_fp=meta["doc_start_fp"],
        skip_offset=meta["skip_offset"],
        singleton_doc_id=meta["singleton_doc_id"],
        pos_start_fp=meta["pos_start_fp"],
        last_pos_block_offset=meta["last_pos_block_offset"],
    )


@pytest.mark.parametrize(
    "df,max_per_doc",
    # shapes: singleton with a multi-block pos stream, tail-only,
    # exactly one pos block, block+tail, multi-block, skip-listed term
    [(1, 3), (1, 500), (5, 5), (128, 1), (129, 1), (300, 4), (2000, 6)],
)
def test_pos_stream_roundtrip(df, max_per_doc):
    rng = random.Random(df * 31 + max_per_doc)
    docs, positions = _gen_positions(rng, df, max_per_doc)
    doc_b, pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    check_index_header(
        DataInput(pos_b), "Lucene84PostingsWriterPos", 0, 1, SEG_ID,
        b"Lucene84_0",
    )
    ttf = sum(len(p) for p in positions)
    state = _pos_state(metas[0], df, ttf)
    got_docs, got_freqs = read_term_postings(doc_b, state, PFLAGS)
    np.testing.assert_array_equal(got_docs, docs)
    np.testing.assert_array_equal(
        got_freqs, np.array([len(p) for p in positions], dtype=np.int64)
    )
    got_pos = read_term_positions(pos_b, state, got_freqs)
    assert len(got_pos) == df
    for g, p in zip(got_pos, positions):
        np.testing.assert_array_equal(g, p)
    # the .tim-side contract (terms_enumerator.ml:154-157): the tail fp
    # is carried exactly when ttf > 128
    assert (metas[0]["last_pos_block_offset"] is not None) == (ttf > BLOCK_SIZE)


def test_pos_exact_block_multiple_has_empty_tail():
    # ttf = 256 exactly: two packed blocks, empty vint tail; the tail
    # fp still points at the end of the packed region (ttf > 128)
    rng = random.Random(4)
    df = 128
    docs = np.cumsum([rng.randint(1, 9) for _ in range(df)]).astype(np.int64)
    positions = [
        np.cumsum([rng.randint(1, 5), rng.randint(1, 5)]).astype(np.int64)
        for _ in range(df)
    ]
    doc_b, pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    state = _pos_state(metas[0], df, 256)
    _, freqs = read_term_postings(doc_b, state, PFLAGS)
    got = read_term_positions(pos_b, state, freqs)
    for g, p in zip(got, positions):
        np.testing.assert_array_equal(g, p)


def test_multi_term_pos_fps_are_independent():
    rng = random.Random(6)
    terms = [_gen_positions(rng, df, 4) for df in (300, 1, 40, 129)]
    doc_b, pos_b, metas = write_postings_streams(terms, SEG_ID)
    for (docs, positions), meta in zip(terms, metas):
        ttf = sum(len(p) for p in positions)
        state = _pos_state(meta, len(docs), ttf)
        got_docs, got_freqs = read_term_postings(doc_b, state, PFLAGS)
        np.testing.assert_array_equal(got_docs, docs)
        got_pos = read_term_positions(pos_b, state, got_freqs)
        for g, p in zip(got_pos, positions):
            np.testing.assert_array_equal(g, p)


def test_pos_skip_resume_never_decodes_earlier_blocks():
    """The .doc skip entries' (pos_fp, pos_upto) resume state: a
    targeted doc+pos walk decodes exactly the pos blocks from the
    resume block on — blocks holding only skipped docs' positions are
    never touched."""
    rng = random.Random(42)
    df = 2000
    docs, positions = _gen_positions(rng, df, 6)
    doc_b, pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    freqs_full = np.array([len(p) for p in positions], dtype=np.int64)
    ttf = int(freqs_full.sum())
    state = _pos_state(metas[0], df, ttf)
    target = int(docs[11 * BLOCK_SIZE + 17])
    ctr: list = []
    got_docs, got_freqs, got_pos = read_term_postings_and_positions(
        doc_b, pos_b, state, PFLAGS, target=target, _pos_decode_counter=ctr
    )
    np.testing.assert_array_equal(got_docs, docs[11 * BLOCK_SIZE :])
    np.testing.assert_array_equal(got_freqs, freqs_full[11 * BLOCK_SIZE :])
    for g, p in zip(got_pos, positions[11 * BLOCK_SIZE :]):
        np.testing.assert_array_equal(g, p)
    # exactness: positions of skipped docs fill floor(skipped/128)
    # packed blocks that must never decode
    skipped = int(freqs_full[: 11 * BLOCK_SIZE].sum())
    expected = ttf // BLOCK_SIZE - skipped // BLOCK_SIZE
    assert len(ctr) == expected, (len(ctr), expected)


def test_composed_walk_parses_skip_list_once(monkeypatch):
    """read_term_postings_and_positions shares ONE skip advance across
    both streams: exactly one SkipListReader is constructed per
    targeted lookup (the advance is O(df/128) vint parsing — paying it
    twice doubled every positions lookup)."""
    import ocaml_lucene_spark.interop.postings_stream as ps

    rng = random.Random(8)
    df = 1500
    docs, positions = _gen_positions(rng, df, 4)
    doc_b, pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    ttf = sum(len(p) for p in positions)
    state = _pos_state(metas[0], df, ttf)
    calls = []
    real = ps.SkipListReader

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(ps, "SkipListReader", counting)
    target = int(docs[5 * BLOCK_SIZE + 3])
    read_term_postings_and_positions(doc_b, pos_b, state, PFLAGS, target=target)
    assert len(calls) == 1


def test_pos_skip_resume_fuzz_matches_full_decode():
    rng = random.Random(9)
    df = 1500
    docs, positions = _gen_positions(rng, df, 5)
    doc_b, pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    ttf = sum(len(p) for p in positions)
    state = _pos_state(metas[0], df, ttf)
    for trial in range(15):
        i = rng.randrange(df)
        target = int(docs[i]) + rng.choice([0, 1, -1])
        got_docs, _, got_pos = read_term_postings_and_positions(
            doc_b, pos_b, state, PFLAGS, target=target
        )
        start = df - len(got_docs)
        np.testing.assert_array_equal(got_docs, docs[start:], err_msg=f"t{trial}")
        for g, p in zip(got_pos, positions[start:]):
            np.testing.assert_array_equal(g, p, err_msg=f"t{trial}")


def test_pos_skip_grammar_checks_reject_corruption():
    # a corrupted pos_fp delta in an upper skip level breaks the
    # cross-level agreement the reader verifies
    rng = random.Random(13)
    df = 9000
    docs, positions = _gen_positions(rng, df, 2)
    doc_b, _pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    skip_pos = metas[0]["doc_start_fp"] + metas[0]["skip_offset"]
    n_points = (df - 1) // BLOCK_SIZE
    SkipListReader(doc_b, skip_pos, n_points, has_positions=True)  # clean
    from ocaml_lucene_spark.codecs.varint import read_vint as _rv

    corrupted = bytearray(doc_b)
    _ln, p = _rv(corrupted, skip_pos)  # top level length
    _dd, p = _rv(corrupted, p)  # doc delta
    _fd, p = _rv(corrupted, p)  # doc fp delta
    corrupted[p] ^= 0x01  # pos fp delta of the first top-level entry
    with pytest.raises(ValueError, match="skip level"):
        SkipListReader(bytes(corrupted), skip_pos, n_points, has_positions=True)


def test_pos_writer_rejects_bad_input():
    with pytest.raises(ValueError, match="position"):
        write_postings_streams(
            [(np.array([1, 2]), [np.array([3]), np.array([], dtype=np.int64)])],
            SEG_ID,
        )
    with pytest.raises(ValueError, match="ascending"):
        write_postings_streams(
            [(np.array([1, 2]), [np.array([3]), np.array([7, 7])])], SEG_ID
        )
    with pytest.raises(ValueError, match="one position array per doc"):
        write_postings_streams([(np.array([1, 2]), [np.array([3])])], SEG_ID)


def test_pos_stream_reader_checks_header():
    rng = random.Random(2)
    docs, positions = _gen_positions(rng, 10, 3)
    doc_b, pos_b, _ = write_postings_streams([(docs, positions)], SEG_ID)
    PosStreamReader(pos_b, SEG_ID)
    with pytest.raises(ValueError, match="segment id mismatch"):
        PosStreamReader(pos_b, bytes(16))
    # a .doc stream is NOT a .pos stream (codec name mismatch) — the
    # check the reference means to do at lucene_84_postings_reader.ml:32
    # but runs against doc_in (its quirk; we check the real stream)
    with pytest.raises(ValueError, match="codec"):
        PosStreamReader(doc_b, SEG_ID)


def test_positions_require_position_flags():
    rng = random.Random(3)
    docs, positions = _gen_positions(rng, 5, 2)
    doc_b, pos_b, metas = write_postings_streams([(docs, positions)], SEG_ID)
    state = _pos_state(metas[0], 5, sum(len(p) for p in positions))
    with pytest.raises(ValueError, match="no positions"):
        read_term_postings_and_positions(doc_b, pos_b, state, FLAGS)


def test_open_index_positions_composed(tmp_path):
    """seek_exact -> .doc -> .pos over a full directory: the golden
    .fnm has no positions-enabled field (all DOCS/DOCS_AND_FREQS), so
    the .tim is written under positions flags and the opened field
    reader's flags are swapped to match — everything else (golden
    .si/.fnm, manifest, headers) is the standard composition."""
    import dataclasses

    rng = random.Random(55)
    names = [b"apple", b"apply", b"apq", b"apqx", b"bat", b"bats"]
    dfs = [300, 1, 130, 5, 600, 127]
    data = {}
    stream_terms = []
    for name, df in zip(names, dfs):
        docs, positions = _gen_positions(rng, df, 4)
        data[name] = (docs, positions)
        stream_terms.append((docs, positions))
    doc_bytes, pos_bytes, metas = write_postings_streams(stream_terms, SEG_ID)

    def entry(i: int, suffix: bytes) -> TermEntry:
        docs, positions = data[names[i]]
        return TermEntry(
            suffix,
            doc_freq=len(docs),
            total_term_freq=sum(len(p) for p in positions),
            doc_start_fp=metas[i]["doc_start_fp"],
            singleton_doc_id=metas[i]["singleton_doc_id"],
            skip_offset=metas[i]["skip_offset"],
            pos_start_fp=metas[i]["pos_start_fp"],
            last_pos_block_offset=metas[i]["last_pos_block_offset"],
        )

    blocks = (
        [entry(0, b"ple"), entry(1, b"ply")],
        [entry(2, b"q"), entry(3, b"qx")],
        [entry(4, b"t"), entry(5, b"ts")],
    )
    from test_open_index import _synth_dir as synth

    d = synth(
        tmp_path,
        blocks=blocks,
        doc_bytes=doc_bytes,
        pos_bytes=pos_bytes,
        flags=PFLAGS,
    )
    index = open_index(d)
    seg = index.segments[0]
    fr = seg.field_readers["title"]
    seg.field_readers["title"] = dataclasses.replace(fr, flags=PFLAGS)
    for name in names:
        hits = index.positions("title", name)
        assert len(hits) == 1
        seg_name, docs, freqs, positions = hits[0]
        assert seg_name == "_0"
        exp_docs, exp_pos = data[name]
        np.testing.assert_array_equal(docs, exp_docs)
        for g, p in zip(positions, exp_pos):
            np.testing.assert_array_equal(g, p)
    # targeted: skip through the 600-doc term, positions aligned
    docs, exp_pos = data[b"bat"]
    target = int(docs[3 * 128 + 5])
    (_, got_docs, _, got_pos), = index.positions("title", b"bat", target=target)
    np.testing.assert_array_equal(got_docs, docs[3 * 128 :])
    for g, p in zip(got_pos, exp_pos[3 * 128 :]):
        np.testing.assert_array_equal(g, p)


# -- .pay stream: payloads/offsets (same stub-completion model) --------


PAYFLAGS = FieldFlags(has_freqs=True, has_positions=True,
                      has_payloads=True, has_offsets=True)
PAYONLY = FieldFlags(has_freqs=True, has_positions=True, has_payloads=True)
OFFONLY = FieldFlags(has_freqs=True, has_positions=True, has_offsets=True)

from ocaml_lucene_spark.interop.postings_stream import (  # noqa: E402
    PayStreamReader,
    read_term_positions_full,
    read_term_postings_positions_payloads,
    write_postings_streams_full,
)


def _gen_full(rng: random.Random, df: int, max_per_doc: int,
              payloads: bool = True, offsets: bool = True):
    """(docs, positions, payloads, offsets) with realistic shapes:
    variable-length payloads incl. empties and runs of equal lengths
    (exercising the changed-bit tail chain), token-ish offsets."""
    docs = np.cumsum([rng.randint(1, 50) for _ in range(df)]).astype(np.int64)
    poss, pays, offs = [], [], []
    for _ in range(df):
        k = rng.randint(1, max_per_doc)
        p = np.cumsum([rng.randint(1, 9) for _ in range(k)]).astype(np.int64)
        poss.append(p)
        if payloads:
            pays.append([
                bytes(rng.randrange(256) for _ in range(
                    rng.choice([0, 1, 1, 4, 4, 4, 11])
                ))
                for _ in range(k)
            ])
        if offsets:
            starts = np.cumsum(
                [rng.randint(0, 14) for _ in range(k)]
            ).astype(np.int64)
            ends = starts + np.array(
                [rng.choice([3, 3, 3, 7]) for _ in range(k)], dtype=np.int64
            )
            offs.append((starts, ends))
    return (docs, poss,
            pays if payloads else None,
            offs if offsets else None)


def _full_state(meta: dict, df: int, ttf: int) -> BlockTermState:
    return BlockTermState(
        doc_freq=df,
        total_term_freq=ttf,
        doc_start_fp=meta["doc_start_fp"],
        skip_offset=meta["skip_offset"],
        singleton_doc_id=meta["singleton_doc_id"],
        pos_start_fp=meta["pos_start_fp"],
        last_pos_block_offset=meta["last_pos_block_offset"],
        pay_start_fp=meta["pay_start_fp"],
    )


def _assert_full_equal(got, want, start=0):
    g_pos, g_pay, g_off = got
    _docs, w_pos, w_pay, w_off = want
    for g, p in zip(g_pos, w_pos[start:]):
        np.testing.assert_array_equal(g, p)
    if w_pay is not None:
        assert [list(x) for x in g_pay] == [list(x) for x in w_pay[start:]]
    if w_off is not None:
        for (gs, ge), (ws, we) in zip(g_off, w_off[start:]):
            np.testing.assert_array_equal(gs, ws)
            np.testing.assert_array_equal(ge, we)


@pytest.mark.parametrize("df,max_per_doc", [
    (1, 3), (1, 400), (5, 5), (60, 2), (128, 1), (129, 1), (300, 4),
    (2000, 6),
])
@pytest.mark.parametrize("flags", [PAYFLAGS, PAYONLY, OFFONLY],
                         ids=["pay+off", "pay", "off"])
def test_pay_stream_roundtrip(df, max_per_doc, flags):
    rng = random.Random(df * 37 + max_per_doc + flags.has_offsets)
    term = _gen_full(rng, df, max_per_doc,
                     payloads=flags.has_payloads, offsets=flags.has_offsets)
    doc_b, pos_b, pay_b, metas = write_postings_streams_full(
        [term], SEG_ID,
        has_payloads=flags.has_payloads, has_offsets=flags.has_offsets,
    )
    check_index_header(
        DataInput(pay_b), "Lucene84PostingsWriterPay", 0, 1, SEG_ID,
        b"Lucene84_0",
    )
    docs, poss = term[0], term[1]
    ttf = sum(len(p) for p in poss)
    state = _full_state(metas[0], df, ttf)
    got_docs, got_freqs = read_term_postings(doc_b, state, flags)
    np.testing.assert_array_equal(got_docs, docs)
    got = read_term_positions_full(pos_b, pay_b, state, got_freqs, flags)
    _assert_full_equal(got, term)
    assert (got[1] is None) == (not flags.has_payloads)
    assert (got[2] is None) == (not flags.has_offsets)


def test_pay_multi_term_fps_are_independent():
    rng = random.Random(11)
    terms = [_gen_full(rng, df, 4) for df in (300, 1, 40, 1024, 129)]
    doc_b, pos_b, pay_b, metas = write_postings_streams_full(terms, SEG_ID)
    for term, meta in zip(terms, metas):
        docs, poss = term[0], term[1]
        ttf = sum(len(p) for p in poss)
        state = _full_state(meta, len(docs), ttf)
        got_docs, got_freqs = read_term_postings(doc_b, state, PAYFLAGS)
        np.testing.assert_array_equal(got_docs, docs)
        got = read_term_positions_full(pos_b, pay_b, state, got_freqs, PAYFLAGS)
        _assert_full_equal(got, term)


def test_pay_skip_resume_never_decodes_earlier_blocks():
    """The skip entries' (pay_fp, pay_upto): a targeted three-stream
    walk decodes exactly the pos blocks (and matching .pay records)
    from the resume block on, and the payload-byte-upto cross-check
    against the resume record's length block passes."""
    rng = random.Random(42)
    df = 2000
    term = _gen_full(rng, df, 6)
    doc_b, pos_b, pay_b, metas = write_postings_streams_full([term], SEG_ID)
    docs, poss = term[0], term[1]
    freqs_full = np.array([len(p) for p in poss], dtype=np.int64)
    ttf = int(freqs_full.sum())
    state = _full_state(metas[0], df, ttf)
    target = int(docs[11 * BLOCK_SIZE + 17])
    ctr: list = []
    got_docs, got_freqs, g_pos, g_pay, g_off = (
        read_term_postings_positions_payloads(
            doc_b, pos_b, pay_b, state, PAYFLAGS, target=target,
            _pos_decode_counter=ctr,
        )
    )
    start = 11 * BLOCK_SIZE
    np.testing.assert_array_equal(got_docs, docs[start:])
    _assert_full_equal((g_pos, g_pay, g_off), term, start=start)
    skipped = int(freqs_full[:start].sum())
    expected = ttf // BLOCK_SIZE - skipped // BLOCK_SIZE
    assert len(ctr) == expected, (len(ctr), expected)


@pytest.mark.parametrize("flags", [PAYFLAGS, PAYONLY, OFFONLY],
                         ids=["pay+off", "pay", "off"])
def test_pay_skip_resume_fuzz_matches_full_decode(flags):
    rng = random.Random(23 + flags.has_payloads)
    df = 1500
    term = _gen_full(rng, df, 5,
                     payloads=flags.has_payloads, offsets=flags.has_offsets)
    doc_b, pos_b, pay_b, metas = write_postings_streams_full(
        [term], SEG_ID,
        has_payloads=flags.has_payloads, has_offsets=flags.has_offsets,
    )
    docs, poss = term[0], term[1]
    ttf = sum(len(p) for p in poss)
    state = _full_state(metas[0], df, ttf)
    for trial in range(12):
        i = rng.randrange(df)
        target = int(docs[i]) + rng.choice([0, 1, -1])
        got_docs, _f, g_pos, g_pay, g_off = (
            read_term_postings_positions_payloads(
                doc_b, pos_b, pay_b, state, flags, target=target
            )
        )
        start = df - len(got_docs)
        np.testing.assert_array_equal(got_docs, docs[start:], err_msg=f"t{trial}")
        _assert_full_equal((g_pos, g_pay, g_off), term, start=start)


def test_pay_skip_grammar_checks_reject_corruption():
    rng = random.Random(13)
    df = 9000
    term = _gen_full(rng, df, 2)
    doc_b, _pos_b, _pay_b, metas = write_postings_streams_full([term], SEG_ID)
    skip_pos = metas[0]["doc_start_fp"] + metas[0]["skip_offset"]
    n_points = (df - 1) // BLOCK_SIZE
    SkipListReader(doc_b, skip_pos, n_points, has_positions=True,
                   has_pay_data=True, has_payloads=True)  # clean
    from ocaml_lucene_spark.codecs.varint import read_vint as _rv

    corrupted = bytearray(doc_b)
    _ln, p = _rv(corrupted, skip_pos)   # top level length
    _dd, p = _rv(corrupted, p)          # doc delta
    _fd, p = _rv(corrupted, p)          # doc fp delta
    _pf, p = _rv(corrupted, p)          # pos fp delta
    _pu, p = _rv(corrupted, p)          # pos upto
    corrupted[p] ^= 0x01                # payload byte upto
    with pytest.raises(ValueError, match="skip level"):
        SkipListReader(bytes(corrupted), skip_pos, n_points,
                       has_positions=True, has_pay_data=True,
                       has_payloads=True)


def test_pay_writer_rejects_bad_input():
    with pytest.raises(ValueError, match="one payload per position"):
        write_postings_streams_full(
            [(np.array([1]), [np.array([2, 5])], [[b"x"]],
              [(np.array([0, 4]), np.array([3, 8]))])],
            SEG_ID,
        )
    with pytest.raises(ValueError, match="end >= start"):
        write_postings_streams_full(
            [(np.array([1]), [np.array([2])], [[b"x"]],
              [(np.array([4]), np.array([3]))])],
            SEG_ID,
        )
    with pytest.raises(ValueError, match="plain positions"):
        write_postings_streams_full(
            [], SEG_ID, has_payloads=False, has_offsets=False
        )


def test_pay_stream_reader_checks_header():
    rng = random.Random(2)
    term = _gen_full(rng, 10, 3)
    doc_b, _pos_b, pay_b, _ = write_postings_streams_full([term], SEG_ID)
    PayStreamReader(pay_b, SEG_ID)
    with pytest.raises(ValueError, match="segment id mismatch"):
        PayStreamReader(pay_b, bytes(16))
    with pytest.raises(ValueError, match="codec"):
        PayStreamReader(doc_b, SEG_ID)


def test_open_index_positions_with_payloads_composed(tmp_path):
    """seek_exact -> .doc -> .pos -> .pay over a full directory (the
    three files the reference's create opens,
    lucene_84_postings_reader.ml:24-44), flags swapped onto the golden
    .fnm field as in the positions composition test."""
    import dataclasses

    rng = random.Random(77)
    names = [b"apple", b"apply", b"apq", b"apqx", b"bat", b"bats"]
    dfs = [300, 1, 130, 5, 600, 127]
    data = {}
    stream_terms = []
    for name, df in zip(names, dfs):
        term = _gen_full(rng, df, 4)
        data[name] = term
        stream_terms.append(term)
    doc_bytes, pos_bytes, pay_bytes, metas = write_postings_streams_full(
        stream_terms, SEG_ID
    )

    def entry(i: int, suffix: bytes) -> TermEntry:
        docs, poss, _pays, _offs = data[names[i]]
        return TermEntry(
            suffix,
            doc_freq=len(docs),
            total_term_freq=sum(len(p) for p in poss),
            doc_start_fp=metas[i]["doc_start_fp"],
            singleton_doc_id=metas[i]["singleton_doc_id"],
            skip_offset=metas[i]["skip_offset"],
            pos_start_fp=metas[i]["pos_start_fp"],
            last_pos_block_offset=metas[i]["last_pos_block_offset"],
            pay_start_fp=metas[i]["pay_start_fp"],
        )

    blocks = (
        [entry(0, b"ple"), entry(1, b"ply")],
        [entry(2, b"q"), entry(3, b"qx")],
        [entry(4, b"t"), entry(5, b"ts")],
    )
    from test_open_index import _synth_dir as synth

    d = synth(
        tmp_path,
        blocks=blocks,
        doc_bytes=doc_bytes,
        pos_bytes=pos_bytes,
        pay_bytes=pay_bytes,
        flags=PAYFLAGS,
    )
    index = open_index(d)
    seg = index.segments[0]
    fr = seg.field_readers["title"]
    seg.field_readers["title"] = dataclasses.replace(fr, flags=PAYFLAGS)
    assert "pay_reader" not in seg.__dict__  # lazy like .doc/.pos
    for name in names:
        hits = index.positions_with_payloads("title", name)
        assert len(hits) == 1
        seg_name, docs, _freqs, g_pos, g_pay, g_off = hits[0]
        assert seg_name == "_0"
        np.testing.assert_array_equal(docs, data[name][0])
        _assert_full_equal((g_pos, g_pay, g_off), data[name])
    # targeted: skip through the 600-doc term, all three streams aligned
    docs = data[b"bat"][0]
    target = int(docs[3 * 128 + 5])
    (_, got_docs, _f, g_pos, g_pay, g_off), = index.positions_with_payloads(
        "title", b"bat", target=target
    )
    np.testing.assert_array_equal(got_docs, docs[3 * 128 :])
    _assert_full_equal((g_pos, g_pay, g_off), data[b"bat"], start=3 * 128)


# -- skip-entry impacts: competitive (freq, norm) pairs ----------------


from ocaml_lucene_spark.interop.postings_stream import (  # noqa: E402
    competitive_pairs,
)


def test_competitive_pairs_properties():
    rng = random.Random(3)
    for trial in range(50):
        n = rng.randint(1, 200)
        freqs = [rng.randint(1, 30) for _ in range(n)]
        norms = [rng.randint(1, 40) for _ in range(n)]
        pairs = competitive_pairs(freqs, norms)
        # strictly ascending in BOTH fields (Lucene's serialize assert)
        assert all(
            a[0] < b[0] and a[1] < b[1] for a, b in zip(pairs, pairs[1:])
        )
        # dominance: every doc is covered by a pair with freq >= and
        # norm <= (the block-max bound contract)
        for f, m in zip(freqs, norms):
            assert any(pf >= f and pn <= m for pf, pn in pairs), (f, m, pairs)
        # minimality: no pair is dominated by another
        for i, a in enumerate(pairs):
            assert not any(
                j != i and b[0] >= a[0] and b[1] <= a[1]
                for j, b in enumerate(pairs)
            )


def test_skip_impacts_roundtrip_and_union_invariant():
    """Norm-carrying writer: every skip entry's impacts decode to the
    exact competitive set of its span, and the reader's cross-level
    union check passes on a 3-level list (9000 docs, 70 points:
    70 >= 8^2)."""
    rng = random.Random(29)
    df = 9000
    docs, freqs = _gen_postings(rng, df)
    norms = np.array([rng.randint(1, 60) for _ in range(df)], dtype=np.int64)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID, norms=[norms])
    state = _state(metas[0], docs, freqs)
    n_points = (df - 1) // BLOCK_SIZE
    sk = SkipListReader(
        data, metas[0]["doc_start_fp"] + metas[0]["skip_offset"], n_points
    )
    assert len(sk.impacts[0]) == n_points and len(sk.impacts) == 3
    for i in range(n_points):
        sl = slice(i * BLOCK_SIZE, (i + 1) * BLOCK_SIZE)
        assert sk.impacts[0][i] == competitive_pairs(freqs[sl], norms[sl])
    # targeted reads still exact with impact bytes in the entries
    for i in (5, df // 2, df - 1):
        target = int(docs[i])
        got_docs, _ = read_term_postings(data, state, FLAGS, target=target)
        start = df - len(got_docs)
        np.testing.assert_array_equal(got_docs, docs[start:])


def test_skip_impacts_corrupt_union_rejected():
    rng = random.Random(31)
    df = 9000
    docs, freqs = _gen_postings(rng, df)
    norms = np.array([rng.randint(1, 60) for _ in range(df)], dtype=np.int64)
    data, metas = write_doc_stream([(docs, freqs)], SEG_ID, norms=[norms])
    skip_pos = metas[0]["doc_start_fp"] + metas[0]["skip_offset"]
    n_points = (df - 1) // BLOCK_SIZE
    SkipListReader(data, skip_pos, n_points)  # clean
    from ocaml_lucene_spark.codecs.varint import read_vint as _rv

    # corrupt the first impact byte of the TOP level's first entry:
    # impacts follow (doc delta, fp delta, impact len) at level > 0
    corrupted = bytearray(data)
    _ln, p = _rv(corrupted, skip_pos)
    _dd, p = _rv(corrupted, p)
    _fd, p = _rv(corrupted, p)
    il, p = _rv(corrupted, p)
    assert il > 0
    corrupted[p] ^= 0x02  # flip a freq-delta bit, keeps vint length
    with pytest.raises(ValueError, match="skip level"):
        SkipListReader(bytes(corrupted), skip_pos, n_points)


def test_skip_impacts_with_positions_and_payloads():
    """Impacts compose with the pos/pay skip fields (full entry
    grammar: doc, fp, pos, pay, impacts, child)."""
    rng = random.Random(37)
    df = 2000
    term = _gen_full(rng, df, 4)
    norms = np.array(
        [len(p) * 7 + 1 for p in term[1]], dtype=np.int64
    )  # dl-ish norm
    doc_b, pos_b, pay_b, metas = write_postings_streams_full(
        [term], SEG_ID, norms=[norms]
    )
    docs, poss = term[0], term[1]
    ttf = sum(len(p) for p in poss)
    state = _full_state(metas[0], df, ttf)
    target = int(docs[7 * BLOCK_SIZE + 3])
    got_docs, _f, g_pos, g_pay, g_off = read_term_postings_positions_payloads(
        doc_b, pos_b, pay_b, state, PAYFLAGS, target=target
    )
    start = df - len(got_docs)
    np.testing.assert_array_equal(got_docs, docs[start:])
    _assert_full_equal((g_pos, g_pay, g_off), term, start=start)
    sk = SkipListReader(
        doc_b, metas[0]["doc_start_fp"] + metas[0]["skip_offset"],
        (df - 1) // BLOCK_SIZE, has_positions=True, has_pay_data=True,
        has_payloads=True,
    )
    freqs_full = np.array([len(p) for p in poss], dtype=np.int64)
    for i, pairs in enumerate(sk.impacts[0]):
        sl = slice(i * BLOCK_SIZE, (i + 1) * BLOCK_SIZE)
        assert pairs == competitive_pairs(freqs_full[sl], norms[sl])


def test_write_doc_stream_rejects_bad_norms():
    with pytest.raises(ValueError, match="one norm per doc"):
        write_doc_stream(
            [(np.array([1, 2]), np.array([1, 1]))], SEG_ID,
            norms=[np.array([3])],
        )
    with pytest.raises(ValueError, match="norms must be >= 1"):
        write_doc_stream(
            [(np.array([1, 2]), np.array([1, 1]))], SEG_ID,
            norms=[np.array([1, 0])],
        )


def test_pay_skip_resume_lands_exactly_at_tail():
    """Freq-1 docs make doc-block ends hit pos-block boundaries: the
    skip point after doc block 11 (consumed = 1408 = 11*128) resumes
    exactly AT the vint tail (pos_fp == tail start, pay_fp == end of
    packed pay region, upto 0) — the branch where no packed block and
    no pay record is partially consumed."""
    rng = random.Random(51)
    df = 1500  # ttf = 1500: 11 packed pos blocks + 92-position tail
    docs = np.cumsum([rng.randint(1, 9) for _ in range(df)]).astype(np.int64)
    poss = [np.array([rng.randint(0, 50)], dtype=np.int64) for _ in range(df)]
    pays = [[bytes([rng.randrange(256)]) * rng.choice([0, 3])] for _ in range(df)]
    offs = [(np.array([i % 7], dtype=np.int64), np.array([i % 7 + 4], dtype=np.int64))
            for i in range(df)]
    term = (docs, poss, pays, offs)
    doc_b, pos_b, pay_b, metas = write_postings_streams_full([term], SEG_ID)
    state = _full_state(metas[0], df, df)
    # the skip entry after doc block 11 resumes at the tail exactly
    sk = SkipListReader(
        doc_b, metas[0]["doc_start_fp"] + metas[0]["skip_offset"],
        (df - 1) // BLOCK_SIZE, has_positions=True, has_pay_data=True,
        has_payloads=True,
    )
    e = sk.entries[0][10]  # point 11 -> block_index 11 -> docs[1408:]
    assert e[3] == 0  # pos_upto: resume consumed nothing of the tail
    assert e[2] == metas[0]["last_pos_block_offset"]  # pos_fp == tail fp
    assert e[5] == 0  # pay_upto
    # targeted read through that exact point
    target = int(docs[11 * BLOCK_SIZE])
    ctr: list = []
    got_docs, _f, g_pos, g_pay, g_off = read_term_postings_positions_payloads(
        doc_b, pos_b, pay_b, state, PAYFLAGS, target=target,
        _pos_decode_counter=ctr,
    )
    assert ctr == []  # no packed pos block decoded: straight to tail
    start = 11 * BLOCK_SIZE
    np.testing.assert_array_equal(got_docs, docs[start:])
    _assert_full_equal((g_pos, g_pay, g_off), term, start=start)
