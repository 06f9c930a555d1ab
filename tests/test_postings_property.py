"""Hypothesis property tests for the Lucene84 postings interop: ANY
well-formed (docs, positions, payloads, offsets) input round-trips
through the three-stream writer/reader, and ANY target's skipped read
equals the block-aligned suffix of the full decode. Derandomized so CI
is deterministic; the fixed-seed fuzz in test_postings_stream.py
covers the large shapes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from ocaml_lucene_spark.interop.postings_stream import (
    BLOCK_SIZE,
    read_term_postings,
    read_term_postings_positions_payloads,
    write_postings_streams_full,
)
from ocaml_lucene_spark.interop.terms_block import BlockTermState, FieldFlags

SEG_ID = bytes(range(16))
PAYFLAGS = FieldFlags(
    has_freqs=True, has_positions=True, has_payloads=True, has_offsets=True
)


@st.composite
def term_data(draw):
    df = draw(st.integers(min_value=1, max_value=300))
    gaps = draw(
        st.lists(st.integers(1, 9), min_size=df, max_size=df)
    )
    docs = np.cumsum(np.array(gaps, dtype=np.int64))
    poss, pays, offs = [], [], []
    for _ in range(df):
        k = draw(st.integers(1, 3))
        pdeltas = draw(st.lists(st.integers(1, 5), min_size=k, max_size=k))
        p = np.cumsum(np.array(pdeltas, dtype=np.int64))
        poss.append(p)
        pays.append([
            bytes(draw(st.binary(min_size=0, max_size=5))) for _ in range(k)
        ])
        sdeltas = draw(st.lists(st.integers(0, 7), min_size=k, max_size=k))
        starts = np.cumsum(np.array(sdeltas, dtype=np.int64))
        lens = draw(st.lists(st.integers(0, 6), min_size=k, max_size=k))
        offs.append((starts, starts + np.array(lens, dtype=np.int64)))
    return docs, poss, pays, offs


@settings(max_examples=40, derandomize=True, deadline=None)
@given(term=term_data(), target_frac=st.floats(0.0, 1.0))
def test_three_stream_roundtrip_and_skip_property(term, target_frac):
    docs, poss, pays, offs = term
    df = len(docs)
    doc_b, pos_b, pay_b, metas = write_postings_streams_full([term], SEG_ID)
    ttf = sum(len(p) for p in poss)
    state = BlockTermState(
        doc_freq=df,
        total_term_freq=ttf,
        doc_start_fp=metas[0]["doc_start_fp"],
        skip_offset=metas[0]["skip_offset"],
        singleton_doc_id=metas[0]["singleton_doc_id"],
        pos_start_fp=metas[0]["pos_start_fp"],
        last_pos_block_offset=metas[0]["last_pos_block_offset"],
        pay_start_fp=metas[0]["pay_start_fp"],
    )
    # full decode == input
    got_docs, got_freqs = read_term_postings(doc_b, state, PAYFLAGS)
    np.testing.assert_array_equal(got_docs, docs)
    np.testing.assert_array_equal(
        got_freqs, np.array([len(p) for p in poss], dtype=np.int64)
    )
    # targeted decode == block-aligned suffix, all three streams aligned
    target = int(docs[min(int(target_frac * df), df - 1)])
    gd, gf, g_pos, g_pay, g_off = read_term_postings_positions_payloads(
        doc_b, pos_b, pay_b, state, PAYFLAGS, target=target
    )
    start = df - len(gd)
    assert start % BLOCK_SIZE == 0  # suffix is block-aligned
    assert start <= (np.searchsorted(docs, target))  # target survives
    np.testing.assert_array_equal(gd, docs[start:])
    for g, p in zip(g_pos, poss[start:]):
        np.testing.assert_array_equal(g, p)
    assert [list(b) for b in g_pay] == [list(b) for b in pays[start:]]
    for (gs, ge), (ws, we) in zip(g_off, offs[start:]):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(ge, we)
