"""Hypothesis property tests for the Lucene-segment exporter's block
planner + directory writer: ANY sorted vocabulary (small alphabets
force deep shared-prefix trees, floor splits, fillers, 1-byte terms,
terms equal to key prefixes) with ANY well-formed postings exports to
a directory where

- every term of length >= 2 seeks to its exact (df, ttf) and its
  postings round-trip,
- every 1-byte term raises the reference's documented seek crash
  (terms_enumerator.ml:225 parity) while staying fully enumerable,
- every generated NON-term either returns None or raises that same
  crash when it collides with a key — never a wrong hit, never an
  undecodable-pointer error (the prefix-closure guarantee),
- full enumeration reproduces the vocabulary exactly.

Derandomized so CI is deterministic (the repo's Hypothesis
convention); tests/test_export_index.py covers the large fixed-seed
shapes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ocaml_lucene_spark.interop.export_index import (
    plan_blocks,
    write_lucene_directory,
)
from ocaml_lucene_spark.interop.import_index import enumerate_terms
from ocaml_lucene_spark.interop.open_index import open_index

FIELD = "body"


@st.composite
def vocab_and_postings(draw):
    # tiny alphabet -> heavy prefix sharing -> deep keys and fillers
    alphabet = draw(st.sampled_from([b"ab", b"abc", b"abcz"]))
    n_terms = draw(st.integers(2, 60))
    terms = draw(
        st.sets(
            st.text(
                alphabet=[chr(c) for c in alphabet], min_size=1, max_size=7
            ).map(str.encode),
            min_size=2,
            max_size=n_terms,
        )
    )
    terms = sorted(terms)
    postings = []
    doc_top = 0
    for t in terms:
        df = draw(st.integers(1, 8))
        gaps = draw(st.lists(st.integers(1, 5), min_size=df, max_size=df))
        docs = np.cumsum(np.array(gaps, dtype=np.int64)) - 1
        tfs = np.array(
            draw(st.lists(st.integers(1, 4), min_size=df, max_size=df)),
            dtype=np.int64,
        )
        doc_top = max(doc_top, int(docs[-1]))
        postings.append((t, docs, tfs))
    target = draw(st.sampled_from([2, 3, 8, 48]))
    probes = draw(
        st.lists(
            st.text(
                alphabet=[chr(c) for c in alphabet] + ["q"],
                min_size=1,
                max_size=8,
            ).map(str.encode),
            max_size=10,
        )
    )
    return terms, postings, doc_top + 1, target, probes


@given(vocab_and_postings())
@settings(max_examples=60, deadline=None, derandomize=True)
def test_any_vocabulary_exports_and_seeks_exactly(tmp_path_factory, data):
    terms, postings, max_doc, target, probes = data

    # planner invariants hold for any vocabulary
    plans = plan_blocks(terms, target=target)
    keys = [p for p, _r in plans]
    key_set = set(keys)
    for k in keys:
        for i in range(1, len(k)):
            assert k[:i] in key_set  # prefix-closed
    covered = sorted(
        i for _p, runs in plans for lo, hi in runs for i in range(lo, hi)
    )
    assert covered == list(range(len(terms)))

    d = str(tmp_path_factory.mktemp("hyp_export"))
    write_lucene_directory(
        d,
        FIELD,
        postings,
        with_positions=False,
        max_doc=max_doc,
        target_block_terms=target,
    )
    index = open_index(d)
    seg = index.segments[0]

    assert [t for t, _st in enumerate_terms(seg, FIELD)] == terms

    by_term = {t: (docs, tfs) for t, docs, tfs in postings}
    for t, (docs, tfs) in by_term.items():
        if len(t) == 1:
            with pytest.raises(NotImplementedError):
                seg.seek_exact(FIELD, t)
            continue
        st_ = seg.seek_exact(FIELD, t)
        assert st_ is not None and st_.doc_freq == docs.size
        assert st_.total_term_freq == int(tfs.sum())
        (_s, got_d, got_f), = index.postings(FIELD, t)
        assert np.array_equal(got_d, docs) and np.array_equal(got_f, tfs)

    for probe in probes:
        if probe in by_term:
            continue
        try:
            assert seg.seek_exact(FIELD, probe) is None, probe
        except NotImplementedError:
            # the probe equals an FST key: the reference's crash —
            # allowed; anything else (EOFError, wrong hit) is a bug
            assert probe in key_set, probe
