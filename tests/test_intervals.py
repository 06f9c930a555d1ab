"""Lucene intervals module (minimal-interval semantics): the engine's
two-group-by collapse must equal a generic quadratic containment
filter over ALL ordered pairs — minimality first, THEN the maxgaps
filter (Lucene's Intervals.maxgaps wraps the ordered source, so the
filter sees only already-minimal intervals)."""

import random

import pytest

from ocaml_lucene_spark.index.build import assign_doc_ids, build_index
from ocaml_lucene_spark.query.exec import (
    intervals_containing_indexed,
    intervals_ordered_indexed,
)

VOCAB = ["table", "hash", "dup", "scan", "pad"]


def _make_texts():
    # handcrafted heads pin known interval structures; random tails
    # (seeded) exercise the general case
    texts = {
        # two b's snapping to the same a: the later one is contained
        0: "table hash hash pad pad",
        # two disjoint minimal intervals
        1: "table pad hash pad table hash",
        # a's between: closest-preceding wins; dup inside one interval
        2: "table table dup hash pad table pad pad hash",
        # gap too wide for max_gaps=2
        3: "table pad pad pad pad hash",
        # b before a only: no ordered interval
        4: "hash pad table",
    }
    rng = random.Random(17)
    for d in range(5, 40):
        texts[d] = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 30)))
    return texts


@pytest.fixture(scope="module")
def iv_index(spark, tmp_path_factory):
    texts = _make_texts()
    index_dir = str(tmp_path_factory.mktemp("index_iv"))
    docs = assign_doc_ids(
        spark.createDataFrame(
            [(f"u{d}", t) for d, t in texts.items()], "url string, text string"
        )
    ).select("doc_id", "text")
    build_index(docs, index_dir, n_partitions=2, with_positions=True)
    # docIDs are url-derived, not the dict key: recover the mapping
    toks = {
        r.doc_id: r.text.split() for r in docs.collect()
    }
    return index_dir, toks


def _positions(toks, term):
    return {
        d: [i for i, t in enumerate(ts) if t == term]
        for d, ts in toks.items()
        if term in ts
    }


def _brute_minimal(toks, a, b, max_gaps):
    """doc -> sorted minimal ordered (p1, p2) list, generic algorithm."""
    pa, pb = _positions(toks, a), _positions(toks, b)
    out = {}
    for d in set(pa) & set(pb):
        cands = [(p1, p2) for p1 in pa[d] for p2 in pb[d] if p1 < p2]
        minimal = [
            (p1, p2)
            for (p1, p2) in cands
            if not any(
                (q1, q2) != (p1, p2) and q1 >= p1 and q2 <= p2
                for (q1, q2) in cands
            )
        ]
        kept = sorted(
            (p1, p2) for (p1, p2) in minimal if p2 - p1 - 1 <= max_gaps
        )
        if kept:
            out[d] = kept
    return out


@pytest.mark.parametrize("a,b,gaps", [("table", "hash", 2), ("table", "hash", 6),
                                      ("hash", "table", 3), ("dup", "scan", 4)])
def test_intervals_ordered_matches_brute(spark, iv_index, a, b, gaps):
    index_dir, toks = iv_index
    want = {
        d: (len(iv), min(p2 - p1 + 1 for p1, p2 in iv))
        for d, iv in _brute_minimal(toks, a, b, gaps).items()
    }
    got = {
        r.doc_id: (r.n_intervals, r.min_width)
        for r in intervals_ordered_indexed(spark, index_dir, a, b, gaps).collect()
    }
    assert got == want


def test_intervals_known_doc_values(spark, iv_index):
    index_dir, toks = iv_index
    # doc with text "table hash hash pad pad": second 'hash' snaps to
    # the same 'table' -> contained -> exactly ONE minimal interval,
    # width 2
    d0 = next(d for d, ts in toks.items() if ts == ["table", "hash", "hash", "pad", "pad"])
    rows = {
        r.doc_id: (r.n_intervals, r.min_width)
        for r in intervals_ordered_indexed(spark, index_dir, "table", "hash", 6).collect()
    }
    assert rows[d0] == (1, 2)
    # gap-limited doc drops out at max_gaps=2 (gap is 4)
    d3 = next(
        d for d, ts in toks.items()
        if ts == ["table", "pad", "pad", "pad", "pad", "hash"]
    )
    rows2 = {
        r.doc_id
        for r in intervals_ordered_indexed(spark, index_dir, "table", "hash", 2).collect()
    }
    assert d3 not in rows2
    assert d3 in {
        r.doc_id
        for r in intervals_ordered_indexed(spark, index_dir, "table", "hash", 4).collect()
    }


@pytest.mark.parametrize("inner", ["dup", "pad"])
def test_intervals_containing_matches_brute(spark, iv_index, inner):
    index_dir, toks = iv_index
    a, b, gaps = "table", "hash", 6
    pc = _positions(toks, inner)
    want = {}
    for d, iv in _brute_minimal(toks, a, b, gaps).items():
        has = [any(p1 <= p <= p2 for p in pc.get(d, [])) for p1, p2 in iv]
        want[d] = (sum(has), len(has) - sum(has))
    got = {
        r.doc_id: (r.n_containing, r.n_not_containing)
        for r in intervals_containing_indexed(
            spark, index_dir, a, b, inner, gaps
        ).collect()
    }
    assert got == want


def test_collapse_equals_generic_minimality_fuzz():
    """Pure-python fuzz of the algebraic claim the engine relies on:
    closest-preceding-first per second + earliest-second per first
    == generic containment minimality, and band-limiting before the
    collapse == gap-filtering after it."""
    rng = random.Random(99)
    for _ in range(300):
        n = rng.randint(2, 40)
        seq = [rng.choice("ab.") for _ in range(n)]
        pa = [i for i, t in enumerate(seq) if t == "a"]
        pb = [i for i, t in enumerate(seq) if t == "b"]
        gaps = rng.randint(0, 5)
        toks = {0: ["a" if t == "a" else "b" if t == "b" else "pad" for t in seq]}
        want = _brute_minimal(toks, "a", "b", gaps).get(0, [])
        # engine collapse, band-limited first
        pairs = [
            (p1, p2)
            for p1 in pa
            for p2 in pb
            if 0 < p2 - p1 <= gaps + 1
        ]
        closest = {}
        for p1, p2 in pairs:
            closest[p2] = max(closest.get(p2, -1), p1)
        earliest = {}
        for p2, p1 in closest.items():
            earliest[p1] = min(earliest.get(p1, 10**9), p2)
        got = sorted((p1, p2) for p1, p2 in earliest.items())
        assert got == want, (seq, gaps)


def _brute_minimal_unordered(toks, a, b, max_gaps):
    """doc -> sorted minimal unordered (l, r): generic quadratic
    containment over ALL cross pairs, minimality first, gaps after."""
    pa, pb = _positions(toks, a), _positions(toks, b)
    out = {}
    for d in set(pa) & set(pb):
        cands = sorted(
            {(min(p1, p2), max(p1, p2)) for p1 in pa[d] for p2 in pb[d]}
        )
        minimal = [
            (l, r)
            for (l, r) in cands
            if not any(
                (q1, q2) != (l, r) and q1 >= l and q2 <= r for (q1, q2) in cands
            )
        ]
        kept = sorted((l, r) for (l, r) in minimal if r - l - 1 <= max_gaps)
        if kept:
            out[d] = kept
    return out


@pytest.mark.parametrize("a,b,gaps", [("table", "hash", 2), ("table", "hash", 6),
                                      ("dup", "scan", 4)])
def test_intervals_unordered_matches_brute(spark, iv_index, a, b, gaps):
    from ocaml_lucene_spark.query.exec import intervals_unordered_indexed

    index_dir, toks = iv_index
    want = {
        d: (len(iv), min(r - l + 1 for l, r in iv))
        for d, iv in _brute_minimal_unordered(toks, a, b, gaps).items()
    }
    got = {
        r.doc_id: (r.n_intervals, r.min_width)
        for r in intervals_unordered_indexed(
            spark, index_dir, a, b, gaps
        ).collect()
    }
    assert got == want


def test_alternating_adjacency_equals_generic_minimality_fuzz():
    """Pure-python fuzz of the unordered claim: label-alternating
    adjacent pairs of the merged position list == generic containment
    minimality (then gap-filter both)."""
    rng = random.Random(123)
    for _ in range(300):
        n = rng.randint(2, 40)
        seq = [rng.choice("ab.") for _ in range(n)]
        toks = {0: ["a" if t == "a" else "b" if t == "b" else "pad" for t in seq]}
        gaps = rng.randint(0, 5)
        want = _brute_minimal_unordered(toks, "a", "b", gaps).get(0, [])
        merged = [(i, t) for i, t in enumerate(seq) if t in "ab"]
        got = sorted(
            (p0, p1)
            for (p0, t0), (p1, t1) in zip(merged, merged[1:])
            if t0 != t1 and p1 - p0 <= gaps + 1
        )
        assert got == want, (seq, gaps)
