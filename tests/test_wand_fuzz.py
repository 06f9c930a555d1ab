"""Multi-block fuzz of block-max WAND against the pure-Python oracle.

Regression for the round-1 unsound skip: when the block-max bound failed
(bm < theta), the jump target `min(candidate block last_doc)+1` ignored
non-candidate lists whose current doc lay inside the skipped range —
candidate lists were advanced past docs that could still score from the
other lists, permanently losing their contributions (wrong top-k).

The fuzz builds real packed blocks (encode_posting_blocks) from random
corpora, splits each term into interleaved doc-shards (the adversarial
layout: shard block ranges overlap heavily, maximizing cross-list skip
interactions), and compares exact results with the OracleIndex.
"""

import math
import random

import numpy as np

from ocaml_lucene_spark.codecs.blocks import encode_posting_blocks
from ocaml_lucene_spark.oracle import OracleIndex
from ocaml_lucene_spark.query.exec import idf as idf_fn
from ocaml_lucene_spark.query.wand import (
    PostingList,
    block_max_wand,
    frontier_ub,
    tfn_ub,
)


def lists_from_oracle(
    oracle: OracleIndex, terms: list[str], n_shards: int = 1
) -> list[PostingList]:
    """Build PostingLists straight from oracle postings; n_shards > 1
    splits each term into doc-interleaved sub-lists (old salt layout)."""
    lists: list[PostingList] = []
    avgdl = oracle.avgdl
    for t in dict.fromkeys(terms):
        post = oracle.postings.get(t, {})
        if not post:
            continue
        w = idf_fn(oracle.n_docs, len(post))
        for s in range(n_shards):
            docs = np.array(
                sorted(d for d in post if d % n_shards == s), dtype=np.int64
            )
            if docs.size == 0:
                continue
            tfs = np.array([post[int(d)] for d in docs], dtype=np.int64)
            dls = np.array([oracle.doc_lens[int(d)] for d in docs], dtype=np.int64)
            blocks = encode_posting_blocks(docs, tfs, None, dls)
            lists.append(
                PostingList(
                    term=t,
                    idf=w,
                    avgdl=avgdl,
                    first_doc=np.array([b.first_doc for b in blocks], dtype=np.int64),
                    last_doc=np.array([b.last_doc for b in blocks], dtype=np.int64),
                    ub=np.array(
                        [frontier_ub(b.ub_tfs, b.ub_dls, avgdl, idf=w) for b in blocks]
                    ),
                    payloads=[(b.doc_bytes, b.tf_bytes, b.dl_bytes) for b in blocks],
                )
            )
    return lists


def random_corpus(rng: random.Random, n_docs: int, vocab: str) -> OracleIndex:
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30)))
        for d in range(n_docs)
    }
    return OracleIndex.from_texts(texts)


def _assert_matches(got, expected, ctx):
    assert [d for d, _ in got] == [d for d, _ in expected], (
        ctx, got[:5], expected[:5]
    )
    for (_, gs), (_, es) in zip(got, expected):
        assert math.isclose(gs, es, rel_tol=1e-9), (ctx, gs, es)


def test_wand_fuzz_vs_oracle():
    rng = random.Random(1234)
    vocab = list("abcdef")
    for trial in range(60):
        oracle = random_corpus(rng, rng.randint(200, 450), vocab)
        terms = rng.sample(vocab, rng.randint(1, 3))
        mode = rng.choice(["or", "or", "and"])
        k = rng.choice([5, 10])
        n_shards = rng.choice([1, 2, 4])
        lists = lists_from_oracle(oracle, terms, n_shards)
        require = set(terms) if mode == "and" else None
        got, metrics = block_max_wand(lists, k, require_all_terms=require)
        expected = oracle.query(terms, mode, k)
        _assert_matches(got, expected, (trial, terms, mode, k, n_shards))
        assert metrics["total_blocks"] >= metrics["decoded_blocks"]


def test_wand_advice_repro():
    """The exact shape the round-1 advisor flagged: or-mode 3-term query,
    400-doc corpus, sharded lists — runs 20 seeds."""
    for seed in range(20):
        rng = random.Random(seed)
        oracle = random_corpus(rng, 400, list("abcdef"))
        got, _ = block_max_wand(
            lists_from_oracle(oracle, ["a", "e", "c"], n_shards=4), 10
        )
        _assert_matches(got, oracle.query(["a", "e", "c"], "or", 10), seed)


def test_wand_rounded_tieboundary():
    """round_to orders the heap by rounded score then doc_id — the same
    k-boundary tie-break as the exhaustive paths and the SQL oracle."""
    rng = random.Random(7)
    for trial in range(20):
        oracle = random_corpus(rng, 300, list("abcd"))
        lists = lists_from_oracle(oracle, ["a", "b"], n_shards=2)
        got = block_max_wand(lists, 10, round_to=4)[0]
        exp = [(d, round(s, 4)) for d, s in oracle.query(["a", "b"], "or", 300)]
        exp.sort(key=lambda x: (-x[1], x[0]))
        assert [d for d, _ in got] == [d for d, _ in exp[:10]], trial
        assert [s for _, s in got] == [s for _, s in exp[:10]], trial


def test_frontier_ub_exact_and_tighter():
    """The stored pareto (tf, dl) frontier reproduces the EXACT block-max
    tf-norm for any avgdl, and is never looser than the naive
    tfn(max_tf, min_dl) pairing (strictly tighter when max tf and min dl
    come from different postings)."""
    rng = random.Random(5)
    strict_wins = 0
    for _ in range(60):
        n = rng.randint(1, 128)
        # anti-correlated tf/dl (the hot-term shape): big tf in long docs
        dl = np.array([rng.randint(1, 500) for _ in range(n)], dtype=np.int64)
        tf = np.maximum(1, dl // rng.randint(10, 50) + np.array(
            [rng.randint(0, 2) for _ in range(n)]
        )).astype(np.int64)
        docs = np.arange(n, dtype=np.int64)
        b = encode_posting_blocks(docs, tf, None, dl)[0]
        assert len(b.ub_tfs) == len(b.ub_dls) >= 1
        for avgdl in (5.0, 50.0, 500.0):
            exact = max(tfn_ub(t, d, avgdl) for t, d in zip(tf, dl))
            got = frontier_ub(b.ub_tfs, b.ub_dls, avgdl)
            naive = tfn_ub(b.max_tf, b.min_dl, avgdl)
            assert math.isclose(got, exact, rel_tol=1e-12), (got, exact)
            assert got <= naive + 1e-12
            if got < naive - 1e-9:
                strict_wins += 1
    assert strict_wins > 50  # the anti-correlated shape must actually bite


def oracle_query_not(oracle, terms, exclude, k):
    banned = set()
    for t in exclude:
        banned |= set(oracle.postings.get(t, {}))
    full = oracle.query(terms, "or", len(oracle.doc_lens))
    return [(d, s) for d, s in full if d not in banned][:k]


def test_wand_exclusion_fuzz():
    """NOT clause via exclusion posting lists (leapfrog anti-join)
    matches filtering the oracle's full ranking."""
    rng = random.Random(99)
    vocab = list("abcdefgh")
    for trial in range(40):
        oracle = random_corpus(rng, rng.randint(150, 400), vocab)
        inc = rng.sample(vocab, 2)
        exc = [t for t in rng.sample(vocab, 2) if t not in inc]
        lists = lists_from_oracle(oracle, inc, rng.choice([1, 2]))
        xlists = lists_from_oracle(oracle, exc, 1)
        for xl in xlists:
            xl.idf = 0.0
        got, _ = block_max_wand(lists, 8, exclude_lists=xlists or None)
        expected = oracle_query_not(oracle, inc, exc, 8)
        _assert_matches(got, expected, (trial, inc, exc))


def test_wand_combined_stress_fuzz():
    """Everything at once — AND/OR x NOT x round_to x shards x k — so
    the round-3 machinery (theta seeding, lazy positioning, leapfrog
    ejection, early-exit partial scoring) is exercised in interaction,
    not just per feature."""
    rng = random.Random(20260816)
    vocab = list("abcdefgh")
    for trial in range(80):
        oracle = random_corpus(rng, rng.randint(100, 500), vocab)
        inc = rng.sample(vocab, rng.randint(1, 4))
        exc = rng.sample(vocab, rng.randint(0, 2))  # may overlap inc
        mode = rng.choice(["or", "or", "and"])
        k = rng.choice([1, 3, 10, 1000])  # incl. k >= all results
        round_to = rng.choice([None, 4, 2])
        n_shards = rng.choice([1, 2, 4, 8])
        lists = lists_from_oracle(oracle, inc, n_shards)
        xlists = lists_from_oracle(oracle, exc, rng.choice([1, 2]))
        for xl in xlists:
            xl.idf = 0.0
        require = set(inc) if mode == "and" else None
        got, metrics = block_max_wand(
            lists, k, require_all_terms=require, round_to=round_to,
            exclude_lists=xlists or None,
        )
        assert metrics["total_blocks"] >= metrics["decoded_blocks"]
        banned = set()
        for t in exc:
            banned |= set(oracle.postings.get(t, {}))
        full = oracle.query(inc, mode, len(oracle.doc_lens))
        filt = [(d, s) for d, s in full if d not in banned]
        if round_to is not None:
            filt = [(d, round(s, round_to)) for d, s in filt]
            filt.sort(key=lambda x: (-x[1], x[0]))
            expected = filt[:k]
            assert [d for d, _ in got] == [d for d, _ in expected], (
                trial, inc, exc, mode, k, round_to, n_shards, got[:4], expected[:4],
            )
            assert [s for _, s in got] == [s for _, s in expected]
        else:
            expected = filt[:k]
            _assert_matches(
                got, expected, (trial, inc, exc, mode, k, round_to, n_shards)
            )


def oracle_query_bool(oracle, must, should, k, min_should_match=0):
    """Reference BooleanQuery: docs with every must term (and at least
    min_should_match should terms), scored over must+should."""
    terms = list(dict.fromkeys(must + [t for t in should if t not in must]))
    full = oracle.query(terms, "or", len(oracle.doc_lens))
    keep = []
    for d, s in full:
        if not all(d in oracle.postings.get(t, {}) for t in must):
            continue
        n_should = sum(
            1 for t in terms if t not in must and d in oracle.postings.get(t, {})
        )
        if n_should < min_should_match:
            continue
        keep.append((d, s))
    return keep[:k]


def test_wand_bool_must_should_fuzz():
    """require_all_terms = a SUBSET of the scored terms (BooleanQuery
    must+should, with min_should_match) stays exact under sharding."""
    rng = random.Random(31337)
    vocab = list("abcdefgh")
    for trial in range(50):
        oracle = random_corpus(rng, rng.randint(150, 400), vocab)
        terms = rng.sample(vocab, rng.randint(2, 4))
        n_must = rng.randint(1, len(terms) - 1)
        must, should = terms[:n_must], terms[n_must:]
        msm = rng.choice([0, 0, 1, len(should)])
        lists = lists_from_oracle(oracle, terms, rng.choice([1, 2, 4]))
        got, _ = block_max_wand(
            lists, 8, require_all_terms=set(must), term_order=terms,
            min_should_match=msm,
        )
        expected = oracle_query_bool(oracle, must, should, 8, msm)
        _assert_matches(got, expected, (trial, must, should, msm))


def test_wand_range_split_union_fuzz():
    """min_doc/max_doc clipping (the parallel-plan primitive): running
    WAND per doc range over FRESH iterators and merging the local
    top-ks reproduces the global oracle top-k for any range count."""
    rng = random.Random(777)
    vocab = list("abcdef")
    for trial in range(40):
        n_docs = rng.randint(150, 450)
        oracle = random_corpus(rng, n_docs, vocab)
        terms = rng.sample(vocab, rng.randint(1, 3))
        mode = rng.choice(["or", "or", "and"])
        k = rng.choice([5, 10])
        n_ranges = rng.choice([1, 2, 3, 7])
        require = set(terms) if mode == "and" else None
        width = -(-n_docs // n_ranges)
        merged = []
        for r in range(n_ranges):
            lists = lists_from_oracle(oracle, terms, rng.choice([1, 2]))
            out, m = block_max_wand(
                lists, k, require_all_terms=require,
                min_doc=r * width, max_doc=min((r + 1) * width - 1, n_docs - 1),
            )
            assert all(
                r * width <= d <= (r + 1) * width - 1 for d, _ in out
            ), (trial, r, out)
            merged.extend(out)
        merged.sort(key=lambda x: (-x[1], x[0]))
        expected = oracle.query(terms, mode, k)
        _assert_matches(merged[:k], expected, (trial, terms, mode, k, n_ranges))


def test_wand_exclusion_overlapping_terms_fuzz():
    """inc ∩ exc non-empty (the round-2 ADVICE shape): exclusion is a
    pure doc filter, so a term that is both scored and excluded must
    still drop every doc that contains it — matching the SQL oracle's
    NOT IN over the full exclude set."""
    rng = random.Random(4242)
    vocab = list("abcdefgh")
    for trial in range(40):
        oracle = random_corpus(rng, rng.randint(150, 400), vocab)
        inc = rng.sample(vocab, rng.randint(2, 3))
        # exclude always contains one scored term plus possibly others
        exc = [inc[0]] + [t for t in rng.sample(vocab, 2) if t != inc[0]]
        lists = lists_from_oracle(oracle, inc, rng.choice([1, 2]))
        xlists = lists_from_oracle(oracle, exc, 1)
        for xl in xlists:
            xl.idf = 0.0
        got, _ = block_max_wand(lists, 8, exclude_lists=xlists or None)
        expected = oracle_query_not(oracle, inc, exc, 8)
        _assert_matches(got, expected, (trial, inc, exc))
        # and-mode with a required term excluded -> provably empty
        got_and, _ = block_max_wand(
            lists_from_oracle(oracle, inc, 1),
            8,
            require_all_terms=set(inc),
            exclude_lists=lists_from_oracle(oracle, [inc[0]], 1),
        )
        assert got_and == [], (trial, inc)
