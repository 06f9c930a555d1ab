"""Lucene-segment exporter end-to-end (interop/export_index.py — the
inverse of the importer, closing the interop loop in both directions):

- plan_blocks structural properties: full coverage, prefix-closed key
  set, sorted keys, run sizing, deep-key splits, branch-node fillers
- freqs-only and positions directory round trips through open_index:
  every term's seek/postings/positions equal the input; misses return
  None (never crash) across absent-first-byte / floor-range / deep-key
  / suffix-scan shapes
- 1-byte terms: enumerable + importable (empty suffix in the base
  block); seeking exactly that term inherits the reference's crash
  (terms_enumerator.ml:225 — NotImplementedError parity)
- block-max WAND over an EXPORTED directory == exhaustive scoring
  (the exporter writes real competitive impacts + the norms pair)
- Spark round trip: engine index -> export_lucene_index ->
  import_lucene_index(verify=True — .tmd invariants + norms
  cross-check) -> postings relation EXACTLY equal and BM25 top-k
  identical (ids mapped through doc_map)

Like the importer's tests, the evidence model is grammar-inverse
writers whose read side is fixture-verified where the reference ships
fixtures and round-trip/mutation-verified where it does not.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ocaml_lucene_spark.interop.export_index import (
    export_lucene_index,
    export_lucene_partitions,
    main as export_main,
    plan_blocks,
    write_lucene_directory,
)
from ocaml_lucene_spark.interop.import_index import (
    enumerate_terms,
    import_lucene_index,
)
from ocaml_lucene_spark.interop.open_index import open_index
from ocaml_lucene_spark.interop.wand_search import (
    bm25_topk,
    bm25_topk_exhaustive,
)

FIELD = "body"


# --------------------------------------------------------- plan_blocks


def _check_plan(terms: list[bytes], plans, target: int) -> None:
    """Structural invariants any valid plan must satisfy."""
    keys = [p for p, _r in plans]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    # prefix-closed: every proper prefix (len >= 1) of a key is a key
    key_set = set(keys)
    for k in keys:
        for i in range(1, len(k)):
            assert k[:i] in key_set, (k, i)
    # runs cover every term exactly once, in order, under their key
    covered = []
    for prefix, runs in plans:
        for lo, hi in runs:
            assert lo < hi
            for i in range(lo, hi):
                assert terms[i].startswith(prefix), (terms[i], prefix)
            covered.extend(range(lo, hi))
        # floor labels strictly ascend (find_block's range walk)
        labels = [terms[lo][len(prefix)] for lo, hi in runs[1:]]
        assert labels == sorted(set(labels))
    assert sorted(covered) == list(range(len(terms)))


def test_plan_blocks_small_vocab_single_blocks():
    terms = [b"apple", b"apply", b"bat", b"bats"]
    plans = plan_blocks(terms, target=48)
    _check_plan(terms, plans, 48)
    assert plans == [(b"a", [(0, 2)]), (b"b", [(2, 4)])]


def test_plan_blocks_floor_split_and_deep_keys():
    # 26*3 terms under 'c': second-byte floors; 40 under "do":
    # a deep key with its own floors; 1-byte term 'c' peels into the
    # base block of key b"c"
    terms = sorted(
        {b"c"}
        | {b"c" + bytes([b]) + s for b in range(ord("a"), ord("z")) for s in (b"x", b"y", b"z")}
        | {b"do" + bytes([b]) + s for b in range(ord("a"), ord("u")) for s in (b"m", b"n")}
    )
    plans = plan_blocks(terms, target=8)
    _check_plan(terms, plans, 8)
    by_key = dict(plans)
    # 'c' group (76 terms) floor-splits at depth 1
    assert len(by_key[b"c"]) > 1
    # the 1-byte term b"c" sits first in key b"c"'s base run
    lo, _hi = by_key[b"c"][0]
    assert terms[lo] == b"c"
    # 'd' branches: all terms go deeper -> filler at b"d", runs at b"do"
    assert by_key[b"d"] == []
    assert len(by_key[b"do"]) > 1
    # every run respects the target unless it is a single
    # unsplittable (prefix+byte) group
    for prefix, runs in plans:
        for lo, hi in runs:
            if hi - lo > 8:
                nxt = {terms[i][len(prefix)] for i in range(lo, hi)}
                assert len(nxt) == 1, (prefix, hi - lo)


def test_plan_blocks_rejects_bad_input():
    with pytest.raises(ValueError, match="sorted"):
        plan_blocks([b"b", b"a"])
    with pytest.raises(ValueError, match="sorted"):
        plan_blocks([b"a", b"a"])
    with pytest.raises(ValueError, match="empty term"):
        plan_blocks([b""])
    with pytest.raises(ValueError, match="empty"):
        plan_blocks([])


# --------------------------------------------------- directory round trip


def _freq_corpus(seed: int = 3, n_docs: int = 300):
    """Vocabulary exercising every planner/stream shape: a 1-byte term
    with 2-byte and long siblings, >target groups at depth 1 AND 2
    (deep keys + fillers), a df>128 hot term (packed blocks + skip
    list + impacts), singletons."""
    rng = random.Random(seed)
    vocab = sorted(
        set(
            ["a", "ab", "abandon", "hot", "mid", "rare", "zx"]
            + [f"co{c}{d}" for c in "abcdefgh" for d in "xyz"]
            + [f"inter{c}{d}" for c in "abcdefghijklm" for d in "pq"]
        )
    )
    weights = [200 if v == "hot" else (30 if v == "mid" else 2) for v in vocab]
    per_term: dict[str, list[tuple[int, int]]] = {}
    for d in range(n_docs):
        toks = rng.choices(vocab, weights=weights, k=rng.randint(3, 30))
        if d == 5:
            toks.append("rare")
        for t in set(toks):
            per_term.setdefault(t, []).append((d, toks.count(t)))
    return [
        (
            t.encode(),
            np.array([d for d, _c in per_term[t]], dtype=np.int64),
            np.array([c for _d, c in per_term[t]], dtype=np.int64),
        )
        for t in sorted(per_term)
    ]


@pytest.fixture(scope="module")
def freq_dir(tmp_path_factory):
    postings = _freq_corpus()
    d = str(tmp_path_factory.mktemp("lucene_export"))
    res = write_lucene_directory(
        d, FIELD, postings, with_positions=False, target_block_terms=8
    )
    return d, postings, res


def test_export_seek_and_postings_roundtrip(freq_dir):
    d, postings, res = freq_dir
    assert res["n_terms"] == len(postings)
    assert res["n_blocks"] >= res["n_keys"] - 1  # fillers have no block
    index = open_index(d)
    seg = index.segments[0]
    hot_df = 0
    for t, docs, tfs in postings:
        if len(t) == 1:
            continue  # crash parity, separate test
        st = seg.seek_exact(FIELD, t)
        assert st is not None, t
        assert st.doc_freq == docs.size, t
        assert st.total_term_freq == int(tfs.sum()), t
        (_seg, got_docs, got_tfs), = index.postings(FIELD, t)
        assert np.array_equal(got_docs, docs), t
        assert np.array_equal(got_tfs, tfs), t
        hot_df = max(hot_df, docs.size)
    assert hot_df > 128  # the skip-list/packed-block path was exercised


def test_export_misses_return_none(freq_dir):
    d, _postings, _res = freq_dir
    seg = open_index(d).segments[0]
    for miss in (
        b"qq",       # absent first byte (inside [min_term, max_term])
        b"aa",       # suffix-scan miss in a base block holding b""
        b"abz",      # suffix-scan miss beside a long sibling
        b"cozz",     # floor-range miss at a depth-1 floor split
        b"coaq",     # miss inside a floor block
        b"interzz",  # miss below a deep key (depth-2+ walk stop)
        b"interaz",  # miss inside a deep key's floor block
        b"hoz",      # miss between terms sharing a first byte
        b"hots",     # past a term, same prefix
    ):
        assert seg.seek_exact(FIELD, miss) is None, miss


def test_export_one_byte_term_parity(freq_dir):
    """b"a" is stored (empty suffix in key b"a"'s base block): fully
    enumerable, but seeking exactly it inherits the reference's crash
    (terms_enumerator.ml:225)."""
    d, postings, _res = freq_dir
    seg = open_index(d).segments[0]
    enumerated = [t for t, _st in enumerate_terms(seg, FIELD)]
    assert enumerated == [t for t, _d, _f in postings]  # incl. b"a"
    with pytest.raises(NotImplementedError):
        seg.seek_exact(FIELD, b"a")


def test_export_norms_and_wand_prune_match_exhaustive(freq_dir):
    """The exporter writes the Lucene80 norms pair + real competitive
    impacts: block-max WAND over the directory must rank AND score
    identically to exhaustive evaluation (the wand_search exactness
    contract), and must actually skip block decodes on a selective
    query."""
    d, postings, res = freq_dir
    index = open_index(d)
    seg = index.segments[0]
    norms = seg.norms(FIELD)
    assert norms is not None and len(norms) == res["n_docs"]
    dl = np.zeros(res["n_docs"], dtype=np.int64)
    for _t, docs, tfs in postings:
        dl[docs] += tfs
    assert (np.asarray(norms) > 0).all()  # every doc bears postings
    for terms, mode in (
        (["hot", "rare"], "or"),
        (["hot", "mid"], "or"),
        (["mid", "rare"], "and"),
        (["hot", "mid", "rare"], "or"),
    ):
        got, metrics = bm25_topk(index, FIELD, terms, k=10, mode=mode)
        want = bm25_topk_exhaustive(index, FIELD, terms, k=10, mode=mode)
        assert got == want, (terms, mode)
    # selective query over the hot list: pruning must engage
    _got, metrics = bm25_topk(index, FIELD, ["hot", "rare"], k=3, mode="or")
    assert metrics["decoded_blocks"] < metrics["total_blocks"]


def test_export_positions_roundtrip(tmp_path):
    rng = random.Random(7)
    vocab = sorted(
        set(
            ["hot", "mid", "rare", "apple", "apply", "bat"]
            + [f"w{c}{d}" for c in "abcdef" for d in "mn"]
        )
    )
    docs = [
        rng.choices(
            vocab,
            weights=[300 if v == "hot" else 5 for v in vocab],
            k=rng.randint(3, 25),
        )
        for _ in range(250)
    ]
    per: dict[str, dict[int, list[int]]] = {}
    for d, toks in enumerate(docs):
        for p, t in enumerate(toks):
            per.setdefault(t, {}).setdefault(d, []).append(p)
    postings = [
        (
            t.encode(),
            np.array(sorted(per[t]), dtype=np.int64),
            [np.array(per[t][d], dtype=np.int64) for d in sorted(per[t])],
        )
        for t in sorted(per)
    ]
    out = str(tmp_path / "lx")
    res = write_lucene_directory(
        out, FIELD, postings, with_positions=True, target_block_terms=6
    )
    assert res["with_positions"]
    index = open_index(out)
    assert index.segments[0].field_readers[FIELD].flags.has_positions
    for t, dd, pp in postings:
        (_seg, got_d, got_f, got_p), = index.positions(FIELD, t)
        assert np.array_equal(got_d, dd), t
        assert np.array_equal(
            got_f, np.array([len(x) for x in pp], dtype=np.int64)
        ), t
        assert all(np.array_equal(a, b) for a, b in zip(got_p, pp)), t
    # ttf > 128 exercised the .pos packed-block path
    assert max(sum(len(x) for x in pp) for _t, _d, pp in postings) > 128


def test_export_validates_input(tmp_path):
    good = [(b"ab", np.array([0], dtype=np.int64), np.array([1], dtype=np.int64))]
    with pytest.raises(ValueError, match="sorted"):
        write_lucene_directory(
            str(tmp_path / "a"),
            FIELD,
            [good[0], good[0]],
            with_positions=False,
        )
    with pytest.raises(ValueError, match="no postings"):
        write_lucene_directory(
            str(tmp_path / "b"),
            FIELD,
            [(b"ab", np.array([], dtype=np.int64), np.array([], dtype=np.int64))],
            with_positions=False,
        )
    with pytest.raises(ValueError, match="max_doc"):
        write_lucene_directory(
            str(tmp_path / "c"), FIELD, good, with_positions=False, max_doc=0
        )


# -------------------------------------------------- Spark round trip


def _tiny_docs(spark, n_docs: int = 200, seed: int = 5):
    rng = random.Random(seed)
    vocab = ["hot", "mid", "rare", "apple", "apply", "bat", "bats", "dog", "zebra"] + [
        f"w{c}" for c in "abcdefgh"
    ]
    rows = [
        (
            f"http://x/{i}",
            " ".join(
                rng.choices(
                    vocab,
                    weights=[40 if v == "hot" else 3 for v in vocab],
                    k=rng.randint(3, 20),
                )
            ),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "url string, text string")


def _flat_postings(index_dir: str) -> dict[tuple[str, int], int]:
    import pyarrow.parquet as pq

    from ocaml_lucene_spark.codecs import pfor
    from ocaml_lucene_spark.codecs.delta import delta_decode
    from ocaml_lucene_spark.index import segments as seg_mod

    out: dict[tuple[str, int], int] = {}
    for s in seg_mod.list_segments(index_dir, live_only=True):
        t = pq.read_table(seg_mod.segment_paths(index_dir, s["segment"])["postings"])
        d = t.to_pydict()
        for i in range(t.num_rows):
            docs = delta_decode(bytes(d["doc_bytes"][i]))
            tfs = pfor.decode(bytes(d["tf_bytes"][i]), int(d["n"][i]))
            for dd, tf in zip(docs.tolist(), tfs.tolist()):
                key = (d["term"][i], dd)
                assert key not in out
                out[key] = int(tf)
    return out


def test_engine_export_import_roundtrip(spark, tmp_path):
    """engine -> export -> import -> engine reproduces the postings
    relation EXACTLY and BM25 top-k is identical; the import runs with
    verify=True, so the exported directory also passes the .tmd
    invariants and the norms-vs-dl cross-check."""
    from ocaml_lucene_spark.index.build import assign_doc_ids, build_index
    from ocaml_lucene_spark.query.exec import bm25_topk_indexed

    docs = assign_doc_ids(_tiny_docs(spark)).select("doc_id", "url", "text")
    d1 = str(tmp_path / "engine1")
    lx = str(tmp_path / "lucene")
    d2 = str(tmp_path / "engine2")
    row = build_index(docs, d1, n_partitions=4)

    res = export_lucene_index(d1, lx, field=FIELD)
    assert res["n_postings"] == row["n_postings"]
    assert res["n_docs"] == row["n_docs"]
    assert not res["with_positions"] and not res["offsets_dropped"]

    row2 = import_lucene_index(spark, lx, d2, FIELD)  # verify=True
    assert row2["n_postings"] == row["n_postings"]
    assert row2["sum_dl"] == row["sum_dl"]

    ord_of = {int(g): o for o, g in enumerate(res["doc_map"].tolist())}
    original = {
        (t, ord_of[dd]): tf for (t, dd), tf in _flat_postings(d1).items()
    }
    assert original == _flat_postings(d2)

    for terms in (["hot", "rare"], ["mid", "zebra"]):
        t1 = [
            (ord_of[r.doc_id], round(r.score, 6))
            for r in bm25_topk_indexed(spark, d1, terms, k=10).collect()
        ]
        t2 = [
            (r.doc_id, round(r.score, 6))
            for r in bm25_topk_indexed(spark, d2, terms, k=10).collect()
        ]
        assert t1 == t2, terms


def test_engine_export_import_roundtrip_with_positions(spark, tmp_path):
    """Same loop over a positions build: the exported directory gets a
    .pos stream, import re-decodes positions, and phrase-bearing
    postings survive the trip exactly."""
    import pyarrow.parquet as pq

    from ocaml_lucene_spark.codecs import pfor
    from ocaml_lucene_spark.codecs.blocks import decode_positions
    from ocaml_lucene_spark.codecs.delta import delta_decode
    from ocaml_lucene_spark.index import segments as seg_mod
    from ocaml_lucene_spark.index.build import assign_doc_ids, build_index

    def flat_pos(index_dir):
        out = {}
        for s in seg_mod.list_segments(index_dir, live_only=True):
            t = pq.read_table(
                seg_mod.segment_paths(index_dir, s["segment"])["postings"]
            )
            d = t.to_pydict()
            for i in range(t.num_rows):
                docs = delta_decode(bytes(d["doc_bytes"][i]))
                tfs = pfor.decode(bytes(d["tf_bytes"][i]), int(d["n"][i]))
                poss = decode_positions(bytes(d["pos_bytes"][i]), tfs)
                for dd, p in zip(docs.tolist(), poss):
                    out[(d["term"][i], dd)] = tuple(p.tolist())
        return out

    docs = assign_doc_ids(_tiny_docs(spark, n_docs=120, seed=8)).select(
        "doc_id", "url", "text"
    )
    d1 = str(tmp_path / "engine1")
    lx = str(tmp_path / "lucene")
    d2 = str(tmp_path / "engine2")
    build_index(docs, d1, n_partitions=4, with_positions=True)
    res = export_lucene_index(d1, lx, field=FIELD)
    assert res["with_positions"]
    # the exported directory really has a .pos stream open_index reads
    (_seg, _d, _f, poss), = open_index(lx).positions(FIELD, b"zebra")
    assert all(len(p) >= 1 for p in poss)
    import_lucene_index(spark, lx, d2, FIELD)
    ord_of = {int(g): o for o, g in enumerate(res["doc_map"].tolist())}
    original = {
        (t, ord_of[dd]): p for (t, dd), p in flat_pos(d1).items()
    }
    assert original == flat_pos(d2)


def test_export_lucene_partitions_shards_cover_and_are_deterministic(
    spark, tmp_path
):
    """The distributed export: doc-range shards union back to the
    exact postings relation, every shard is a self-contained readable
    directory, and two runs produce byte-identical files (the
    deterministic-boundaries contract — never repartitionByRange)."""
    import os

    from ocaml_lucene_spark.index.build import assign_doc_ids, build_index

    docs = assign_doc_ids(_tiny_docs(spark, n_docs=150, seed=4)).select(
        "doc_id", "url", "text"
    )
    d1 = str(tmp_path / "engine")
    row = build_index(docs, d1, n_partitions=4)
    base1 = str(tmp_path / "shards1")
    parts = export_lucene_partitions(spark, d1, base1, n_directories=3)
    assert [p["bucket"] for p in parts] == [0, 1, 2]
    assert sum(p["n_postings"] for p in parts) == row["n_postings"]
    assert sum(p["n_docs"] for p in parts) == row["n_docs"]

    union: dict[tuple[str, int], int] = {}
    for p in parts:
        index = open_index(p["out_dir"])
        doc_map = np.load(os.path.join(p["out_dir"], "doc_map.npy"))
        seg = index.segments[0]
        for term, _st in enumerate_terms(seg, FIELD):
            (_s, got_docs, got_tfs), = index.postings(FIELD, term)
            for o, tf in zip(got_docs.tolist(), got_tfs.tolist()):
                key = (term.decode(), int(doc_map[o]))
                assert key not in union
                union[key] = int(tf)
    assert union == _flat_postings(d1)

    base2 = str(tmp_path / "shards2")
    parts2 = export_lucene_partitions(spark, d1, base2, n_directories=3)
    for p1, p2 in zip(parts, parts2):
        files1 = sorted(os.listdir(p1["out_dir"]))
        assert files1 == sorted(os.listdir(p2["out_dir"]))
        for name in files1:
            with open(os.path.join(p1["out_dir"], name), "rb") as f1, open(
                os.path.join(p2["out_dir"], name), "rb"
            ) as f2:
                assert f1.read() == f2.read(), (p1["bucket"], name)

    # cross-shard BM25 with GLOBAL stats: the ShardedIndex facade over
    # 3 shards must rank AND score exactly like one directory holding
    # the whole index (same quantized-dl model, same global stats,
    # same engine ids via the concatenated doc_maps)
    from ocaml_lucene_spark.interop.export_index import open_exported_shards

    single = str(tmp_path / "single")
    export_lucene_index(d1, single, field=FIELD)
    whole = open_index(single)
    sharded = open_exported_shards(base1)
    assert len(sharded.indexes) == 3 and sharded.doc_map is not None
    single_map = np.load(os.path.join(single, "doc_map.npy"))
    assert np.array_equal(sharded.doc_map, single_map)
    for terms, mode in (
        (["hot", "rare"], "or"),
        (["mid", "zebra"], "or"),
        (["hot", "mid"], "and"),
    ):
        got = sharded.bm25_topk(FIELD, terms, k=10, mode=mode)
        want = [
            (int(single_map[d]), s)
            for d, s in whole.bm25_topk(FIELD, terms, k=10, mode=mode)
        ]
        assert got == want, (terms, mode)


def test_export_cli(spark, tmp_path, capsys):
    from ocaml_lucene_spark.index.build import assign_doc_ids, build_index

    docs = assign_doc_ids(_tiny_docs(spark, n_docs=60)).select(
        "doc_id", "url", "text"
    )
    d1 = str(tmp_path / "engine")
    build_index(docs, d1, n_partitions=2)
    out = str(tmp_path / "lx")
    assert export_main([d1, out]) == 0
    printed = capsys.readouterr().out
    assert "exported segment _0" in printed
    assert open_index(out).seek_exact(FIELD, b"hot")
    assert export_main([d1]) == 2
