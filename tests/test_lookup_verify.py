"""seek_exact + verify_index tests (terms_enumerator/codec_util parity)."""

import glob
import os

import pytest

from ocaml_lucene_spark.index.build import assign_doc_ids, build_index
from ocaml_lucene_spark.oracle import OracleIndex
from ocaml_lucene_spark.query.lookup import seek_exact, verify_index


@pytest.fixture(scope="module")
def built(spark, tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index_lookup"))
    docs = assign_doc_ids(spark.read.parquet(tiny_corpus)).select("doc_id", "text").cache()
    build_index(docs, index_dir, n_partitions=4)
    texts = {r.doc_id: r.text for r in docs.collect()}
    return index_dir, OracleIndex.from_texts(texts)


def test_seek_exact_matches_oracle_stats(spark, built):
    index_dir, oracle = built
    stats = oracle.term_stats()
    for term in list(stats)[:20]:
        st = seek_exact(spark, index_dir, term)
        assert st is not None, term
        assert (st["doc_freq"], st["total_term_freq"]) == stats[term], term
        assert sum(b["n"] for b in st["blocks"]) == stats[term][0]


def test_seek_exact_absent_and_singleton(spark, built):
    index_dir, oracle = built
    assert seek_exact(spark, index_dir, "zzznotaterm") is None
    singles = [t for t, (df, _) in oracle.term_stats().items() if df == 1]
    if singles:
        st = seek_exact(spark, index_dir, singles[0])
        assert st["singleton_doc_id"] is not None
        assert st["singleton_doc_id"] in oracle.postings[singles[0]]


def test_verify_index_clean(spark, built):
    index_dir, _ = built
    summary = verify_index(spark, index_dir)
    assert summary["segments"] == 1 and summary["shards"] >= 1


def test_verify_index_detects_corruption(spark, built):
    index_dir, _ = built
    shard = sorted(glob.glob(index_dir + "/segments/*/postings/part-*.parquet"))[0]
    backup = open(shard, "rb").read()
    try:
        # truncate a shard: verify must fail loudly, not return stale ok
        with open(shard, "wb") as f:
            f.write(backup[: len(backup) // 2])
        with pytest.raises(Exception):
            verify_index(spark, index_dir)
    finally:
        with open(shard, "wb") as f:
            f.write(backup)
    assert verify_index(spark, index_dir)["segments"] == 1


def test_fst_term_index_matches_oracle(spark, built):
    """The in-memory FST term dictionary (hot-segment path) agrees with
    the oracle on every term's (df, ttf) and rejects absent terms with
    no Spark job."""
    from ocaml_lucene_spark.index.segments import list_segments
    from ocaml_lucene_spark.query.lookup import seek_exact
    from ocaml_lucene_spark.query.term_index import load_term_index, seek_exact_mem

    index_dir, oracle = built
    segs = list_segments(index_dir)
    tis = [load_term_index(index_dir, r["segment"]) for r in segs]
    assert sum(ti.n_terms for ti in tis) >= len(oracle.term_stats())
    expected = oracle.term_stats()
    for term, (df, ttf) in list(expected.items()):
        got = seek_exact_mem(index_dir, term)
        assert got is not None and (got["doc_freq"], got["total_term_freq"]) == (df, ttf), term
    assert seek_exact_mem(index_dir, "zzz-not-a-term") is None
    # the full seek_exact FST path agrees with the scan path
    some = sorted(expected)[:5] + ["zzz-not-a-term"]
    for term in some:
        a = seek_exact(spark, index_dir, term, use_fst=True)
        b = seek_exact(spark, index_dir, term, use_fst=False)
        if b is None:
            assert a is None
        else:
            assert a["doc_freq"] == b["doc_freq"] and a["total_term_freq"] == b["total_term_freq"]


def test_fst_all_stats_enumeration_zero_jobs(spark, built):
    """all_stats_mem enumerates the FULL terms dictionary from the
    in-memory FST (items() walks arcs in byte order) and matches the
    oracle exactly — without launching a single Spark job."""
    from ocaml_lucene_spark.query.term_index import all_stats_mem, load_term_index

    index_dir, oracle = built
    load_term_index(index_dir, "seg000001")  # warm the cache outside the count
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    stats = all_stats_mem(index_dir)
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, "in-memory dictionary enumeration ran Spark jobs"
    assert stats == oracle.term_stats()
    # negative seek is also job-free
    from ocaml_lucene_spark.query.term_index import seek_exact_mem

    before = set(tracker.getJobIdsForGroup(None))
    assert seek_exact_mem(index_dir, "zzz-absent") is None
    assert set(tracker.getJobIdsForGroup(None)) == before


def test_fst_prefix_scan(spark, built):
    """prefix_items enumerates exactly the keys under a prefix in byte
    order (incl. the prefix itself when it is a term); absent prefixes
    yield nothing; prefix_stats_mem launches no Spark jobs."""
    from ocaml_lucene_spark.fst.transducer import FstBuilder
    from ocaml_lucene_spark.query.term_index import prefix_stats_mem

    keys = sorted(["s", "scan", "scans", "sort", "tab", "table", "tables"])
    b = FstBuilder()
    for i, k in enumerate(keys):
        b.add(k.encode(), i)
    fst = b.finish()
    for prefix, want in (
        (b"s", ["s", "scan", "scans", "sort"]),
        (b"scan", ["scan", "scans"]),
        (b"tab", ["tab", "table", "tables"]),
        (b"tables", ["tables"]),
        (b"z", []),
        (b"scanner", []),
        (b"", keys),
    ):
        got = [(k.decode(), o) for k, o in fst.prefix_items(prefix)]
        assert [k for k, _ in got] == want, (prefix, got)
        for k, o in got:
            assert o == keys.index(k)

    index_dir, oracle = built
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    stats = prefix_stats_mem(index_dir, "s")
    assert set(tracker.getJobIdsForGroup(None)) == before
    expected = {t: v for t, v in oracle.term_stats().items() if t.startswith("s")}
    assert stats == expected

    # range read [f, m): byte-ordered enumeration with early stop
    from ocaml_lucene_spark.query.term_index import range_stats_mem

    got_r = range_stats_mem(index_dir, "f", "m")
    exp_r = {t: v for t, v in oracle.term_stats().items() if "f" <= t < "m"}
    assert got_r == exp_r
    assert range_stats_mem(index_dir, "zz", "zza") == {}

    # wildcard expansion: '*' any run, '?' one char, literals literal
    import fnmatch

    from ocaml_lucene_spark.query.term_index import wildcard_stats_mem

    for pat in ("s?a*", "*a*", "s*", "q??r?", "*zzz*"):
        got_w = wildcard_stats_mem(index_dir, pat)
        exp_w = {
            t: v
            for t, v in oracle.term_stats().items()
            if fnmatch.fnmatchcase(t, pat)
        }
        assert got_w == exp_w, (pat, sorted(got_w), sorted(exp_w))


def test_prefix_oracle_escapes_like_metachars(spark, built):
    """A prefix containing LIKE metacharacters ('_'/'%') must match
    LITERALLY on both sides: the FST expansion finds nothing for 's_'
    (tokens are [a-z0-9]+), and the escaped SQL oracle agrees instead
    of treating '_' as a wildcard."""
    import duckdb

    from ocaml_lucene_spark.query.exec import bm25_topk_prefix
    from ocaml_lucene_spark.query.oracle_sql import bm25_topk_prefix_sql

    index_dir, _ = built
    assert bm25_topk_prefix(spark, index_dir, "s_").count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    assert con.execute(bm25_topk_prefix_sql("s_")).fetchall() == []
    # and a sane prefix still matches on both sides
    assert con.execute(bm25_topk_prefix_sql("s")).fetchall()


def test_fuzzy_expansion(spark, built):
    """edit_distance_leq is a correct bounded Levenshtein; the fuzzy
    dictionary expansion matches a brute-force reference and launches
    no Spark jobs."""
    from ocaml_lucene_spark.query.term_index import edit_distance_leq, fuzzy_stats_mem

    def ref(a, b):  # unbounded classic DP
        la, lb = len(a), len(b)
        d = [[i + j if i * j == 0 else 0 for j in range(lb + 1)] for i in range(la + 1)]
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1, d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[la][lb]

    import random

    rng = random.Random(6)
    words = ["sort", "short", "s", "", "spark", "park", "sport", "query", "qery"]
    words += ["".join(rng.choice("abc") for _ in range(rng.randint(0, 6))) for _ in range(40)]
    for a in words:
        for b in words:
            for kk in (0, 1, 2, 3):
                assert edit_distance_leq(a, b, kk) == (ref(a, b) <= kk), (a, b, kk)

    index_dir, oracle = built
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    got = fuzzy_stats_mem(index_dir, "sort", 2)
    assert set(tracker.getJobIdsForGroup(None)) == before
    expected = {t: v for t, v in oracle.term_stats().items() if ref(t, "sort") <= 2}
    assert got == expected


def test_fst_term_index_cache_invalidates_on_rebuild(spark, tmp_path_factory):
    """Round-2 ADVICE: rebuilding a segment in place must not serve
    stale df/ttf from the cached TermIndex (cache key carries a terms-
    dir fingerprint)."""
    from ocaml_lucene_spark.query.term_index import seek_exact_mem

    index_dir = str(tmp_path_factory.mktemp("index_ticache"))
    d1 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha")], "doc_id long, text string"
    )
    build_index(d1, index_dir, segment="s", n_partitions=2)
    assert seek_exact_mem(index_dir, "alpha")["doc_freq"] == 2

    import shutil

    shutil.rmtree(index_dir)
    d2 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha"), (2, "alpha gamma")],
        "doc_id long, text string",
    )
    build_index(d2, index_dir, segment="s", n_partitions=2)
    got = seek_exact_mem(index_dir, "alpha")
    assert got["doc_freq"] == 3, got  # stale cache would say 2
    assert seek_exact_mem(index_dir, "gamma") is not None


def test_fst_term_index_dictionary_scale():
    """FST dictionary at reference test scale (~4.3k keys): minimality
    (suffix sharing) keeps it far below the raw key bytes."""
    from ocaml_lucene_spark.fst.transducer import FstBuilder

    keys = sorted({f"pre{i % 40}fix{i}suffix{i % 7}" for i in range(4300)})
    b = FstBuilder()
    for i, k in enumerate(keys):
        b.add(k.encode(), i)
    fst = b.finish()
    for i, k in enumerate(keys):
        assert fst.lookup(k.encode()) == i
    assert fst.lookup(b"absent") is None


def test_matching_docs_filter_context(spark, built):
    """ConstantScoreQuery semantics vs the pure-Python oracle: exact
    boolean set algebra, no scores; min_should_match honored."""
    from ocaml_lucene_spark.query.exec import (
        count_matching_indexed,
        matching_docs_indexed,
    )

    index_dir, oracle = built
    terms = sorted(oracle.term_stats(), key=lambda t: -oracle.term_stats()[t][0])
    a, b, c = terms[0], terms[1], terms[10]
    docs_a = set(oracle.postings[a])
    docs_b = set(oracle.postings[b])
    docs_c = set(oracle.postings[c])

    got = {r.doc_id for r in matching_docs_indexed(
        spark, index_dir, must=[a, b]).collect()}
    assert got == docs_a & docs_b

    got = {r.doc_id for r in matching_docs_indexed(
        spark, index_dir, should=[a, c]).collect()}
    assert got == docs_a | docs_c

    got = {r.doc_id for r in matching_docs_indexed(
        spark, index_dir, must=[a], must_not=[b]).collect()}
    assert got == docs_a - docs_b

    got = {r.doc_id for r in matching_docs_indexed(
        spark, index_dir, should=[a, b, c], min_should_match=2).collect()}
    expect = {d for d in docs_a | docs_b | docs_c
              if (d in docs_a) + (d in docs_b) + (d in docs_c) >= 2}
    assert got == expect

    n = count_matching_indexed(spark, index_dir, should=[a, c]).collect()[0].n_hits
    assert n == len(docs_a | docs_c)


def test_search_after_pagination_walks_full_ranking(spark, built):
    """Paging with the cursor must reproduce the full ranking exactly
    (incl. crossing score-tie boundaries), with no dup/skip between
    pages."""
    from ocaml_lucene_spark.query.exec import bm25_topk_indexed

    index_dir, oracle = built
    terms = sorted(oracle.term_stats(), key=lambda t: -oracle.term_stats()[t][0])[:2]
    full = bm25_topk_indexed(
        spark, index_dir, terms, "or", 25, round_to=4
    ).collect()
    assert len(full) > 20
    k = 5
    paged, cursor = [], None
    for _ in range(4):  # 4 pages == full[:20], crossing tie boundaries
        rows = bm25_topk_indexed(
            spark, index_dir, terms, "or", k, round_to=4, after=cursor
        ).collect()
        assert rows
        paged.extend(rows)
        cursor = (rows[-1].score, rows[-1].doc_id)
    assert [(r.doc_id, r.score) for r in paged] == [
        (r.doc_id, r.score) for r in full[:20]
    ]
    # unrounded cursors are float-fuzzy (== on raw floats can dup/skip
    # tied rows across pages) — the API refuses them up front
    with pytest.raises(ValueError, match="round_to"):
        bm25_topk_indexed(spark, index_dir, terms, "or", k, after=(1.5, 3))


def test_dismax_combines_per_field_scores(spark, built, tiny_corpus, tmp_path_factory):
    """DisMax over two per-field indexes == the python combination of
    the two fields' own BM25 scores (tie_breaker 0, 0.3, and 1.0)."""
    from pyspark.sql import functions as F

    from ocaml_lucene_spark.functions.analysis import tokens_col
    from ocaml_lucene_spark.query.exec import bm25_topk_dismax, bm25_topk_indexed

    index_dir, oracle = built
    title_dir = str(tmp_path_factory.mktemp("index_title"))
    tdocs = assign_doc_ids(spark.read.parquet(tiny_corpus)).select(
        "doc_id", F.array_join(F.slice(tokens_col("text"), 1, 8), " ").alias("text")
    )
    build_index(tdocs, title_dir, segment="title", n_partitions=4)

    terms = sorted(oracle.term_stats(), key=lambda t: -oracle.term_stats()[t][0])[:2]
    sb = {r.doc_id: r.score for r in bm25_topk_indexed(
        spark, index_dir, terms, "or", k=None).collect()}
    st = {r.doc_id: r.score for r in bm25_topk_indexed(
        spark, title_dir, terms, "or", k=None).collect()}
    assert sb and st and sb != st  # the fields genuinely differ
    for tie in (0.0, 0.3, 1.0):
        got = [(r.doc_id, r.score) for r in bm25_topk_dismax(
            spark, {"title": title_dir, "body": index_dir}, terms,
            k=10, tie_breaker=tie, round_to=4).collect()]
        comb = {}
        for d in set(sb) | set(st):
            a, b = st.get(d, 0.0), sb.get(d, 0.0)
            comb[d] = round(max(a, b) + tie * (a + b - max(a, b)), 4)
        expect = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == [(d, s) for d, s in expect], tie


def test_regexp_expansion_matches_python_re(spark, built):
    """regexp_stats_mem == fullmatch filter over the oracle dictionary
    (incl. patterns with no literal prefix and no matches); zero Spark
    jobs."""
    import re

    from ocaml_lucene_spark.query.term_index import regexp_stats_mem

    index_dir, oracle = built
    stats = oracle.term_stats()
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    # adversarial patterns for naive scan-to-first-metachar prefix
    # extraction (r4 bug): a trailing quantifier makes its literal char
    # optional, and a top-level | makes the whole literal run optional.
    # Derived from the REAL dictionary so the cases are non-vacuous:
    # (t, t+c) both being terms means 'tc?' must return both — the
    # naive prefix 'tc' would drop t.
    terms = sorted(stats)
    pair = next(
        (a, b)
        for a in terms
        for b in terms
        if b.startswith(a) and len(b) == len(a) + 1
    )
    quant_pat = re.escape(pair[0]) + re.escape(pair[1][-1]) + "?"
    alt_pat = re.escape(terms[0]) + "|" + re.escape(terms[-1])
    for pat, min_matches in [
        (r"s[aeiou].*", 0), (r".*ing", 0), (r"zz.*", 0),
        (r"[a-f]{3,5}", 0), (r"data[0-9]?", 0),
        (quant_pat, 2), (alt_pat, 2),
    ]:
        got = regexp_stats_mem(index_dir, pat)
        expect = {t: v for t, v in stats.items() if re.fullmatch(pat, t)}
        assert got == expect, pat
        assert len(got) >= min_matches, (pat, "vacuous adversarial case")
        # the prefix-subtree fallback path must agree with the
        # automaton∩FST primary path term-for-term
        assert regexp_stats_mem(index_dir, pat, use_automaton=False) == got, pat
    assert set(tracker.getJobIdsForGroup(None)) == before


def test_mandatory_literal_prefix_soundness():
    """The FST-subtree prefix must be MANDATORY: every string matching
    the pattern starts with it (quantifiers drop their folded literal,
    top-level alternation yields the empty prefix, min>=1 repeats keep
    one copy)."""
    from ocaml_lucene_spark.query.term_index import _mandatory_literal_prefix as mlp

    assert mlp("abc") == "abc"
    assert mlp("abc*") == "ab"       # c optional
    assert mlp("abd?") == "ab"       # d optional
    assert mlp("ab{0,2}") == "a"     # b optional
    assert mlp("abc+") == "abc"      # min 1 -> one mandatory c
    assert mlp("ab{2,5}") == "ab"    # min 2 -> at least one b
    assert mlp("ab|cd") == ""        # top-level alternation
    assert mlp("a|b") == ""
    assert mlp("ab(c|d)") == "ab"    # grouped alternation: ab mandatory
    assert mlp("s.a.*") == "s"
    assert mlp(".*ing") == ""
    assert mlp("^abc") == ""         # conservative on anchors
    assert mlp("(") == ""            # unparseable -> empty, no raise


def test_more_like_this_selects_informative_terms(spark, built, tiny_corpus):
    """MLT's term selection = top tf·idf of the source doc (rounded-6
    tie contract), and its result equals a plain BM25 over exactly that
    selection."""
    import math
    from collections import Counter

    from ocaml_lucene_spark.query.exec import bm25_topk_indexed, more_like_this

    index_dir, oracle = built
    docs = assign_doc_ids(spark.read.parquet(tiny_corpus)).select("doc_id", "text")
    src_tokens = None
    did = 3
    for d, toks in ((r.doc_id, r.text) for r in docs.collect()):
        if d == did:
            src_tokens = toks
    assert src_tokens is not None
    from ocaml_lucene_spark.functions.analysis import py_tokenize

    tfs = Counter(py_tokenize(src_tokens))
    n = oracle.n_docs
    stats = oracle.term_stats()
    weights = sorted(
        (
            (-round(tf * math.log(1.0 + (n - stats[t][0] + 0.5) / (stats[t][0] + 0.5)), 6), t)
            for t, tf in tfs.items()
            if t in stats
        )
    )
    sel = sorted(t for _, t in weights[:5])
    got = [(r.doc_id, r.score) for r in more_like_this(
        spark, index_dir, docs, did, k=10, max_query_terms=5, round_to=4).collect()]
    expect = [(r.doc_id, r.score) for r in bm25_topk_indexed(
        spark, index_dir, sel, "or", 10, round_to=4).collect()]
    assert got == expect and got
