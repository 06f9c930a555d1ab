"""Grouping / faceting / suggest / pluggable-similarity surface.

The gate replica (test_entry.py) already runs each entry against its
DuckDB oracle in driver-hash mode; these tests pin the structural
properties the oracles can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.query import grouping, similarity, suggest
from ocaml_lucene_spark.query.bm25 import bm25_topk
from ocaml_lucene_spark.query.term_index import (
    all_stats_mem,
    edit_distance_leq,
)

SF = "/root/testdata/sf0.001"
TERMS = ["table", "hash", "dup"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def index_dir(spark):
    import __spark_entry__ as entry

    return entry._ensure_index(spark, SF)


def test_collapse_one_row_per_key_and_best_doc(docs):
    rows = grouping.bm25_collapse_topk(docs, TERMS, "source", k=1000).collect()
    keys = [r.collapse_key for r in rows]
    assert len(keys) == len(set(keys)), "collapse must keep one doc per key"
    # each kept doc is its group's (score desc, doc_id asc) max over the
    # full (uncollapsed) score table
    full = {
        (r.doc_id): r.score
        for r in grouping._bm25_doc_scores(docs, TERMS, round_to=4).collect()
    }
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    best = {}
    for d, s in sorted(full.items()):
        key = src[d]
        if key not in best or (-s, d) < (-best[key][1], best[key][0]):
            best[key] = (d, s)
    for r in rows:
        assert best[r.collapse_key] == (r.doc_id, r.score)


def test_collapse_subset_of_topk_scores(docs):
    # collapsed top-k scores are a subset of the uncollapsed ranking
    plain = {r.doc_id: r.score for r in bm25_topk(docs, TERMS, k=1000, round_to=4).collect()}
    for r in grouping.bm25_collapse_topk(docs, TERMS, "source", k=10).collect():
        assert plain[r.doc_id] == r.score


def test_facet_counts_sum_equals_match_count(docs):
    facs = grouping.facet_counts(docs, ["table", "scan"], "lang").collect()
    total = sum(r.n_docs for r in facs)
    toks = docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"
        ).alias("t"),
    )
    n = (
        toks.filter(
            F.array_contains("t", "table") & F.array_contains("t", "scan")
        ).count()
    )
    assert total == n


def test_facet_indexed_equals_logical(spark, docs, index_dir):
    a = grouping.facet_counts(docs, ["table", "scan"], "lang").collect()
    b = grouping.facet_counts_indexed(
        spark, index_dir, docs, ["table", "scan"], "lang"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_spell_suggest_matches_exhaustive_dictionary(spark, index_dir):
    got = [tuple(r) for r in suggest.spell_suggest(spark, index_dir, "bat", 2, 50).collect()]
    stats = all_stats_mem(index_dir)
    want = sorted(
        ((t, df) for t, (df, _ttf) in stats.items() if edit_distance_leq(t, "bat", 2)),
        key=lambda r: (-r[1], r[0]),
    )[:50]
    assert got == want
    assert got, "probe term must have at least one candidate"


def test_complete_fuzzy_matches_exhaustive_and_beats_plain_prefix(spark, index_dir):
    from ocaml_lucene_spark.query.term_index import (
        _some_prefix_within,
        fuzzy_prefix_stats_mem,
    )

    got = [
        tuple(r)
        for r in suggest.complete_fuzzy(spark, index_dir, "sta", max_edits=1, k=50).collect()
    ]
    stats = all_stats_mem(index_dir)
    want = sorted(
        ((t, df) for t, (df, _ttf) in stats.items() if _some_prefix_within(t, "sta", 1)),
        key=lambda r: (-r[1], r[0]),
    )[:50]
    assert got == want
    assert got, "probe prefix must have candidates"
    # typo tolerance: must include a term that does NOT start with "sta"
    assert any(not t.startswith("sta") for t, _ in got), got
    # the automaton path equals the exhaustive stats path wholesale
    assert fuzzy_prefix_stats_mem(index_dir, "sta", 1) == fuzzy_prefix_stats_mem(
        index_dir, "sta", 1, use_automaton=False
    )


def test_tfidf_and_bm25_rank_differently_but_share_plan_shape(docs):
    # ClassicSimilarity is a different formula; both orderings are
    # internally consistent (score desc, doc_id asc)
    rows = similarity.tfidf_classic_topk(docs, TERMS, k=20).collect()
    assert rows == sorted(rows, key=lambda r: (-r.score, r.doc_id))
    assert all(r.score > 0 for r in rows)


def test_boost_one_reduces_to_bm25(docs):
    b1 = [
        tuple(r)
        for r in similarity.bm25_topk_boosted(
            docs, {t: 1.0 for t in TERMS}, k=20
        ).collect()
    ]
    plain = [tuple(r) for r in bm25_topk(docs, TERMS, k=20, round_to=4).collect()]
    assert b1 == plain


def test_boost_scales_single_term_scores(docs):
    one = {r.doc_id: r.score for r in similarity.bm25_topk_boosted(docs, {"dup": 1.0}, k=1000).collect()}
    three = {r.doc_id: r.score for r in similarity.bm25_topk_boosted(docs, {"dup": 3.0}, k=1000).collect()}
    assert set(one) == set(three)
    for d, s in one.items():
        assert abs(three[d] - 3.0 * s) < 2e-4  # rounded at 4dp on both sides


def test_boosting_demotes_never_drops(docs):
    from ocaml_lucene_spark.query.bm25 import bm25_topk_boosting

    plain = {
        r.doc_id: r.score
        for r in bm25_topk(docs, ["table", "hash"], k=10000, round_to=4).collect()
    }
    boosted = {
        r.doc_id: r.score
        for r in bm25_topk_boosting(
            docs, ["table", "hash"], ["dup"], negative_boost=0.5, k=10000
        ).collect()
    }
    # same match set: negative terms demote, never drop (vs must_not)
    assert set(plain) == set(boosted)
    neg_docs = {
        r.doc_id
        for r in docs.select(
            "doc_id",
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')").alias("t"),
        )
        .filter(F.array_contains("t", "dup"))
        .collect()
    }
    hit = 0
    for d, s in plain.items():
        if d in neg_docs:
            hit += 1
            # single-round contract: demoted = round(raw * 0.5), so it
            # can differ from round(plain)*0.5 by at most the 4dp step
            assert abs(boosted[d] - 0.5 * s) < 2e-4
        else:
            assert boosted[d] == s
    assert hit > 0, "corpus must exercise the demotion path"


def test_boosting_boost_one_reduces_to_bm25(docs):
    from ocaml_lucene_spark.query.bm25 import bm25_topk_boosting

    b1 = [
        tuple(r)
        for r in bm25_topk_boosting(
            docs, ["table", "hash"], ["dup"], negative_boost=1.0, k=20
        ).collect()
    ]
    plain = [
        tuple(r) for r in bm25_topk(docs, ["table", "hash"], k=20, round_to=4).collect()
    ]
    assert b1 == plain


def test_synonym_singleton_reduces_to_single_term_bm25(docs):
    syn = [tuple(r) for r in __import__("ocaml_lucene_spark.query.bm25", fromlist=["x"]).bm25_topk_synonym(docs, ["dup"], k=50).collect()]
    plain = [tuple(r) for r in bm25_topk(docs, ["dup"], k=50, round_to=4).collect()]
    assert syn == plain


def test_synonym_blends_stats_sum_tf_max_df(docs):
    from ocaml_lucene_spark.query.bm25 import bm25_topk_synonym, candidate_tf, corpus_stats
    import math

    K1, B = 1.2, 0.75
    rows = candidate_tf(docs, ["join", "merge"]).collect()
    st = corpus_stats(docs).collect()[0]
    n, avgdl = st.n_docs, st.avgdl
    df = {}
    for r in rows:
        df[r.term] = df.get(r.term, 0) + 1
    df_max = max(df.values())
    per_doc = {}
    for r in rows:
        tf, dl = per_doc.get(r.doc_id, (0, r.dl))
        per_doc[r.doc_id] = (tf + r.tf, r.dl)
    idf = math.log(1.0 + (n - df_max + 0.5) / (df_max + 0.5))
    want = sorted(
        (
            (round(idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl)), 4), d)
            for d, (tf, dl) in per_doc.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = [(r.score, r.doc_id) for r in bm25_topk_synonym(docs, ["join", "merge"], k=20).collect()]
    assert got == [(s, d) for s, d in want]


def test_parent_join_modes_match_python_reference(docs):
    import math

    scores = {
        r.doc_id: r.score
        for r in grouping._bm25_doc_scores(docs, TERMS, round_to=4).collect()
    }
    parent_of = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    groups = {}
    for d in sorted(scores):
        groups.setdefault(parent_of[d], []).append(scores[d])
    for mode, red in (
        ("sum", lambda v: round(math.fsum([]) + sum(v), 4)),
        ("avg", lambda v: round(sum(v) / len(v), 4)),
        ("max", max),
        ("min", min),
    ):
        got = [
            (r.parent, r.score, r.n_children)
            for r in grouping.bm25_parent_join_topk(
                docs, TERMS, "source", mode, k=1000
            ).collect()
        ]
        want = sorted(
            ((p, red(v), len(v)) for p, v in groups.items()),
            key=lambda x: (-x[1], x[0]),
        )
        assert got == want, mode


def test_explain_contributions_reproduce_ranked_score(docs):
    from ocaml_lucene_spark.query.bm25 import explain_score

    ranked = {r.doc_id: r.score for r in bm25_topk(docs, TERMS, k=1000, round_to=4).collect()}
    doc = sorted(ranked)[0]
    rows = explain_score(docs, TERMS, doc).collect()
    assert rows, "doc must match at least one term"
    # contributions are rounded individually; the ranked score rounds
    # the unrounded sum — allow only rounding slack
    assert abs(sum(r.contribution for r in rows) - ranked[doc]) < 5e-4 * len(rows)
    for r in rows:
        assert r.tf >= 1 and r.df >= 1 and r.dl > 0
        assert abs(r.idf * r.tfn - r.contribution) < 5e-4


def test_rescore_beta_zero_reduces_to_bm25(spark, docs):
    from ocaml_lucene_spark.query.rescore import rescore_topk
    import __spark_entry__ as entry

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = entry._query_vec(SF)
    got = [
        (r.doc_id, r.score)
        for r in rescore_topk(docs, vecs, TERMS, qv, n_first=50, k=20, beta=0.0).collect()
    ]
    want = [tuple(r) for r in bm25_topk(docs, TERMS, k=20, round_to=4).collect()]
    assert got == want


def test_rrf_score_formula(spark, docs):
    from ocaml_lucene_spark.query.rescore import rrf_fusion_topk
    import __spark_entry__ as entry

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = entry._query_vec(SF)
    rows = rrf_fusion_topk(docs, vecs, TERMS, qv, n_each=50, k=200).collect()
    assert rows, "fusion must produce rows"
    for r in rows:
        want = 0.0
        if r.bm25_rank > 0:
            want += 1.0 / (60 + r.bm25_rank)
        if r.sim_rank > 0:
            want += 1.0 / (60 + r.sim_rank)
        assert abs(r.score - round(want, 6)) < 1e-9
        assert r.bm25_rank > 0 or r.sim_rank > 0
    # both rankings' #1 docs must be present
    ranks1 = [r.doc_id for r in rows if r.bm25_rank == 1] + [
        r.doc_id for r in rows if r.sim_rank == 1
    ]
    assert len(ranks1) == 2


def test_percolator_boolean_semantics(spark):
    from ocaml_lucene_spark.query.percolator import percolate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),   # duplicate tokens count once
            (3, "beta"),
            (4, "epsilon"),
        ],
        "doc_id long, text string",
    )
    rules = spark.createDataFrame(
        [
            (10, ["alpha", "beta"], 2),            # AND
            (11, ["alpha", "beta"], 1),            # OR
            (12, ["alpha", "beta", "delta"], 2),   # 2-of-3
            (13, ["alpha", "alpha"], 2),           # dup rule terms -> 1 distinct, unmatchable
            (14, ["zeta"], 1),                     # never matches
        ],
        "query_id long, terms array<string>, min_match int",
    )
    got = sorted(tuple(r) for r in percolate(docs, rules).collect())
    assert got == [
        (1, 10), (1, 11), (1, 12),
        (2, 11), (2, 12),
        (3, 11),
    ]


def test_percolator_broadcasts_the_rule_table(spark, docs):
    import contextlib, io, re as _re

    from ocaml_lucene_spark.query.percolator import percolate

    rules = spark.createDataFrame(
        [(1, ["table"], 1)], "query_id long, terms array<string>, min_match int"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        percolate(docs, rules).explain(mode="formatted")
    assert "BroadcastExchange" in buf.getvalue()


def test_significant_terms_identical_across_broadcast_threshold(docs):
    # the foreground tag join must produce the same result whether the
    # match set broadcasts (small n_fg) or falls back to a shuffle join
    # (fg_broadcast_max=0 forces the fallback)
    a = grouping.significant_terms(docs, ["table"], k=10).collect()
    b = grouping.significant_terms(docs, ["table"], k=10, fg_broadcast_max=0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 10


def test_rrf_indexed_all_cells_equals_brute_force(spark, docs, tmp_path_factory):
    # probing ALL IVF cells makes the dense leg cover the whole corpus,
    # so the indexed fusion must reproduce the brute-force fusion
    # exactly (shared _rrf_combine; same (doc_id, sim) contract)
    import __spark_entry__ as entry
    from ocaml_lucene_spark.operators import ann
    from ocaml_lucene_spark.query.rescore import (
        rrf_fusion_topk,
        rrf_fusion_topk_indexed,
    )

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = entry._query_vec(SF)
    cents = entry._ivf_kmeans_centroids(SF)
    idx = str(tmp_path_factory.mktemp("ivf_rrf"))
    ann.build_ivf_index(vecs, idx, cents)
    brute = rrf_fusion_topk(docs, vecs, TERMS, qv, n_each=50, k=10).collect()
    indexed = rrf_fusion_topk_indexed(
        docs, spark, idx, cents, TERMS, qv, n_each=50, k=10, n_probe=len(cents)
    ).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in brute]


def test_filters_agg_counts_match_conjunctive_match_sets(docs):
    from ocaml_lucene_spark.functions.analysis import tokens_col

    got = {
        r.filter_name: r.n_docs
        for r in grouping.filters_agg(
            docs, {"a_zipf": ["zipf"], "b_both": ["zipf", "data"]}
        ).collect()
    }
    toks = docs.select(F.col("doc_id"), tokens_col("text").alias("t"))
    n_zipf = toks.filter(F.array_contains("t", "zipf")).count()
    n_both = toks.filter(
        F.array_contains("t", "zipf") & F.array_contains("t", "data")
    ).count()
    assert got == {"a_zipf": n_zipf, "b_both": n_both}


def test_top_hits_grouped_rank1_is_group_max(docs):
    rows = grouping.top_hits_by_group(docs, TERMS, "lang", per_group=2).collect()
    assert rows, "query must match something"
    # per key: ranks are 1..min(per_group, n_hits), rank-1 score is the max
    by_key = {}
    for r in rows:
        by_key.setdefault(r.group_key, []).append(r)
    full = grouping._bm25_doc_scores(docs, TERMS, round_to=4)
    keyed = full.join(
        docs.select("doc_id", F.col("lang").alias("group_key")), "doc_id"
    )
    for key, group in by_key.items():
        ranks = sorted(r.rank for r in group)
        assert ranks == list(range(1, len(group) + 1))
        best = (
            keyed.filter(F.col("group_key") == key)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .first()
        )
        top = min(group, key=lambda r: r.rank)
        assert (top.doc_id, top.score) == (best["doc_id"], best["score"])
        assert all(g.n_hits == keyed.filter(F.col("group_key") == key).count() for g in group)


def test_value_histogram_buckets_partition_the_total(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = grouping.value_histogram(ev, interval=25).collect()
    assert sum(r.n_events for r in rows) == ev.count()
    total = sum(r.sum_value for r in rows)
    # quantized bucket sums recombine to the quantized global sum
    want = ev.select(grouping._quantized_sum("value", 100).alias("s")).first()["s"]
    assert abs(total - want) < 1e-6


def test_function_score_combines_rounded_stages(docs):
    from ocaml_lucene_spark.query.similarity import bm25_function_score_topk

    rows = bm25_function_score_topk(docs, TERMS, k=10).collect()
    assert rows
    chars = {
        r.doc_id: r.n_chars
        for r in docs.select("doc_id", "n_chars").collect()
    }
    for r in rows:
        f = 1.0 / (1.0 + chars[r.doc_id] / 1000.0)
        assert r.factor == round(f, 4)
        assert r.score == round(r.bm25 * f, 4)
    # deterministic ordering
    assert [(r.score, r.doc_id) for r in rows] == sorted(
        [(r.score, r.doc_id) for r in rows], key=lambda t: (-t[0], t[1])
    )


def test_phrase_suggest_corrects_the_typo(spark, docs, index_dir):
    from ocaml_lucene_spark.query.suggest import phrase_suggest

    rows = phrase_suggest(spark, index_dir, docs, "tabel", "hash", max_edits=2, k=5).collect()
    assert rows, "expected at least one candidate pair"
    # every suggested word is a real <=2-edit dictionary candidate
    for r in rows:
        assert edit_distance_leq("tabel", r.w1, 2)
        assert edit_distance_leq("hash", r.w2, 2)
    # the corrected phrase is among the suggestions (top-1 is
    # corpus-dependent: at sf0.001 'table fast' outnumbers 'table hash')
    assert ("table", "hash") in {(r.w1, r.w2) for r in rows}
    # counts decrease, ties ordered (w1, w2)
    ns = [r.n_bigram for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_adjacency_matrix_counts(spark):
    from ocaml_lucene_spark.query.grouping import adjacency_matrix

    texts = {
        0: "table hash",
        1: "table dup",
        2: "hash dup table",
        3: "nothing",
        4: "dup",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    rows = {
        r.bucket_key: r.n_docs
        for r in adjacency_matrix(
            docs, {"t": ["table"], "h": ["hash"], "d": ["dup"]}
        ).collect()
    }
    assert rows == {
        "t": 3, "h": 2, "d": 3,
        # pairs keyed in sorted-name order; empty buckets omitted
        "d&h": 1, "d&t": 2, "h&t": 2,
    }


def test_adjacency_matrix_omits_empty_buckets(spark):
    from ocaml_lucene_spark.query.grouping import adjacency_matrix

    docs = spark.createDataFrame([(0, "table only")], "doc_id long, text string")
    keys = [r.bucket_key for r in adjacency_matrix(
        docs, {"t": ["table"], "z": ["zebra"]}
    ).collect()]
    assert keys == ["t"]


def test_histogram_pipeline_cumsum_and_derivative(spark):
    from ocaml_lucene_spark.query.grouping import date_histogram_pipeline

    rows = [
        ("a", "2024-01-01 10:00:00", 1.25),
        ("a", "2024-01-01 11:00:00", 2.00),
        ("a", "2024-01-02 09:00:00", 0.50),
        ("a", "2024-01-03 09:00:00", 4.75),
        ("b", "2024-01-02 09:00:00", 10.00),
    ]
    events = spark.createDataFrame(
        [(k, ts, v) for k, ts, v in rows], "event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [
        (r.key, r.bucket, r.n_events, r.sum_value, r.cum_value, r.derivative)
        for r in date_histogram_pipeline(events).collect()
    ]
    assert got == [
        ("a", "2024-01-01", 2, 3.25, 3.25, None),   # first bucket: null derivative
        ("a", "2024-01-02", 1, 0.5, 3.75, -2.75),   # negative delta
        ("a", "2024-01-03", 1, 4.75, 8.5, 4.25),
        ("b", "2024-01-02", 1, 10.0, 10.0, None),
    ]


def test_composite_agg_pagination_walks_all_buckets(spark):
    from ocaml_lucene_spark.query.grouping import composite_agg

    rows = [(i, ["a", "b", "c"][i % 3], f"s{i % 4}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    all_rows = [tuple(r) for r in composite_agg(docs, size=100).collect()]
    assert len(all_rows) == 12
    # page through with size 5: concatenation == the full ordered set
    pages, after = [], None
    while True:
        page = [tuple(r) for r in composite_agg(docs, after=after, size=5).collect()]
        if not page:
            break
        pages.extend(page)
        after = page[-1][:2]
    assert pages == all_rows


def test_percentiles_agg_known_values(spark):
    from ocaml_lucene_spark.query.grouping import percentiles_agg

    # n_chars 0..9 for one key: p50 = 4.5, p90 = 8.1, p99 = 8.91
    docs = spark.createDataFrame(
        [(i, "en", i) for i in range(10)], "doc_id long, lang string, n_chars long"
    )
    r = percentiles_agg(docs).collect()[0]
    assert (r.key, r.p_50, r.p_90, r.p_99) == ("en", 4.5, 8.1, 8.91)


def test_percentile_ranks_known_values_and_half_boundary(spark):
    from ocaml_lucene_spark.query.grouping import percentile_ranks

    # n_chars 0..9 for "en": <=4 -> 5/10 = 50%, <=8 -> 90%;
    # "de" has n_chars 0,2,..,14: <=4 -> 3/8 = 37.5%, <=8 -> 5/8 =
    # 62.5% — 100*c/n lands EXACTLY on a .5 representation, the
    # half-boundary class _div_round_expr exists for
    docs = spark.createDataFrame(
        [(i, "en", i) for i in range(10)] + [(100 + i, "de", 2 * i) for i in range(8)],
        "doc_id long, lang string, n_chars long",
    )
    got = [tuple(r) for r in percentile_ranks(docs, values=(4, 8)).collect()]
    assert got == [("de", 8, 37.5, 62.5), ("en", 10, 50.0, 90.0)], got


def test_sort_by_field_plan_and_ascending(spark, docs, index_dir):
    from ocaml_lucene_spark.query.exec import search_sort_by_field_indexed

    desc = search_sort_by_field_indexed(
        spark, index_dir, docs, should=["table", "dup"], k=10
    )
    # top-k by field must compile to TakeOrderedAndProject (per-partition
    # heaps + driver merge), never a global Sort exchange
    plan = desc._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = desc.collect()
    vals = [r.n_chars for r in rows]
    assert vals == sorted(vals, reverse=True)
    # doc_id tie-break makes the order total within equal field values
    for a, b in zip(rows, rows[1:]):
        assert (a.n_chars, -a.doc_id) > (b.n_chars, -b.doc_id) or (
            a.n_chars == b.n_chars and a.doc_id < b.doc_id
        )
    asc = search_sort_by_field_indexed(
        spark, index_dir, docs, should=["table", "dup"], k=10, ascending=True
    ).collect()
    avals = [r.n_chars for r in asc]
    assert avals == sorted(avals)
    # same match set feeds both directions: the ascending head must be
    # disjoint from the descending head unless the set is tiny
    assert {r.doc_id for r in asc}.isdisjoint({r.doc_id for r in rows})


def test_auto_date_histogram_ladder_picks_day_at_small_target(spark):
    from ocaml_lucene_spark.query.grouping import auto_date_histogram, date_histogram

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # 30 daily buckets <= 100 < 720 hourly: the ladder must step to day
    got = auto_date_histogram(events, target_buckets=100).collect()
    assert all(r.interval == "day" for r in got)
    want = [tuple(r) for r in date_histogram(events, keys=()).collect()]
    assert [tuple(r)[1:] for r in got] == want
    # and too-small targets raise (past the ladder)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ladder"):
        auto_date_histogram(events, target_buckets=5)


def test_date_range_facets_overlapping_ranges_count_independently(spark):
    from ocaml_lucene_spark.query.grouping import date_range_facets

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = {r.range_name: r.n_events for r in date_range_facets(
        events,
        [("all", None, None), ("jan_a", "2024-01-01", "2024-01-16"),
         ("jan_b", "2024-01-10", None)],
    ).collect()}
    total = events.count()
    assert rows["all"] == total
    # overlap [01-10, 01-16) is double-counted across jan_a/jan_b
    assert rows["jan_a"] + rows["jan_b"] > total


def test_snippet_topk_picks_densest_earliest_window(spark):
    from ocaml_lucene_spark.query.highlight import snippet_topk

    rows = [
        # hits at 0 and 9 (far apart) then a dense cluster at 20,21,23
        (0, "table x x x x x x x x hash x x x x x x x x x x table hash x hash"),
        (1, "x table x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in snippet_topk(df, ["table", "hash"], k=10, width=4).collect()}
    # doc 0: window [20, 24) holds hits 20,21,23 -> 3 hits, beats any
    # 2-hit window; earliest tie-break is exercised by doc 1 (1 hit,
    # window anchored at its only hit)
    assert (got[0].win_start, got[0].n_hits, got[0].snippet) == (20, 3, "table hash x hash")
    assert (got[1].win_start, got[1].n_hits, got[1].snippet) == (1, 1, "table x")


def test_combined_fields_accumulates_across_fields_unlike_dismax(spark):
    from ocaml_lucene_spark.query.bm25 import bm25_topk_combined_fields

    rows = [
        (0, "table join", "table"),   # term in BOTH fields
        (1, "table join", "other"),   # text only
        (2, "scan merge", "table"),   # source only
        (3, "scan merge", "other"),   # no match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r.score for r in bm25_topk_combined_fields(
        df, ["table"], {"text": 1.0, "source": 2.0}, k=10
    ).collect()}
    assert set(got) == {0, 1, 2}
    # the both-fields doc has tf_c = 1*1 + 2*1 = 3: strictly the best
    assert got[0] > got[1] and got[0] > got[2]
    # python reference for doc 0: df over the synthetic field = 3,
    # n = 4, dl_c = w1*2 + w2*1, avgdl = mean of dl_c
    import math

    dls = {0: 1.0 * 2 + 2.0 * 1, 1: 1.0 * 2 + 2.0 * 1,
           2: 1.0 * 2 + 2.0 * 1, 3: 1.0 * 2 + 2.0 * 1}
    avgdl = sum(dls.values()) / 4
    idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    tf0 = 3.0
    want0 = round(idf * (tf0 * 2.2) / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dls[0] / avgdl)), 4)
    assert got[0] == want0


def test_combined_fields_weight_one_single_field_reduces_to_bm25(spark):
    from ocaml_lucene_spark.query.bm25 import bm25_topk_combined_fields

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in bm25_topk_combined_fields(
        docs, ["table", "hash"], {"text": 1.0}, k=20
    ).collect()]
    b = [tuple(r) for r in bm25_topk(docs, ["table", "hash"], k=20, round_to=4).collect()]
    assert a == b


def test_pinned_order_and_unmatched_pinned_doc(spark):
    from ocaml_lucene_spark.query.similarity import bm25_pinned_topk

    rows = [
        (0, "table table table"),
        (1, "table x"),
        (2, "nothing relevant"),
        (3, "table y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.doc_id, r.pinned, r.score) for r in bm25_pinned_topk(
        df, ["table"], [3, 2], k=10
    ).collect()]
    # pinned first IN LIST ORDER (3 then 2 — 2 does not match, score 0)
    assert [g[0] for g in got[:2]] == [3, 2]
    assert got[0][1] is True and got[1] == (2, True, 0.0)
    # organic follows, best first, pinned ids absent
    assert [g[0] for g in got[2:]] == [0, 1]
    assert all(g[1] is False for g in got[2:])


def test_random_score_is_partitioning_invariant(spark):
    from ocaml_lucene_spark.query.similarity import random_score_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in random_score_topk(docs, "table", seed=7, k=25).collect()]
    b = [tuple(r) for r in random_score_topk(docs.repartition(13), "table", seed=7, k=25).collect()]
    assert a == b
    c = [tuple(r) for r in random_score_topk(docs, "table", seed=8, k=25).collect()]
    assert a != c


def test_rank_eval_hand_corpus(spark):
    """Judged = docs containing both words; query ranks by 'a' OR 'b'.
    Metrics checked against hand-computed values, including the
    no-hits edge (mrr = dcg = 0.0)."""
    import math

    from ocaml_lucene_spark.query.bm25 import bm25_topk
    from ocaml_lucene_spark.query.rank_eval import rank_eval

    rows = [
        (0, "a a a b"),      # both -> judged, high score
        (1, "a a"),           # only a
        (2, "b a"),           # both -> judged
        (3, "c c c"),         # neither
        (4, "a b b b"),       # both -> judged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k = 3
    got = rank_eval(df, ["a", "b"], ["a", "b"], k=k).collect()[0]
    # round_to=4 mirrors rank_eval's internal ranking contract
    ranking = [r.doc_id for r in bm25_topk(df, ["a", "b"], "or", k=k, round_to=4).collect()]
    judged = {0, 2, 4}
    hits = [(i + 1, d) for i, d in enumerate(ranking) if d in judged]
    n_hits = len(hits)
    assert got.k == k and got.n_judged == 3 and got.n_hits == n_hits
    assert got.precision_at_k == round((2 * n_hits * 10**4 + k) // (2 * k) / 10**4, 4)
    assert got.recall_at_k == round((2 * n_hits * 10**4 + 3) // (2 * 3) / 10**4, 4)
    first = hits[0][0]
    assert got.mrr == ((2 * 10**4 + first) // (2 * first)) / 10**4
    s = sum(round(round(1.0 / math.log2(r + 1), 6) * 1e6) for r, _ in hits)
    assert got.dcg_at_k == ((2 * int(s) * 10**4 + 10**6) // (2 * 10**6)) / 10**4

    # no-hit edge: judged set that never matches the ranking
    got0 = rank_eval(df, ["a", "b"], ["c"], k=k).collect()[0]
    # judged = {3}; doc 3 scores 0 on a/b so can't be in the top-3
    assert got0.n_hits == 0 and got0.mrr == 0.0 and got0.dcg_at_k == 0.0
    assert got0.precision_at_k == 0.0 and got0.recall_at_k == 0.0


def test_terms_set_per_doc_threshold(spark):
    from ocaml_lucene_spark.query.bm25 import bm25_topk, terms_set_topk

    # n_chars % 3 drives required: 2 -> 3, 0 -> 1
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma filler", 2),   # 3 of 4 terms, req 3 -> in
            (2, "alpha beta filler filler", 2),  # 2 of 4 terms, req 3 -> out
            (3, "alpha filler filler extra", 0), # 1 of 4 terms, req 1 -> in
        ],
        "doc_id long, text string, n_chars long",
    )
    q = ["alpha", "beta", "gamma", "delta"]
    rows = {r.doc_id: r for r in terms_set_topk(docs, q, k=10).collect()}
    assert set(rows) == {1, 3}
    assert (rows[1].n_matched, rows[1].required) == (3, 3)
    assert (rows[3].n_matched, rows[3].required) == (1, 1)
    # CoveringQuery scores as the plain disjunctive BM25 sum
    plain = {
        r.doc_id: r.score
        for r in bm25_topk(docs, q, k=10, round_to=4).collect()
    }
    for d, r in rows.items():
        assert r.score == plain[d]


def test_rank_feature_saturation_reorders(spark):
    from ocaml_lucene_spark.query.similarity import rank_feature_topk

    # identical text -> identical bm25; the feature decides the order
    docs = spark.createDataFrame(
        [(1, "table filler", 100), (2, "table filler", 400)],
        "doc_id long, text string, n_chars long",
    )
    rows = rank_feature_topk(docs, ["table"], k=10, pivot=300, boost=2.0).collect()
    assert [r.doc_id for r in rows] == [2, 1]
    assert [r.feature for r in rows] == [400, 100]
    # the gap is exactly 2*(sat(400)-sat(100)) after the shared round
    got_gap = round(rows[0].score - rows[1].score, 4)
    want_gap = round(2.0 * (400 / 700 - 100 / 400), 4)
    assert abs(got_gap - want_gap) <= 1e-4


def test_distance_feature_hand_distances(spark):
    from ocaml_lucene_spark.query.similarity import distance_feature_topk

    from datetime import datetime

    o = datetime(2024, 1, 15, 0, 0, 0)
    h = 3_600_000_000  # micros per hour

    def ts(us):
        return datetime.utcfromtimestamp(
            (int(o.timestamp() * 1e6) + us) / 1e6
        )

    events = spark.createDataFrame(
        [
            (1, o, 7, "click", 0.0, "{}"),              # dist 0    -> 1.0
            (2, ts(72 * h), 7, "click", 0.0, "{}"),     # = pivot   -> 0.5
            (3, ts(-216 * h), 7, "click", 0.0, "{}"),   # 3*pivot   -> 0.25
            (4, ts(1), 7, "view", 0.0, "{}"),           # filtered out
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = distance_feature_topk(
        events, origin="2024-01-15 00:00:00", pivot_hours=72, k=10
    ).collect()
    assert [(r.event_id, r.score) for r in rows] == [
        (1, 1.0), (2, 0.5), (3, 0.25)
    ]


def test_linear_fusion_minmax_and_weights(spark, docs):
    from ocaml_lucene_spark.query.rescore import linear_fusion_topk
    import __spark_entry__ as entry

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = entry._query_vec(SF)
    rows = linear_fusion_topk(docs, vecs, TERMS, qv, n_each=50, k=200).collect()
    assert rows, "fusion must produce rows"
    for r in rows:
        # norms live in [0,1] at 4dp; score is the exact integer combine
        assert 0.0 <= r.lex_norm <= 1.0 and 0.0 <= r.dense_norm <= 1.0
        assert r.score == (round(r.lex_norm * 10000) * 2 + round(r.dense_norm * 10000)) / 10000.0
    # each leg's #1 doc normalizes to exactly 1.0 and is present
    assert any(r.lex_norm == 1.0 for r in rows)
    assert any(r.dense_norm == 1.0 for r in rows)
    # min-of-list normalizes to exactly 0.0 for docs in-list (the
    # 50th lexical doc), indistinguishable from absent by design
    assert any(r.lex_norm == 0.0 and r.dense_norm > 0.0 for r in rows)


def test_linear_fusion_hand_values(spark):
    from ocaml_lucene_spark.query.rescore import linear_fusion_topk

    docs = spark.createDataFrame(
        [(1, "zig zig zig"), (2, "zig zag"), (3, "zag mid zig")],
        "doc_id long, text string",
    )
    # embeddings chosen so cosine against [1,0] is 1.0 / 0.6 / 0.0
    vecs = spark.createDataFrame(
        [(2, [1.0, 0.0]), (3, [0.6, 0.8]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = linear_fusion_topk(docs, vecs, ["zig"], [1.0, 0.0], n_each=10, k=10)
    got = [(r.doc_id, r.score, r.lex_norm, r.dense_norm) for r in rows.collect()]
    # lexical: doc1 best (tf=3) -> 1.0, doc3 worst in-list -> 0.0,
    # doc2 interpolates; dense: vec2 -> 1.0, vec3 -> 0.6, vec4 -> 0.0
    by_id = {d: (s, l, dn) for d, s, l, dn in got}
    assert by_id[1][1] == 1.0 and by_id[1][2] == 0.0
    assert by_id[2][2] == 1.0  # dense #1
    assert by_id[3][1] == 0.0
    assert by_id[4] == (0.0, 0.0, 0.0)  # dense min, absent lexically
    for d, s, l, dn in got:
        assert s == (round(l * 10000) * 2 + round(dn * 10000)) / 10000.0
    # sorted (score desc, doc_id)
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))


def test_linear_fusion_degenerate_list_normalizes_to_one(spark):
    from ocaml_lucene_spark.query.rescore import linear_fusion_topk

    docs = spark.createDataFrame([(1, "solo term")], "doc_id long, text string")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    rows = {r.doc_id: r for r in linear_fusion_topk(
        docs, vecs, ["solo"], [1.0, 0.0], n_each=10, k=10
    ).collect()}
    # single-doc lexical list: max == min -> norm 1.0 (documented)
    assert rows[1].lex_norm == 1.0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        linear_fusion_topk(docs, vecs, ["solo"], [1.0, 0.0], w_lex=0)


def test_terms_lookup_matches_python(spark, docs):
    import re

    from ocaml_lucene_spark.query.bm25 import terms_lookup_filter

    rows = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    lookup_id = sorted(rows)[3]
    tok = lambda t: set(re.split(r"[^a-z0-9]+", t.lower())) - {""}
    lk = tok(rows[lookup_id])
    want = sorted(
        (d, len(tok(t) & lk)) for d, t in rows.items() if tok(t) & lk
    )
    got = [
        tuple(r)
        for r in terms_lookup_filter(docs, lookup_doc_id=lookup_id).collect()
    ]
    assert got == want
    # the lookup doc matches all of its own distinct terms
    assert (lookup_id, len(lk)) in got


def test_terms_lookup_hand_corpus(spark):
    from ocaml_lucene_spark.query.bm25 import terms_lookup_filter

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta beta delta"),
            (3, "epsilon zeta"),
            (4, "gamma alpha alpha"),
        ],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in terms_lookup_filter(df, lookup_doc_id=1).collect()]
    # lookup terms {alpha, beta, gamma}: doc 3 matches none and is absent;
    # n_matched counts DISTINCT lookup terms, not occurrences
    assert got == [(1, 3), (2, 1), (4, 2)]


def test_has_parent_children_inherit_topk_parent_scores(spark, docs):
    from ocaml_lucene_spark.query.grouping import (
        bm25_parent_join_topk,
        has_parent_children,
    )

    top = {
        r.parent: r.score
        for r in bm25_parent_join_topk(
            docs, TERMS, "source", "max", 3
        ).collect()
    }
    got = has_parent_children(docs, TERMS, "source", "max", k_parents=3).collect()
    # every child of a top parent appears, with the parent's exact score
    kids = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    assert {r.parent for r in got} == set(top)
    for r in got:
        assert r.parent_score == top[r.parent]
    assert len(got) == sum(kids[p] for p in top)
    # total order: (parent_score DESC, parent, doc_id)
    keys = [(-r.parent_score, r.parent, r.doc_id) for r in got]
    assert keys == sorted(keys)


def test_complete_context_matches_python(spark, docs):
    import re
    from collections import Counter

    from ocaml_lucene_spark.query.suggest import complete_context

    rows = docs.select("doc_id", "text", "lang").collect()
    tok = lambda t: set(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    df = Counter()
    for r in rows:
        if r.lang != "de":
            continue
        for w in tok(r.text):
            if w.startswith("s"):
                df[w] += 1
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.term, r.df) for r in complete_context(docs, "s", "de", k=10).collect()]
    assert got == want
    # the context matters: global df ordering differs from de-local
    # for at least one term (non-vacuous context filter)
    df_all = Counter()
    for r in rows:
        for w in tok(r.text):
            if w.startswith("s"):
                df_all[w] += 1
    assert any(df_all[t] != d for t, d in got)


def test_drill_sideways_matches_python(spark, docs):
    import re
    from collections import Counter

    from ocaml_lucene_spark.query.grouping import drill_sideways

    rows = docs.select("doc_id", "text", "lang", "source").collect()
    tok = lambda t: set(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    match = [r for r in rows if {"table", "hash"} <= tok(r.text)]
    sel = {"lang": "de", "source": "src3"}
    want = []
    lang_counts = Counter(r.lang for r in match if r.source == "src3")
    src_counts = Counter(r.source for r in match if r.lang == "de")
    hits = sum(1 for r in match if r.lang == "de" and r.source == "src3")
    want += [("_hits", "", hits)]
    want += [("lang", v, n) for v, n in lang_counts.items()]
    want += [("source", v, n) for v, n in src_counts.items()]
    want.sort()
    got = [
        tuple(r)
        for r in drill_sideways(docs, ["table", "hash"], sel).collect()
    ]
    assert got == want
    # sideways semantics: the drilled dim's own filter is NOT applied
    # to its own counts — other lang values appear alongside 'de'
    langs = {v for d, v, _ in got if d == "lang"}
    assert len(langs) > 1, got
    # cross-check: the lang dim's 'de' bucket carries the other dim's
    # filter (source=src3), so it must equal the fully-drilled count
    by = {(d, v): n for d, v, n in got}
    assert by.get(("lang", "de"), 0) == hits
