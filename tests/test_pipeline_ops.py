"""Round-6 training-pipeline operators: decontamination, repetition
signals, sequence packing. The gate replica (test_entry.py) covers the
oracle parity; these pin structural/semantic properties the oracles
can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.functions.textstats import repetition_signals
from ocaml_lucene_spark.operators.dedup import ngram_contamination
from ocaml_lucene_spark.operators.packing import pack_sequences

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_pack_sequences_range_size_is_plan_only(docs):
    # range_size shapes the two-pass execution, never the assignment:
    # any range_size must give the identical (doc_id, pack_id) map
    a = pack_sequences(docs, budget=512, range_size=4096).collect()
    b = pack_sequences(docs, budget=512, range_size=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pack_sequences_matches_python_prefix_sum(docs):
    from ocaml_lucene_spark.functions.analysis import py_tokenize

    budget = 512
    texts = {r.doc_id: r.text for r in docs.collect()}
    cum, want = 0, {}
    for d in sorted(texts):
        n = len(py_tokenize(texts[d]))
        want[d] = (n, cum // budget)
        cum += n
    got = {r.doc_id: (r.n_tokens, r.pack_id) for r in pack_sequences(docs, budget=budget).collect()}
    assert got == want


def test_pack_ids_are_contiguous_from_zero(docs):
    rows = pack_sequences(docs, budget=256).collect()
    packs = sorted({r.pack_id for r in rows})
    assert packs[0] == 0
    # every pack between 0 and max has at least one FIRST-token doc
    # except packs fully covered by one giant doc — with budget 256
    # and short docs, ids must be contiguous
    assert packs == list(range(packs[-1] + 1))


def test_contamination_flags_benchmark_members_fully(docs):
    from ocaml_lucene_spark.operators.dedup import shingles_col

    bench = docs.filter(F.col("doc_id") % 13 == 0)
    got = {r.doc_id: r.n_overlap for r in ngram_contamination(docs, bench, n=4).collect()}
    # a benchmark member overlaps itself: n_overlap == its distinct
    # 4-gram count
    own = {
        r.doc_id: r.n
        for r in bench.select(
            "doc_id", F.size(F.array_distinct(shingles_col(F.col("text"), 4))).alias("n")
        ).collect()
    }
    for d, n in own.items():
        assert got.get(d) == n
    # and docs sharing nothing are absent (n_overlap never 0)
    assert all(v > 0 for v in got.values())


def test_repetition_signals_hand_corpus(spark):
    rows = [
        (0, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> top 'a b' 3/5; 3-grams: aba bab aba bab -> all dup 4/4
        (1, "x y z w"),            # no repeats
        (2, "q"),                  # short doc: single whole-doc shingle
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_3grams, r.dup_3gram_frac, r.top_2gram_frac) for r in repetition_signals(df).collect()}
    assert got[0] == (4, 1.0, 0.6)
    assert got[1] == (2, 0.0, round(1 / 3, 4))
    assert got[2] == (1, 0.0, 1.0)


def test_sample_stratified_deterministic_and_rate_correct(docs, spark):
    from ocaml_lucene_spark.operators.sampling import sample_stratified

    fr = {"en": 0.5, "de": 0.25}
    a = sample_stratified(docs, fr, "lang", seed=7).collect()
    b = sample_stratified(docs.repartition(13), fr, "lang", seed=7).collect()
    # partitioning must not change the sample (the df.sample failure mode)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # only configured strata survive
    assert {r.stratum for r in a} <= set(fr)
    # empirical rates within a loose binomial band
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    from collections import Counter

    kept = Counter(r.stratum for r in a)
    for s, f in fr.items():
        n, k = totals[s], kept.get(s, 0)
        assert abs(k / n - f) < 4 * (f * (1 - f) / n) ** 0.5 + 0.02, (s, k, n)
    # a different seed gives a different sample
    c = sample_stratified(docs, fr, "lang", seed=8).collect()
    assert [tuple(r) for r in c] != [tuple(r) for r in a]


def test_dedup_clusters_label_propagation_matches_networkx_style_bfs(spark):
    # hand graph: two components incl. a 4-node chain (needs >1
    # propagation iteration) and a triangle
    from ocaml_lucene_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (7, 8), (8, 9), (7, 9)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 10, 7: 7, 8: 7, 9: 7}


def test_dedup_clusters_raises_without_convergence(spark):
    from ocaml_lucene_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(pairs, max_iters=1)


# -- boilerplate span detection / removal ------------------------------


def _bp_docs(spark):
    texts = {
        # "cookie banner text" appears in 3 docs -> frequent at min_df=3
        0: "cookie banner text unique alpha beta",
        1: "gamma cookie banner text delta",
        2: "cookie banner text",
        3: "totally clean document here",
        4: "short",
    }
    return (
        spark.createDataFrame(
            [(d, t) for d, t in texts.items()], "doc_id long, text string"
        ),
        texts,
    )


def test_boilerplate_coverage_counts(spark):
    from ocaml_lucene_spark.operators.boilerplate import boilerplate_coverage

    docs, texts = _bp_docs(spark)
    got = {
        r.doc_id: (r.n_tokens, r.n_covered)
        for r in boilerplate_coverage(docs, k=3, min_df=3).collect()
    }
    # covered = the 3 positions of 'cookie banner text' in each doc
    # carrying it; every doc appears, clean docs with 0
    assert got == {0: (6, 3), 1: (5, 3), 2: (3, 3), 3: (4, 0), 4: (1, 0)}


def test_boilerplate_coverage_python_reference(spark):
    """Overlapping frequent grams: covered positions are the UNION of
    spans, pinned against a brute-force reference."""
    from ocaml_lucene_spark.operators.boilerplate import boilerplate_coverage

    import random

    rng = random.Random(5)
    vocab = ["a", "b", "c", "d"]
    texts = {d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14)))
             for d in range(30)}
    k, min_df = 2, 4
    toks = {d: t.split() for d, t in texts.items()}
    gdf = {}
    for d, ts in toks.items():
        for g in {tuple(ts[i:i + k]) for i in range(len(ts) - k + 1)}:
            gdf[g] = gdf.get(g, 0) + 1
    want = {}
    for d, ts in toks.items():
        cov = set()
        for i in range(len(ts) - k + 1):
            if gdf.get(tuple(ts[i:i + k]), 0) >= min_df:
                cov.update(range(i, i + k))
        want[d] = (len(ts), len(cov))
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_covered)
        for r in boilerplate_coverage(docs, k=k, min_df=min_df).collect()
    }
    assert got == want


def test_remove_boilerplate_strips_covered_positions(spark):
    from ocaml_lucene_spark.operators.boilerplate import remove_boilerplate

    docs, texts = _bp_docs(spark)
    got = {
        r.doc_id: r.clean_tokens
        for r in remove_boilerplate(docs, k=3, min_df=3).collect()
    }
    assert got[0] == ["unique", "alpha", "beta"]
    assert got[1] == ["gamma", "delta"]
    assert got[2] == []
    assert got[3] == ["totally", "clean", "document", "here"]
    assert got[4] == ["short"]


def test_mix_to_proportions_keeps_constrained_stratum_whole(spark):
    from ocaml_lucene_spark.operators.sampling import mix_to_proportions

    rows = (
        [(i, "en") for i in range(100)]
        + [(1000 + i, "fr") for i in range(10)]
        + [(2000 + i, "zz") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mix_to_proportions(docs, {"en": 1.0, "fr": 1.0}).collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r.doc_id)
    # fr is the constrained stratum (10/1 < 100/1): kept whole
    assert sorted(by["fr"]) == list(range(1000, 1010))
    # en downsampled toward ~10 (md5-uniform, exact count varies)
    assert 0 < len(by["en"]) < 100
    # unweighted stratum dropped entirely
    assert "zz" not in by


def test_mix_to_proportions_is_deterministic(spark):
    from ocaml_lucene_spark.operators.sampling import mix_to_proportions

    rows = [(i, ["en", "fr"][i % 2]) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    a = [tuple(r) for r in mix_to_proportions(docs, {"en": 3.0, "fr": 1.0}).collect()]
    b = [tuple(r) for r in mix_to_proportions(
        docs.repartition(7), {"en": 3.0, "fr": 1.0}
    ).collect()]
    assert a == b and a


def test_unigram_logprob_partition_invariant_and_matches_python(docs):
    from collections import Counter
    import math

    from ocaml_lucene_spark.functions.analysis import py_tokenize
    from ocaml_lucene_spark.functions.textstats import unigram_logprob

    a = [tuple(r) for r in unigram_logprob(docs).collect()]
    b = [tuple(r) for r in unigram_logprob(docs.repartition(13)).collect()]
    # the quantized integer fold makes the per-doc sum order-free:
    # any partitioning gives the bit-identical result
    assert a == b

    texts = {r.doc_id: py_tokenize(r.text) for r in docs.collect()}
    corpus = Counter()
    for toks in texts.values():
        corpus.update(toks)
    T = float(sum(corpus.values()))
    want = []
    for d in sorted(texts):
        toks = texts[d]
        if not toks:
            continue
        tf = Counter(toks)
        s = sum(
            n * int(round(round(math.log(corpus[w] / T), 6) * 1000000.0))
            for w, n in tf.items()
        )
        want.append((d, len(toks), round(-(s / 1000000.0 / len(toks)), 4)))
    assert a == want


def test_token_budget_select_matches_python_greedy_prefix(docs, spark):
    from ocaml_lucene_spark.functions.textstats import quality_features
    from ocaml_lucene_spark.operators.selection import token_budget_select

    scored = quality_features(docs).select(
        "doc_id", F.col("lexical_diversity").alias("score"), "n_tokens"
    )
    rows = [(r.doc_id, r.score, r.n_tokens) for r in scored.collect()]
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    total = sum(r[2] for r in rows)
    # budgets probing: empty cut, mid-bucket boundary, everything
    for budget in (0, 1, total // 7, total // 2, total - 1, total, total + 10):
        cum, want = 0, []
        for d, s, n in ranked:
            if cum + n > budget:
                break
            cum += n
            want.append((d, s, n))
        got = [
            (r.doc_id, r.score, r.n_tokens)
            for r in token_budget_select(scored, budget=budget).collect()
        ]
        assert got == want, f"budget={budget}"


def test_token_budget_select_bucket_quant_is_plan_only(docs):
    from ocaml_lucene_spark.functions.textstats import quality_features
    from ocaml_lucene_spark.operators.selection import token_budget_select

    scored = quality_features(docs).select(
        "doc_id", F.col("lexical_diversity").alias("score"), "n_tokens"
    )
    a = token_budget_select(scored, budget=5000, bucket_quant=100).collect()
    b = token_budget_select(scored, budget=5000, bucket_quant=7).collect()
    c = token_budget_select(scored, budget=5000, bucket_quant=100000).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] == [tuple(r) for r in c]


def test_extended_stats_matches_numpy_and_clamps_zero_variance(spark):
    import math

    from ocaml_lucene_spark.query.grouping import extended_stats

    rows = [
        ("a", 1.25), ("a", 1.25), ("a", 1.25),          # zero variance
        ("b", 0.01), ("b", 490.02), ("b", 123.45), ("b", 2.00),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r.key: r for r in extended_stats(df).collect()}
    # zero-variance bucket: exact 0.0 / 0.0, never -0.0 (repr check)
    assert repr(got["a"].variance) == "0.0" and repr(got["a"].std_dev) == "0.0"
    assert got["a"].avg_value == 1.25 and got["a"].sum_value == 3.75
    from fractions import Fraction

    def r4(fr):
        # half-away-from-zero at 4dp on the EXACT rational — python's
        # round() is banker's over binary doubles, the wrong reference
        num, den = fr.numerator, fr.denominator
        sgn = -1 if num < 0 else 1
        return sgn * ((2 * abs(num) * 10000 + den) // (2 * den)) / 10000.0

    vals = [v for k, v in rows if k == "b"]
    n = len(vals)
    s_u = sum(round(v * 100) for v in vals)
    ss_u = sum(round(v * 100) ** 2 for v in vals)
    var = Fraction(n * ss_u - s_u * s_u, n * n * 100 * 100)
    b = got["b"]
    assert b.n_events == n and b.min_val == 0.01 and b.max_val == 490.02
    assert b.sum_value == s_u / 100.0
    assert b.avg_value == r4(Fraction(s_u, 100 * n))
    assert b.sum_sq == ss_u / 10000.0
    assert b.variance == r4(var)
    # the engine's documented contract: std = round(sqrt(ROUNDED var))
    assert b.std_dev == round(math.sqrt(r4(var)), 4)


def test_rare_terms_df_counts_docs_not_occurrences(spark):
    from ocaml_lucene_spark.query.grouping import rare_terms

    df = spark.createDataFrame(
        [(0, "zebra zebra zebra common"), (1, "common"), (2, "common quokka")],
        "doc_id long, text string",
    )
    got = [(r.term, r.df) for r in rare_terms(df, max_doc_count=1).collect()]
    # repeated within one doc still df=1; ascending (df, term) order
    assert got == [("quokka", 1), ("zebra", 1)]


def test_multi_terms_orders_biggest_buckets_first(docs):
    from ocaml_lucene_spark.query.grouping import multi_terms

    rows = [tuple(r) for r in multi_terms(docs, ("lang", "source"), "n_chars").collect()]
    counts = [r[2] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # per-bucket integer sum cross-check against a collected groupBy
    want = {}
    for r in docs.select("lang", "source", "n_chars").collect():
        k = (r.lang, r.source)
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + r.n_chars)
    assert {(r[0], r[1]): (r[2], r[3]) for r in rows} == want


def test_extended_stats_half_boundary_parity_with_duckdb(spark):
    # avg/variance that land EXACTLY on 4dp half-boundaries: the
    # integer-rounding contract must keep Spark and DuckDB repr-equal
    # (double rounding diverges here — Spark HALF_UP on the shortest
    # repr vs DuckDB on the binary value)
    import duckdb

    from ocaml_lucene_spark.query.grouping import extended_stats
    from ocaml_lucene_spark.query.oracle_sql import extended_stats_sql

    rows = [
        # avg = (1.00 + 0.01)/2 = 0.505 (fine) ; crafted boundary set:
        ("x", 0.01), ("x", 0.01), ("x", 0.01), ("x", 0.10),
        # S_u = 13, n = 4 -> avg = 13/400 = 0.0325 ; var boundary:
        ("y", 1.25), ("y", 1.25), ("y", 1.25),
        ("b", 0.01), ("b", 490.02), ("b", 123.45), ("b", 2.00),
        # avg exactly on a half boundary: S_u=5, n=2, Q=100 ->
        # avg = 5/200 = 0.025 -> 4dp is exact; use S_u=1, n=8:
        # 1/800 = 0.00125 -> x.xxx5 at 5dp? 0.0012|5 -> boundary!
        ("z", 0.01), ("z", 0.00), ("z", 0.00), ("z", 0.00),
        ("z", 0.00), ("z", 0.00), ("z", 0.00), ("z", 0.00),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = [tuple(r) for r in extended_stats(df).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {v}::DOUBLE)" for k, v in rows)
        + ") t(event_type, value)"
    )
    want = con.execute(extended_stats_sql()).fetchall()
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert repr(a) == repr(tuple(b)), (a, b)
    # the z bucket's avg sits exactly on the 5dp half boundary
    z = dict((r[0], r) for r in got)["z"]
    assert z[5] == 0.0013  # half-away-from-zero, by integer contract


def test_matrix_stats_matches_fraction_reference(spark):
    from fractions import Fraction

    from ocaml_lucene_spark.query.grouping import matrix_stats

    def r4(fr):
        num, den = fr.numerator, fr.denominator
        sgn = -1 if num < 0 else 1
        return sgn * ((2 * abs(num) * 10000 + den) // (2 * den)) / 10000.0

    # x long vs SHORT token count -> negative covariance
    rows = [
        (0, "a b c d e f g h", 10),
        (1, "a b", 90),
        (2, "a b c d", 50),
        (3, "a", 99),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = matrix_stats(df, x_col="n_chars").collect()[0]
    xs = [r[2] for r in rows]
    ys = [len(r[1].split()) for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    mx, my, nxy = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
    assert got.n_docs == n
    assert got.mean_x == r4(Fraction(sx, n)) and got.mean_y == r4(Fraction(sy, n))
    assert got.var_x == r4(Fraction(mx, n * n)) and got.var_y == r4(Fraction(my, n * n))
    assert got.cov_xy == r4(Fraction(nxy, n * n)) and got.cov_xy < 0
    assert got.corr_xy == round(nxy / (mx * my) ** 0.5, 4) and got.corr_xy < 0


def test_matrix_stats_constant_field_null_corr(spark):
    from ocaml_lucene_spark.query.grouping import matrix_stats

    df = spark.createDataFrame(
        [(0, "a b", 7), (1, "a b c", 7)], "doc_id long, text string, n_chars long"
    )
    got = matrix_stats(df, x_col="n_chars").collect()[0]
    assert got.var_x == 0.0 and got.corr_xy is None


def test_moving_avg_trailing_window_python_reference(spark):
    import datetime
    from fractions import Fraction

    from ocaml_lucene_spark.query.grouping import date_histogram_moving_avg

    def r4(fr):
        num, den = fr.numerator, fr.denominator
        sgn = -1 if num < 0 else 1
        return sgn * ((2 * abs(num) * 10000 + den) // (2 * den)) / 10000.0

    rows = []
    vals = [1.00, 2.00, 4.00, -8.00, 16.00]
    for i, v in enumerate(vals):
        rows.append((datetime.datetime(2024, 1, 1 + i), "click", v))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = [
        (r.bucket, r.sum_value, r.moving_avg)
        for r in date_histogram_moving_avg(df, window=3).collect()
    ]
    units = [round(v * 100) for v in vals]
    want = []
    for i in range(len(vals)):
        lo = max(0, i - 2)
        w = units[lo : i + 1]
        want.append(
            (
                f"2024-01-{i + 1:02d}",
                units[i] / 100.0,
                r4(Fraction(sum(w), 100 * len(w))),
            )
        )
    assert got == want


def test_gopher_quality_filter_rules_fire_individually(spark):
    from ocaml_lucene_spark.functions.textstats import gopher_quality_filter

    stop = "the of and to in is was for on as"  # 10 stopwords
    # 6-letter words keep alnum_ratio (letters / letters+spaces) >= 0.8
    good = stop + " planet bridge stream forest window silver market garden rocket violet"
    docs = spark.createDataFrame(
        [
            (0, good),                               # passes everything
            (1, "tiny doc"),                          # n_tokens_low
            (2, stop + " " + " ".join(f"w{i}" for i in range(100))),  # n_tokens_high
            (3, stop + " " + "a b c d e f g h i j"),  # avg_token_len_low
            (4, stop + " " + " ".join("extraordinarily" for _ in range(10))),
            # ^ avg_token_len_high + repetition rules
            (5, " ".join(f"x{i}" for i in range(25))),  # stopword_ratio_low
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.keep, r.failed) for r in gopher_quality_filter(docs).collect()}
    assert got[0] == (True, "")
    assert got[1][0] is False and "n_tokens_low" in got[1][1]
    assert got[2][0] is False and "n_tokens_high" in got[2][1]
    assert got[3][0] is False and "avg_token_len_low" in got[3][1]
    assert got[4][0] is False and "avg_token_len_high" in got[4][1]
    assert "dup_3gram_high" in got[4][1]  # repeated word -> dup 3-grams
    assert got[5][0] is False and "stopword_ratio_low" in got[5][1]
    # failed names keep the fixed rule order
    assert got[4][1].split(",") == sorted(
        got[4][1].split(","),
        key=["n_tokens_low", "n_tokens_high", "avg_token_len_low",
             "avg_token_len_high", "alnum_ratio_low", "stopword_ratio_low",
             "dup_3gram_high", "top_2gram_high"].index,
    )


def test_clean_dedup_select_stage_boundaries(spark):
    from ocaml_lucene_spark.operators.pipeline import clean_dedup_select

    stop = "the of and to in is was for on as"
    clean_a = stop + " planet bridge stream forest window silver market garden rocket violet"
    clean_b = stop + " carbon helium silica cobalt nickel copper indium gallium barium cesium"
    rows = [
        (0, clean_a),          # kept, canonical of the dup pair
        (1, clean_a),          # exact dup of 0 -> dropped by dedup
        (2, clean_b),          # kept
        (3, "tiny"),           # fails cleaning
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    all_in = [
        (r.doc_id, r.n_tokens)
        for r in clean_dedup_select(df, budget=10_000).collect()
    ]
    assert sorted(d for d, _ in all_in) == [0, 2]  # dup + dirty gone
    # budget binds: only the best-ranked doc fits half the tokens
    tight = clean_dedup_select(df, budget=all_in[0][1]).collect()
    assert len(tight) == 1


def test_dsir_importance_matches_python_reference(docs):
    """Exact integer replay of the quantized-fold contract, plus the
    semantic sanity check: target-language docs must score higher on
    average than the rest (the signal DSIR resamples on)."""
    import math

    from ocaml_lucene_spark.functions.analysis import py_tokenize
    from ocaml_lucene_spark.functions.textstats import dsir_importance

    rows = docs.select("doc_id", "lang", "text").collect()
    c_r: dict[str, int] = {}
    c_t: dict[str, int] = {}
    per_doc: dict[int, dict[str, int]] = {}
    langs = {}
    for r in rows:
        langs[r.doc_id] = r.lang
        tfs: dict[str, int] = {}
        for w in py_tokenize(r.text):
            tfs[w] = tfs.get(w, 0) + 1
        per_doc[r.doc_id] = tfs
        for w, tf in tfs.items():
            c_r[w] = c_r.get(w, 0) + tf
            if r.lang == "en":
                c_t[w] = c_t.get(w, 0) + tf
    TR, TT, V = sum(c_r.values()), sum(c_t.values()), len(c_r)
    want = {}
    for d, tfs in per_doc.items():
        s, n = 0, 0
        for w, tf in tfs.items():
            kt = round(round(math.log((c_t.get(w, 0) + 1) / (TT + V)), 6) * 1e6)
            kr = round(round(math.log((c_r[w] + 1) / (TR + V)), 6) * 1e6)
            s += tf * (kt - kr)
            n += tf
        sign = -1 if s < 0 else 1
        k = sign * ((2 * abs(s) * 10**4 + 1000000 * n) // (2 * 1000000 * n))
        want[d] = (n, k / 10**4 + 0.0)
    got = {r.doc_id: (r.n_tokens, r.logratio) for r in dsir_importance(docs).collect()}
    assert got == want
    en = [v for d, (_, v) in got.items() if langs[d] == "en"]
    rest = [v for d, (_, v) in got.items() if langs[d] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_cross_doc_repetition_hand_corpus(spark):
    """Hand corpus separating the three cases: a gram repeated only
    WITHIN one doc does not count (df counts distinct docs), a gram
    shared across docs counts on both sides, short docs fall back to
    the whole-doc shingle."""
    from ocaml_lucene_spark.operators.dedup import cross_doc_repetition

    rows = [
        (0, "a b c x y z a b c"),   # 'a b c' repeats within doc only
        (1, "p q r a b c"),          # shares 'a b c' with doc 0
        (2, "u v w"),                # single 3-gram, unshared
        (3, "hi"),                   # short doc: whole-doc shingle
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.cross_dup_frac) for r in cross_doc_repetition(df, n=3).collect()}
    # doc 0: 7 grams, occurrences of 'a b c' (x2) shared with doc 1
    assert got[0] == (7, round((2 * 10**4 * 2 + 7) // (2 * 7) / 10**4, 4))
    # doc 1: 4 grams, 1 shared occurrence -> 0.25 exactly
    assert got[1] == (4, 0.25)
    assert got[2] == (1, 0.0)
    assert got[3] == (1, 0.0)


def test_frequent_item_sets_matches_python_and_pruning_exact(spark):
    from itertools import combinations

    from ocaml_lucene_spark.functions.textstats import frequent_item_sets
    from ocaml_lucene_spark.functions.analysis import py_tokenize as tokenize

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [tuple(r) for r in frequent_item_sets(docs, min_support=30).collect()]

    # python reference: distinct tokens per doc, pair doc-counts
    from collections import Counter

    pair_df = Counter()
    for r in docs.select("text").collect():
        items = sorted(set(tokenize(r.text)))
        for a, b in combinations(items, 2):
            pair_df[(a, b)] += 1
    expected = sorted(
        ((a, b, c) for (a, b), c in pair_df.items() if c >= 30),
        key=lambda x: (-x[2], x[0], x[1]),
    )
    assert got == expected

    # Apriori level-1 pruning is exact: an unpruned run (df filter
    # disabled by min_support=1 at the item stage cannot be expressed
    # through the public arg, so compare against the reference, which
    # never prunes) — covered above; additionally the support bound
    # holds: no pair's support exceeds either member's df
    item_df = Counter()
    for r in docs.select("text").collect():
        for t in set(tokenize(r.text)):
            item_df[t] += 1
    for a, b, c in got:
        assert c <= item_df[a] and c <= item_df[b]


def test_frequent_item_sets_hand_values(spark):
    from ocaml_lucene_spark.functions.textstats import frequent_item_sets

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "apple banana apple"),  # duplicate tokens count once
            (4, "banana cherry"),
            (5, "date"),
        ],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in frequent_item_sets(docs, min_support=2).collect()]
    assert got == [
        ("apple", "banana", 3),
        ("banana", "cherry", 2),
    ]


def test_domain_cap_select_matches_python(spark, docs):
    from ocaml_lucene_spark.operators.selection import domain_cap_select

    rows = docs.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.n_chars, r.doc_id))
    want = {}
    for src, members in by_src.items():
        for rank, (_, d) in enumerate(
            sorted(members, key=lambda t: (-t[0], t[1])), start=1
        ):
            want[d] = (src, rank, rank <= 3)
    got = [tuple(r) for r in domain_cap_select(docs, cap=3).collect()]
    assert got == sorted((d, s, r, k) for d, (s, r, k) in want.items())
    # the cap actually drops something and keeps something
    kept = [g for g in got if g[3]]
    assert 0 < len(kept) < len(got)


def test_domain_cap_select_tiebreak_is_doc_id(spark):
    from ocaml_lucene_spark.operators.selection import domain_cap_select

    df = spark.createDataFrame(
        [
            (10, "a", 100),
            (11, "a", 100),  # n_chars tie: lower doc_id ranks first
            (12, "a", 250),
            (20, "b", 50),
        ],
        "doc_id long, source string, n_chars long",
    )
    got = [tuple(r) for r in domain_cap_select(df, cap=2).collect()]
    assert got == [
        (10, "a", 2, True),
        (11, "a", 3, False),
        (12, "a", 1, True),
        (20, "b", 1, True),
    ]


def test_chunk_windows_matches_python(spark, docs):
    import re

    from ocaml_lucene_spark.operators.packing import chunk_windows

    rows = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    tok = lambda t: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
    want = []
    for d in sorted(rows):
        t = tok(rows[d])
        if not t:
            continue
        n_chunks = (len(t) + 47) // 48
        for k in range(n_chunks):
            c = t[k * 48 : k * 48 + 64]
            want.append((d, k, k * 48 + 1, len(c), " ".join(c)))
    got = [tuple(r) for r in chunk_windows(docs, window=64, stride=48).collect()]
    assert got == want
    # overlap property: consecutive chunks of a long doc share 16 tokens
    long_doc = max(rows, key=lambda d: len(tok(rows[d])))
    t = tok(rows[long_doc])
    if len(t) > 64:
        c0, c1 = t[0:64], t[48:112]
        assert c0[48:] == c1[:16]


def test_chunk_windows_hand_doc(spark):
    from ocaml_lucene_spark.operators.packing import chunk_windows

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string"
    )
    got = [tuple(r) for r in chunk_windows(df, window=4, stride=3).collect()]
    # doc 1: 7 tokens -> ceil(7/3)=3 chunks at starts 1,4,7
    assert got == [
        (1, 0, 1, 4, "a b c d"),
        (1, 1, 4, 4, "d e f g"),
        (1, 2, 7, 1, "g"),
        (2, 0, 1, 1, "x"),
    ]


def test_chunk_windows_rejects_gappy_stride(spark, docs):
    import pytest as _pytest

    from ocaml_lucene_spark.operators.packing import chunk_windows

    with _pytest.raises(ValueError):
        chunk_windows(docs, window=4, stride=5)
