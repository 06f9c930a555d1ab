"""ES bucket-pipeline aggregations: bucket_selector, bucket_sort,
serial_diff. The gate replica (test_entry.py) covers oracle parity at
sf0.01; these pin the semantics against python references and the
contracts the oracles can't see (threshold exactness, offset cut,
lag-NULL prefix)."""

from __future__ import annotations

import datetime as dt

import pytest

from ocaml_lucene_spark.query.grouping import (
    bucket_selector,
    bucket_sort,
    serial_diff,
    top_metrics,
    weighted_avg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _py_histogram(events):
    """(key, day-bucket) -> (n, q) reference, q in integer cents."""
    agg = {}
    for r in events.select("event_type", "ts", "value").collect():
        k = (r.event_type, r.ts.strftime("%Y-%m-%d"))
        n, q = agg.get(k, (0, 0))
        agg[k] = (n + 1, q + round(r.value * 100))
    return agg


def test_bucket_selector_matches_python_filter(events):
    ref = _py_histogram(events)
    thr = 300.0
    want = sorted(
        (k, b, n, q / 100.0) for (k, b), (n, q) in ref.items() if q > thr * 100
    )
    got = [tuple(r) for r in bucket_selector(events, min_sum=thr).collect()]
    assert got == [(k, b, n, round(s, 4)) for k, b, n, s in want]
    # and some bucket was actually dropped (non-vacuous)
    assert 0 < len(got) < len(ref)


def test_bucket_selector_rejects_sub_quantize_threshold(events):
    with pytest.raises(ValueError):
        bucket_selector(events, min_sum=3300.001)  # finer than 1/100


def test_bucket_sort_is_the_python_slice(events):
    ref = _py_histogram(events)
    ranked = sorted(
        ((q / 100.0, k, b, n) for (k, b), (n, q) in ref.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    want = [(k, b, n, round(s, 4)) for s, k, b, n in ranked[3 : 3 + 5]]
    got = [tuple(r) for r in bucket_sort(events, size=5, from_=3).collect()]
    assert got == want


def test_serial_diff_hand_series(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        ("a", base + dt.timedelta(days=d), v)
        for d, v in [(0, 1.0), (1, 2.5), (2, 2.0), (3, 5.0), (4, 1.0)]
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = [(r.bucket, r.sum_value, r.diff_value) for r in serial_diff(df, lag=2).collect()]
    assert got == [
        ("2024-03-01", 1.0, None),
        ("2024-03-02", 2.5, None),
        ("2024-03-03", 2.0, 1.0),
        ("2024-03-04", 5.0, 2.5),
        ("2024-03-05", 1.0, -1.0),
    ]


def test_weighted_avg_matches_python(events):
    import json

    agg: dict[str, tuple] = {}
    for r in events.select("event_type", "value", "props").collect():
        k = json.loads(r.props)["k"]
        n, sw, num = agg.get(r.event_type, (0, 0, 0))
        agg[r.event_type] = (n + 1, sw + k, num + round(r.value * 100) * k)
    got = {r.key: tuple(r)[1:] for r in weighted_avg(events).collect()}
    assert set(got) == set(agg)
    for k, (n, sw, num) in agg.items():
        gn, gsw, gwa = got[k]
        assert (gn, gsw) == (n, sw)
        # integer-rounding reference (all values positive here):
        # k = (2*N*10^4 + D) div 2D with D = 100*sw
        want = (2 * num * 10**4 + 100 * sw) // (2 * 100 * sw)
        assert gwa == want / 10**4, k


def test_weighted_avg_zero_weight_key_is_null(spark):
    rows = [("a", 5.0, '{"k": 0}'), ("a", 7.0, '{"k": 0}'), ("b", 2.0, '{"k": 3}')]
    df = spark.createDataFrame(rows, "event_type string, value double, props string")
    got = {r.key: (r.sum_weight, r.weighted_avg) for r in weighted_avg(df).collect()}
    assert got["a"] == (0, None)
    assert got["b"] == (3, 2.0)


def test_top_metrics_is_latest_row_per_key(events):
    want = {}
    for r in events.select("event_type", "ts", "event_id", "value").collect():
        cur = want.get(r.event_type)
        key = (r.ts, r.event_id)
        if cur is None or key > (cur[0], cur[1]):
            want[r.event_type] = (r.ts, r.event_id, round(r.value, 4))
    got = {r.key: (r.ts_us, r.event_id, r.top_value) for r in top_metrics(events).collect()}
    assert set(got) == set(want)
    epoch = dt.datetime(1970, 1, 1)
    for k, (ts, eid, v) in want.items():
        # exact epoch micros from timedelta components (float seconds
        # would lose precision past 2^53 ns)
        delta = ts - epoch
        us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        assert got[k] == (us, eid, v), k


def test_serial_diff_null_prefix_per_key(events):
    lag = 7
    rows = serial_diff(events, lag=lag).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    for k, series in by_key.items():
        # rows come back ordered (key, bucket); the first `lag` buckets
        # of every key are NULL, everything after is populated
        assert all(r.diff_value is None for r in series[:lag]), k
        assert all(r.diff_value is not None for r in series[lag:]), k


def test_terms_shard_topk_bound_guarantee(spark):
    """The ES contract: for every returned bucket, the TRUE doc count
    lies in [doc_count, doc_count + error_upper] — checked against an
    exact df computed with no sharding at all (non-circular)."""
    from pyspark.sql import functions as F

    from ocaml_lucene_spark.functions.analysis import tokens_col
    from ocaml_lucene_spark.query.grouping import terms_shard_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = terms_shard_topk(docs, n_shards=3, shard_size=10, size=25).collect()
    true_df = {
        r.term: r.df
        for r in docs.select(
            F.col("doc_id"), F.explode(F.array_distinct(tokens_col("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    # candidate union is <= n_shards * shard_size; at sf0.001 with
    # shard overlap that's ~21 terms — the cut, not the corpus, limits
    assert 0 < len(got) <= 25
    under = 0
    for r in got:
        t = true_df[r.term]
        assert r.doc_count <= t <= r.doc_count + r.error_upper, (r, t)
        under += int(r.doc_count < t)
    # the approximation must actually bite somewhere at shard_size=10
    # (otherwise the test is vacuous)
    assert under > 0


def test_terms_shard_topk_matches_python_replay(spark):
    from ocaml_lucene_spark.functions.analysis import py_tokenize
    from ocaml_lucene_spark.query.grouping import terms_shard_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_shards, shard_size, size = 3, 10, 25
    per: dict[int, dict[str, int]] = {s: {} for s in range(n_shards)}
    for r in docs.select("doc_id", "text").collect():
        s = r.doc_id % n_shards
        for t in set(py_tokenize(r.text)):
            per[s][t] = per[s].get(t, 0) + 1
    kept, last_eff = {}, {}
    for s, cnts in per.items():
        ranked = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[:shard_size]
        kept[s] = dict(ranked)
        last_eff[s] = 0 if len(cnts) <= shard_size else min(c for _, c in ranked)
    terms = {t for d in kept.values() for t in d}
    merged = []
    for t in terms:
        dc = sum(kept[s].get(t, 0) for s in kept)
        err = sum(last_eff[s] for s in kept if t not in kept[s])
        merged.append((t, dc, err))
    merged.sort(key=lambda x: (-x[1], x[0]))
    want = merged[:size]
    got = [
        (r.term, r.doc_count, r.error_upper)
        for r in terms_shard_topk(
            docs, n_shards=n_shards, shard_size=shard_size, size=size
        ).collect()
    ]
    assert got == want


def test_diversified_sampler_matches_python_replay(spark):
    """Replay the sample selection in python from the engine's own
    rounded per-doc scores (the selection, cap, and cut are the
    contract; the scores themselves are gate-checked elsewhere) and
    check the facet counts + the per-key cap property."""
    from ocaml_lucene_spark.query.grouping import (
        _bm25_doc_scores,
        diversified_sample_facets,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    terms, cap, n = ["table", "hash"], 2, 30
    scores = {r.doc_id: r.score for r in _bm25_doc_scores(docs, terms).collect()}
    meta = {r.doc_id: (r.source, r.lang) for r in docs.select("doc_id", "source", "lang").collect()}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    per_key: dict[str, int] = {}
    sample = []
    for d, s in ranked:
        src = meta[d][0]
        if per_key.get(src, 0) < cap:
            per_key[src] = per_key.get(src, 0) + 1
            sample.append(d)
    sample = sample[:n]
    want: dict[str, int] = {}
    for d in sample:
        want[meta[d][1]] = want.get(meta[d][1], 0) + 1
    got = {
        r.facet_value: r.n_docs
        for r in diversified_sample_facets(
            docs, terms, max_per_key=cap, sample_size=n
        ).collect()
    }
    assert got == want
    assert sum(got.values()) == len(sample) <= n


def test_hll_cardinality_accuracy_and_invariances(spark):
    """HLL sanity at m=64 (standard error 1.04/8 = 13%): estimates
    land within 3 sigma of exact; duplicating the input changes
    nothing (the register max absorbs repeats — the mergeability that
    makes the sketch scale); both correction branches are exercised
    across the two canonical gate inputs."""
    from pyspark.sql import functions as F

    from ocaml_lucene_spark.query.grouping import hll_cardinality

    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = ev.select("event_type", F.col("user_id").cast("string").alias("item"))
    vals = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").cast("string").alias("item"),
    )
    for df in (users, vals):
        rows = hll_cardinality(df, item_col="item").collect()
        for r in rows:
            assert abs(r.hll_estimate - r.exact_distinct) <= 0.4 * r.exact_distinct, r
        doubled = hll_cardinality(df.unionAll(df), item_col="item").collect()
        assert [tuple(r) for r in doubled] == [tuple(r) for r in rows]
    # branch coverage: small cardinalities leave empty registers
    # (linear counting), larger ones may fill all 64 (raw estimator)
    u = hll_cardinality(users, item_col="item").collect()
    assert any(r.v_empty > 0 for r in u)


def test_stats_bucket_hand_series_and_tie_scalarization(spark):
    from ocaml_lucene_spark.query.grouping import stats_bucket

    base = dt.datetime(2024, 3, 1)
    rows = [
        # key "a": bucket sums 3.0, 5.0, 5.0, 1.0 — max TIES on days
        # 2 and 3 -> max_bucket must be the lexicographically FIRST
        ("a", base + dt.timedelta(days=0), 3.0),
        ("a", base + dt.timedelta(days=1), 2.0),
        ("a", base + dt.timedelta(days=1), 3.0),
        ("a", base + dt.timedelta(days=2), 5.0),
        ("a", base + dt.timedelta(days=3), 1.0),
        # key "b": one bucket, negative sum (signed-zero / sign path)
        ("b", base, -2.5),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = [tuple(r) for r in stats_bucket(df).collect()]
    assert got == [
        # avg of (3.0, 5.0, 5.0, 1.0) = 3.5 exactly
        ("a", 4, 1.0, 5.0, 3.5, 14.0, "2024-03-04", "2024-03-02"),
        ("b", 1, -2.5, -2.5, -2.5, -2.5, "2024-03-01", "2024-03-01"),
    ], got


def test_stats_bucket_matches_python_replay(events):
    from ocaml_lucene_spark.query.grouping import stats_bucket

    ref = _py_histogram(events)
    per = {}
    for (k, b), (_n, q) in ref.items():
        per.setdefault(k, []).append((b, q))
    expected = []
    for k in sorted(per):
        qs = [q for _b, q in per[k]]
        n, total = len(qs), sum(qs)
        # avg: integer half-away-from-zero of total/(n*100) at 4dp
        num, den = abs(total) * 10000 * 2, 2 * n * 100
        avg = (1 if total >= 0 else -1) * ((num + n * 100) // den) / 10000.0
        min_q, max_q = min(qs), max(qs)
        expected.append(
            (
                k, n, min_q / 100.0, max_q / 100.0, avg, total / 100.0,
                min(b for b, q in per[k] if q == min_q),
                min(b for b, q in per[k] if q == max_q),
            )
        )
    got = [tuple(r) for r in stats_bucket(events).collect()]
    assert got == expected


def test_mad_agg_matches_numpy(spark):
    import numpy as np

    from ocaml_lucene_spark.query.grouping import mad_agg

    events = spark.read.parquet(f"{SF}/events.parquet")
    got = {r.key: r for r in mad_agg(events).collect()}
    vals = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(round(r.value * 100))
    for k, units in vals.items():
        a = np.array(units, dtype=np.float64)
        med = float(np.percentile(a, 50))
        mad = float(np.percentile(np.abs(a - med), 50))
        assert got[k].n_events == len(units)
        assert got[k].median == round(med / 100, 4) + 0.0
        assert got[k].mad == round(mad / 100, 4)


def test_mad_agg_hand_values(spark):
    from ocaml_lucene_spark.query.grouping import mad_agg

    # values 1.00..5.00: median 3.00, |dev| = [2,1,0,1,2] -> mad 1.00;
    # second key has an interpolated (even-count) median: [1.00, 2.00]
    # -> median 1.50, devs [.5,.5] -> mad 0.50
    rows = [(i, "a", 1.0 + i) for i in range(5)] + [(9, "b", 1.0), (10, "b", 2.0)]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = [tuple(r) for r in mad_agg(events).collect()]
    assert got == [("a", 5, 3.0, 1.0), ("b", 2, 1.5, 0.5)], got


def test_boxplot_whiskers_exclude_outliers(spark):
    from ocaml_lucene_spark.query.grouping import boxplot_agg

    # 0..9 plus an outlier 1000: q1=2.5, q3=7.75 (n=11), iqr=5.25,
    # hi fence = 15.625 -> upper whisker is 9, NOT 1000; lower fence
    # -5.375 -> lower whisker 0
    docs = spark.createDataFrame(
        [(i, "en", i) for i in range(10)] + [(99, "en", 1000)],
        "doc_id long, lang string, n_chars long",
    )
    r = boxplot_agg(docs).collect()[0]
    assert (r.key, r.n_docs) == ("en", 11)
    assert (r.q1, r.q2, r.q3, r.iqr) == (2.5, 5.0, 7.5, 5.0)
    assert (r.lower_whisker, r.upper_whisker) == (0, 9)


def _py_string_stats(rows):
    """Pure-python replay of string_stats' quantized-entropy contract."""
    import math
    from collections import Counter

    vals = Counter(rows)
    n = sum(vals.values())
    lens = [len(v) for v in vals]
    sl = sum(nv * len(v) for v, nv in vals.items())
    # avg: integer half-away-from-zero of sl/n at 4dp (sl, n >= 0 here)
    avg = ((2 * sl * 10000 + n) // (2 * n)) / 10000.0
    chars = Counter()
    for v, nv in vals.items():
        for c in v:
            chars[c] += nv
    big_n = sum(chars.values())
    s = 0
    for c, cnt in chars.items():
        units = round(round(math.log2(cnt / big_n), 6) * 1000000.0)
        s += cnt * units
    entropy = round(-(s / 1000000.0 / big_n), 4)
    return n, min(lens), max(lens), avg, entropy


def test_string_stats_matches_python(spark):
    from ocaml_lucene_spark.query.grouping import string_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [r.source for r in docs.select("source").collect()]
    got = string_stats(docs, col="source").collect()[0]
    n, mn, mx, avg, ent = _py_string_stats(rows)
    assert (got.n_values, got.min_length, got.max_length) == (n, mn, mx)
    assert got.avg_length == avg
    assert got.entropy == ent
    assert got.entropy > 0


def test_string_stats_hand_values(spark):
    from ocaml_lucene_spark.query.grouping import string_stats

    # "aa" x3 + "ab" x1: chars a=7, b=1, N=8 -> H = -(7/8)log2(7/8)
    # - (1/8)log2(1/8) = 0.5436 at 4dp under the quantized fold
    docs = spark.createDataFrame(
        [(0, "aa"), (1, "aa"), (2, "aa"), (3, "ab")], "doc_id long, source string"
    )
    got = string_stats(docs, col="source").collect()[0]
    n, mn, mx, avg, ent = _py_string_stats(["aa", "aa", "aa", "ab"])
    assert tuple(got) == (n, mn, mx, avg, ent)
    assert got.avg_length == 2.0


def test_t_test_matches_numpy(spark, events):
    import numpy as np

    from ocaml_lucene_spark.query.grouping import t_test

    got = t_test(events).collect()[0]
    vals = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(round(r.value * 100))
    a = np.array(vals["click"], dtype=np.float64) / 100.0
    b = np.array(vals["error"], dtype=np.float64) / 100.0
    t_np = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert (got.n_a, got.n_b) == (len(a), len(b))
    # means: integer half-away rounding of the exact ratios
    for mean_got, arr in ((got.mean_a, vals["click"]), (got.mean_b, vals["error"])):
        s, den = sum(arr), len(arr) * 100
        sign = 1 if s >= 0 else -1
        exp = sign * ((2 * abs(s) * 10000 + den) // (2 * den)) / 10000.0
        assert mean_got == exp + 0.0
    assert abs(got.t_stat - t_np) < 5e-5


def test_t_test_hand_values(spark):
    from ocaml_lucene_spark.query.grouping import t_test

    # click: [1,2,3] mean 2 var 1; error: [2,4] mean 3 var 2 ->
    # t = (2-3)/sqrt(1/3 + 2/2) = -1/sqrt(4/3) = -0.8660 at 4dp
    rows = [(0, "click", 1.0), (1, "click", 2.0), (2, "click", 3.0),
            (3, "error", 2.0), (4, "error", 4.0), (5, "view", 99.0)]
    events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = t_test(events).collect()[0]
    assert tuple(got) == (3, 2, 2.0, 3.0, -0.866)


def test_normalize_agg_matches_python(spark, events):
    from ocaml_lucene_spark.query.grouping import normalize_agg

    got = [tuple(r) for r in normalize_agg(events).collect()]
    per = {}
    for r in events.select("ts", "value").collect():
        b = r.ts.strftime("%Y-%m-%d")
        n, q = per.get(b, (0, 0))
        per[b] = (n + 1, q + round(r.value * 100))
    tot = sum(q for _n, q in per.values())
    lo = min(q for _n, q in per.values())
    hi = max(q for _n, q in per.values())

    def div4(num, den):
        sign = 1 if num >= 0 else -1
        return sign * ((2 * abs(num) * 10000 + den) // (2 * den)) / 10000.0

    expected = [
        (
            b, n, round(q / 100.0, 4), div4(q * 100, tot) + 0.0,
            (div4(q - lo, hi - lo) + 0.0) if hi != lo else None,
        )
        for b, (n, q) in sorted(per.items())
    ]
    assert got == expected
    # percent_of_sum sums to ~100, rescale spans [0, 1]
    assert abs(sum(r[3] for r in got) - 100.0) < 0.01
    assert min(r[4] for r in got) == 0.0 and max(r[4] for r in got) == 1.0


def test_normalize_agg_degenerate_rescale_null(spark):
    import datetime as dt

    from ocaml_lucene_spark.query.grouping import normalize_agg

    rows = [
        (0, dt.datetime(2024, 1, 1, 5), 2.0),
        (1, dt.datetime(2024, 1, 2, 5), 2.0),
    ]
    events = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = [tuple(r) for r in normalize_agg(events).collect()]
    assert got == [
        ("2024-01-01", 1, 2.0, 50.0, None),
        ("2024-01-02", 1, 2.0, 50.0, None),
    ]


def test_cumulative_cardinality_matches_python(spark, events):
    from ocaml_lucene_spark.query.grouping import cumulative_cardinality

    got = [tuple(r) for r in cumulative_cardinality(events).collect()]
    per = {}
    for r in events.select("ts", "user_id").collect():
        per.setdefault(r.ts.strftime("%Y-%m-%d"), []).append(r.user_id)
    seen, expected = set(), []
    for b in sorted(per):
        ids = per[b]
        seen |= set(ids)
        expected.append((b, len(ids), len(set(ids)), len(seen)))
    assert got == expected
    # cumulative is monotone and ends at the global distinct count
    assert got[-1][3] == len(seen)
    assert all(a[3] <= b[3] for a, b in zip(got, got[1:]))


def test_vwh_centroids_finds_bimodal_modes():
    from ocaml_lucene_spark.query.grouping import vwh_centroids

    # two tight clusters around 10.00 and 90.00 (unit = cents)
    hist = {998: 5, 1000: 10, 1002: 5, 8998: 5, 9000: 10, 9002: 5}
    cent = vwh_centroids(hist, k=2, n_iters=8)
    assert cent == [1000 * 10000, 9000 * 10000]
    # k > distinct values clamps; k=1 is the global weighted mean
    assert len(vwh_centroids({100: 3}, k=5)) == 1
    one = vwh_centroids(hist, k=1, n_iters=4)
    tot = sum(v * 10000 * c for v, c in hist.items())
    n = sum(hist.values())
    assert one == [((2 * tot + n) // (2 * n))]


def test_variable_width_histogram_matches_python(spark, events):
    from collections import Counter

    from ocaml_lucene_spark.query.grouping import (
        variable_width_histogram,
        vwh_centroids,
    )

    vals = [round(r.value * 100) for r in events.select("value").collect()]
    hist = Counter(vals)
    cent = vwh_centroids(dict(hist), k=4, n_iters=8)
    assert cent == sorted(cent) and len(cent) == 4

    got = [tuple(r) for r in variable_width_histogram(events, k=4, n_iters=8).collect()]

    def bucket(v):
        b = 0
        for i in range(len(cent) - 1):
            if 2 * v * 10000 > cent[i] + cent[i + 1]:
                b = i + 1
        return b

    per = {}
    for v in vals:
        b = bucket(v)
        n, lo, hi = per.get(b, (0, v, v))
        per[b] = (n + 1, min(lo, v), max(hi, v))
    expected = [
        (b, n, lo / 100.0, hi / 100.0, cent[b] / 1000000.0)
        for b, (n, lo, hi) in sorted(per.items())
    ]
    assert got == expected
    # buckets partition the events; boundaries do not overlap
    assert sum(r[1] for r in got) == len(vals)
    for a, b in zip(got, got[1:]):
        assert a[3] < b[2]  # prev max < next min


def test_vwh_spark_and_pyarrow_training_agree(spark):
    import __spark_entry__ as entry
    from ocaml_lucene_spark.query.grouping import vwh_centroids

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    rows = (
        ev.selectExpr("cast(round(value * 100, 0) as long) as v")
        .groupBy("v").count().collect()
    )
    spark_cent = vwh_centroids({r.v: r["count"] for r in rows}, k=6, n_iters=8)
    assert spark_cent == entry._vwh_centroids(sf, k=6, n_iters=8)


def _div_round4(num: int, den: int) -> int:
    """Python mirror of grouping._div_round_expr (integer
    half-away-from-zero at 4dp; // truncates toward zero for the
    sign-split operands)."""
    s = -1 if num < 0 else 1
    return s * ((2 * abs(num) * 10000 + den) // (2 * den))


def test_bucket_script_matches_python(events):
    from ocaml_lucene_spark.query.grouping import bucket_script

    agg = {}
    for r in events.select("ts", "event_type", "value").collect():
        b = r.ts.strftime("%Y-%m-%d")
        n, p, q = agg.get(b, (0, 0, 0))
        agg[b] = (n + 1, p + (r.event_type == "click"), q + round(r.value * 100))
    want = [
        (
            b,
            n,
            p,
            _div_round4(p, n) / 10000.0,
            _div_round4(q, n * 100) / 10000.0 + 0.0,
        )
        for b, (n, p, q) in sorted(agg.items())
    ]
    got = [tuple(r) for r in bucket_script(events, pick_type="click").collect()]
    assert got == want
    # non-vacuous: some bucket has clicks, some ratio is non-trivial
    assert any(p > 0 for _, _, p, _, _ in got)


def test_bucket_script_hand_values(spark):
    from ocaml_lucene_spark.query.grouping import bucket_script

    base = dt.datetime(2024, 3, 1, 12)
    rows = [
        ("click", base, 1.0),
        ("view", base + dt.timedelta(hours=1), 2.0),
        ("error", base + dt.timedelta(days=1), 0.1),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = [tuple(r) for r in bucket_script(df, pick_type="click").collect()]
    assert got == [
        ("2024-03-01", 2, 1, 0.5, 1.5),
        ("2024-03-02", 1, 0, 0.0, 0.1),
    ]


def test_cumulative_sum_matches_python(events):
    from ocaml_lucene_spark.query.grouping import cumulative_sum

    ref = _py_histogram(events)
    want = []
    by_key = {}
    for (k, b), (n, q) in sorted(ref.items()):
        by_key.setdefault(k, []).append((b, q))
    for k in sorted(by_key):
        running = 0
        for b, q in sorted(by_key[k]):
            running += q
            want.append((k, b, round(q / 100.0, 4), round(running / 100.0, 4)))
    got = [tuple(r) for r in cumulative_sum(events).collect()]
    assert got == want
    # last bucket's cum equals the key total (non-vacuous running fold)
    totals = {k: round(sum(q for _, q in v) / 100.0, 4) for k, v in by_key.items()}
    last = {g[0]: g[3] for g in got}
    assert last == totals


def test_percentiles_bucket_matches_python(events):
    from ocaml_lucene_spark.query.grouping import percentiles_bucket

    ref = _py_histogram(events)
    by_key = {}
    for (k, b), (n, q) in ref.items():
        by_key.setdefault(k, []).append(q)

    def interp(vals, p):
        v = sorted(vals)
        pos = (len(v) - 1) * p
        lo = int(pos)
        hi = min(lo + 1, len(v) - 1)
        return v[lo] + (pos - lo) * (v[hi] - v[lo])

    want = [
        (
            k,
            len(qs),
            round(interp(qs, 0.25) / 100.0, 4) + 0.0,
            round(interp(qs, 0.5) / 100.0, 4) + 0.0,
            round(interp(qs, 0.75) / 100.0, 4) + 0.0,
        )
        for k, qs in sorted(by_key.items())
    ]
    got = [tuple(r) for r in percentiles_bucket(events).collect()]
    assert got == want
    for row in got:
        assert row[2] <= row[3] <= row[4]  # quartiles are ordered


def test_percentiles_bucket_rejects_non_binary_fraction(events):
    from ocaml_lucene_spark.query.grouping import percentiles_bucket

    with pytest.raises(ValueError):
        percentiles_bucket(events, ps=(0.3,))
