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
