"""approx=True sketch mode for the percentile family
(query/grouping.py percentiles_agg / mad_agg / boxplot_agg).

Exact mode is the oracle contract (gate rows); approx mode is the
at-scale path: Spark's mergeable approx_percentile (Greenwald-Khanna
quantile sketch — the role ES fills with t-digest), rank error
<= n/accuracy per key, partial sketches built map-side so executor
memory is O(accuracy*log n) instead of the exact mode's O(rows per
key) buffer. Tests:

- property: every approx output is bracketed by the EXACT percentiles
  at p +/- eps (eps = rank error bound with margin), per key, on both
  the real gate corpus column and a skewed synthetic one;
- plan shape: the approx plan is ObjectHashAggregate with an
  approx_percentile partial BELOW the exchange (map-side sketches)
  and NO sort — while the exact plan's percentile also aggregates
  two-phase, the point pinned here is that approx keeps the same
  two-phase shape with sketch state (the buffer lives in the sketch,
  not a per-key value list; Spark's exact percentile state IS the
  value list).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.query.grouping import boxplot_agg, mad_agg, percentiles_agg

SF = "/root/testdata/sf0.01"
ACC = 1000  # rank error <= n/1000 per key; gate keys have ~1-2k rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _exact_quantile_bracket(values: list[float], p: float, eps: float):
    """[lo, hi] = exact (n-1)-interpolated quantiles at p-eps / p+eps."""
    xs = sorted(values)
    n = len(xs)

    def q(frac):
        frac = min(max(frac, 0.0), 1.0)
        pos = (n - 1) * frac
        lo, hi = int(pos), min(int(pos) + 1, n - 1)
        return xs[lo] + (pos - int(pos)) * (xs[hi] - xs[lo])

    return q(p - eps), q(p + eps)


def _per_key(df, key_col, val_col):
    out: dict = {}
    for r in df.select(key_col, val_col).collect():
        out.setdefault(r[0], []).append(float(r[1]))
    return out


def test_percentiles_approx_within_rank_error(docs):
    ps = (0.5, 0.9, 0.99)
    got = {
        r["key"]: (r["p_50"], r["p_90"], r["p_99"])
        for r in percentiles_agg(docs, ps=ps, approx=True, accuracy=ACC).collect()
    }
    ref = _per_key(docs, "lang", "n_chars")
    assert set(got) == set(ref)
    for key, vals in ref.items():
        # GK guarantee: returned value's RANK is within n/ACC of the
        # target rank -> value must lie inside the exact quantile
        # bracket at p +/- eps (small margin for interpolation vs
        # nearest-data-point semantics)
        eps = 1.0 / ACC + 2.0 / len(vals)
        for p, g in zip(ps, got[key]):
            lo, hi = _exact_quantile_bracket(vals, p, eps)
            assert lo - 1e-9 <= g <= hi + 1e-9, (key, p, g, lo, hi)


def test_percentiles_approx_skewed_key(spark):
    # one hot key with a heavy tail + one tiny key: the shape that
    # kills an O(rows-per-key) buffer at scale and that a sketch must
    # still answer within its rank bound
    rows = [("hot", (i % 97) ** 2) for i in range(20000)] + [
        ("cold", v) for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, ["lang", "n_chars"])
    out = {
        r["key"]: (r["p_50"], r["p_90"], r["p_99"])
        for r in percentiles_agg(df, approx=True, accuracy=ACC).collect()
    }
    ref = _per_key(df, "lang", "n_chars")
    for key, vals in ref.items():
        eps = 1.0 / ACC + 2.0 / len(vals)
        for p, g in zip((0.5, 0.9, 0.99), out[key]):
            lo, hi = _exact_quantile_bracket(vals, p, eps)
            assert lo - 1e-9 <= g <= hi + 1e-9, (key, p, g, lo, hi)


def test_mad_approx_close_to_exact(events):
    exact = {r["key"]: (r["median"], r["mad"]) for r in mad_agg(events).collect()}
    approx = {
        r["key"]: (r["median"], r["mad"])
        for r in mad_agg(events, approx=True, accuracy=ACC).collect()
    }
    assert set(exact) == set(approx)
    # medians/mads over ~2k-row keys with rank error <= 2 ranks: the
    # approx answer must sit within a tight value band of exact
    for key in exact:
        for e, a in zip(exact[key], approx[key]):
            assert abs(e - a) <= max(0.05 * abs(e), 0.5), (key, e, a)


def test_boxplot_approx_brackets_exact(docs):
    exact = {r["key"]: r for r in boxplot_agg(docs).collect()}
    approx = {r["key"]: r for r in boxplot_agg(docs, approx=True, accuracy=ACC).collect()}
    ref = _per_key(docs, "lang", "n_chars")
    for key, vals in ref.items():
        eps = 1.0 / ACC + 2.0 / len(vals)
        for p, col in ((0.25, "q1"), (0.5, "q2"), (0.75, "q3")):
            lo, hi = _exact_quantile_bracket(vals, p, eps)
            assert lo - 1e-9 <= approx[key][col] <= hi + 1e-9
        # whiskers are actual data points inside the (approx) fences
        assert approx[key]["lower_whisker"] in [int(v) for v in vals]
        assert approx[key]["upper_whisker"] in [int(v) for v in vals]
        assert exact[key]["n_docs"] == approx[key]["n_docs"]


def test_approx_plan_is_two_phase_sketch_no_sort(docs):
    plan = percentiles_agg(docs, approx=True, accuracy=ACC)._jdf.queryExecution().executedPlan().toString()
    # map-side partial sketch + post-shuffle merge: two ObjectHashAggregate
    # nodes around one exchange, approx_percentile in both
    assert plan.count("ObjectHashAggregate") >= 2, plan
    assert "approx_percentile" in plan, plan
    # the orderBy("key") output sort is allowed; what must NOT appear
    # is a sort feeding the aggregate (SortAggregate = per-key sorted
    # value stream, the O(rows-per-key)-adjacent shape)
    assert "SortAggregate" not in plan, plan
