"""Property tests for the integer half-away-from-zero rounding
contract (grouping._div_round_expr / oracle_sql._div_round4_sql) and
chunk_windows' coverage arithmetic — the two pure-integer formulas the
round-6 gate rows lean on. The formulas are checked against exact
Fraction references (Hypothesis, no JVM), then one batched Spark/
DuckDB run pins that both engines evaluate them identically."""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocaml_lucene_spark.query.grouping import _div_round_expr
from ocaml_lucene_spark.query.oracle_sql import _div_round4_sql


def _py_div_round4(num: int, den: int, ten4: int = 10000) -> int:
    """Exact reference: round-half-away-from-zero of num/den at 4dp
    via Fraction arithmetic."""
    x = Fraction(num * ten4, den)
    s = -1 if x < 0 else 1
    ax = abs(x)
    floor = ax.numerator // ax.denominator
    rem = ax - floor
    return s * (floor + (1 if rem >= Fraction(1, 2) else 0))


@given(
    num=st.integers(min_value=-(10**12), max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_div_round_formula_is_half_away_from_zero(num, den):
    # the shipped integer formula, evaluated in python (// truncates
    # toward zero for the non-negative operands after the sign split,
    # same as Spark div / DuckDB //)
    s = -1 if num < 0 else 1
    k = s * ((2 * abs(num) * 10000 + den) // (2 * den))
    assert k == _py_div_round4(num, den)


def test_div_round_engines_match_reference_batch(spark):
    rng = random.Random(7)
    pairs = [(rng.randint(-10**9, 10**9), rng.randint(1, 10**6)) for _ in range(500)]
    # exact half-boundary cases: num/den = x.00005 exactly
    pairs += [(2 * 100005, 2 * 10**5), (-3 * 100015, 3 * 10**5), (100005, 2 * 10**5)]
    want = [_py_div_round4(n, d) for n, d in pairs]

    df = spark.createDataFrame(pairs, "num long, den long").selectExpr(
        "num", "den",
        _div_round_expr(
            "cast(num as decimal(38,0))", "cast(den as decimal(38,0))"
        ) + " as k",
    )
    got_spark = [int(r.k) for r in df.orderBy("num", "den").collect()]
    ordered = sorted(zip(pairs, want))
    assert got_spark == [w for _, w in ordered]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    expr = _div_round4_sql("num::HUGEINT", "den::HUGEINT")
    got_duck = [r[0] for r in con.execute(
        f"SELECT {expr} FROM t ORDER BY num, den"
    ).fetchall()]
    assert got_duck == [w for _, w in ordered]


@given(
    n=st.integers(min_value=1, max_value=5000),
    w=st.integers(min_value=1, max_value=128),
    s=st.integers(min_value=1, max_value=128),
)
@settings(max_examples=300, deadline=None)
def test_chunk_window_arithmetic_covers_every_token(n, w, s):
    """chunk_windows' contract: with stride <= window, the union of
    chunk spans [k*s+1, min(k*s+w, n)] for k in 0..ceil(n/s)-1 covers
    1..n with no gaps, and every chunk is non-empty."""
    if s > w:
        return  # the operator rejects gappy strides
    n_chunks = (n + s - 1) // s
    covered = set()
    for k in range(n_chunks):
        lo, hi = k * s + 1, min(k * s + w, n)
        assert lo <= hi  # non-empty
        covered.update(range(lo, hi + 1))
    assert covered == set(range(1, n + 1))
