"""Watermarked session-window aggregation over an event stream.

The Structured-Streaming face of query/grouping.py's session_windows
(SURVEY §2.10's streaming surface, next to the stateful dedup and the
windowed histogram): per user, events closer than ``gap`` merge into
one session; the watermark closes a session once event time moves
past its end, so append mode emits each session exactly once and
state is bounded by |open sessions|, not stream length.

Semantics contract (what the gate row witnesses): with every real
event admitted before the watermark passes, the emitted session set
over a finite stream EQUALS the batch session_windows output on the
same events — F.session_window is the same Catalyst aggregate in both
modes, merging open sessions executor-side. A late re-delivery whose
session was already finalized is DROPPED at the input filter (given
its own micro-batch — Spark's watermark lags one batch, the measured
4.1.2 behavior pinned by tests/test_streaming_histogram.py), so a
duplicate can never resurrect or double-count a closed session.

Scale shape: one shuffle on the user key per micro-batch; session
state merges incrementally (no per-event state growth); the output
stream carries |closed sessions| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_windows(
    stream_df: DataFrame,
    gap: str = "6 hours",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    quantize: int | None = 100,
) -> DataFrame:
    """Streaming sessionization: returns (user_id, start_us, end_us,
    n_events, sum_value) rows emitted in append mode when the
    watermark closes each session; end_us = last event + gap (Spark's
    session_window contract), bounds as epoch-MICROSECOND integers so
    sinks/oracles never depend on timestamp encoding (the batch
    session_windows convention).

    ``quantize`` mirrors the batch op: values snap to integer
    1/quantize units before summing, so the stateful aggregate folds
    LONGS — exact and order-independent across micro-batch merge
    order, which a raw double sum in stateful aggregation cannot
    guarantee. No orderBy here (unsupported on append streams); the
    sink reader orders (user_id, start_us) — a total order, one
    user's sessions are disjoint."""
    if quantize is None:
        total = F.round(F.sum(value_col), 4)
    else:
        total = F.round(
            F.sum(F.round(F.col(value_col) * quantize, 0).cast("long")).cast("double")
            / F.lit(float(quantize)),
            4,
        )
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_events"),
            total.alias("sum_value"),
        )
    )
    return agg.select(
        F.col(user_col),
        # parquet timestamps read as TIMESTAMP_NTZ; session TZ pinned
        # UTC (session.py) makes the cast a deterministic identity
        F.unix_micros(F.col("session_window.start").cast("timestamp")).alias(
            "start_us"
        ),
        F.unix_micros(F.col("session_window.end").cast("timestamp")).alias("end_us"),
        "n_events",
        "sum_value",
    )
