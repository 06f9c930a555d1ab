"""Watermarked windowed aggregation over an event stream.

The Structured-Streaming face of query/grouping.py's date_histogram:
tumbling event-time windows + a watermark bounding state and dropping
late data (SURVEY §2.10's streaming surface next to the stateful
dedup operator). Append output mode means a window row is emitted
exactly once, when the watermark passes the window end — the shape a
100 TB ingest pipeline needs: state is |open windows x key
cardinality| regardless of stream length, partitioned by (window,
keys) across executors.

Late-data semantics are the operator's contract (and what the gate
row witnesses): a row whose window was already finalized by the
watermark is DROPPED — the driver oracle aggregates the clean batch
table, so a re-delivered late duplicate reaching the sink would
mismatch the oracle by +1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FMT = {"1 hour": "yyyy-MM-dd HH:mm", "1 day": "yyyy-MM-dd"}


def streaming_date_histogram(
    stream_df: DataFrame,
    ts_col: str = "ts",
    keys: tuple = ("event_type",),
    window: str = "1 hour",
    watermark: str = "1 hour",
    value_col: str = "value",
    quantize: int | None = 100,
) -> DataFrame:
    """Tumbling-window histogram of a streaming DataFrame: one row per
    (window start, keys...) with count + rounded value sum, emitted in
    append mode once the watermark finalizes the window. The bucket is
    a string (window start) so sinks/oracles never depend on
    timestamp-type encoding.

    ``quantize`` mirrors query/grouping.date_histogram: values snap to
    integer 1/quantize units before summing, so the stateful aggregate
    folds LONGS — exact and order-independent across micro-batch /
    partial-merge order, which a raw double sum in stateful
    aggregation cannot guarantee (no deterministic fold is available
    there). ``quantize=None`` restores the float sum."""
    fmt = _FMT[window]
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
        .groupBy(F.window(F.col(ts_col), window), *[F.col(k) for k in keys])
        .agg(
            F.count("*").alias("n_events"),
            total.alias("sum_value"),
        )
    )
    return agg.select(
        F.date_format(F.col("window.start"), fmt).alias("bucket"),
        *[F.col(k) for k in keys],
        "n_events",
        "sum_value",
    )
