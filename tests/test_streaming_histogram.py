"""Watermarked windowed aggregation: late-data semantics, measured.

Spark's global watermark lags ONE micro-batch (batch N plans with the
max event time of batches < N). Consequences this engine relies on —
both pinned here because the gate harness depends on them:

1. a late row arriving in the SAME batch as its window's eviction is
   still merged (no input-side drop before the state flush);
2. a late row arriving once the window was evicted in an EARLIER
   batch is dropped, with NO resurrected state and NO duplicate
   emission of the window.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from ocaml_lucene_spark.streaming.histogram import streaming_date_histogram


def _tb(minutes):
    t0 = dt.datetime(2024, 1, 1)
    return pa.table(
        {
            "ts": pa.array(
                [t0 + dt.timedelta(minutes=m) for m in minutes], pa.timestamp("us")
            ),
            "event_type": pa.array(["e"] * len(minutes)),
            "value": pa.array([1.0] * len(minutes)),
        }
    )


def _run(spark, tmp_path, batches):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    for i, t in enumerate(batches):
        p = f"{src}/b{i}.parquet"
        pq.write_table(t, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_date_histogram(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.bucket, r.n_events) for r in spark.read.parquet(out).collect()
    )


def test_late_row_in_eviction_batch_is_still_merged(spark, tmp_path):
    # late 00:07 rides the same batch that first plans with a watermark
    # past its window -> merged (the one-batch watermark lag)
    got = _run(
        spark,
        tmp_path,
        [_tb([5, 10, 600]), _tb([7, 610]), _tb([100000])],
    )
    assert ("2024-01-01 00:00", 3) in got


def test_late_row_after_eviction_is_dropped_without_duplicate_emission(
    spark, tmp_path
):
    got = _run(
        spark,
        tmp_path,
        [
            _tb([5, 10]),     # 00:05, 00:10
            _tb([600]),       # advances max event time to 10:00
            _tb([605]),       # spacer: 00:00 window evicted+emitted here
            _tb([7, 610]),    # LATE 00:07 (dropped) + on-time 10:10
            _tb([100000]),    # sentinel flush
        ],
    )
    assert got == [("2024-01-01 00:00", 2), ("2024-01-01 10:00", 3)]


def test_streaming_matches_batch_histogram_when_nothing_late(spark, tmp_path):
    batches = [_tb([5, 10, 65]), _tb([300, 301, 302]), _tb([100000])]
    got = _run(spark, tmp_path, batches)
    full = pa.concat_tables(batches[:2])
    batch_df = spark.createDataFrame(full.to_pandas())
    want = sorted(
        (r.bucket, r.n_events)
        for r in (
            batch_df.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias(
                    "bucket"
                )
            )
            .agg(F.count("*").alias("n_events"))
            .collect()
        )
    )
    assert got == want
