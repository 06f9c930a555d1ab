"""Streaming sessionization: session merge across batches, watermark
close-out, and late-row drop (the phantom-session hazard).

The gate row (streamed_sessions) checks stream-batch parity against
the batch session_windows SQL oracle; these tests pin the micro-batch
mechanics the harness relies on with a hand stream:

1. a user's events split across batches MERGE into one session while
   it is open (stateful session_window merge);
2. a late re-delivery arriving AFTER its session closed (in its own
   batch — the one-batch watermark lag pinned by
   tests/test_streaming_histogram.py) is dropped: no phantom 1-event
   session, no duplicate emission;
3. a session whose end the watermark never passes is NOT emitted
   (append-mode contract — the gate's sentinel relies on this).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocaml_lucene_spark.streaming.sessions import streaming_session_windows

T0 = dt.datetime(2024, 1, 1)


def _tb(rows):
    return pa.table(
        {
            "ts": pa.array(
                [T0 + dt.timedelta(minutes=m) for m, _u in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([u for _m, u in rows], pa.int64()),
            "value": pa.array([1.0] * len(rows)),
        }
    )


def _run(spark, tmp_path, batches, gap="30 minutes", watermark="10 minutes"):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    for i, t in enumerate(batches):
        p = f"{src}/b{i}.parquet"
        pq.write_table(t, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_session_windows(stream, gap=gap, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in spark.read.parquet(out).orderBy("user_id", "start_us").collect()
    ]


def _us(minutes):
    return int((T0 + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000)


def test_session_merges_across_batches_and_late_row_is_dropped(spark, tmp_path):
    # batch0: user 1 at t=0 and t=10 (one open session)
    # batch1: user 1 at t=20 (merges: gaps < 30m) + t=300 — watermark
    #         still lags (batch0's max - 10m = 0), nothing closes yet
    # batch2: t=301 — plans with batch1's max (300 - 10m = 290):
    #         session [0, 50) is EVICTED here; the late row must NOT
    #         share this batch (same-batch late rows still merge — the
    #         measured one-batch-lag behavior pinned in
    #         tests/test_streaming_histogram.py)
    # batch3: late re-delivery of t=0, one batch AFTER the eviction —
    #         dropped: no phantom 1-event session, no re-emission
    # batch4: sentinel at t=1000 (user 2) closes the [300, 331) session
    got = _run(
        spark,
        tmp_path,
        [
            _tb([(0, 1), (10, 1)]),
            _tb([(20, 1), (300, 1)]),
            _tb([(301, 1)]),
            _tb([(0, 1)]),
            _tb([(1000, 2)]),
        ],
    )
    # sessions: user1 [0, 20+30) x3; user1 [300, 301+30) x2;
    # user2's sentinel session never closes -> absent
    assert got == [
        (1, _us(0), _us(50), 3),
        (1, _us(300), _us(331), 2),
    ]
