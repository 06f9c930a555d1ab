"""Stateful streaming dedup: applyInPandasWithState across micro-batches.

A training-data ingest stream re-delivers near-identical pages (crawl
re-fetches, mirrors); batch-mode ``operators/dedup.py`` handles the
static case, this operator the STREAMING one: keep only the FIRST
document ever seen for each exact text hash, across all micro-batches,
with per-key state in Spark's streaming state store.

Shape: groupBy(text_hash) -> applyInPandasWithState. State per hash is
the canonical doc_id (a single long — state volume is one row per
distinct document text, the minimum possible for exact streaming
dedup). Within a micro-batch the canonical is the min doc_id
(deterministic under any partitioning); later batches hitting an
existing key emit nothing. Output rows carry (doc_id, text_hash), i.e.
the survivor stream to join back against payloads.

At 100 TB scale this is the standard shape: state is hash-partitioned
by key across executors (RocksDB state store in production), each key
holds 8 bytes, and the operator is embarrassingly key-parallel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = "doc_id long, text_hash string"
STATE_SCHEMA = "canonical_doc_id long"


def _dedup_fn(key, pdf_iter, state):
    text_hash = key[0]
    if state.exists:
        # key already emitted in an earlier batch: drop everything
        yield pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "text_hash": pd.Series([], dtype=object),
            }
        )
        return
    min_id = None
    for pdf in pdf_iter:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            min_id = m if min_id is None else min(min_id, m)
    if min_id is None:
        yield pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "text_hash": pd.Series([], dtype=object),
            }
        )
        return
    state.update((min_id,))
    yield pd.DataFrame(
        {
            "doc_id": pd.Series([min_id], dtype="int64"),
            "text_hash": pd.Series([text_hash], dtype=object),
        }
    )


def streaming_exact_dedup(
    stream_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming DataFrame: returns
    the survivor stream (doc_id, text_hash). Feed the result to any
    sink (or join back to payload columns) — each distinct text emits
    exactly one row across the stream's lifetime."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream_df.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash")
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
