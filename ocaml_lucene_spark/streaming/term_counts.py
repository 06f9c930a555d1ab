"""Complete-mode running term counts over a document stream.

The third Structured-Streaming aggregation mode next to the append-
mode watermarked histogram (streaming/histogram.py) and the custom
applyInPandasWithState dedup (streaming/dedup_state.py): an unbounded
running aggregate whose COMPLETE output after batch N equals the batch
aggregate over everything ingested so far — the "live dictionary
stats" a streaming indexer maintains while segments accumulate
(SURVEY §2.10's incremental-index surface from the stats side).

Stream-batch parity IS the contract (Spark guarantees complete-mode
aggregates are exactly incremental): the gate row runs the corpus
through ordered micro-batches and compares the FINAL table against the
one-shot batch SQL aggregate. Counts are integers — no float contract
needed.

Scale shape: state is the vocabulary (Heaps-bounded — the same reason
the batch engine's term dictionary fits memory), partitioned by term
across executors; each micro-batch ships only map-side-combined
(term, partial count) rows into the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col


def streaming_term_counts(stream_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, ttf) running total-term-frequency aggregate for a
    complete-mode sink. One explode + one groupBy — the streaming
    planner turns it into an incremental stateful aggregate."""
    return (
        stream_df.select(F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("ttf"))
    )
