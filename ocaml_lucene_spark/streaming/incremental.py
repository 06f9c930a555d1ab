"""Incremental indexing via Structured Streaming.

The reference's incremental model is immutable segments + generation
manifests (/root/reference/codec/segments.ml:106-115 notes multiple
segments_N coexisting during an update). The streaming mirror: a file
(or any) source of webtext rows -> foreachBatch -> each micro-batch
becomes one new segment via index.build.add_documents, and the tiered
merge policy keeps segment count bounded. Queries on the live manifest
see every committed batch; BM25 stats aggregate across segments, so
results equal a batch rebuild over the same docs (tested).

foreachBatch gives exactly-once per micro-batch here because segment
publishing is idempotent: batch_id -> deterministic segment name, and
a re-run of a committed batch hits the checkpoint fast-path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.build import add_documents, build_index
from ..index.merge import maybe_merge
from ..index.segments import list_segments


def start_incremental_indexer(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    merge_factor: int = 0,
    assign_ids: bool = True,
    max_files_per_trigger: int | None = None,
    **build_kw,
):
    """Stream parquet files landing in source_dir into the index.

    merge_factor > 0 also runs the tiered merge policy after each batch.
    assign_ids=False ingests rows that already carry a globally-unique
    doc_id column (batches must be doc-disjoint). max_files_per_trigger
    bounds each micro-batch (availableNow still drains everything).
    Returns the StreamingQuery (caller stops it / processAllAvailable)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if assign_ids:
            add_documents(
                batch_df.select("url", "text"),
                index_dir,
                segment=f"stream{batch_id:06d}",
                **build_kw,
            )
        else:
            build_index(
                batch_df.select("doc_id", "text"),
                index_dir,
                segment=f"stream{batch_id:06d}",
                **build_kw,
            )
        if merge_factor > 0:
            maybe_merge(spark, index_dir, merge_factor=merge_factor)

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", f"{index_dir}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def indexed_doc_count(index_dir: str) -> int:
    return sum(r["n_docs"] for r in list_segments(index_dir))
