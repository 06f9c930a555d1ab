"""Complete-mode running term counts: the final table after N ordered
micro-batches must equal the one-shot batch aggregate (Spark's
complete-mode guarantee — the row's stream-batch parity contract), and
a prefix of batches must equal the batch aggregate over that prefix
(the running-total semantics, not just the endpoint)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.functions.analysis import tokens_col
from ocaml_lucene_spark.streaming.term_counts import streaming_term_counts

SF = "/root/testdata/sf0.001"


def _batch_counts(spark, path, mod=None):
    df = spark.read.parquet(path)
    if mod is not None:
        df = df.filter(F.col("doc_id") % 3 < mod)
    return {
        r.term: r.ttf
        for r in df.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("ttf"))
        .collect()
    }


@pytest.mark.parametrize("n_batches", [2, 3])
def test_complete_mode_equals_batch_over_prefix(spark, tmp_path, n_batches):
    src = str(tmp_path / f"src{n_batches}")
    os.makedirs(src)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    for i in range(n_batches):
        p = f"{src}/b{i}.parquet"
        pq.write_table(t.filter(pa.array(ids % 3 == i)), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    qname = f"t_stermc_{n_batches}"
    q = (
        streaming_term_counts(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt{n_batches}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.term: r.ttf for r in spark.table(qname).collect()}
    want = _batch_counts(spark, f"{SF}/documents.parquet", mod=n_batches)
    assert got == want
