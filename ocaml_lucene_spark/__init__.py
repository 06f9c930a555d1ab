"""ocaml_lucene_spark — a PySpark-native Lucene-style full-text engine.

A from-scratch inverted-index build + BM25 query engine over
Common-Crawl-style webtext tables, re-expressing the capabilities of the
reference (sidharthkuruvila/ocaml-lucene, an OCaml reader of the Lucene
8.4/8.9 index format) in idiomatic Spark:

- DataFrame/SQL logical plans; Catalyst handles pushdown/pruning/AQE.
- All per-block binary logic (delta+FOR/PFOR packing, block-max WAND,
  term dictionaries) is vectorized numpy inside Arrow/pandas UDFs.
- Distribution (partitioning, hot-term salting, tiered merge,
  checkpointed resume) is explicit DataFrame operations.

Package map:
- codecs/    numpy block codecs (varint, zigzag, FOR, PFOR, delta, LZ4,
             lowercase-ASCII) — semantics of reference bit_packing/ +
             terms-enumerator/ compression.
- fst/       minimal acyclic transducer (term index) — reference fst/.
- functions/ analysis chain (tokenize/extract), text stats, hashing,
             vector math — all Column-expression or pandas-UDF based.
- index/     segment build DAG, segment format, tiered merge, manifest.
- query/     BM25 scoring: logical DataFrame path + physical
             segment/WAND path.
- operators/ training-data pipeline ops: dedup (exact/minhash/simhash/
             jaccard/embedding), ANN, multimodal stubs.
- sources/   corpus generator (synthetic webtext), segment IO.
- streaming/ incremental indexing via Structured Streaming.
"""

# 0.4.1: IVF cell assignment rounds cosine to 12dp before argmax (tie
# regions identical across JVM/numpy/DuckDB) — bump invalidates the
# persisted IVF entry layouts keyed on this version.
# 0.4.2: assign_doc_ids partition count is input-derived (url count),
# no longer defaultParallelism — docIDs are now identical across
# cluster sizes. Bump invalidates version-keyed packed caches so a
# resume never mixes old- and new-scheme ids in one index.
__version__ = "0.4.3"
