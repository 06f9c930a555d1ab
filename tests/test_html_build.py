"""North-rule ingestion: building from raw html (vectorized extraction
UDF) produces a byte-identical index to building from the text column."""

import glob
import hashlib
import os


def _index_digest(index_dir: str) -> str:
    h = hashlib.sha256()
    for f in sorted(glob.glob(index_dir + "/segments/*/postings/part-*.parquet")):
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_html_build_equals_text_build(spark, tiny_corpus, tmp_path_factory):
    from ocaml_lucene_spark.index.build import assign_doc_ids, build_index

    docs = assign_doc_ids(spark.read.parquet(tiny_corpus)).cache()
    d1 = str(tmp_path_factory.mktemp("idx_text"))
    d2 = str(tmp_path_factory.mktemp("idx_html"))
    r1 = build_index(docs.select("doc_id", "text"), d1, segment="s", n_partitions=4)
    r2 = build_index(
        docs.select("doc_id", "html"), d2, segment="s", n_partitions=4, html_col="html"
    )
    assert r1["n_postings"] == r2["n_postings"]
    assert _index_digest(d1) == _index_digest(d2), "packed shards differ"
