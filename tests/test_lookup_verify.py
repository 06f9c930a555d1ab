"""seek_exact + verify_index tests (terms_enumerator/codec_util parity)."""

import glob
import os

import pytest

from ocaml_lucene_spark.index.build import assign_doc_ids, build_index
from ocaml_lucene_spark.oracle import OracleIndex
from ocaml_lucene_spark.query.lookup import seek_exact, verify_index


@pytest.fixture(scope="module")
def built(spark, tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index_lookup"))
    docs = assign_doc_ids(spark.read.parquet(tiny_corpus)).select("doc_id", "text").cache()
    build_index(docs, index_dir, n_partitions=4)
    texts = {r.doc_id: r.text for r in docs.collect()}
    return index_dir, OracleIndex.from_texts(texts)


def test_seek_exact_matches_oracle_stats(spark, built):
    index_dir, oracle = built
    stats = oracle.term_stats()
    for term in list(stats)[:20]:
        st = seek_exact(spark, index_dir, term)
        assert st is not None, term
        assert (st["doc_freq"], st["total_term_freq"]) == stats[term], term
        assert sum(b["n"] for b in st["blocks"]) == stats[term][0]


def test_seek_exact_absent_and_singleton(spark, built):
    index_dir, oracle = built
    assert seek_exact(spark, index_dir, "zzznotaterm") is None
    singles = [t for t, (df, _) in oracle.term_stats().items() if df == 1]
    if singles:
        st = seek_exact(spark, index_dir, singles[0])
        assert st["singleton_doc_id"] is not None
        assert st["singleton_doc_id"] in oracle.postings[singles[0]]


def test_verify_index_clean(spark, built):
    index_dir, _ = built
    summary = verify_index(spark, index_dir)
    assert summary["segments"] == 1 and summary["shards"] >= 1


def test_verify_index_detects_corruption(spark, built):
    index_dir, _ = built
    shard = sorted(glob.glob(index_dir + "/segments/*/postings/part-*.parquet"))[0]
    backup = open(shard, "rb").read()
    try:
        # truncate a shard: verify must fail loudly, not return stale ok
        with open(shard, "wb") as f:
            f.write(backup[: len(backup) // 2])
        with pytest.raises(Exception):
            verify_index(spark, index_dir)
    finally:
        with open(shard, "wb") as f:
            f.write(backup)
    assert verify_index(spark, index_dir)["segments"] == 1
