"""End-to-end rank-identity: the Spark logical BM25 path vs the
pure-Python oracle on the generated webtext corpus (the reference
query set of sources/corpus.py) — top-k docIDs AND scores must match
rank-identically (tie-break score desc, doc_id asc), per BASELINE.json
north_rule."""

import math

import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.oracle import OracleIndex
from ocaml_lucene_spark.query.bm25 import bm25_topk, term_stats
from ocaml_lucene_spark.sources.corpus import generate_query_set


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    # docID = deterministic dense id: order by url (unique primary key)
    df = spark.read.parquet(tiny_corpus)
    w = F.row_number().over(__import__("pyspark").sql.Window.orderBy("url")) - 1
    return df.withColumn("doc_id", w.cast("long")).select("doc_id", "url", "text", "lang").cache()


@pytest.fixture(scope="module")
def oracle(corpus_df):
    texts = {r.doc_id: r.text for r in corpus_df.select("doc_id", "text").collect()}
    return OracleIndex.from_texts(texts)


def test_rank_identity_query_set(spark, corpus_df, oracle):
    queries = generate_query_set(seed=42, n_queries=25)
    for q in queries:
        expected = oracle.query(q["terms"], q["mode"], q["k"])
        got = [
            (r.doc_id, r.score)
            for r in bm25_topk(corpus_df, q["terms"], q["mode"], q["k"]).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in expected], (
            q, got[:5], expected[:5],
        )
        for (gd, gs), (ed, es) in zip(got, expected):
            assert math.isclose(gs, es, rel_tol=1e-9), (q, gd, gs, es)


def test_term_stats_match_oracle(spark, corpus_df, oracle):
    got = {r.term: (r.df, r.ttf) for r in term_stats(corpus_df).collect()}
    assert got == oracle.term_stats()
