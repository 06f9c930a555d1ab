"""QueryParser grammar + execution semantics (the gate replica covers
oracle parity; these pin the parse results, the v1 error contract, and
reductions to the existing query surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.query.parser import ParsedQuery, execute_query, parse_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_parse_full_grammar():
    spec = parse_query('+table hash^2.5 dup -merge "table hash" -"bad pair" sca* sort~1 fuzz~')
    assert spec.must_terms == ["table"]
    assert spec.must_not_terms == ["merge"]
    assert spec.boosts == {"table": 1.0, "hash": 2.5, "dup": 1.0}
    assert spec.must_phrases == [["table", "hash"]]
    assert spec.must_not_phrases == [["bad", "pair"]]
    assert spec.prefix_clauses == ["sca"]
    assert spec.fuzzy_clauses == [("sort", 1), ("fuzz", 2)]


@pytest.mark.parametrize(
    "bad",
    [
        "",                 # no clause
        "-only -nots",      # no scoring clause
        "-term^2",          # boost on must_not
        "+pre*",            # occur on prefix
        "fuz~1^2",          # boost on fuzzy
        'a&b',              # not a bare term
        '""',               # empty phrase
        "table lang:de^2",            # boost on field clause
        "table n_chars:{1 TO 2}",     # exclusive range
        "table n_chars:[* TO *]",     # doubly-unbounded range
        "table n_chars:[1 TO]",       # malformed range
        "table lang:d-e",             # non-keyword field value
    ],
)
def test_parse_rejects_undefined_syntax(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_plain_disjunction_reduces_to_bm25_topk(spark, docs):
    from ocaml_lucene_spark.query.bm25 import bm25_topk

    a = execute_query(spark, docs, "zipf data table", k=10).collect()
    b = bm25_topk(docs, ["zipf", "data", "table"], "or", k=10, round_to=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_must_and_not_filter_results(spark, docs):
    from ocaml_lucene_spark.functions.analysis import tokens_col

    rows = execute_query(spark, docs, "+table dup -merge", k=1000).collect()
    toks = {
        r.doc_id: set(r.t)
        for r in docs.select("doc_id", tokens_col("text").alias("t")).collect()
    }
    assert rows
    for r in rows:
        assert "table" in toks[r.doc_id]
        assert "merge" not in toks[r.doc_id]


def test_phrase_filter_requires_adjacency(spark, docs):
    from ocaml_lucene_spark.functions.analysis import py_tokenize

    rows = execute_query(spark, docs, 'table "table hash"', k=1000).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert rows
    for r in rows:
        t = py_tokenize(texts[r.doc_id])
        assert any(t[i] == "table" and t[i + 1] == "hash" for i in range(len(t) - 1))
    # and the phrase filter strictly shrinks the unfiltered result
    all_rows = execute_query(spark, docs, "table", k=1000).collect()
    assert len(rows) < len(all_rows)


def test_expansion_clauses_need_index(spark, docs):
    with pytest.raises(ValueError, match="index_dir"):
        execute_query(spark, docs, "sca*", k=5)


def test_field_clauses_filter_without_changing_scores(spark, docs):
    from ocaml_lucene_spark.query.parser import parse_query

    spec = parse_query("table lang:de +n_chars:[150 TO 400] -source:src3")
    assert spec.field_terms == [("lang", "de", False), ("source", "src3", True)]
    assert spec.field_ranges == [("n_chars", 150, 400, False)]

    rows = execute_query(
        spark, docs, "table lang:de n_chars:[150 TO 400]", k=1000
    ).collect()
    assert rows
    meta = {
        r.doc_id: (r.lang, r.n_chars)
        for r in docs.select("doc_id", "lang", "n_chars").collect()
    }
    for r in rows:
        lang, n = meta[r.doc_id]
        assert lang == "de" and 150 <= n <= 400
    # filter context: surviving docs keep their unfiltered scores
    plain = {r.doc_id: r.score for r in execute_query(spark, docs, "table", k=10000).collect()}
    for r in rows:
        assert r.score == plain[r.doc_id]


def test_open_range_and_negated_field(spark, docs):
    rows = execute_query(spark, docs, "table -lang:de n_chars:[* TO 300]", k=1000).collect()
    meta = {
        r.doc_id: (r.lang, r.n_chars)
        for r in docs.select("doc_id", "lang", "n_chars").collect()
    }
    assert rows
    for r in rows:
        lang, n = meta[r.doc_id]
        assert lang != "de" and n <= 300


def test_unknown_field_raises_at_execute(spark, docs):
    with pytest.raises(ValueError, match="unknown field"):
        execute_query(spark, docs, "table bogus:x", k=5)
