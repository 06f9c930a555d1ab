"""Tokenizer/extraction invariants: byte-identical extracted text per
url between the vectorized UDF and the pure-Python oracle
(BASELINE.json input_hint), and token-grammar parity between the JVM
Column expression, the pandas UDF, and py_tokenize."""

import hashlib

from pyspark.sql import functions as F

from ocaml_lucene_spark.functions.analysis import (
    extract_text_udf,
    py_extract_text,
    py_tokenize,
    tokens_col,
)


def test_extract_text_pure():
    html = b"<html><head><title>T o</title></head><body><p>hello world</p></body></html>"
    assert py_extract_text(html) == "T o\nhello world"


def test_udf_extraction_byte_identical(spark, tiny_corpus):
    df = spark.read.parquet(tiny_corpus)
    got = (
        df.select("url", "text", extract_text_udf("html").alias("engine_text"))
        .withColumn("match", (F.col("text") == F.col("engine_text")).cast("int"))
        .agg(F.sum("match").alias("ok"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert got.ok == got.n, f"only {got.ok}/{got.n} rows byte-identical"


def test_udf_vs_python_hashes(spark, tiny_corpus):
    df = spark.read.parquet(tiny_corpus).limit(50)
    rows = df.select("url", "html", extract_text_udf("html").alias("t")).collect()
    for r in rows:
        expect = py_extract_text(bytes(r.html))
        assert hashlib.sha256(r.t.encode()).hexdigest() == hashlib.sha256(
            expect.encode()
        ).hexdigest(), r.url


def test_tokens_col_matches_py_tokenize(spark):
    samples = [
        "Hello, World--foo  bar123",
        "the qu1ck    brown\nfox",
        "...",
        "",
        "UPPER lower 42x7",
        "über café ASCII-only stays",  # non-ascii letters split tokens
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["text"])
    got = [r.toks for r in df.select(tokens_col("text").alias("toks")).collect()]
    for s, g in zip(samples, got):
        assert list(g) == py_tokenize(s), s
