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


# -- vectorized offsets tokenizer vs per-doc reference ----------------
def test_batch_tokenize_with_offsets_matches_reference():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocaml_lucene_spark.functions.analysis import (
        batch_tokenize_with_offsets,
        py_tokenize_with_offsets,
    )

    def check(texts):
        doc_idx, toks, pos, start, dls = batch_tokenize_with_offsets(texts)
        # regroup and compare per doc against the exact reference
        got = {i: ([], []) for i in range(len(texts))}
        for d, t, p, s in zip(doc_idx, toks, pos, start):
            assert p == len(got[d][0])  # positions are 0..n-1 in order
            got[d][0].append(t)
            got[d][1].append(int(s))
        for i, text in enumerate(texts):
            etoks, eoffs = py_tokenize_with_offsets(text)
            assert got[i] == (etoks, eoffs), (i, text)
            assert dls[i] == len(etoks)

    # adversarial fixed cases: empties, separator char inside text,
    # token at string edges, non-ASCII fallback docs mixed with ASCII,
    # exotic casefold members (U+017F long s, U+212A Kelvin sign)
    check([])
    check([""])
    check(["", "a", "", "7seven eight8", ""])
    check(["ab\x00cd", "\x00\x00", "x\x00"])
    check(["edge", " pad ", "UPPER lower MiXeD 123abc"])
    check(["café au lait", "ascii doc", "ſmoke Kelvin", "naïve"])
    check(["İstanbul", "i̇dot"])

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.sampled_from(
                    list("abcXYZ019 .,-\n\x00\t_/") + ["é", "ſ", "K"]
                ),
                max_size=40,
            ),
            max_size=8,
        )
    )
    def fuzz(texts):
        check(texts)

    fuzz()
