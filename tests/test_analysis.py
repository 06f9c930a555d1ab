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


# -- analyzer chain (StopFilter + EnglishMinimalStem) ------------------


def test_minimal_stemmer_contract():
    from ocaml_lucene_spark.functions.analyzers import py_minimal_stem

    assert py_minimal_stem("tables") == "table"
    assert py_minimal_stem("dogs") == "dog"
    # penultimate 's'/'u' guard: -ss and -us endings survive
    assert py_minimal_stem("class") == "class"
    assert py_minimal_stem("corpus") == "corpus"
    # len < 3 unchanged
    assert py_minimal_stem("as") == "as"
    assert py_minimal_stem("s") == "s"
    # Lucene's stemmer really does strip bare 3-letter -s words
    assert py_minimal_stem("his") == "hi"


def test_analyze_terms_drops_stopwords_and_dedups_post_stem():
    from ocaml_lucene_spark.functions.analyzers import analyze_terms

    assert analyze_terms(["the", "tables", "table", "hash"]) == ["table", "hash"]
    assert analyze_terms(["The", "AND", "with"]) == []


def test_analyzed_tokens_col_matches_py_analyze(spark):
    from ocaml_lucene_spark.functions.analyzers import (
        analyzed_tokens_col,
        py_analyze,
    )

    texts = [
        "The tables are joined with a hash index",
        "class corpus his hers its",
        "no tokens survive: the and of to with",
        "ss us endings: miss bus plus fuss",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.at for r in df.select(analyzed_tokens_col("text").alias("at")).collect()]
    assert got == [py_analyze(t) for t in texts]


def test_bm25_analyzed_matches_python_reference(spark):
    """End-to-end: bm25_topk_analyzed == a pure-python BM25 over
    py_analyze token streams (canonical K1/B/idf), including the dl
    change from stopword removal."""
    import math

    from ocaml_lucene_spark.functions.analyzers import analyze_terms, py_analyze
    from ocaml_lucene_spark.oracle import B, K1
    from ocaml_lucene_spark.query.similarity import bm25_topk_analyzed

    texts = {
        0: "the tables of the hash index",
        1: "tables tables tables and no hash",
        2: "a corpus class with his table",
        3: "nothing relevant here at all",
        4: "hash hash table the the the",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    terms = ["the", "tables", "hash"]
    q = analyze_terms(terms)
    toks = {d: py_analyze(t) for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df_ = {t: sum(1 for v in toks.values() if t in v) for t in q}
    want = {}
    for d, v in toks.items():
        s = 0.0
        for t in q:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df_[t] + 0.5) / (df_[t] + 0.5))
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if s:
            want[d] = round(s, 4)
    got = {
        r.doc_id: r.score
        for r in bm25_analyzed_collect(spark, docs, terms)
    }
    assert got == want


def bm25_analyzed_collect(spark, docs, terms):
    from ocaml_lucene_spark.query.similarity import bm25_topk_analyzed

    return bm25_topk_analyzed(docs, terms, k=10, round_to=4).collect()


def test_bm25_analyzed_all_stopword_query_is_empty(spark):
    from ocaml_lucene_spark.query.similarity import bm25_topk_analyzed

    docs = spark.createDataFrame([(0, "the table")], "doc_id long, text string")
    out = bm25_topk_analyzed(docs, ["the", "and"], k=5)
    assert out.columns == ["doc_id", "score"]
    assert out.count() == 0
