"""Analysis chain: HTML text extraction + tokenization.

The reference consumes Lucene-built indexes and has no analyzer
(SURVEY.md §2.7 [gap]); the north rule fixes the contract instead:
*byte-identical extracted text per url* between the engine's vectorized
UDF and the oracle, and a no-per-row-Python tokenizer.

One canonical pipeline, three faces:
- ``py_extract_text`` / ``py_tokenize``: pure-Python reference used by
  the corpus generator and the pytest oracle;
- ``extract_text_udf``: Arrow/pandas UDF (vectorized pandas .str ops)
  applying the *same* transform on executors;
- ``tokens_col`` / ``explode_postings``: JVM-side Column expressions
  (whole-stage codegen, no Python at all) used by the logical query
  path and by the DuckDB-comparable queries.

Token grammar: lowercase, maximal runs of [a-z0-9]. The same regex is
used verbatim by the DuckDB oracle SQL, which is what makes the
engine-vs-oracle value-hash comparison meaningful.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT_RE = "[^a-z0-9]+"
_TAG_RE = re.compile(r"<[^>]*>")
_NL_RE = re.compile(r"\n+")
_TOKEN_RE = re.compile(r"[a-z0-9]+")


# -- pure-Python reference implementations (oracle + generator) --------
def py_extract_text(html: bytes) -> str:
    """tags -> newline, collapse newline runs, strip. The per-url
    byte-identity invariant (BASELINE.json input_hint) is over this."""
    s = html.decode("utf-8")
    s = _TAG_RE.sub("\n", s)
    s = _NL_RE.sub("\n", s)
    return s.strip("\n")


def py_tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


_TOKEN_CI_RE = re.compile(r"[a-z0-9]+", re.IGNORECASE)


def py_tokenize_with_offsets(text: str) -> tuple[list[str], list[int]]:
    """(tokens, char start offsets in the ORIGINAL text). Matching is
    case-insensitive on the original string so offsets stay valid even
    for inputs whose lowercase differs in length (e.g. ß).

    Token-sequence identity with ``py_tokenize`` holds for texts whose
    case mapping is ASCII-stable (all webtext corpora here): ASCII
    lowering never changes [a-zA-Z0-9] run boundaries. Exotic non-ASCII
    case mappings CAN diverge — str.lower() maps U+212A (KELVIN SIGN)
    to 'k' and U+0130 to 'i'+combining-dot, so py_tokenize sees runs
    this case-insensitive match on the original string does not. A
    with_offsets build of such text is a documented divergence (the
    canonical grammar is lower-then-split, shared with the JVM and
    DuckDB paths, which apply the same Unicode lowering)."""
    toks, offs = [], []
    for m in _TOKEN_CI_RE.finditer(text):
        toks.append(m.group().lower())
        offs.append(m.start())
    return toks, offs


# -- executor-side vectorized UDF (Arrow batches, no per-row Python) ---
@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    s = html.apply(lambda b: b.decode("utf-8"))  # bytes->str (cheap C loop)
    s = s.str.replace(_TAG_RE, "\n", regex=True)
    s = s.str.replace(_NL_RE, "\n", regex=True)
    return s.str.strip("\n")


# -- JVM-side Column expressions (codegen; mirrors the DuckDB SQL) ----
def tokens_col(text: Column | str) -> Column:
    """array<string> of tokens; same grammar as the oracle SQL's
    list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), ...)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def explode_postings(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos) rows — posexplode keeps token positions for
    phrase queries; Catalyst prunes pos when unused downstream."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "term"),
    )


def term_freqs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — map-side partial agg then final (one shuffle)."""
    return (
        explode_postings(df, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl) — array size, no explode/shuffle needed."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("dl"),
    )
