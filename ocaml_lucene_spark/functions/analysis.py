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


def batch_tokenize_with_offsets(texts):
    """Vectorized batch form of ``py_tokenize_with_offsets`` — no
    per-document (let alone per-token) Python on the hot path.

    All ASCII documents in the batch are processed as ONE numpy pass:
    join with a '\\x00' separator (a non-token char; document
    boundaries come from cumulative lengths, so texts containing
    '\\x00' are still handled correctly), decode to a uint32 codepoint
    array via UTF-32-LE, compute the [a-zA-Z0-9] run mask, and derive
    token starts / per-doc positions / doc lengths with boundary
    arithmetic (searchsorted over document start offsets). Token
    strings come from a single C-level ``str.split``: lowercase A-Z by
    +32 on the array, overwrite non-token chars with ' ', decode once.
    For ASCII text this is exactly the CI-regex grammar ([a-z0-9]+
    IGNORECASE has no ASCII members beyond [a-zA-Z0-9]).

    Non-ASCII documents (where Unicode casefolding admits exotic
    members like U+017F/U+212A into the class) take the exact per-doc
    reference path — rare in webtext, and bit-identical by
    construction.

    Returns (doc_idx:int64[], tokens:list[str], pos:int64[],
    start:int64[], dl_per_doc:int64[len(texts)]) where doc_idx indexes
    into ``texts``; rows are ordered by (doc_idx, pos).
    """
    import numpy as np

    texts = list(texts)
    n_docs = len(texts)
    dl_per_doc = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, [], empty.copy(), empty.copy(), dl_per_doc
    ascii_mask = np.fromiter(
        (t.isascii() for t in texts), dtype=bool, count=n_docs
    )
    out_doc, out_toks, out_pos, out_start = [], [], [], []

    ascii_idx = np.nonzero(ascii_mask)[0]
    if ascii_idx.size:
        sub = [texts[i] for i in ascii_idx]
        joined = "\x00".join(sub)
        arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        lens = np.fromiter((len(t) for t in sub), dtype=np.int64, count=len(sub))
        doc_starts = np.concatenate(([0], np.cumsum(lens + 1)[:-1]))
        is_tok = (
            ((arr >= 97) & (arr <= 122))
            | ((arr >= 65) & (arr <= 90))
            | ((arr >= 48) & (arr <= 57))
        )
        prev = np.concatenate(([False], is_tok[:-1]))
        tok_starts = np.nonzero(is_tok & ~prev)[0]
        tok_doc = np.searchsorted(doc_starts, tok_starts, side="right") - 1
        start_in_doc = tok_starts - doc_starts[tok_doc]
        first_idx = np.searchsorted(tok_doc, np.arange(len(sub)), side="left")
        pos = np.arange(tok_doc.size, dtype=np.int64) - first_idx[tok_doc]
        dl_per_doc[ascii_idx] = np.diff(np.append(first_idx, tok_doc.size))
        low = np.where((arr >= 65) & (arr <= 90), arr + 32, arr)
        low = np.where(is_tok, low, np.uint32(32))
        toks = low.tobytes().decode("utf-32-le").split()
        assert len(toks) == tok_doc.size
        out_doc.append(ascii_idx[tok_doc])
        out_toks.extend(toks)
        out_pos.append(pos)
        out_start.append(start_in_doc.astype(np.int64))

    for i in np.nonzero(~ascii_mask)[0]:
        toks, offs = py_tokenize_with_offsets(texts[i])
        n = len(toks)
        dl_per_doc[i] = n
        out_doc.append(np.full(n, i, dtype=np.int64))
        out_toks.extend(toks)
        out_pos.append(np.arange(n, dtype=np.int64))
        out_start.append(np.asarray(offs, dtype=np.int64))

    doc_idx = np.concatenate(out_doc) if out_doc else np.empty(0, dtype=np.int64)
    pos_a = np.concatenate(out_pos) if out_pos else np.empty(0, dtype=np.int64)
    start_a = np.concatenate(out_start) if out_start else np.empty(0, dtype=np.int64)
    if not ascii_mask.all() and doc_idx.size:
        order = np.lexsort((pos_a, doc_idx))
        doc_idx, pos_a, start_a = doc_idx[order], pos_a[order], start_a[order]
        out_toks = [out_toks[j] for j in order]
    return doc_idx.astype(np.int64), out_toks, pos_a, start_a, dl_per_doc


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
