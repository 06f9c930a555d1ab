"""Analysis chains beyond the canonical tokenizer: stopword filter +
minimal English stemmer (Lucene's StopFilter + EnglishMinimalStemFilter,
the `english` analyzer's light variant).

The reference consumes Lucene-built indexes whose analyzers ran at
index time (SURVEY.md §2.7); this module re-expresses the chain as
JVM-side Column expressions over the canonical token array — zero
Python on the hot path — applied identically on the corpus side and
the query side (Lucene applies the same chain at both).

Chain order matches Lucene's EnglishAnalyzer: tokenize → lowercase
(both already the canonical grammar) → stop filter → stem. Field
length (dl) counts tokens that SURVIVE the stop filter, exactly like
Lucene, where removed stopwords never reach the index and norms are
computed from the emitted token count.

Stemmer contract (EnglishMinimalStemmer, public Lucene source): strip
one trailing 's' when the token has >= 3 chars and its penultimate
char is neither 'u' nor 's' (keeps "his", "ss"/"us" endings like
"class"/"corpus" intact). Both the Spark lambda and the DuckDB oracle
CASE implement this verbatim; ``py_analyze`` is the pure-Python
reference the tests pin both against.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analysis import py_tokenize, tokens_col

# Lucene EnglishAnalyzer default stop set (public, 33 words)
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]


def py_minimal_stem(tok: str) -> str:
    if len(tok) >= 3 and tok.endswith("s") and tok[-2] not in ("u", "s"):
        return tok[:-1]
    return tok


def py_analyze(text: str) -> list[str]:
    """Pure-Python reference: canonical tokens → stop filter → stem."""
    return [
        py_minimal_stem(t) for t in py_tokenize(text) if t not in EN_STOPWORDS
    ]


def _stem_col(t: Column) -> Column:
    strip = (
        (F.length(t) >= 3)
        & t.endswith("s")
        & ~t.substr(F.length(t) - 1, F.lit(1)).isin("u", "s")
    )
    return F.when(strip, t.substr(F.lit(1), F.length(t) - 1)).otherwise(t)


def analyzed_tokens_col(text: Column | str) -> Column:
    """array<string>: canonical tokens → stop filter → minimal stem.
    Pure Column expressions (whole-stage codegen); arity-1 lambdas
    only (F.transform feeds (elem, idx) to arity-2 ones)."""
    toks = tokens_col(text)
    kept = F.filter(toks, lambda t: ~t.isin(EN_STOPWORDS))
    return F.transform(kept, _stem_col)


def analyze_terms(terms: list[str]) -> list[str]:
    """Query-side analysis: the same chain applied to query terms
    (stopword query terms vanish, exactly like Lucene's QueryBuilder
    dropping stopword-only clauses); preserves first-seen order."""
    out = [
        py_minimal_stem(t.lower())
        for t in terms
        if t.lower() not in EN_STOPWORDS
    ]
    return list(dict.fromkeys(out))


def stem_sql_case(var: str) -> str:
    """DuckDB CASE replaying the stemmer on column/lambda var ``var``."""
    return (
        f"CASE WHEN length({var}) >= 3 AND substr({var}, length({var}), 1) = 's' "
        f"AND substr({var}, length({var}) - 1, 1) NOT IN ('u', 's') "
        f"THEN substr({var}, 1, length({var}) - 1) ELSE {var} END"
    )


def stopword_sql_list() -> str:
    return "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
