"""Classic Lucene QueryParser surface: a query-string mini-language
compiled onto the engine's existing query algebra.

The reference stops at the index read path, but every Lucene USER
enters through `QueryParser.parse("...")` — this module provides that
entry point for the algebra this repo already executes:

    +table hash^2.0 dup -merge "table hash" sca* sort~1

| syntax        | meaning                          | compiled to |
|---------------|----------------------------------|-------------|
| word          | should clause (scores)           | boosted disjunct, boost 1 |
| word^2.5      | boosted should clause            | boosted disjunct |
| +word[^b]     | must clause (filters AND scores) | filter + boosted disjunct |
| -word         | must_not clause (filters only)   | anti filter |
| "w1 w2 ..."   | phrase (filter context; +/- ok)  | adjacency filter |
| word*         | prefix clause                    | FST prefix expansion → disjuncts |
| word~N        | fuzzy clause (N edits, default 2)| automaton∩FST expansion → disjuncts |
| field:value   | metadata keyword filter (+/- ok) | column equality, filter context |
| field:[a TO b]| inclusive numeric range (+/- ok) | column range, filter context (pushdown) |

v1 semantics (documented, deliberately simple):
- Phrases are FILTER context: a bare/`+` phrase must be present, a
  `-` phrase must be absent; phrase words do NOT score (use explicit
  word clauses to score them — bm25_phrase_scored remains the
  scored-phrase surface).
- Prefix/fuzzy clauses are should-only (`+`/`-`/`^` on them raise),
  and their expansions score at boost 1 in lexicographic order —
  identical to the bm25_prefix / bm25_fuzzy gate semantics.
- Field clauses (keyword and range) are FILTER context like phrases —
  they never score (Lucene's cross-field scoring is the DisMax /
  combined_fields surface); ranges are INCLUSIVE `[a TO b]` with `*`
  for an open end; exclusive `{a TO b}` raises in v1; the field name
  is validated against the table schema at execute time.
- Lucene stats convention: df/N/avgdl are corpus-wide; must/must_not
  clauses filter the result set but never change scores.

Scale shape: parsing and prefix/fuzzy expansion are driver-side and
zero-job (in-memory FST); execution is ONE boosted-disjunction scoring
pass plus one filter join — filters evaluate as array predicates on
the tokenized doc (no extra scan), and the top-k cut happens after the
filter, TakeOrderedAndProject as always.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import _tokenized
from .similarity import boosted_doc_scores

_CLAUSE = re.compile(r'([+-]?)("(?:[^"]*)"|\S+:\[[^\]]*\]|\S+)')
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)$")
_FIELD = re.compile(r"([A-Za-z_][A-Za-z0-9_]*):(.+)", re.S)
_RANGE = re.compile(r"\[\s*(\d+|\*)\s+TO\s+(\d+|\*)\s*\]")


@dataclass
class ParsedQuery:
    """The compiled clause lists; `boosts` insertion order is the
    score fold order (the engine-wide query-order contract)."""

    boosts: dict[str, float] = field(default_factory=dict)
    must_terms: list[str] = field(default_factory=list)
    must_not_terms: list[str] = field(default_factory=list)
    must_phrases: list[list[str]] = field(default_factory=list)
    must_not_phrases: list[list[str]] = field(default_factory=list)
    prefix_clauses: list[str] = field(default_factory=list)
    fuzzy_clauses: list[tuple[str, int]] = field(default_factory=list)
    # (field, value, negated) / (field, lo|None, hi|None, negated)
    field_terms: list[tuple[str, str, bool]] = field(default_factory=list)
    field_ranges: list[tuple] = field(default_factory=list)


def parse_query(q: str) -> ParsedQuery:
    """Parse the query string; raises ValueError on syntax this v1
    does not define (boost on must_not, +/-/boost on prefix/fuzzy,
    empty query) rather than guessing."""
    out = ParsedQuery()
    matched_any = False
    for occur, body in _CLAUSE.findall(q):
        matched_any = True
        if body.startswith('"'):
            words = [w for w in re.split(r"\s+", body.strip('"').strip()) if w]
            if not words:
                raise ValueError("empty phrase clause")
            if occur == "-":
                out.must_not_phrases.append(words)
            else:
                out.must_phrases.append(words)
            continue
        fieldm = _FIELD.fullmatch(body)
        if fieldm:
            name, rest = fieldm.group(1), fieldm.group(2)
            neg = occur == "-"
            if _BOOST.search(rest):
                raise ValueError(f"boost on field clause {body!r} is meaningless")
            if rest.startswith("{") or rest.endswith("}"):
                raise ValueError("exclusive ranges {a TO b} are not in v1")
            if rest.startswith("["):
                rm = _RANGE.fullmatch(rest)
                if not rm:
                    raise ValueError(f"malformed range clause {body!r}")
                lo = None if rm.group(1) == "*" else int(rm.group(1))
                hi = None if rm.group(2) == "*" else int(rm.group(2))
                if lo is None and hi is None:
                    raise ValueError(f"range clause {body!r} is unbounded on both ends")
                out.field_ranges.append((name, lo, hi, neg))
            else:
                val = rest.lower()
                if not re.fullmatch(r"[a-z0-9]+", val):
                    raise ValueError(f"field value in {body!r} is not a bare keyword")
                out.field_terms.append((name, val, neg))
            continue
        boost = 1.0
        m = _BOOST.search(body)
        if m:
            boost = float(m.group(1))
            body = body[: m.start()]
        if body.endswith("*"):
            if occur or boost != 1.0:
                raise ValueError(f"prefix clause {body!r} takes no +/-/boost in v1")
            out.prefix_clauses.append(body[:-1])
            continue
        fm = re.search(r"~(\d?)$", body)
        if fm:
            if occur or boost != 1.0:
                raise ValueError(f"fuzzy clause {body!r} takes no +/-/boost in v1")
            out.fuzzy_clauses.append(
                (body[: fm.start()], int(fm.group(1) or 2))
            )
            continue
        term = body.lower()
        if not re.fullmatch(r"[a-z0-9]+", term):
            raise ValueError(f"clause {body!r} is not a bare term in v1")
        if occur == "-":
            if boost != 1.0:
                raise ValueError("boost on a must_not clause is meaningless")
            out.must_not_terms.append(term)
            continue
        if occur == "+":
            out.must_terms.append(term)
        out.boosts.setdefault(term, boost)
    if not matched_any or not (
        out.boosts or out.prefix_clauses or out.fuzzy_clauses
    ):
        raise ValueError("query has no scoring clause")
    return out


def _phrase_present(words: list[str]):
    """Array predicate: the exact word sequence appears in the token
    column `t`. F.exists over 0-based start offsets with null-safe
    F.get (element_at throws out-of-bounds under ANSI mode; get
    returns NULL, which the AND folds to not-matched). The per-offset
    conjunction unrolls in Python — words are query constants."""
    n = len(words)
    if n == 1:
        return F.array_contains("t", words[0])
    starts = F.sequence(F.lit(0), F.greatest(F.size("t") - n, F.lit(0)))

    def match_at(i):
        c = F.lit(True)
        for j, w in enumerate(words):
            c = c & (F.get("t", (i + F.lit(j)).cast("int")) == F.lit(w))
        return c

    return (F.size("t") >= n) & F.exists(starts, match_at)


def execute_query(
    spark: SparkSession,
    docs: DataFrame,
    q: str,
    index_dir: str | None = None,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Parse and run a query string; returns (doc_id, score) top-k
    ordered (score desc, doc_id asc). ``index_dir`` is required only
    when the query has prefix/fuzzy clauses (their zero-job FST
    expansion reads the packed dictionary)."""
    spec = parse_query(q)
    boosts = dict(spec.boosts)
    if spec.prefix_clauses or spec.fuzzy_clauses:
        if index_dir is None:
            raise ValueError("prefix/fuzzy clauses need index_dir for expansion")
        from .term_index import fuzzy_stats_mem, prefix_stats_mem

        for p in spec.prefix_clauses:
            for t in sorted(prefix_stats_mem(index_dir, p)):
                boosts.setdefault(t, 1.0)
        for w, d in spec.fuzzy_clauses:
            for t in sorted(fuzzy_stats_mem(index_dir, w, d)):
                boosts.setdefault(t, 1.0)
    scores = boosted_doc_scores(docs, boosts, id_col, text_col, round_to)
    needs_filter = (
        spec.must_terms
        or spec.must_not_terms
        or spec.must_phrases
        or spec.must_not_phrases
    )
    if needs_filter:
        toks = _tokenized(docs, id_col, text_col).select("doc_id", F.col("toks").alias("t"))
        cond = F.lit(True)
        for t in spec.must_terms:
            cond = cond & F.array_contains("t", t)
        for t in spec.must_not_terms:
            cond = cond & ~F.array_contains("t", t)
        for ph in spec.must_phrases:
            cond = cond & _phrase_present(ph)
        for ph in spec.must_not_phrases:
            cond = cond & ~_phrase_present(ph)
        keep = toks.filter(cond).select("doc_id")
        scores = scores.join(keep, "doc_id", "left_semi")
    if spec.field_terms or spec.field_ranges:
        mcond = F.lit(True)
        for name, val, neg in spec.field_terms:
            if name not in docs.columns:
                raise ValueError(f"unknown field {name!r} in field clause")
            c = F.col(name) == F.lit(val)
            mcond = mcond & (~c if neg else c)
        for name, lo, hi, neg in spec.field_ranges:
            if name not in docs.columns:
                raise ValueError(f"unknown field {name!r} in range clause")
            c = F.lit(True)
            if lo is not None:
                c = c & (F.col(name) >= F.lit(lo))
            if hi is not None:
                c = c & (F.col(name) <= F.lit(hi))
            mcond = mcond & (~c if neg else c)
        # metadata predicates evaluate on the source table (pushdown-
        # eligible column compares) and semi-join the score set —
        # filter context, Lucene stats stay corpus-wide per v1
        keep_meta = docs.filter(mcond).select(F.col(id_col).alias("doc_id"))
        scores = scores.join(keep_meta, "doc_id", "left_semi")
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
