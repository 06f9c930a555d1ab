"""DuckDB oracle SQL builders — one per engine query.

Each function returns SQL that DuckDB runs over the same parquet
tables (views pre-registered by the driver: documents, embeddings, …)
and that must match the Spark DataFrame result on row count, schema
(column names!) and order-insensitive value hash. The token grammar
and BM25 formula are textually mirrored from functions/analysis.py and
query/bm25.py — keep them in lockstep.
"""

from __future__ import annotations

TOKS_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks)
"""


def _terms_in(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({inner})"


def _like_prefix(prefix: str) -> str:
    """LIKE pattern matching ``prefix`` LITERALLY (the engine's FST
    prefix walk is byte-literal, so '_'/'%'/'\\' in the prefix must be
    escaped or the oracle silently matches more than the engine).
    Use with: term LIKE '<this>' ESCAPE '\\'."""
    p = (
        prefix.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("'", "''")
    )
    return p + "%"


def bm25_topk_sql(
    terms: list[str],
    mode: str = "or",
    k: int = 10,
    round_to: int = 4,
    lang: str | None = None,
    exclude: list[str] | None = None,
) -> str:
    terms = list(dict.fromkeys(terms))
    having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    toks_cte = TOKS_CTE
    if lang is not None:
        toks_cte = toks_cte.replace("FROM documents", f"FROM documents WHERE lang = '{lang}'")
    not_clause = ""
    if exclude:
        # NOT clause: drop docs containing any excluded term; df/N/avgdl
        # are computed before exclusion (Lucene semantics)
        not_clause = f"""WHERE doc_id NOT IN (
    SELECT DISTINCT doc_id
    FROM (SELECT doc_id, unnest(t) AS term FROM base)
    WHERE term IN {_terms_in(list(dict.fromkeys(exclude)))}
  )"""
    return f"""
WITH {toks_cte},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
{not_clause}
GROUP BY doc_id {having}
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_prefix_sql(prefix: str, k: int = 10, round_to: int = 4) -> str:
    """PrefixQuery oracle: the term filter is LIKE '<prefix>%' (with
    metacharacters escaped — the engine's expansion is byte-literal) —
    the expansion happens independently inside SQL, checking the
    engine's FST-driven rewrite end to end."""
    pq = _like_prefix(prefix)
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term LIKE '{pq}' ESCAPE '\\'
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_fuzzy_sql(term: str, max_edits: int = 1, k: int = 10, round_to: int = 4) -> str:
    """FuzzyQuery oracle: DuckDB's levenshtein() expands the term
    INDEPENDENTLY, checking the engine's dictionary-scan rewrite end to
    end."""
    tq = term.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE levenshtein(term, '{tq}') <= {max_edits}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def _like_wildcard(pattern: str) -> str:
    """Translate a Lucene wildcard pattern ('*'/'?') to a LIKE pattern
    with every literal metacharacter escaped (ESCAPE '\\')."""
    out = []
    for c in pattern:
        if c == "*":
            out.append("%")
        elif c == "?":
            out.append("_")
        elif c in ("%", "_", "\\"):
            out.append("\\" + c)
        elif c == "'":
            out.append("''")
        else:
            out.append(c)
    return "".join(out)


def bm25_topk_wildcard_sql(pattern: str, k: int = 10, round_to: int = 4) -> str:
    """WildcardQuery oracle: the pattern translates to LIKE wildcards
    independently of the engine's FST-subtree expansion."""
    pq = _like_wildcard(pattern)
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term LIKE '{pq}' ESCAPE '\\'
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def term_stats_range_sql(lo: str, hi: str) -> str:
    lq, hq = lo.replace("'", "''"), hi.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  WHERE term >= '{lq}' AND term < '{hq}'
  GROUP BY doc_id, term
)
SELECT term, count(*) AS df, sum(tf)::BIGINT AS ttf
FROM tf GROUP BY term
"""


def term_stats_prefix_sql(prefix: str) -> str:
    pq = _like_prefix(prefix)
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  WHERE term LIKE '{pq}' ESCAPE '\\'
  GROUP BY doc_id, term
)
SELECT term, count(*) AS df, sum(tf)::BIGINT AS ttf
FROM tf GROUP BY term
"""


def bm25_topk_bool_sql(
    must: list[str],
    should: list[str] | None = None,
    k: int = 10,
    round_to: int = 4,
    exclude: list[str] | None = None,
    min_should_match: int = 0,
) -> str:
    """BooleanQuery oracle: results contain every must term; should
    terms add score (>= min_should_match of them must hit); must_not
    drops docs (mirrors bm25_topk_bool)."""
    must = list(dict.fromkeys(must))
    should = [t for t in dict.fromkeys(should or []) if t not in must]
    terms = must + should
    conds = []
    if must:
        conds.append(
            f"sum(CASE WHEN term IN {_terms_in(must)} THEN 1 ELSE 0 END) = {len(must)}"
        )
    if min_should_match:
        conds.append(
            f"sum(CASE WHEN term NOT IN {_terms_in(must)} THEN 1 ELSE 0 END)"
            f" >= {min_should_match}"
            if must
            else f"count(*) >= {min_should_match}"
        )
    having = f"HAVING {' AND '.join(conds)}" if conds else ""
    not_clause = ""
    if exclude:
        not_clause = f"""WHERE doc_id NOT IN (
    SELECT DISTINCT doc_id
    FROM (SELECT doc_id, unnest(t) AS term FROM base)
    WHERE term IN {_terms_in(list(dict.fromkeys(exclude)))}
  )"""
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
{not_clause}
GROUP BY doc_id {having}
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def term_postings_sql(term: str) -> str:
    return f"""
WITH {TOKS_CTE}
SELECT doc_id, count(*) AS tf
FROM (SELECT doc_id, unnest(t) AS term FROM base)
WHERE term = '{term}'
GROUP BY doc_id
"""


def term_stats_sql(min_df: int = 1) -> str:
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  GROUP BY doc_id, term
)
SELECT term, count(*) AS df, sum(tf)::BIGINT AS ttf
FROM tf GROUP BY term HAVING count(*) >= {min_df}
"""


def corpus_stats_sql() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT count(*) AS n_docs, round(sum(dl)::DOUBLE / count(*), 6) AS avgdl FROM base
"""


def doc_lengths_sql() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT doc_id, dl FROM base
"""


def phrase_counts_sql(first: str, second: str) -> str:
    return phrase_counts_multi_sql([first, second])


def proximity_counts_sql(first: str, second: str, window: int = 5) -> str:
    """Range-join proximity counts — textual mirror of
    bm25.proximity_counts / exec.proximity_counts_indexed."""
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p
  FROM base
),
a AS (SELECT doc_id, p AS p1 FROM pos WHERE term = '{first}'),
b AS (SELECT doc_id, p AS p2 FROM pos WHERE term = '{second}')
SELECT a.doc_id AS doc_id, count(*) AS n_pairs
FROM a JOIN b ON a.doc_id = b.doc_id
             AND abs(b.p2 - a.p1) <= {window} AND a.p1 <> b.p2
GROUP BY a.doc_id
"""


def phrase_counts_multi_sql(words: list[str]) -> str:
    """Exact n-word phrase counts: slot i's positions shift down by i
    and the chain joins on (doc_id, anchor p) — textual mirror of
    bm25.phrase_counts_multi / exec.phrase_counts_indexed_multi."""
    slot_ctes = []
    for i, w in enumerate(words):
        wq = w.replace("'", "''")
        slot_ctes.append(
            f"s{i} AS (SELECT doc_id, p - {i} AS p FROM pos WHERE term = '{wq}')"
        )
    joins = "".join(
        f" JOIN s{i} ON s0.doc_id = s{i}.doc_id AND s0.p = s{i}.p"
        for i in range(1, len(words))
    )
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p
  FROM base
),
{", ".join(slot_ctes)}
SELECT s0.doc_id AS doc_id, count(*) AS n_phrase
FROM s0{joins}
GROUP BY s0.doc_id
"""


def multi_phrase_counts_sql(slots: list[list[str]]) -> str:
    """MultiPhraseQuery oracle: slot i accepts any of its alternative
    terms; same shift-and-join shape as phrase_counts_multi_sql
    (textual mirror of exec.multi_phrase_counts_indexed)."""
    slot_ctes = []
    for i, alts in enumerate(slots):
        in_list = ", ".join("'" + w.replace("'", "''") + "'" for w in alts)
        slot_ctes.append(
            f"s{i} AS (SELECT doc_id, p - {i} AS p FROM pos "
            f"WHERE term IN ({in_list}))"
        )
    joins = "".join(
        f" JOIN s{i} ON s0.doc_id = s{i}.doc_id AND s0.p = s{i}.p"
        for i in range(1, len(slots))
    )
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p
  FROM base
),
{", ".join(slot_ctes)}
SELECT s0.doc_id AS doc_id, count(*) AS n_phrase
FROM s0{joins}
GROUP BY s0.doc_id
"""


# -- char-offset oracles (the .pay-stream surface) --------------------
# Token-run detection entirely in SQL: classify every character of the
# source text ([a-zA-Z0-9] — exactly the CI token grammar for ASCII
# webtext), find run starts/ends with lag/lead windows, pair them by
# per-doc rank, slice + lower() the run for the term. Independent of
# the engine's batch tokenizer (functions/analysis.py), so it checks
# offsets end to end, not a replay of the same code.
CHAR_OCC_CTE = """
chars AS (
  SELECT d.doc_id, d.text, u.i::BIGINT AS i,
         regexp_matches(substr(d.text, u.i::INT + 1, 1), '^[a-zA-Z0-9]$') AS tok
  FROM documents d, unnest(range(length(d.text))) AS u(i)
),
marks AS (
  SELECT doc_id, text, i, tok,
         tok AND NOT coalesce(lag(tok) OVER w, false) AS is_start,
         tok AND NOT coalesce(lead(tok) OVER w, false) AS is_end
  FROM chars WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
starts AS (
  SELECT doc_id, text, i AS s,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM marks WHERE is_start
),
ends AS (
  SELECT doc_id, i AS e,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM marks WHERE is_end
),
occ AS (
  SELECT s.doc_id,
         lower(substr(s.text, s.s::INT + 1, (e.e - s.s)::INT + 1)) AS term,
         (s.rn - 1)::BIGINT AS pos,
         s.s::BIGINT AS start
  FROM starts s JOIN ends e ON s.doc_id = e.doc_id AND s.rn = e.rn
)
"""


def term_offsets_sql(term: str) -> str:
    """(doc_id, pos, start) for every occurrence of ``term`` — oracle
    for query/exec.py term_offsets (the .pay-stream decode)."""
    t = term.replace("'", "''")
    return f"""
WITH {CHAR_OCC_CTE}
SELECT doc_id, pos, start FROM occ WHERE term = '{t}'
"""


def highlight_topk_sql(terms: list[str], k: int = 10, round_to: int = 4) -> str:
    """(doc_id, score, term, pos, start): BM25 top-k joined with each
    query-term occurrence in those docs — oracle for query/exec.py
    highlight_topk."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
top AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score
  FROM scored
  GROUP BY doc_id
  ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
  LIMIT {k}
),
{CHAR_OCC_CTE.strip().rstrip()}
SELECT top.doc_id, top.score, occ.term, occ.pos, occ.start
FROM top JOIN occ ON top.doc_id = occ.doc_id
WHERE occ.term IN {_terms_in(terms)}
"""


# -- filter context / counting / pagination ---------------------------
def matching_docs_sql(
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    min_should_match: int = 0,
) -> str:
    """(doc_id) rows of the unscored boolean match set — oracle for
    query/exec.py matching_docs_indexed (ConstantScoreQuery)."""
    must = list(dict.fromkeys(must or []))
    should = list(dict.fromkeys(should or []))
    must_not = list(dict.fromkeys(must_not or []))
    conds = []
    if must:
        conds.append(
            f"(SELECT count(DISTINCT term) FROM (SELECT unnest(t) AS term) u"
            f" WHERE term IN {_terms_in(must)}) = {len(must)}"
        )
    msm = max(min_should_match, 0 if must else 1)
    if should and msm > 0:
        conds.append(
            f"(SELECT count(DISTINCT term) FROM (SELECT unnest(t) AS term) u"
            f" WHERE term IN {_terms_in(should)}) >= {msm}"
        )
    if must_not:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM (SELECT unnest(t) AS term) u"
            f" WHERE term IN {_terms_in(must_not)})"
        )
    where = " AND ".join(conds)
    return f"""
WITH {TOKS_CTE}
SELECT doc_id FROM base WHERE {where}
"""


def count_matching_sql(
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
) -> str:
    """(n_hits) single row — oracle for count_matching_indexed
    (TotalHitCountCollector)."""
    inner = matching_docs_sql(must, should, must_not)
    return f"SELECT count(*)::BIGINT AS n_hits FROM ({inner})"


def bm25_topk_page_sql(
    terms: list[str], mode: str = "or", k: int = 10, page: int = 0,
    round_to: int = 4,
) -> str:
    """Page ``page`` of the BM25 ranking via OFFSET — deliberately a
    DIFFERENT formulation than the engine's search_after cursor filter
    (given the total order score DESC, doc_id ASC, cursor-after and
    OFFSET agree), so pagination is checked against an independent
    mechanism."""
    base = bm25_topk_sql(terms, mode, 10**9, round_to).rstrip().rstrip("\n")
    # swap the LIMIT: bm25_topk_sql ends with "LIMIT <huge>"
    assert base.endswith(f"LIMIT {10**9}")
    base = base[: -len(f"LIMIT {10**9}")]
    return f"{base}LIMIT {k} OFFSET {page * k}"


def bm25_topk_dismax_sql(
    terms: list[str],
    k: int = 10,
    tie_breaker: float = 0.0,
    round_to: int = 4,
    title_len: int = 8,
) -> str:
    """DisjunctionMaxQuery oracle over two derived fields — title =
    the first ``title_len`` tokens, body = all tokens — each scored
    with its OWN df/avgdl (per-field posting spaces, like Lucene's
    per-field readers); combined max + tie_breaker * rest."""
    terms = list(dict.fromkeys(terms))
    tin = _terms_in(terms)

    def field_cte(name: str, tcol: str) -> str:
        return f"""
{name}_base AS (SELECT doc_id, {tcol} AS t, len({tcol}) AS dl FROM toks),
{name}_stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM {name}_base),
{name}_tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM {name}_base)
  WHERE term IN {tin}
  GROUP BY doc_id, term, dl
),
{name}_df AS (SELECT term, count(*) AS df FROM {name}_tf GROUP BY term),
{name}_sc AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS sc
  FROM {name}_tf tf JOIN {name}_df USING (term) CROSS JOIN {name}_stats s
  GROUP BY tf.doc_id
)"""

    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),{field_cte("title", f"t[1:{title_len}]")},{field_cte("body", "t")}
SELECT coalesce(ti.doc_id, bo.doc_id) AS doc_id,
       round(
         greatest(coalesce(ti.sc, 0), coalesce(bo.sc, 0))
         + {float(tie_breaker)} * (coalesce(ti.sc, 0) + coalesce(bo.sc, 0)
            - greatest(coalesce(ti.sc, 0), coalesce(bo.sc, 0))),
         {round_to}) AS score
FROM title_sc ti FULL JOIN body_sc bo ON ti.doc_id = bo.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_regexp_sql(pattern: str, k: int = 10, round_to: int = 4) -> str:
    """RegexpQuery oracle: the expansion happens INDEPENDENTLY inside
    SQL via RE2's regexp_full_match over the unnested dictionary."""
    p = pattern.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE regexp_full_match(term, '{p}')
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def more_like_this_sql(
    doc_id: int, k: int = 10, max_query_terms: int = 5, round_to: int = 4
) -> str:
    """MoreLikeThis oracle: the informative-term selection happens
    INDEPENDENTLY in SQL — top max_query_terms by
    (round(tf·idf, 6) DESC, term ASC) from the source doc — then the
    standard BM25 disjunction over the selected set."""
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
src_tf AS (
  SELECT term, count(*) AS tf
  FROM (SELECT unnest(t) AS term FROM base WHERE doc_id = {doc_id})
  GROUP BY term
),
all_tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN (SELECT term FROM src_tf)
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM all_tf GROUP BY term),
sel AS (
  SELECT s.term
  FROM src_tf s JOIN dfreq USING (term) CROSS JOIN stats st
  ORDER BY round(s.tf * ln(1.0 + (st.n - df + 0.5) / (df + 0.5)), 6) DESC, s.term ASC
  LIMIT {max_query_terms}
),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM all_tf tf JOIN dfreq USING (term) CROSS JOIN stats s
  WHERE tf.term IN (SELECT term FROM sel)
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_phrase_sql(
    words: list[str], k: int = 10, round_to: int = 4
) -> str:
    """PhraseQuery-with-scoring oracle: phrase tf via the slot-join
    CTEs, weight = sum of distinct terms' idfs, dl/avgdl from the
    token arrays — mirrors exec.bm25_topk_phrase."""
    slot_ctes = []
    for i, w in enumerate(words):
        wq = w.replace("'", "''")
        slot_ctes.append(
            f"s{i} AS (SELECT doc_id, p - {i} AS p FROM pos WHERE term = '{wq}')"
        )
    joins = "".join(
        f" JOIN s{i} ON s0.doc_id = s{i}.doc_id AND s0.p = s{i}.p"
        for i in range(1, len(words))
    )
    distinct_terms = list(dict.fromkeys(words))
    # weight folds in first-seen term order, same as the engine
    idf_sum = " + ".join(
        f"(SELECT ln(1.0 + ((SELECT count(*)::DOUBLE FROM base) - df + 0.5) / (df + 0.5))"
        f" FROM dfreq WHERE term = '{t.replace(chr(39), chr(39)*2)}')"
        for t in distinct_terms
    )
    tin = _terms_in(distinct_terms)
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p
  FROM base
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM pos WHERE term IN {tin} GROUP BY term
),
{", ".join(slot_ctes)},
pc AS (
  SELECT s0.doc_id AS doc_id, count(*) AS n_phrase
  FROM s0{joins}
  GROUP BY s0.doc_id
)
SELECT b.doc_id,
       round(({idf_sum}) * pc.n_phrase * 2.2
         / (pc.n_phrase + 1.2 * (1.0 - 0.75 + 0.75 * b.dl / st.avgdl)),
         {round_to}) AS score
FROM pc JOIN base b USING (doc_id) CROSS JOIN stats st
ORDER BY score DESC, b.doc_id ASC
LIMIT {k}
"""


def bm25_topk_after_delete_sql(
    terms: list[str], deleted: list[int], k: int = 10, round_to: int = 4
) -> str:
    """liveDocs oracle: BM25 with FULL-corpus stats (df/N/avgdl still
    include deleted docs — Lucene's pre-merge semantics) but deleted
    ids excluded from results before the top-k cut."""
    terms = list(dict.fromkeys(terms))
    ids = ", ".join(str(int(i)) for i in deleted)
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
WHERE doc_id NOT IN ({ids})
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def spell_suggest_sql(term: str, max_edits: int = 2, k: int = 10) -> str:
    """Spell-suggest oracle: DuckDB's levenshtein() expands the
    dictionary independently of the engine's automaton∩FST walk
    (query/suggest.py); rank = (df desc, term asc),
    DirectSpellChecker's default."""
    t = term.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT term, df FROM dfreq
WHERE levenshtein(term, '{t}') <= {max_edits}
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def bm25_collapse_sql(
    terms: list[str], collapse_col: str = "source", k: int = 10, round_to: int = 4
) -> str:
    """Field-collapse oracle (query/grouping.py bm25_collapse_topk):
    the bm25_topk_sql scoring CTE, rounded BEFORE ranking, then
    row_number per collapse key keeps each key's best doc."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT d.{collapse_col} AS collapse_key, p.doc_id, p.score,
         row_number() OVER (
           PARTITION BY d.{collapse_col} ORDER BY p.score DESC, p.doc_id ASC
         ) AS rn
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT collapse_key, doc_id, score FROM ranked
WHERE rn = 1
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def facet_counts_sql(must: list[str], facet_col: str = "lang") -> str:
    """Facet-count oracle (query/grouping.py facet_counts /
    facet_counts_indexed): docs containing EVERY must term, counted
    per facet value; integer-only, ordered by facet value."""
    must = list(dict.fromkeys(must))
    return f"""
WITH {TOKS_CTE},
hit AS (
  SELECT doc_id
  FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(must)}
  GROUP BY doc_id HAVING count(*) = {len(must)}
)
SELECT d.{facet_col} AS facet_value, count(*)::BIGINT AS n_docs
FROM hit JOIN documents d USING (doc_id)
GROUP BY d.{facet_col}
ORDER BY facet_value
"""


def drill_sideways_sql(must: list[str], selections: dict[str, str]) -> str:
    """DrillSideways oracle (query/grouping.py drill_sideways): the
    same conjunctive match set, each dimension's sideways counts under
    the OTHER dims' selections, UNION ALL + the fully-drilled _hits
    row; integer-only, (dim, value) total order."""
    must = list(dict.fromkeys(must))
    dims = sorted(selections)

    def esc(v: str) -> str:
        return v.replace("'", "''")

    legs = []
    for dim in dims:
        others = " AND ".join(
            f"d.{od} = '{esc(selections[od])}'" for od in dims if od != dim
        ) or "TRUE"
        legs.append(f"""
SELECT '{dim}' AS dim, coalesce(d.{dim}::VARCHAR, chr(1) || 'null') AS value,
       count(*)::BIGINT AS n_docs
FROM hit JOIN documents d USING (doc_id)
WHERE {others}
GROUP BY 2""")
    alldims = " AND ".join(f"d.{od} = '{esc(selections[od])}'" for od in dims)
    legs.append(f"""
SELECT '_hits' AS dim, '' AS value, count(*)::BIGINT AS n_docs
FROM hit JOIN documents d USING (doc_id)
WHERE {alldims}""")
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH {TOKS_CTE},
hit AS (
  SELECT doc_id
  FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(must)}
  GROUP BY doc_id HAVING count(*) = {len(must)}
)
SELECT * FROM ({union})
ORDER BY dim, value
"""


def tfidf_classic_topk_sql(terms: list[str], k: int = 10, round_to: int = 4) -> str:
    """ClassicSimilarity oracle (query/similarity.py
    tfidf_classic_topk): per term-doc sqrt(tf) * idf^2 / sqrt(dl)
    with idf = 1 + ln(N/(df+1)), summed per doc then scaled by the
    coord factor n_matched/n_query_terms. Left-to-right sum order =
    the engine's query-order fold."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sqrt(tf.tf) * (1.0 + ln(s.n / (df + 1.0))) * (1.0 + ln(s.n / (df + 1.0)))
           / sqrt(tf.dl) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id,
       round(sum(sc) * (count(*)::DOUBLE / {float(len(terms))}), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc) * (count(*)::DOUBLE / {float(len(terms))}), {round_to}) DESC,
         doc_id ASC
LIMIT {k}
"""


def bm25_topk_boosted_sql(
    boosts: dict[str, float], k: int = 10, round_to: int = 4
) -> str:
    """Boosted-BM25 oracle (query/similarity.py bm25_topk_boosted):
    sc = boost[t] * idf * tfn, boost applied via a CASE over the
    term; sum order = the dict's insertion order = the engine's
    query-order fold."""
    terms = list(dict.fromkeys(boosts))
    case = "CASE term " + " ".join(
        f"WHEN '{t}' THEN {float(boosts[t])!r}" for t in terms
    ) + " END"
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ({case}) * ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_synonym_sql(synonyms: list[str], k: int = 10, round_to: int = 4) -> str:
    """SynonymQuery oracle (query/bm25.py bm25_topk_synonym): blended
    stats — df = max over the synonym set, tf = per-doc sum — scored
    as one pseudo-term."""
    synonyms = list(dict.fromkeys(synonyms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(synonyms)}
  GROUP BY doc_id, term, dl
),
dfmax AS (
  SELECT max(df) AS df_max
  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term)
),
per_doc AS (
  SELECT doc_id, sum(tf) AS tf_syn, any_value(dl) AS dl FROM tf GROUP BY doc_id
)
SELECT doc_id,
       round(ln(1.0 + (s.n - m.df_max + 0.5) / (m.df_max + 0.5))
             * (p.tf_syn * 2.2)
             / (p.tf_syn + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl)),
             {round_to}) AS score
FROM per_doc p CROSS JOIN dfmax m CROSS JOIN stats s
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_boosting_sql(
    positive: list[str],
    negative: list[str],
    negative_boost: float = 0.5,
    k: int = 10,
    round_to: int = 4,
) -> str:
    """BoostingQuery oracle (query/bm25.py bm25_topk_boosting): score
    the positive disjunction, then multiply the RAW per-doc sum by
    ``negative_boost`` for docs matching any negative term, rounding
    ONCE at the end (the exact-binary multiply keeps the pre-round
    double identical on both sides; a two-stage round diverges on 5dp
    half-boundaries — see the engine docstring)."""
    positive = list(dict.fromkeys(positive))
    negative = list(dict.fromkeys(negative))
    nb = float(negative_boost)
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(positive)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
pos AS (SELECT doc_id, sum(sc) AS raw FROM scored GROUP BY doc_id),
neg AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(negative)}
)
SELECT p.doc_id,
       round(p.raw * (CASE WHEN n.doc_id IS NOT NULL
                           THEN {nb!r}::DOUBLE ELSE 1.0::DOUBLE END),
             {round_to}) AS score
FROM pos p LEFT JOIN neg n ON p.doc_id = n.doc_id
ORDER BY score DESC, p.doc_id ASC
LIMIT {k}
"""


def bm25_topk_where_sql(
    terms: list[str], where_sql: str, k: int = 10, round_to: int = 4
) -> str:
    """Doc-values/points range-filter oracle: bm25_topk_sql's OR body
    with an arbitrary WHERE predicate restricting the corpus BEFORE
    stats — mirroring the engine's docs.filter(...) pre-filter (the
    same convention as the lang-filtered variant: stats over the
    filtered corpus)."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents WHERE {where_sql}
),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def date_histogram_sql(interval: str = "day", quantize: int = 100) -> str:
    """Date-histogram oracle (query/grouping.py date_histogram).

    Mirrors the engine's quantized sum: values snap to integer
    1/quantize units before summing, so the total is an exact integer
    fold on both engines regardless of addition order (::DOUBLE casts
    keep DuckDB out of DECIMAL arithmetic)."""
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    return f"""
SELECT strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(CAST(round(value * {quantize}, 0) AS BIGINT))::DOUBLE / {float(quantize)!r}::DOUBLE, 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
"""


def numeric_range_facets_sql(col: str = "n_chars", width: int = 50) -> str:
    """Numeric range-facet oracle (query/grouping.py
    numeric_range_facets)."""
    return f"""
SELECT (floor({col} / {width}) * {width})::BIGINT AS bucket_lo,
       count(*)::BIGINT AS n_docs
FROM documents
GROUP BY 1
ORDER BY bucket_lo
"""


def match_stats_sql(must: list[str], stat_col: str = "n_chars") -> str:
    """Stats-agg oracle (query/grouping.py match_stats)."""
    must = list(dict.fromkeys(must))
    return f"""
WITH {TOKS_CTE},
hit AS (
  SELECT doc_id
  FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(must)}
  GROUP BY doc_id HAVING count(*) = {len(must)}
)
SELECT count(*)::BIGINT AS n_docs,
       min(d.{stat_col}) AS min_val,
       max(d.{stat_col}) AS max_val,
       round(avg(d.{stat_col}), 4) AS avg_val
FROM hit JOIN documents d USING (doc_id)
"""


def bm25_parent_join_sql(
    terms: list[str],
    parent_col: str = "source",
    score_mode: str = "sum",
    k: int = 10,
    round_to: int = 4,
) -> str:
    """Parent-block-join oracle (query/grouping.py
    bm25_parent_join_topk): per-doc rounded BM25 -> per-parent
    aggregate; sum/avg fold children in doc_id order (list_sort +
    list_reduce mirrors the engine's sorted-array fold)."""
    terms = list(dict.fromkeys(terms))
    mode_expr = {
        "sum": f"round(osum, {round_to})",
        "avg": f"round(osum / n_children, {round_to})",
        "max": "omax",
        "min": "omin",
    }[score_mode]
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score FROM scored GROUP BY doc_id
),
per_parent AS (
  SELECT d.{parent_col} AS parent,
         list_reduce(
           list_prepend(0.0::DOUBLE,
             [x.score FOR x IN list_sort(list(struct_pack(doc_id := p.doc_id, score := p.score)))]),
           (acc, v) -> acc + v
         ) AS osum,
         max(p.score) AS omax,
         min(p.score) AS omin,
         count(*)::BIGINT AS n_children
  FROM per_doc p JOIN documents d USING (doc_id)
  GROUP BY d.{parent_col}
)
SELECT parent, {mode_expr} AS score, n_children
FROM per_parent
ORDER BY score DESC, parent ASC
LIMIT {k}
"""


def explain_score_sql(terms: list[str], doc_id: int, round_to: int = 4) -> str:
    """Explain oracle (query/bm25.py explain_score): the same factor
    algebra recomputed independently for one document."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.term,
       tf.tf::BIGINT AS tf,
       df::BIGINT AS df,
       tf.dl::BIGINT AS dl,
       round(ln(1.0 + (s.n - df + 0.5) / (df + 0.5)), {round_to}) AS idf,
       round((tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)), {round_to}) AS tfn,
       round(ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
             * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)),
             {round_to}) AS contribution
FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
WHERE tf.doc_id = {doc_id}
ORDER BY tf.term
"""


def complete_prefix_sql(prefix: str, k: int = 10) -> str:
    """Completion-suggester oracle (query/suggest.py complete_prefix):
    independent LIKE-prefix expansion over the tokenize-and-aggregate
    df table, ranked (df desc, term asc)."""
    pq = _like_prefix(prefix)
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT term, df FROM dfreq
WHERE term LIKE '{pq}' ESCAPE '\\'
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def complete_fuzzy_sql(prefix: str, max_edits: int = 1, k: int = 10) -> str:
    """Fuzzy-completion oracle (query/suggest.py complete_fuzzy):
    acceptance re-derived independently as min over NON-EMPTY char
    prefixes p of term of levenshtein(p, prefix) <= max_edits (DuckDB
    levenshtein is plain edit distance, the same DP the FST walk
    steps). The empty prefix is excluded here, so gate prefixes must
    be longer than max_edits (complete_fuzzy's documented contract);
    ranked (df desc, term asc) like complete_prefix."""
    pfx = prefix.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT term, df FROM dfreq
WHERE list_min(list_transform(range(1, length(term) + 1),
        i -> levenshtein(term[1:i], '{pfx}'))) <= {max_edits}
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def _cos_sql(a: str, b: str) -> str:
    # the ONE cosine SQL, shared with the ANN oracles — never a copy
    from .oracle_sql_ops import _cos

    return _cos(a, b)


def _bm25_topn_cte(terms: list[str], n: int, round_to: int = 4) -> str:
    """Reusable CTE body: (doc_id, score) = disjunctive BM25 top-n."""
    terms = list(dict.fromkeys(terms))
    return f"""
{TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
bm25 AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score
  FROM scored GROUP BY doc_id
  ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
  LIMIT {n}
)"""


def streamed_term_counts_sql(k: int = 20) -> str:
    """Stream-batch parity oracle for the complete-mode running term
    aggregate (streaming/term_counts.py): the one-shot batch ttf over
    the same corpus, same (ttf DESC, term) total order and cut."""
    return f"""
WITH {TOKS_CTE}
SELECT term, count(*)::BIGINT AS ttf
FROM (SELECT unnest(t) AS term FROM base)
GROUP BY term
ORDER BY ttf DESC, term ASC
LIMIT {int(k)}
"""


def hll_cardinality_sql(
    key_col: str = "event_type", item_expr: str = "user_id::VARCHAR", m: int = 64
) -> str:
    """HLL oracle (query/grouping.py hll_cardinality): same md5
    bucketing/ranks, HUGEINT harmonic fold, integer-rounded raw
    estimate (alpha = 709/1000), identical branch predicate.
    ``item_expr`` must canonicalize exactly like the Spark side."""
    if m != 64:
        raise ValueError("alpha hardwired for m=64")
    num = 709 * m * m * (2 ** 61)
    div = (
        f"((2 * ('{num}'::HUGEINT) * 10000 + (1000::HUGEINT * S)) // (2 * (1000::HUGEINT * S)))"
    )
    return f"""
WITH h AS (
  SELECT {key_col} AS key,
         ('0x' || substr(md5({item_expr}), 1, 2))::BIGINT % {m} AS j,
         ('0x' || substr(md5({item_expr}), 3, 15))::BIGINT AS w
  FROM events
),
regs AS (
  SELECT key, j,
         max(CASE WHEN w > 0 THEN 61 - length(bin(w)) ELSE 61 END) AS M
  FROM h GROUP BY key, j
),
per AS (
  SELECT key,
         ({m} - count(*))::BIGINT AS v_empty,
         sum((1::BIGINT << (61 - M))::HUGEINT)::HUGEINT
           + ({m} - count(*))::HUGEINT * ('{2 ** 61}'::HUGEINT) AS S
  FROM regs GROUP BY key
),
est AS (
  SELECT key, v_empty, ({div})::DOUBLE / 10000.0 AS raw FROM per
),
exact AS (
  SELECT {key_col} AS key, count(DISTINCT {item_expr})::BIGINT AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e.key, x.exact_distinct, e.v_empty,
       CASE WHEN e.v_empty > 0 AND e.raw <= {2.5 * m}
            THEN round({float(m)!r}::DOUBLE * ln({float(m)!r}::DOUBLE / e.v_empty), 4)
            ELSE e.raw
       END AS hll_estimate
FROM est e JOIN exact x USING (key)
ORDER BY e.key
"""


def diversified_sample_facets_sql(
    terms: list[str],
    dedup_col: str = "source",
    max_per_key: int = 2,
    sample_size: int = 50,
    facet_col: str = "lang",
) -> str:
    """Diversified-sampler oracle (query/grouping.py
    diversified_sample_facets): per-key cap then global cut, both over
    the rounded (score DESC, doc_id) total order — the limit inside
    _bm25_topn_cte is set past the corpus so the scored set is
    complete."""
    return f"""
WITH {_bm25_topn_cte(terms, 1_000_000_000)},
j AS (
  SELECT b.doc_id, b.score, d.{dedup_col} AS dk, d.{facet_col} AS facet_value
  FROM bm25 b JOIN documents d USING (doc_id)
),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY dk ORDER BY score DESC, doc_id ASC) AS rn
  FROM j
),
sample AS (
  SELECT * FROM capped WHERE rn <= {int(max_per_key)}
  ORDER BY score DESC, doc_id ASC
  LIMIT {int(sample_size)}
)
SELECT facet_value, count(*)::BIGINT AS n_docs
FROM sample
GROUP BY facet_value
ORDER BY facet_value
"""


def rank_eval_sql(
    terms: list[str], judged_must: list[str], k: int = 10
) -> str:
    """Rank-eval oracle (query/rank_eval.rank_eval): same (score DESC,
    doc_id) rank assignment, judged set re-derived independently
    (conjunctive containment), precision/recall/MRR in integer
    arithmetic, DCG gains quantized to 1e-6 units before the fold."""
    judged_must = list(dict.fromkeys(judged_must))
    return f"""
WITH {_bm25_topn_cte(terms, k)},
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM bm25
),
judged AS (
  SELECT doc_id
  FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(judged_must)}
  GROUP BY doc_id HAVING count(*) = {len(judged_must)}
),
nj AS (SELECT count(*)::BIGINT AS n_judged FROM judged),
flagged AS (
  SELECT r.rank, CASE WHEN j.doc_id IS NULL THEN 0 ELSE 1 END AS rel
  FROM ranked r LEFT JOIN judged j USING (doc_id)
),
a AS (
  SELECT sum(rel)::HUGEINT AS nh,
         min(CASE WHEN rel = 1 THEN rank END)::HUGEINT AS mr,
         sum(CASE WHEN rel = 1
                  THEN CAST(round(round(1.0::DOUBLE / log2(rank + 1), 6) * 1000000.0) AS BIGINT)
                  ELSE 0 END)::HUGEINT AS s
  FROM flagged
)
SELECT {int(k)}::BIGINT AS k,
       nj.n_judged,
       a.nh::BIGINT AS n_hits,
       ({_div_round4_sql("a.nh", str(int(k)))})::DOUBLE / 10000.0 AS precision_at_k,
       CASE WHEN nj.n_judged > 0
            THEN ({_div_round4_sql("a.nh", "nj.n_judged")})::DOUBLE / 10000.0
       END AS recall_at_k,
       CASE WHEN a.nh > 0
            THEN ({_div_round4_sql("1", "a.mr")})::DOUBLE / 10000.0
            ELSE 0.0::DOUBLE
       END AS mrr,
       ({_div_round4_sql("a.s", "1000000")})::DOUBLE / 10000.0 AS dcg_at_k
FROM a, nj
"""


def rescore_topk_sql(
    terms: list[str],
    query_vec: list[float],
    n_first: int = 100,
    k: int = 10,
    alpha: float = 1.0,
    beta: float = 0.5,
    round_to: int = 4,
) -> str:
    """QueryRescorer oracle (query/rescore.py rescore_topk)."""
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH {_bm25_topn_cte(terms, n_first, round_to)},
qv AS (SELECT {q} AS v),
emb AS (
  -- + 0.0::DOUBLE: signed-zero normalization (DuckDB round keeps -0.0,
  -- Spark drops it; the driver hash is repr-sensitive) — mirrors the
  -- + F.lit(0.0) in query/rescore.py on BOTH sim and the combined score
  SELECT vec_id AS doc_id, round({_cos_sql("embedding", "qv.v")}, {round_to}) + 0.0::DOUBLE AS sim
  FROM embeddings, qv
)
SELECT b.doc_id,
       round({float(alpha)!r}::DOUBLE * b.score + {float(beta)!r}::DOUBLE * coalesce(e.sim, 0.0), {round_to}) + 0.0::DOUBLE AS score,
       b.score AS bm25,
       coalesce(e.sim, 0.0) AS sim
FROM bm25 b LEFT JOIN emb e USING (doc_id)
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def rrf_fusion_sql(
    terms: list[str],
    query_vec: list[float],
    n_each: int = 100,
    k: int = 10,
    rrf_k: int = 60,
    round_to: int = 6,
) -> str:
    """RRF oracle (query/rescore.py rrf_fusion_topk): rank CTEs with
    the same (score desc, doc_id) tie-break, absent ranks = 0."""
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH {_bm25_topn_cte(terms, n_each, 4)},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
  FROM bm25
),
qv AS (SELECT {q} AS v),
emb AS (
  SELECT vec_id AS doc_id, round({_cos_sql("embedding", "qv.v")}, 4) AS sim
  FROM embeddings, qv
  ORDER BY sim DESC, doc_id ASC
  LIMIT {n_each}
),
dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS sim_rank
  FROM emb
),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(l.bm25_rank, 0)::INT AS bm25_rank,
         coalesce(d.sim_rank, 0)::INT AS sim_rank
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id,
       round(
         (CASE WHEN bm25_rank > 0 THEN 1.0::DOUBLE / ({rrf_k} + bm25_rank) ELSE 0.0::DOUBLE END)
         + (CASE WHEN sim_rank > 0 THEN 1.0::DOUBLE / ({rrf_k} + sim_rank) ELSE 0.0::DOUBLE END),
         {round_to}) AS score,
       bm25_rank, sim_rank
FROM fused
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def rrf_fusion_indexed_sql(
    terms: list[str],
    query_vec: list[float],
    centroids: list[list[float]],
    n_each: int = 100,
    k: int = 10,
    rrf_k: int = 60,
    round_to: int = 6,
    n_probe: int = 2,
) -> str:
    """Indexed-RRF oracle (query/rescore.py rrf_fusion_topk_indexed):
    identical to rrf_fusion_sql except the dense CTE mirrors the IVF
    PROBE semantics — cell assignment + n_probe nearest cells via the
    shared ivf_cells_and_probes building blocks (the same oracle
    strategy as ann_ivf_indexed), not a full-corpus scan."""
    from .oracle_sql_ops import ivf_cells_and_probes

    sim_cols, case, probes = ivf_cells_and_probes(query_vec, centroids, n_probe)
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH {_bm25_topn_cte(terms, n_each, 4)},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
  FROM bm25
),
csims AS (
  SELECT vec_id, embedding, {sim_cols} FROM embeddings
),
ccells AS (
  SELECT vec_id, embedding, {case} AS cell FROM csims
),
qv AS (SELECT {q} AS v),
emb AS (
  SELECT vec_id AS doc_id, round({_cos_sql("embedding", "qv.v")}, 4) AS sim
  FROM ccells, qv
  WHERE cell IN ({probes})
  ORDER BY sim DESC, doc_id ASC
  LIMIT {n_each}
),
dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS sim_rank
  FROM emb
),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(l.bm25_rank, 0)::INT AS bm25_rank,
         coalesce(d.sim_rank, 0)::INT AS sim_rank
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id,
       round(
         (CASE WHEN bm25_rank > 0 THEN 1.0::DOUBLE / ({rrf_k} + bm25_rank) ELSE 0.0::DOUBLE END)
         + (CASE WHEN sim_rank > 0 THEN 1.0::DOUBLE / ({rrf_k} + sim_rank) ELSE 0.0::DOUBLE END),
         {round_to}) AS score,
       bm25_rank, sim_rank
FROM fused
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def percolate_sql(rules: list[tuple[int, list[str], int]]) -> str:
    """Percolator oracle (query/percolator.py percolate): the same
    registered rules as a VALUES table, matched with DISTINCT doc
    tokens; a pair survives when >= min_match rule terms hit."""
    values = ",\n    ".join(
        "({}, [{}], {})".format(
            qid,
            ", ".join("'" + t.replace("'", "''") + "'" for t in dict.fromkeys(terms)),
            mm,
        )
        for qid, terms, mm in rules
    )
    return f"""
WITH {TOKS_CTE},
rules(query_id, terms, min_match) AS (VALUES
    {values}
),
rule_terms AS (
  SELECT query_id, min_match, unnest(terms) AS term FROM rules
),
doc_terms AS (
  SELECT DISTINCT doc_id, unnest(t) AS term FROM base
)
SELECT d.doc_id, r.query_id
FROM doc_terms d JOIN rule_terms r USING (term)
GROUP BY d.doc_id, r.query_id, r.min_match
HAVING count(*) >= r.min_match
ORDER BY doc_id, query_id
"""


def span_first_sql(term: str, end: int) -> str:
    """SpanFirst oracle (query/exec.py span_first_indexed): re-derives
    token positions independently (list_position over the token array
    finds the FIRST occurrence; generate_subscripts covers the general
    earliest-in-window case)."""
    t = term.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
)
SELECT doc_id, min(p)::BIGINT AS first_pos
FROM pos
WHERE term = '{t}' AND p < {end}
GROUP BY doc_id
ORDER BY doc_id
"""


def span_near_ordered_sql(first: str, second: str, slop: int = 3) -> str:
    """Ordered-SpanNear oracle (query/exec.py span_near_ordered_indexed):
    directional position band 0 < p2 - p1 <= slop + 1, positions from
    the positional parallel unnest."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
)
SELECT a.doc_id, count(*)::BIGINT AS n_pairs
FROM (SELECT doc_id, p AS p1 FROM pos WHERE term = '{f}') a
JOIN (SELECT doc_id, p AS p2 FROM pos WHERE term = '{s}') b
  ON a.doc_id = b.doc_id AND b.p2 - a.p1 > 0 AND b.p2 - a.p1 <= {slop + 1}
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


def significant_terms_sql(
    must: list[str], k: int = 10, min_doc_count: int = 3, round_to: int = 6
) -> str:
    """Significant-terms oracle (query/grouping.py significant_terms):
    fg/bg dfs from one distinct (doc, term) table, lift recomputed
    independently with explicit DOUBLE casts."""
    must = list(dict.fromkeys(must))
    return f"""
WITH {TOKS_CTE},
doc_terms AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM base),
match AS (
  SELECT doc_id FROM doc_terms
  WHERE term IN {_terms_in(must)}
  GROUP BY doc_id HAVING count(*) = {len(must)}
),
sizes AS (
  SELECT (SELECT count(*) FROM base)::DOUBLE AS n_docs,
         (SELECT count(*) FROM match)::DOUBLE AS n_fg
),
agg AS (
  SELECT d.term,
         sum(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS fg_df,
         count(*)::BIGINT AS bg_df
  FROM doc_terms d LEFT JOIN match m ON d.doc_id = m.doc_id
  GROUP BY d.term
)
SELECT term, fg_df, bg_df,
       round((fg_df::DOUBLE / s.n_fg) / (bg_df::DOUBLE / s.n_docs), {round_to}) AS lift
FROM agg CROSS JOIN sizes s
WHERE term NOT IN {_terms_in(must)} AND fg_df >= {min_doc_count}
ORDER BY lift DESC, term ASC
LIMIT {k}
"""


def span_near_unordered_sql(first: str, second: str, slop: int = 3) -> str:
    """Unordered-SpanNear oracle (query/exec.py
    span_near_unordered_indexed): symmetric position band
    0 < |p2 - p1| <= slop + 1 over the positional parallel unnest."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
)
SELECT a.doc_id, count(*)::BIGINT AS n_pairs
FROM (SELECT doc_id, p AS p1 FROM pos WHERE term = '{f}') a
JOIN (SELECT doc_id, p AS p2 FROM pos WHERE term = '{s}') b
  ON a.doc_id = b.doc_id
 AND abs(b.p2 - a.p1) > 0 AND abs(b.p2 - a.p1) <= {slop + 1}
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


def span_or_first_sql(terms: list[str], end: int) -> str:
    """SpanOr-into-SpanFirst oracle (query/exec.py
    span_or_first_indexed): any of the clause terms within the first
    ``end`` positions; count + earliest."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
)
SELECT doc_id, count(*)::BIGINT AS n_spans, min(p)::BIGINT AS first_pos
FROM pos
WHERE term IN {_terms_in(terms)} AND p < {end}
GROUP BY doc_id
ORDER BY doc_id
"""


def span_not_sql(include: str, exclude: str, pre: int = 0, post: int = 0) -> str:
    """SpanNot oracle (query/exec.py span_not_indexed): include
    positions surviving an ANTI join against exclude positions in
    [p - pre, p + post]."""
    i = include.replace("'", "''")
    e = exclude.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
inc AS (SELECT doc_id, p AS p1 FROM pos WHERE term = '{i}'),
exc AS (SELECT doc_id, p AS p2 FROM pos WHERE term = '{e}')
SELECT doc_id, count(*)::BIGINT AS n_spans
FROM inc a
WHERE NOT EXISTS (
  SELECT 1 FROM exc b
  WHERE b.doc_id = a.doc_id
    AND b.p2 >= a.p1 - {pre} AND b.p2 <= a.p1 + {post}
)
GROUP BY doc_id
ORDER BY doc_id
"""


def phrase_prefix_sql(first: str, prefix: str, max_expansions: int = 50) -> str:
    """match_phrase_prefix oracle (query/exec.py
    phrase_prefix_counts_indexed): the expansion set is re-derived
    INDEPENDENTLY from the corpus text (distinct terms LIKE
    'prefix%', capped at max_expansions in lexicographic order — the
    same determinism contract as the engine's FST expansion), then the
    phrase adjacency p2 = p1 + 1."""
    f = first.replace("'", "''")
    p = prefix.replace("'", "''").replace("%", "\\%").replace("_", "\\_")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
expansions AS (
  SELECT DISTINCT term FROM pos WHERE term LIKE '{p}%' ESCAPE '\\'
  ORDER BY term LIMIT {max_expansions}
)
SELECT a.doc_id, count(*)::BIGINT AS n_matches
FROM (SELECT doc_id, p AS p1 FROM pos WHERE term = '{f}') a
JOIN (SELECT doc_id, p AS p2 FROM pos WHERE term IN (SELECT term FROM expansions)) b
  ON a.doc_id = b.doc_id AND b.p2 = a.p1 + 1
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


def span_multi_near_sql(
    prefix: str, second: str, slop: int = 3, max_expansions: int = 50
) -> str:
    """SpanMultiTermQueryWrapper oracle (query/exec.py
    span_multi_near_indexed): the prefix expansion re-derived
    independently (distinct corpus terms LIKE 'prefix%', lexicographic
    cap — the shared contract), its positions unioned as the FIRST
    span leg, then the ordered band 0 < p2 - p1 <= slop + 1."""
    s = second.replace("'", "''")
    p = prefix.replace("'", "''").replace("%", "\\%").replace("_", "\\_")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
expansions AS (
  SELECT DISTINCT term FROM pos WHERE term LIKE '{p}%' ESCAPE '\\'
  ORDER BY term LIMIT {max_expansions}
)
SELECT a.doc_id, count(*)::BIGINT AS n_pairs
FROM (SELECT doc_id, p AS p1 FROM pos WHERE term IN (SELECT term FROM expansions)) a
JOIN (SELECT doc_id, p AS p2 FROM pos WHERE term = '{s}') b
  ON a.doc_id = b.doc_id AND b.p2 - a.p1 > 0 AND b.p2 - a.p1 <= {slop + 1}
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


def top_hits_by_group_sql(
    terms: list[str], group_col: str = "lang", per_group: int = 2, round_to: int = 4
) -> str:
    """Terms+top_hits oracle (query/grouping.py top_hits_by_group):
    the shared scoring CTE rounded BEFORE ranking, one window per
    group key for rank and hit count."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT d.{group_col} AS group_key, p.doc_id, p.score,
         row_number() OVER (
           PARTITION BY d.{group_col} ORDER BY p.score DESC, p.doc_id ASC
         ) AS rank,
         count(*) OVER (PARTITION BY d.{group_col}) AS n_hits
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT group_key, rank::INT AS rank, doc_id, score, n_hits::BIGINT AS n_hits
FROM ranked
WHERE rank <= {per_group}
ORDER BY group_key, rank
"""


def filters_agg_sql(filters: dict[str, list[str]]) -> str:
    """Filters-agg oracle (query/grouping.py filters_agg): one
    conjunctive count per named bucket, unioned in name order."""
    selects = []
    for name, terms in sorted(filters.items()):
        terms = list(dict.fromkeys(terms))
        n = name.replace("'", "''")
        selects.append(
            f"""
SELECT '{n}' AS filter_name, (
  SELECT count(*) FROM (
    SELECT doc_id
    FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
    WHERE term IN {_terms_in(terms)}
    GROUP BY doc_id HAVING count(*) = {len(terms)}
  )
)::BIGINT AS n_docs"""
        )
    u = "\nUNION ALL".join(selects)
    return f"""
WITH {TOKS_CTE}
{u}
ORDER BY filter_name
"""


def cardinality_agg_sql(key_col: str = "event_type", id_col: str = "user_id") -> str:
    """Exact-cardinality oracle (query/grouping.py cardinality_agg)."""
    return f"""
SELECT {key_col} AS key,
       count(DISTINCT {id_col})::BIGINT AS n_unique,
       count(*)::BIGINT AS n_events
FROM events
GROUP BY 1
ORDER BY key
"""


def value_histogram_sql(interval: int = 25, quantize: int = 100) -> str:
    """Numeric-histogram oracle (query/grouping.py value_histogram):
    same fixed-width buckets and quantized order-independent sum as
    date_histogram_sql."""
    return f"""
SELECT (floor(value / {interval}) * {interval})::BIGINT AS bucket_lo,
       count(*)::BIGINT AS n_events,
       round(sum(CAST(round(value * {quantize}, 0) AS BIGINT))::DOUBLE / {float(quantize)!r}::DOUBLE, 4) AS sum_value
FROM events
GROUP BY 1
ORDER BY bucket_lo
"""


def session_windows_sql(gap_hours: int = 6, quantize: int = 100) -> str:
    """Sessionization oracle (query/grouping.py session_windows): the
    classic islands formulation — a session break where the gap to the
    previous event is >= the threshold (Spark merges only
    strictly-overlapping [t, t+gap) windows, so an event at exactly
    prev+gap starts a new session on both sides); bounds as epoch
    microseconds, end = last event + gap."""
    return f"""
WITH l AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
),
m AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR ts - prev >= INTERVAL '{gap_hours} hours'
                 THEN 1 ELSE 0 END AS is_new
  FROM l
),
g AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
  ) AS sid
  FROM m
)
SELECT user_id,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts) + INTERVAL '{gap_hours} hours') AS end_us,
       count(*)::BIGINT AS n_events,
       round(sum(CAST(round(value * {quantize}, 0) AS BIGINT))::DOUBLE / {float(quantize)!r}::DOUBLE, 4) AS sum_value
FROM g
GROUP BY user_id, sid
ORDER BY user_id, start_us
"""


def bm25_function_score_sql(
    terms: list[str],
    k: int = 10,
    decay_col: str = "n_chars",
    decay_scale: float = 1000.0,
    round_to: int = 4,
) -> str:
    """FunctionScore oracle (query/similarity.py
    bm25_function_score_topk): the shared scoring CTE rounded first,
    then the rational decay — ::DOUBLE literals keep DuckDB out of
    DECIMAL arithmetic so the combine is bit-identical to Spark."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS bm25 FROM scored GROUP BY doc_id
),
f AS (
  SELECT p.doc_id, p.bm25,
         1.0::DOUBLE / (1.0::DOUBLE + d.{decay_col}::DOUBLE / {float(decay_scale)!r}::DOUBLE) AS factor
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT doc_id,
       round(bm25 * factor, {round_to}) AS score,
       bm25,
       round(factor, {round_to}) AS factor
FROM f
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def phrase_suggest_sql(
    first: str, second: str, max_edits: int = 2, k: int = 5
) -> str:
    """PhraseSuggester oracle (query/suggest.py phrase_suggest): the
    candidate expansion re-derived INDEPENDENTLY with DuckDB's
    levenshtein() (plain edit distance — the same metric the engine's
    automaton implements, per the spell_suggest contract) over the
    distinct corpus vocabulary, then adjacent-bigram counts via the
    positional parallel unnest."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
vocab AS (SELECT DISTINCT unnest(t) AS term FROM base),
c1 AS (SELECT term FROM vocab WHERE levenshtein(term, '{f}') <= {max_edits}),
c2 AS (SELECT term FROM vocab WHERE levenshtein(term, '{s}') <= {max_edits}),
pos AS (
  SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS p FROM base
),
pairs AS (
  SELECT a.w AS w1, b.w AS w2
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.w IN (SELECT term FROM c1) AND b.w IN (SELECT term FROM c2)
)
SELECT w1, w2, count(*)::BIGINT AS n_bigram
FROM pairs
GROUP BY w1, w2
ORDER BY n_bigram DESC, w1, w2
LIMIT {k}
"""


def query_string_sql(q: str, k: int = 10, round_to: int = 4) -> str:
    """QueryParser oracle (query/parser.py execute_query): the SAME
    parse (the grammar is the contract) but fully independent
    execution — prefix/fuzzy expansion via LIKE / levenshtein over the
    corpus vocabulary instead of the FST walk, phrase presence via a
    DuckDB list lambda over start offsets, boosted scoring with the
    shared formula."""
    from .parser import parse_query

    spec = parse_query(q)
    literals = list(spec.boosts)
    preds = []
    if literals:
        preds.append(f"term IN {_terms_in(literals)}")
    for p in spec.prefix_clauses:
        preds.append(f"term LIKE '{_like_prefix(p)}' ESCAPE '\\'")
    for w, d in spec.fuzzy_clauses:
        wq = w.replace("'", "''")
        preds.append(f"levenshtein(term, '{wq}') <= {d}")
    term_pred = " OR ".join(preds)
    if literals:
        case = (
            "CASE term "
            + " ".join(
                f"WHEN '{t.replace(chr(39), chr(39) * 2)}' THEN {float(spec.boosts[t])!r}"
                for t in literals
            )
            + " ELSE 1.0 END"
        )
    else:
        case = "1.0"

    def phrase_pred(words: list[str], col: str = "b.t") -> str:
        n = len(words)
        if n == 1:
            w = words[0].replace("'", "''")
            return f"list_contains({col}, '{w}')"
        conds = " AND ".join(
            f"{col}[i + {j + 1}] = '{w.replace(chr(39), chr(39) * 2)}'"
            for j, w in enumerate(words)
        )
        return (
            f"len(list_filter(range(len({col}) - {n - 1}), i -> {conds})) > 0"
        )

    filters = []
    for t in spec.must_terms:
        filters.append(f"list_contains(b.t, '{t.replace(chr(39), chr(39) * 2)}')")
    for t in spec.must_not_terms:
        filters.append(f"NOT list_contains(b.t, '{t.replace(chr(39), chr(39) * 2)}')")
    for ph in spec.must_phrases:
        filters.append(phrase_pred(ph))
    for ph in spec.must_not_phrases:
        filters.append(f"NOT ({phrase_pred(ph)})")
    meta_join = ""
    if spec.field_terms or spec.field_ranges:
        meta_join = "JOIN documents d USING (doc_id)"
        for name, val, neg in spec.field_terms:
            c = f"d.{name} = '{val.replace(chr(39), chr(39) * 2)}'"
            filters.append(f"NOT ({c})" if neg else c)
        for name, lo, hi, neg in spec.field_ranges:
            parts = []
            if lo is not None:
                parts.append(f"d.{name} >= {int(lo)}")
            if hi is not None:
                parts.append(f"d.{name} <= {int(hi)}")
            c = " AND ".join(parts)
            filters.append(f"NOT ({c})" if neg else f"({c})")
    where = " AND ".join(filters) if filters else "TRUE"
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE {term_pred}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ({case}) * ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score FROM scored GROUP BY doc_id
)
SELECT p.doc_id, p.score
FROM per_doc p JOIN base b USING (doc_id) {meta_join}
WHERE {where}
ORDER BY p.score DESC, p.doc_id ASC
LIMIT {k}
"""


def _minimal_ordered_intervals_ctes(
    first: str, second: str, max_gaps: int
) -> str:
    """Shared CTE chain deriving the MINIMAL ordered-interval set
    (doc_id, p1, p2) — the intervals-module oracle core (query/exec.py
    _minimal_ordered_intervals): band pairs, closest-preceding-first
    per second (max p1), then earliest second per surviving first
    (min p2). Positions re-derived independently via the positional
    parallel unnest."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    return f"""
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
pairs AS (
  SELECT a.doc_id, a.p AS p1, b.p AS p2
  FROM (SELECT doc_id, p FROM pos WHERE term = '{f}') a
  JOIN (SELECT doc_id, p FROM pos WHERE term = '{s}') b
    ON a.doc_id = b.doc_id
   AND b.p - a.p > 0 AND b.p - a.p <= {max_gaps + 1}
),
closest AS (
  SELECT doc_id, p2, max(p1) AS p1 FROM pairs GROUP BY doc_id, p2
),
minimal AS (
  SELECT doc_id, p1, min(p2) AS p2 FROM closest GROUP BY doc_id, p1
)"""


def intervals_ordered_sql(first: str, second: str, max_gaps: int = 6) -> str:
    """Intervals.maxgaps(Intervals.ordered) oracle (query/exec.py
    intervals_ordered_indexed): minimal-interval count + narrowest
    width per doc."""
    return f"""
WITH {TOKS_CTE},
{_minimal_ordered_intervals_ctes(first, second, max_gaps)}
SELECT doc_id, count(*)::BIGINT AS n_intervals,
       min(p2 - p1 + 1)::BIGINT AS min_width
FROM minimal
GROUP BY doc_id
ORDER BY doc_id
"""


def intervals_containing_sql(
    first: str, second: str, inner: str, max_gaps: int = 6
) -> str:
    """Intervals.containing / not_containing oracle (query/exec.py
    intervals_containing_indexed): per minimal ordered interval, does
    an ``inner`` occurrence fall inside [p1, p2]; per-doc counts of
    both outcomes."""
    c = inner.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
{_minimal_ordered_intervals_ctes(first, second, max_gaps)},
tagged AS (
  SELECT m.doc_id, m.p1, m.p2,
         max(CASE WHEN cp.p IS NOT NULL THEN 1 ELSE 0 END) AS has_inner
  FROM minimal m
  LEFT JOIN (SELECT doc_id, p FROM pos WHERE term = '{c}') cp
    ON m.doc_id = cp.doc_id AND cp.p >= m.p1 AND cp.p <= m.p2
  GROUP BY m.doc_id, m.p1, m.p2
)
SELECT doc_id, sum(has_inner)::BIGINT AS n_containing,
       sum(1 - has_inner)::BIGINT AS n_not_containing
FROM tagged
GROUP BY doc_id
ORDER BY doc_id
"""


def bm25_analyzed_sql(terms: list[str], k: int = 10, round_to: int = 4) -> str:
    """Analyzed-BM25 oracle (query/similarity.py bm25_topk_analyzed):
    the StopFilter + EnglishMinimalStem chain replayed in SQL —
    list_filter drops the Lucene English stop set, list_transform
    applies the stemmer CASE, dl counts SURVIVING tokens (Lucene
    norms), and the query terms pass through the same chain on the
    Python side before templating."""
    from ..functions.analyzers import (
        analyze_terms,
        stem_sql_case,
        stopword_sql_list,
    )

    q = analyze_terms(terms)
    if not q:
        return "SELECT NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE 1=0"
    return f"""
WITH {TOKS_CTE},
abase AS (
  SELECT doc_id,
         list_transform(
           list_filter(t, x -> x NOT IN {stopword_sql_list()}),
           x -> {stem_sql_case('x')}
         ) AS at
  FROM base
),
alens AS (SELECT doc_id, at, len(at) AS dl FROM abase),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM alens),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(at) AS term FROM alens)
  WHERE term IN {_terms_in(q)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def adjacency_matrix_sql(filters: dict[str, list[str]]) -> str:
    """Adjacency-matrix oracle (query/grouping.py adjacency_matrix):
    per-doc boolean flags via list_has_all, single + pair buckets
    unioned, empty buckets omitted (ES contract)."""
    names = sorted(filters)

    def _arr(terms: list[str]) -> str:
        inner = ", ".join("'" + t.replace("'", "''") + "'" for t in dict.fromkeys(terms))
        return f"[{inner}]"

    flag_cols = ", ".join(
        f"list_has_all(t, {_arr(filters[n])}) AS f{i}" for i, n in enumerate(names)
    )
    selects = []
    for i, n in enumerate(names):
        key = n.replace("'", "''")
        selects.append(
            f"SELECT '{key}' AS bucket_key, sum(CASE WHEN f{i} THEN 1 ELSE 0 END)::BIGINT AS n_docs FROM flags"
        )
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            key = f"{names[i]}&{names[j]}".replace("'", "''")
            selects.append(
                f"SELECT '{key}', sum(CASE WHEN f{i} AND f{j} THEN 1 ELSE 0 END)::BIGINT FROM flags"
            )
    u = "\nUNION ALL ".join(selects)
    return f"""
WITH {TOKS_CTE},
flags AS (SELECT doc_id, {flag_cols} FROM base),
cells AS (
{u}
)
SELECT bucket_key, n_docs FROM cells WHERE n_docs > 0 ORDER BY bucket_key
"""


def date_histogram_pipeline_sql(
    interval: str = "day", key_col: str = "event_type", quantize: int = 100
) -> str:
    """Pipeline-agg oracle (query/grouping.py date_histogram_pipeline):
    cumulative sum + derivative as window functions over the SAME
    integer quantize-units, divided back only at emission; the
    derivative's rounded emission adds +0.0::DOUBLE (signed-zero
    rule — a negative bucket-over-bucket delta can round to -0.0)."""
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    qd = f"{float(quantize)!r}::DOUBLE"
    return f"""
WITH per AS (
  SELECT {key_col} AS key,
         strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
         count(*)::BIGINT AS n_events,
         sum(CAST(round(value * {quantize}, 0) AS BIGINT)) AS q
  FROM events
  GROUP BY 1, 2
)
SELECT key, bucket, n_events,
       round(q::DOUBLE / {qd}, 4) AS sum_value,
       round((sum(q) OVER (PARTITION BY key ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE / {qd}, 4) AS cum_value,
       round((q - lag(q) OVER (PARTITION BY key ORDER BY bucket))::DOUBLE / {qd}, 4) + 0.0::DOUBLE AS derivative
FROM per
ORDER BY key, bucket
"""


_QHIST_CTE = """
per AS (
  SELECT {key_col} AS key,
         strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
         count(*)::BIGINT AS n_events,
         sum(CAST(round(value * {quantize}, 0) AS BIGINT)) AS q
  FROM events
  GROUP BY 1, 2
)"""


def _qhist(interval: str, key_col: str, quantize: int) -> str:
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    return _QHIST_CTE.format(
        key_col=key_col, interval=interval, fmt=fmt, quantize=quantize
    )


def bucket_selector_sql(
    min_sum: float,
    interval: str = "day",
    key_col: str = "event_type",
    quantize: int = 100,
) -> str:
    """Bucket-selector oracle (query/grouping.py bucket_selector): the
    survival predicate compares INTEGER quantize-units to an integer
    threshold — same exactness contract as the engine."""
    thr_i = int(round(float(min_sum) * int(quantize)))
    qd = f"{float(quantize)!r}::DOUBLE"
    return f"""
WITH {_qhist(interval, key_col, quantize)}
SELECT key, bucket, n_events, round(q::DOUBLE / {qd}, 4) AS sum_value
FROM per
WHERE q > {thr_i}
ORDER BY key, bucket
"""


def percentiles_bucket_sql(
    interval: str = "day",
    key_col: str = "event_type",
    quantize: int = 100,
    ps: tuple = (0.25, 0.5, 0.75),
) -> str:
    """Percentiles-bucket oracle (query/grouping.py percentiles_bucket):
    quantile_cont over the same integer quantize-unit bucket metrics —
    DuckDB shares Spark percentile()'s (n-1)*p interpolation, exact
    IEEE on integer inputs at exact-binary fractions; divide back once
    at emission, +0.0::DOUBLE (sums are signed in general)."""
    qd = f"{float(quantize)!r}::DOUBLE"
    cols = ", ".join(
        f"round(quantile_cont(q, {float(p)!r}) / {qd}, 4) + 0.0::DOUBLE"
        f" AS p_{int(float(p) * 100)}"
        for p in ps
    )
    return f"""
WITH {_qhist(interval, key_col, quantize)}
SELECT key, count(*)::BIGINT AS n_buckets, {cols}
FROM per
GROUP BY key
ORDER BY key
"""


def bucket_script_sql(
    pick_type: str = "click",
    interval: str = "day",
    type_col: str = "event_type",
    quantize: int = 100,
) -> str:
    """Bucket-script oracle (query/grouping.py bucket_script): the two
    per-bucket "scripts" are ratios of exact integers (a count over a
    count; the quantized value sum over count*quantize) rounded via
    _div_round4_sql — integer half-away-from-zero on both engines;
    value_per_event is signed in general and carries +0.0::DOUBLE."""
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    share = _div_round4_sql("n_picked::HUGEINT", "n_events::HUGEINT")
    vpe = _div_round4_sql("q", f"n_events::HUGEINT * {int(quantize)}")
    return f"""
WITH per AS (
  SELECT strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
         count(*)::BIGINT AS n_events,
         sum(CASE WHEN {type_col} = '{pick_type}' THEN 1 ELSE 0 END)::BIGINT
           AS n_picked,
         sum(CAST(round(value * {int(quantize)}, 0) AS BIGINT))::HUGEINT AS q
  FROM events
  GROUP BY 1
)
SELECT bucket, n_events, n_picked,
       ({share})::DOUBLE / 10000.0 AS picked_share,
       ({vpe})::DOUBLE / 10000.0 + 0.0::DOUBLE AS value_per_event
FROM per
ORDER BY bucket
"""


def bucket_sort_sql(
    size: int = 12,
    from_: int = 0,
    interval: str = "day",
    key_col: str = "event_type",
    quantize: int = 100,
) -> str:
    """Bucket-sort oracle: same total order (sum_value DESC, key,
    bucket) and the same offset/limit cut as the engine."""
    qd = f"{float(quantize)!r}::DOUBLE"
    return f"""
WITH {_qhist(interval, key_col, quantize)}
SELECT key, bucket, n_events, round(q::DOUBLE / {qd}, 4) AS sum_value
FROM per
ORDER BY sum_value DESC, key, bucket
LIMIT {int(size)} OFFSET {int(from_)}
"""


def serial_diff_sql(
    lag: int = 7,
    interval: str = "day",
    key_col: str = "event_type",
    quantize: int = 100,
) -> str:
    """Serial-diff oracle: long-units lag difference divided back at
    emission, +0.0::DOUBLE on the signed column (signed-zero rule)."""
    qd = f"{float(quantize)!r}::DOUBLE"
    return f"""
WITH {_qhist(interval, key_col, quantize)}
SELECT key, bucket,
       round(q::DOUBLE / {qd}, 4) AS sum_value,
       round((q - lag(q, {int(lag)}) OVER (PARTITION BY key ORDER BY bucket))::DOUBLE / {qd}, 4) + 0.0::DOUBLE AS diff_value
FROM per
ORDER BY key, bucket
"""


def has_parent_children_sql(
    terms: list[str],
    parent_col: str = "source",
    score_mode: str = "max",
    k_parents: int = 5,
    round_to: int = 4,
) -> str:
    """has_parent oracle (query/grouping.py has_parent_children): the
    parent-join oracle verbatim as a CTE, children joined back and
    inheriting the parent score — no new float arithmetic."""
    inner = bm25_parent_join_sql(terms, parent_col, score_mode, k_parents, round_to)
    return f"""
WITH topp AS ({inner})
SELECT d.doc_id, topp.parent, topp.score AS parent_score
FROM documents d JOIN topp ON d.{parent_col} = topp.parent
ORDER BY parent_score DESC, parent ASC, doc_id ASC
"""


def cumulative_sum_sql(
    interval: str = "day",
    key_col: str = "event_type",
    quantize: int = 100,
) -> str:
    """Cumulative-sum oracle (query/grouping.py cumulative_sum): the
    running fold accumulates integer quantize-units inside the window
    and divides back per row — exact at every prefix on both
    engines."""
    qd = f"{float(quantize)!r}::DOUBLE"
    return f"""
WITH {_qhist(interval, key_col, quantize)}
SELECT key, bucket,
       round(q::DOUBLE / {qd}, 4) AS sum_value,
       round(sum(q) OVER (
         PARTITION BY key ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::DOUBLE / {qd}, 4) AS cum_value
FROM per
ORDER BY key, bucket
"""


def boilerplate_coverage_sql(k: int = 3, min_df: int = 5) -> str:
    """Boilerplate-coverage oracle (operators/boilerplate.py
    boilerplate_coverage): k-grams via the positional parallel unnest
    + 1-based inclusive list slice; frequent set by distinct-doc
    count; covered positions as a distinct (doc, start + offset)
    union."""
    return f"""
WITH {TOKS_CTE},
occ AS (
  SELECT doc_id,
         unnest(range(len(t) - {k} + 1)) AS start,
         unnest(list_transform(range(len(t) - {k} + 1),
                               i -> array_to_string(t[i+1:i+{k}], ' '))) AS gram
  FROM base
  WHERE len(t) >= {k}
),
hot AS (
  SELECT gram
  FROM (SELECT gram, count(DISTINCT doc_id) AS gdf FROM occ GROUP BY gram)
  WHERE gdf >= {min_df}
),
cov AS (
  SELECT DISTINCT doc_id, start + unnest(range({k})) AS p
  FROM occ JOIN hot USING (gram)
),
percov AS (SELECT doc_id, count(*) AS n_covered FROM cov GROUP BY doc_id)
SELECT b.doc_id, len(b.t)::BIGINT AS n_tokens,
       coalesce(p.n_covered, 0)::BIGINT AS n_covered
FROM base b LEFT JOIN percov p USING (doc_id)
ORDER BY doc_id
"""


def percentile_ranks_sql(
    col: str = "n_chars", key_col: str = "lang", values: tuple = (100, 250, 400)
) -> str:
    """Percentile-ranks oracle (query/grouping.py percentile_ranks):
    empirical CDF as percent, each rank a ratio of exact integers via
    _div_round4_sql in HUGEINT arithmetic."""
    rank_cols = ",\n       ".join(
        f"({_div_round4_sql(f'100 * sum(CASE WHEN {col} <= {v} THEN 1 ELSE 0 END)::HUGEINT', 'count(*)::HUGEINT')})::DOUBLE / 10000.0 AS rank_{v}"
        for v in values
    )
    return f"""
SELECT {key_col} AS key, count(*)::BIGINT AS n_docs,
       {rank_cols}
FROM documents
GROUP BY 1
ORDER BY key
"""


def percentiles_agg_sql(
    col: str = "n_chars",
    key_col: str = "lang",
    ps: tuple = (0.5, 0.9, 0.99),
    round_to: int = 4,
) -> str:
    """Percentiles-agg oracle (query/grouping.py percentiles_agg):
    quantile_cont shares Spark exact-percentile's interpolation
    formula (measured bit-identical on integer inputs)."""
    cols = ", ".join(
        f"round(quantile_cont({col}, {float(p)!r}), {round_to}) AS "
        f"p_{str(p).replace('0.', '').ljust(2, '0')}"
        for p in ps
    )
    return f"""
SELECT {key_col} AS key, {cols}
FROM documents
GROUP BY 1
ORDER BY key
"""


def composite_agg_sql(
    keys: tuple = ("lang", "source"),
    after: tuple | None = None,
    size: int = 10,
) -> str:
    """Composite-agg oracle (query/grouping.py composite_agg):
    lexicographic strictly-after predicate + ordered LIMIT page."""
    where = ""
    if after is not None:
        terms = []
        for i in range(len(keys)):
            eqs = [f"{keys[j]} = '{after[j]}'" for j in range(i)]
            terms.append(
                "(" + " AND ".join(eqs + [f"{keys[i]} > '{after[i]}'"]) + ")"
            )
        where = "WHERE " + " OR ".join(terms)
    key_list = ", ".join(keys)
    return f"""
SELECT {key_list}, count(*)::BIGINT AS n_docs
FROM documents
{where}
GROUP BY {key_list}
ORDER BY {key_list}
LIMIT {size}
"""


def intervals_unordered_sql(first: str, second: str, max_gaps: int = 6) -> str:
    """Unordered-intervals oracle (query/exec.py
    intervals_unordered_indexed): the label-alternating adjacent-pair
    characterization replayed with a window lag over the positional
    parallel unnest."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
both_terms AS (
  SELECT doc_id, term, p FROM pos WHERE term IN ('{f}', '{s}')
),
adj AS (
  SELECT doc_id, term, p,
         lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev_p,
         lag(term) OVER (PARTITION BY doc_id ORDER BY p) AS prev_term
  FROM both_terms
)
SELECT doc_id, count(*)::BIGINT AS n_intervals,
       min(p - prev_p + 1)::BIGINT AS min_width
FROM adj
WHERE prev_term IS NOT NULL AND prev_term <> term
  AND p - prev_p <= {max_gaps + 1}
GROUP BY doc_id
ORDER BY doc_id
"""


def search_sort_by_field_sql(
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    field_col: str = "n_chars",
    k: int = 10,
    ascending: bool = False,
) -> str:
    """Top-k of the boolean match set ordered by a document field
    (oracle for exec.search_sort_by_field_indexed / Lucene's
    Sort+TopFieldDocs). Independent mechanism: full match set, global
    ORDER BY, LIMIT — exactly what the engine's TakeOrderedAndProject
    plan must reproduce."""
    inner = matching_docs_sql(must, should, must_not)
    d = "ASC" if ascending else "DESC"
    return f"""
WITH m AS ({inner})
SELECT m.doc_id, d.{field_col}::BIGINT AS {field_col}
FROM m JOIN documents d ON m.doc_id = d.doc_id
ORDER BY d.{field_col} {d}, m.doc_id ASC
LIMIT {int(k)}
"""


def extended_stats_sql(
    key_col: str = "event_type",
    value_col: str = "value",
    quantize: int = 100,
    round_to: int = 4,
) -> str:
    """Extended-stats oracle (query/grouping.py extended_stats): both
    moments fold as exact integers (BIGINT units -> DuckDB HUGEINT
    sums), and avg / variance are rounded in INTEGER arithmetic —
    k = (2*|N|*10^4 + D) // (2*D), truncation toward zero on both
    engines — because those ratios of exact integers land exactly on
    4dp half-boundaries with real probability, where double rounding
    diverges between the engines (see the engine docstring)."""
    q = int(quantize)
    t4 = 10 ** int(round_to)
    qf = f"{float(q)!r}::DOUBLE"
    t4f = f"{float(t4)!r}::DOUBLE"
    return f"""
WITH a AS (
  SELECT {key_col} AS key,
         count(*)::BIGINT AS n_events,
         min({value_col}) AS mn,
         max({value_col}) AS mx,
         sum(CAST(round({value_col} * {q}, 0) AS BIGINT))::HUGEINT AS s_u,
         sum(CAST(round({value_col} * {q}, 0) AS BIGINT)
             * CAST(round({value_col} * {q}, 0) AS BIGINT))::HUGEINT AS ss_u
  FROM events GROUP BY 1
),
k AS (
  SELECT key, n_events, mn, mx, s_u, ss_u,
         n_events::HUGEINT AS n_h,
         (2 * abs(s_u) * {t4} + {q} * n_events::HUGEINT)
           // (2 * {q} * n_events::HUGEINT) AS avg_k,
         (2 * (n_events::HUGEINT * ss_u - s_u * s_u) * {t4}
            + n_events::HUGEINT * n_events::HUGEINT * {q * q})
           // (2 * n_events::HUGEINT * n_events::HUGEINT * {q * q}) AS var_k
  FROM a
)
SELECT key, n_events,
       round(mn, {round_to}) AS min_val,
       round(mx, {round_to}) AS max_val,
       round(s_u::DOUBLE / {qf}, {round_to}) + 0.0::DOUBLE AS sum_value,
       (CASE WHEN s_u < 0 THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END)
         * avg_k::DOUBLE / {t4f} + 0.0::DOUBLE AS avg_value,
       round(ss_u::DOUBLE / ({qf} * {qf}), {round_to}) AS sum_sq,
       var_k::DOUBLE / {t4f} AS variance,
       round(sqrt(var_k::DOUBLE / {t4f}), {round_to}) AS std_dev
FROM k
ORDER BY key
"""


def rare_terms_sql(max_doc_count: int = 5, limit: int = 100) -> str:
    """Rare-terms oracle (query/grouping.py rare_terms): df counts
    docs (DISTINCT doc_id, term), ascending-rarity cut over the
    (df, term) total order."""
    return f"""
WITH {TOKS_CTE},
dfreq AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
  GROUP BY term
)
SELECT term, df FROM dfreq
WHERE df <= {int(max_doc_count)}
ORDER BY df ASC, term ASC
LIMIT {int(limit)}
"""


def multi_terms_sql(
    keys: tuple = ("lang", "source"), stat_col: str = "n_chars"
) -> str:
    """Multi-terms oracle (query/grouping.py multi_terms)."""
    ks = ", ".join(keys)
    return f"""
SELECT {ks},
       count(*)::BIGINT AS n_docs,
       sum({stat_col})::BIGINT AS sum_{stat_col}
FROM documents
GROUP BY {ks}
ORDER BY n_docs DESC, {ks}
"""


def token_budget_select_sql(budget: int) -> str:
    """Token-budget selection oracle (operators/selection.py
    token_budget_select): deliberately a DIFFERENT algorithm — one
    global window cumsum greedy prefix over (score desc, doc_id asc)
    — so the engine's two-phase bucketed cut is checked against the
    definition it claims to equal. Score = the quality_features
    lexical_diversity expression (rounded 4dp on both sides)."""
    return f"""
WITH {TOKS_CTE},
q AS (
  SELECT doc_id,
         CASE WHEN len(t) > 0
              THEN round(len(list_distinct(t))::BIGINT / len(t)::DOUBLE, 4)
              ELSE 0 END AS score,
         len(t)::BIGINT AS n_tokens
  FROM base
),
c AS (
  SELECT doc_id, score, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM q
)
SELECT doc_id, score, n_tokens FROM c
WHERE cum <= {int(budget)}
ORDER BY score DESC, doc_id ASC
"""


def stats_bucket_sql(
    interval: str = "day", key_col: str = "event_type", quantize: int = 100
) -> str:
    """Sibling pipeline-agg oracle (query/grouping.py stats_bucket):
    same integer quantize-units histogram (_qhist), key-level stats in
    HUGEINT, avg via _div_round4_sql (ratio of exact integers), and
    the min/max bucket labels re-derived INDEPENDENTLY as
    min(CASE WHEN q = extreme THEN bucket END) over a join — the
    engine uses min-over-struct; both scalarize ties to the
    lexicographically first bucket. Every float adds +0.0::DOUBLE."""
    qd = f"{float(quantize)!r}::DOUBLE"
    avg = _div_round4_sql("sumq", f"n_buckets::HUGEINT * {quantize}")
    return f"""
WITH {_qhist(interval, key_col, quantize)},
agg AS (
  SELECT key, count(*)::BIGINT AS n_buckets,
         min(q) AS minq, max(q) AS maxq, sum(q)::HUGEINT AS sumq
  FROM per GROUP BY key
),
lbl AS (
  SELECT per.key,
         min(CASE WHEN q = minq THEN bucket END) AS min_bucket,
         min(CASE WHEN q = maxq THEN bucket END) AS max_bucket
  FROM per JOIN agg USING (key) GROUP BY per.key
)
SELECT agg.key AS key, n_buckets,
       round(minq::DOUBLE / {qd}, 4) + 0.0::DOUBLE AS min_value,
       round(maxq::DOUBLE / {qd}, 4) + 0.0::DOUBLE AS max_value,
       ({avg})::DOUBLE / 10000.0 + 0.0::DOUBLE AS avg_value,
       round(sumq::DOUBLE / {qd}, 4) + 0.0::DOUBLE AS total_value,
       min_bucket, max_bucket
FROM agg JOIN lbl ON agg.key = lbl.key
ORDER BY key
"""


def _div_round4_sql(num: str, den: str, ten4: int = 10000) -> str:
    """DuckDB fragment mirroring grouping._div_round_expr: signed
    half-away-from-zero rounding of num/den at 4dp in HUGEINT
    arithmetic (// truncates toward zero, same as Spark's div)."""
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END) * "
        f"((2 * abs({num}) * {ten4} + ({den})) // (2 * ({den})))"
    )


def weighted_avg_sql(
    key_col: str = "event_type",
    weight_field: str = "k",
    quantize: int = 100,
    round_to: int = 4,
) -> str:
    """Weighted-avg oracle (query/grouping.py weighted_avg): HUGEINT
    numerator/denominator, quotient rounded in integer arithmetic via
    _div_round4_sql — the ratio-of-exact-integers rule; NULL on
    zero-weight keys."""
    t4 = 10 ** int(round_to)
    t4f = f"{float(t4)!r}::DOUBLE"
    return f"""
WITH a AS (
  SELECT {key_col} AS key,
         count(*)::BIGINT AS n_events,
         sum(json_extract(props, '$.{weight_field}')::BIGINT)::HUGEINT AS sw,
         sum(CAST(round(value * {quantize}, 0) AS BIGINT)
             * json_extract(props, '$.{weight_field}')::BIGINT)::HUGEINT AS num
  FROM events
  GROUP BY 1
)
SELECT key, n_events, sw::BIGINT AS sum_weight,
       CASE WHEN sw > 0
            THEN ({_div_round4_sql("num", f"{int(quantize)} * sw", t4)})::DOUBLE / {t4f}
       END AS weighted_avg
FROM a
ORDER BY key
"""


def top_metrics_sql(key_col: str = "event_type") -> str:
    """Top-metrics oracle (query/grouping.py top_metrics): latest row
    per key by (ts DESC, event_id DESC) — the oracle replays it as a
    window rank; the engine's max(struct) is the scale-safe
    equivalent. epoch_us matches unix_micros under the pinned-UTC
    session."""
    return f"""
SELECT {key_col} AS key,
       epoch_us(ts) AS ts_us,
       event_id::BIGINT AS event_id,
       round(value, 4) AS top_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY {key_col} ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY key
"""


def terms_shard_topk_sql(
    n_shards: int = 3, shard_size: int = 15, size: int = 30
) -> str:
    """Sharded-terms-agg oracle (query/grouping.py terms_shard_topk):
    replays the full ES distributed algebra — per-shard (cnt DESC,
    term) top shard_size, coordinator merge summing only RETURNED
    counts, error_upper = sum of non-returning shards' last-returned
    counts (0 for exhausted shards)."""
    return f"""
WITH {TOKS_CTE},
occ AS (
  -- distinct over (doc, term) BEFORE the shard projection: cnt must
  -- count DOCS per (shard, term), not collapse a shard to one row
  SELECT doc_id % {int(n_shards)} AS shard, term
  FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM base)
),
per AS (SELECT shard, term, count(*)::BIGINT AS cnt FROM occ GROUP BY 1, 2),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, term ASC) AS rn,
         count(*) OVER (PARTITION BY shard) AS n_terms
  FROM per
),
kept AS (SELECT * FROM ranked WHERE rn <= {int(shard_size)}),
sstat AS (
  SELECT shard,
         CASE WHEN max(n_terms) <= {int(shard_size)} THEN 0 ELSE min(cnt) END::BIGINT AS last_eff
  FROM kept GROUP BY shard
),
tot AS (SELECT sum(last_eff)::BIGINT AS te FROM sstat),
cand AS (
  SELECT term, sum(cnt)::BIGINT AS doc_count, sum(s.last_eff)::BIGINT AS covered
  FROM kept k JOIN sstat s USING (shard)
  GROUP BY term
)
SELECT term, doc_count, (tot.te - covered)::BIGINT AS error_upper
FROM cand, tot
ORDER BY doc_count DESC, term ASC
LIMIT {int(size)}
"""


def matrix_stats_sql(x_col: str = "n_chars", round_to: int = 4) -> str:
    """Matrix-stats oracle (query/grouping.py matrix_stats): exact
    HUGEINT moment sums over (x = stored column, y = token count);
    means/variances/covariance round via integer arithmetic,
    correlation's sqrt denominator is irrational so double rounding
    is safe (NULL when either field is constant)."""
    t4 = 10 ** int(round_to)
    t4f = f"{float(t4)!r}::DOUBLE"
    return f"""
WITH {TOKS_CTE},
j AS (
  SELECT d.{x_col}::HUGEINT AS x, len(b.t)::HUGEINT AS y
  FROM base b JOIN documents d ON b.doc_id = d.doc_id
),
a AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM j
),
m AS (
  SELECT n, sx, sy,
         n * sxx - sx * sx AS mx,
         n * syy - sy * sy AS my,
         n * sxy - sx * sy AS nxy
  FROM a
)
SELECT n::BIGINT AS n_docs,
       ({_div_round4_sql("sx", "n", t4)})::DOUBLE / {t4f} + 0.0::DOUBLE AS mean_x,
       ({_div_round4_sql("sy", "n", t4)})::DOUBLE / {t4f} + 0.0::DOUBLE AS mean_y,
       ({_div_round4_sql("mx", "n * n", t4)})::DOUBLE / {t4f} AS var_x,
       ({_div_round4_sql("my", "n * n", t4)})::DOUBLE / {t4f} AS var_y,
       ({_div_round4_sql("nxy", "n * n", t4)})::DOUBLE / {t4f} + 0.0::DOUBLE AS cov_xy,
       CASE WHEN mx > 0 AND my > 0
            THEN round(nxy::DOUBLE / sqrt(mx::DOUBLE * my::DOUBLE), {round_to})
                 + 0.0::DOUBLE
            ELSE NULL END AS corr_xy
FROM m
"""


def date_histogram_moving_avg_sql(
    window: int = 3,
    interval: str = "day",
    quantize: int = 100,
    round_to: int = 4,
) -> str:
    """Moving-average pipeline-agg oracle (query/grouping.py
    date_histogram_moving_avg): integer quantize-unit bucket sums,
    trailing ROWS window, integer half-up rounding of the
    sum/(quantize*cnt) ratio."""
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    q = int(quantize)
    t4 = 10 ** int(round_to)
    t4f = f"{float(t4)!r}::DOUBLE"
    return f"""
WITH per AS (
  SELECT event_type AS key,
         strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
         sum(CAST(round(value * {q}, 0) AS BIGINT)) AS q_units
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT key, bucket, q_units,
         sum(q_units) OVER (
           PARTITION BY key ORDER BY bucket
           ROWS BETWEEN {int(window) - 1} PRECEDING AND CURRENT ROW
         )::HUGEINT AS wsum,
         count(q_units) OVER (
           PARTITION BY key ORDER BY bucket
           ROWS BETWEEN {int(window) - 1} PRECEDING AND CURRENT ROW
         )::HUGEINT AS wcnt
  FROM per
)
SELECT key, bucket,
       round(q_units::DOUBLE / {float(q)!r}::DOUBLE, {round_to})
         + 0.0::DOUBLE AS sum_value,
       ({_div_round4_sql("wsum", f"{q} * wcnt", t4)})::DOUBLE / {t4f}
         + 0.0::DOUBLE AS moving_avg
FROM w
ORDER BY key, bucket
"""


def date_range_facets_sql(
    ranges: list[tuple], quantize: int = 100
) -> str:
    """Date-range-facet oracle (query/grouping.py date_range_facets):
    possibly-overlapping named [from, to) buckets as independent
    conditional sums."""
    parts = []
    for name, lo, hi in sorted(ranges, key=lambda r: r[0]):
        conds = []
        if lo is not None:
            conds.append(f"ts >= '{lo}'::TIMESTAMP")
        if hi is not None:
            conds.append(f"ts < '{hi}'::TIMESTAMP")
        cond = " AND ".join(conds) if conds else "TRUE"
        parts.append(
            f"""SELECT '{name}' AS range_name,
       sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n_events,
       round(sum(CASE WHEN {cond}
                      THEN CAST(round(value * {int(quantize)}, 0) AS BIGINT)
                      ELSE 0 END)::DOUBLE / {float(quantize)!r}::DOUBLE,
             4) AS sum_value
FROM events"""
        )
    body = "\nUNION ALL\n".join(parts)
    return f"""
SELECT * FROM (
{body}
) ORDER BY range_name
"""


def auto_date_histogram_sql(
    target_buckets: int = 1000, quantize: int = 100
) -> str:
    """Auto-date-histogram oracle (query/grouping.py
    auto_date_histogram): the interval choice is computed IN SQL
    (date_diff ladder — crossings + 1, the engine's arithmetic), so
    the oracle picks its own rung rather than baking the engine's
    in."""
    t = int(target_buckets)
    q = int(quantize)
    qsum = (
        f"round(sum(CAST(round(value * {q}, 0) AS BIGINT))::DOUBLE"
        f" / {float(q)!r}::DOUBLE, 4)"
    )
    return f"""
WITH span AS (
  SELECT date_diff('hour', min(ts), max(ts)) + 1 AS nh,
         date_diff('day', min(ts), max(ts)) + 1 AS nd
  FROM events
),
choice AS (
  SELECT CASE WHEN nh <= {t} THEN 'hour'
              WHEN nd <= {t} THEN 'day' END AS iv
  FROM span
),
h AS (
  SELECT 'hour' AS iv,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
         count(*)::BIGINT AS n_events,
         {qsum} AS sum_value
  FROM events GROUP BY 2
),
d AS (
  SELECT 'day' AS iv,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket,
         count(*)::BIGINT AS n_events,
         {qsum} AS sum_value
  FROM events GROUP BY 2
),
u AS (SELECT * FROM h UNION ALL SELECT * FROM d)
SELECT u.iv AS interval, bucket, n_events, sum_value
FROM u JOIN choice ON u.iv = choice.iv
ORDER BY bucket
"""


def snippet_topk_sql(
    terms: list[str], k: int = 10, width: int = 8, round_to: int = 4
) -> str:
    """Passage-selection oracle (query/highlight.py snippet_topk):
    bm25 top-k body, then every query-term hit anchors a width-token
    window, a per-doc self-join counts hits per window, and
    row_number picks (n_hits desc, win_start asc). The token-position
    stream is DuckDB's positional parallel-unnest zip; the snippet is
    the 1-based-inclusive list slice."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
top AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score
  FROM scored GROUP BY doc_id
  ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
  LIMIT {k}
),
ktoks AS (SELECT b.doc_id, top.score, b.t FROM base b JOIN top ON b.doc_id = top.doc_id),
hits AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS pos FROM ktoks
  ) WHERE tok IN {_terms_in(terms)}
),
counted AS (
  SELECT a.doc_id, a.pos AS win_start, count(*) AS n_hits
  FROM hits a JOIN hits o ON a.doc_id = o.doc_id
   AND o.pos >= a.pos AND o.pos < a.pos + {width}
  GROUP BY a.doc_id, a.pos
),
best AS (
  SELECT doc_id, win_start, n_hits,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY n_hits DESC, win_start ASC
         ) AS rn
  FROM counted
)
SELECT kt.doc_id, kt.score,
       b.win_start::BIGINT AS win_start,
       b.n_hits::BIGINT AS n_hits,
       array_to_string(kt.t[b.win_start + 1 : b.win_start + {width}], ' ') AS snippet
FROM best b JOIN ktoks kt ON b.doc_id = kt.doc_id
WHERE b.rn = 1
ORDER BY kt.score DESC, kt.doc_id ASC
"""


def bm25_topk_combined_fields_sql(
    terms: list[str],
    field_weights: dict[str, float] | None = None,
    k: int = 10,
    round_to: int = 4,
) -> str:
    """CombinedFieldQuery oracle (query/bm25.py
    bm25_topk_combined_fields): occurrence-level weighted union across
    fields in sorted-name order; all weighted sums are exact-binary
    doubles."""
    terms = list(dict.fromkeys(terms))
    fw = sorted((field_weights or {"text": 1.0, "source": 2.0}).items())

    def toks(col: str) -> str:
        return (
            f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'),"
            " x -> x <> '')"
        )

    dl_expr = " + ".join(
        f"{float(w)!r}::DOUBLE * len({toks(c)})" for c, w in fw
    )
    occ = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, unnest({toks(c)}) AS term, {float(w)!r}::DOUBLE AS w"
        f" FROM documents"
        for c, w in fw
    )
    return f"""
WITH dlc AS (SELECT doc_id, {dl_expr} AS dl FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dlc),
occ AS (
  {occ}
),
tfc AS (
  SELECT doc_id, term, sum(w) AS tf FROM occ
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
scored AS (
  SELECT tfc.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tfc.tf * 2.2) / (tfc.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)) AS sc
  FROM tfc JOIN dfreq USING (term)
       JOIN dlc d ON tfc.doc_id = d.doc_id
       CROSS JOIN stats s
)
SELECT doc_id, round(sum(sc), {round_to}) AS score
FROM scored
GROUP BY doc_id
ORDER BY round(sum(sc), {round_to}) DESC, doc_id ASC
LIMIT {k}
"""


def bm25_pinned_topk_sql(
    terms: list[str], pinned_ids: list[int], k: int = 10, round_to: int = 4
) -> str:
    """Pinned-query oracle (query/similarity.py bm25_pinned_topk):
    pinned ids first in list order (score 0.0 when unmatched), then
    organic (score desc, doc_id) minus the pinned."""
    terms = list(dict.fromkeys(terms))
    pinned_ids = list(dict.fromkeys(int(i) for i in pinned_ids))
    pin_rows = ", ".join(f"({d}, {p})" for p, d in enumerate(pinned_ids))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
organic AS (
  SELECT doc_id, round(sum(sc), {round_to}) AS score FROM scored GROUP BY doc_id
),
pin(doc_id, pos) AS (VALUES {pin_rows}),
alldocs AS (
  SELECT d.doc_id,
         coalesce(o.score, 0.0::DOUBLE) AS score,
         p.pos
  FROM documents d
  LEFT JOIN organic o ON d.doc_id = o.doc_id
  LEFT JOIN pin p ON d.doc_id = p.doc_id
)
SELECT doc_id, score, pos IS NOT NULL AS pinned
FROM alldocs
WHERE pos IS NOT NULL OR score > 0.0::DOUBLE
ORDER BY (pos IS NOT NULL) DESC, coalesce(pos, 2147483647) ASC,
         score DESC, doc_id ASC
LIMIT {k}
"""


def random_score_topk_sql(
    must_term: str, seed: int = 7, k: int = 10, round_to: int = 6
) -> str:
    """random_score oracle (query/similarity.py random_score_topk):
    the sample_stratified md5 uniform, replayed independently."""
    t = must_term.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
match AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  WHERE term = '{t}'
)
SELECT doc_id,
       round(
         ('0x' || substr(md5(doc_id::VARCHAR || '|' || '{seed}'), 1, 15))::BIGINT::DOUBLE
           / {float(16**15)!r},
         {round_to}) AS rscore
FROM match
ORDER BY rscore DESC, doc_id ASC
LIMIT {k}
"""


def span_containing_sql(
    first: str, second: str, inner: str, slop: int = 3
) -> str:
    """SpanContaining oracle (query/exec.py span_containing_indexed):
    distinct ordered-near big spans containing an inner occurrence."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    i = inner.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
big AS (
  SELECT a.doc_id, a.p1, b.p2
  FROM (SELECT doc_id, p AS p1 FROM pos WHERE term = '{f}') a
  JOIN (SELECT doc_id, p AS p2 FROM pos WHERE term = '{s}') b
    ON a.doc_id = b.doc_id AND b.p2 - a.p1 > 0 AND b.p2 - a.p1 <= {slop + 1}
),
containing AS (
  SELECT DISTINCT big.doc_id, big.p1, big.p2
  FROM big JOIN (SELECT doc_id, p AS pi FROM pos WHERE term = '{i}') inn
    ON big.doc_id = inn.doc_id AND inn.pi >= big.p1 AND inn.pi <= big.p2
)
SELECT doc_id, count(*)::BIGINT AS n_spans
FROM containing GROUP BY doc_id ORDER BY doc_id
"""


def span_within_sql(
    inner: str, first: str, second: str, slop: int = 3
) -> str:
    """SpanWithin oracle (query/exec.py span_within_indexed): inner
    occurrences inside an ordered-near big span."""
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    i = inner.replace("'", "''")
    return f"""
WITH {TOKS_CTE},
pos AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM base
),
big AS (
  SELECT a.doc_id, a.p1, b.p2
  FROM (SELECT doc_id, p AS p1 FROM pos WHERE term = '{f}') a
  JOIN (SELECT doc_id, p AS p2 FROM pos WHERE term = '{s}') b
    ON a.doc_id = b.doc_id AND b.p2 - a.p1 > 0 AND b.p2 - a.p1 <= {slop + 1}
),
within AS (
  SELECT DISTINCT inn.doc_id, inn.pi
  FROM (SELECT doc_id, p AS pi FROM pos WHERE term = '{i}') inn
  JOIN big ON big.doc_id = inn.doc_id
          AND inn.pi >= big.p1 AND inn.pi <= big.p2
)
SELECT doc_id, count(*)::BIGINT AS n_spans, min(pi)::BIGINT AS first_pos
FROM within GROUP BY doc_id ORDER BY doc_id
"""


def mad_agg_sql(
    key_col: str = "event_type",
    value_col: str = "value",
    quantize: int = 100,
) -> str:
    """MAD oracle (query/grouping.py mad_agg): both percentile passes
    run on exact integers (doubled quantize-units, then integer
    deviations), where quantile_cont shares Spark exact-percentile's
    (n-1)·p interpolation bit-identically; median adds +0.0 (can go
    negative), mad >= 0."""
    q2 = f"{float(2 * int(quantize))!r}::DOUBLE"
    return f"""
WITH b AS (
  SELECT {key_col} AS key,
         CAST(round({value_col} * {int(quantize)}, 0) AS BIGINT) * 2 AS d
  FROM events
),
m AS (
  SELECT key, count(*)::BIGINT AS n_events, quantile_cont(d, 0.5) AS med2
  FROM b GROUP BY 1
),
dv AS (
  SELECT b.key, CAST(abs(b.d - m.med2) AS BIGINT) AS dev2
  FROM b JOIN m USING (key)
),
md AS (SELECT key, quantile_cont(dev2, 0.5) AS mad2 FROM dv GROUP BY 1)
SELECT key, n_events,
       round(med2 / {q2}, 4) + 0.0::DOUBLE AS median,
       round(mad2 / {q2}, 4) AS mad
FROM m JOIN md USING (key)
ORDER BY key
"""


def boxplot_agg_sql(col: str = "n_chars", key_col: str = "lang") -> str:
    """Boxplot oracle (query/grouping.py boxplot_agg): quantile_cont on
    integer inputs (bit-identical interpolation), exact-binary 1.5
    fences, whiskers = nearest data values inside the fences."""
    return f"""
WITH q AS (
  SELECT {key_col} AS key, count(*)::BIGINT AS n_docs,
         quantile_cont({col}, 0.25) AS q1,
         quantile_cont({col}, 0.5)  AS q2,
         quantile_cont({col}, 0.75) AS q3
  FROM documents GROUP BY 1
),
w AS (
  SELECT d.{key_col} AS key,
         min(CASE WHEN d.{col} >= q.q1 - 1.5::DOUBLE * (q.q3 - q.q1)
                  THEN d.{col} END) AS lower_whisker,
         max(CASE WHEN d.{col} <= q.q3 + 1.5::DOUBLE * (q.q3 - q.q1)
                  THEN d.{col} END) AS upper_whisker
  FROM documents d JOIN q ON d.{key_col} = q.key
  GROUP BY 1
)
SELECT key, n_docs,
       round(q1, 4) AS q1, round(q2, 4) AS q2, round(q3, 4) AS q3,
       round(q3 - q1, 4) AS iqr,
       lower_whisker, upper_whisker
FROM q JOIN w USING (key)
ORDER BY key
"""


def terms_set_sql(
    terms: list[str], k: int = 10, msm_mod: int = 3, round_to: int = 4
) -> str:
    """CoveringQuery / terms_set oracle (query/bm25.py terms_set_topk):
    per-doc threshold 1 + (n_chars % mod); n_matched = distinct query
    terms present; score = the standard disjunctive BM25 sum rounded
    once."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_matched, sum(sc) AS raw
  FROM scored GROUP BY doc_id
),
req AS (
  SELECT doc_id, (1 + n_chars % {int(msm_mod)})::BIGINT AS required
  FROM documents
)
SELECT a.doc_id, a.n_matched, r.required, round(a.raw, {round_to}) AS score
FROM agg a JOIN req r USING (doc_id)
WHERE a.n_matched >= r.required
ORDER BY score DESC, a.doc_id ASC
LIMIT {k}
"""


def terms_lookup_sql(lookup_doc_id: int) -> str:
    """Terms-lookup oracle (query/bm25.py terms_lookup_filter):
    distinct tokens of the lookup doc joined against the corpus's
    distinct (doc_id, term) stream; integer-only output ordered by
    the unique doc_id."""
    return f"""
WITH {TOKS_CTE},
lk AS (
  SELECT DISTINCT term
  FROM (SELECT unnest(t) AS term FROM toks WHERE doc_id = {int(lookup_doc_id)})
),
dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
)
SELECT doc_id, count(*)::BIGINT AS n_matched
FROM dt JOIN lk USING (term)
GROUP BY doc_id
ORDER BY doc_id
"""


def rank_feature_sql(
    terms: list[str],
    k: int = 10,
    feature_col: str = "n_chars",
    pivot: int = 300,
    boost: float = 2.0,
    round_to: int = 4,
) -> str:
    """rank_feature saturation oracle (query/similarity.py
    rank_feature_topk): raw bm25 + boost * x/(x+pivot), rounded ONCE
    (the bm25_topk_boosting contract); the division is one IEEE op on
    exactly-representable integers, the boost literal ::DOUBLE-cast
    (bare 1.0 is DECIMAL in DuckDB and changes the arithmetic)."""
    terms = list(dict.fromkeys(terms))
    return f"""
WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n - df + 0.5) / (df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
),
agg AS (SELECT doc_id, sum(sc) AS raw FROM scored GROUP BY doc_id)
SELECT a.doc_id,
       round(a.raw + {float(boost)!r}::DOUBLE
               * (d.{feature_col}::DOUBLE / (d.{feature_col} + {int(pivot)})::DOUBLE),
             {round_to}) AS score,
       d.{feature_col}::BIGINT AS feature
FROM agg a JOIN documents d USING (doc_id)
ORDER BY score DESC, a.doc_id ASC
LIMIT {k}
"""


def distance_feature_sql(
    origin: str = "2024-01-15 00:00:00",
    pivot_hours: int = 72,
    event_type: str | None = "click",
    k: int = 20,
) -> str:
    """distance_feature(date) oracle (query/similarity.py
    distance_feature_topk): integer-micros distance, score =
    pivot/(pivot+dist) rounded via _div_round4_sql (ratio of exact
    integers — the 4dp half-boundary hazard is real here)."""
    from datetime import datetime, timezone

    origin_us = int(
        datetime.strptime(origin, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1_000_000
    )
    pivot_us = int(pivot_hours) * 3_600_000_000
    where = (
        f"WHERE event_type = '{event_type}'" if event_type is not None else ""
    )
    return f"""
WITH d AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         abs(epoch_us(ts) - {origin_us}) AS dist
  FROM events {where}
)
SELECT event_id, ts_us,
       ({_div_round4_sql(str(pivot_us), f"{pivot_us} + dist")})::DOUBLE
         / 10000.0 AS score
FROM d
ORDER BY score DESC, event_id ASC
LIMIT {k}
"""


def string_stats_sql(col: str = "source") -> str:
    """string_stats oracle (query/grouping.py string_stats): lengths
    exact; avg_length via _div_round4_sql; entropy via the
    unigram_logprob idiom (per-char log2(c/N) quantized to 1e-6 units
    SEPARATELY, integer fold, one divide back)."""
    return f"""
WITH vals AS (SELECT {col} AS v, count(*)::HUGEINT AS nv FROM documents GROUP BY 1),
lens AS (
  SELECT sum(nv) AS n, min(length(v))::BIGINT AS min_length,
         max(length(v))::BIGINT AS max_length,
         sum(nv * length(v))::HUGEINT AS sl
  FROM vals
),
ch AS (SELECT nv, unnest(string_split(v, '')) AS c0 FROM vals),
cc AS (SELECT c0, sum(nv)::HUGEINT AS c FROM ch WHERE c0 <> '' GROUP BY 1),
tot AS (SELECT sum(c)::HUGEINT AS N FROM cc),
ent AS (
  SELECT any_value(N) AS N,
         sum(c * CAST(round(round(log2(c::DOUBLE / N::DOUBLE), 6)
                            * 1000000.0) AS BIGINT)) AS s
  FROM cc CROSS JOIN tot
)
SELECT lens.n::BIGINT AS n_values, min_length, max_length,
       ({_div_round4_sql("lens.sl", "lens.n")})::DOUBLE / 10000.0 AS avg_length,
       round(-(ent.s::DOUBLE / 1000000.0 / ent.N::DOUBLE), 4) AS entropy
FROM lens CROSS JOIN ent
"""


def t_test_sql(
    key_col: str = "event_type",
    value_col: str = "value",
    group_a: str = "click",
    group_b: str = "error",
    quantize: int = 100,
) -> str:
    """Welch t_test oracle (query/grouping.py t_test): exact integer
    moments in 1/quantize units, the t statistic replayed with the
    engine's EXACT op order (every op IEEE-exact), means via
    _div_round4_sql, signed outputs + 0.0."""
    q = int(quantize)
    return f"""
WITH b AS (
  SELECT {key_col} AS k,
         CAST(round({value_col} * {q}, 0) AS BIGINT)::HUGEINT AS u
  FROM events WHERE {key_col} IN ('{group_a}', '{group_b}')
),
agg AS (
  SELECT
    sum(CASE WHEN k = '{group_a}' THEN 1 ELSE 0 END)::BIGINT AS n_a,
    sum(CASE WHEN k = '{group_b}' THEN 1 ELSE 0 END)::BIGINT AS n_b,
    sum(CASE WHEN k = '{group_a}' THEN u ELSE 0 END)::HUGEINT AS sa,
    sum(CASE WHEN k = '{group_b}' THEN u ELSE 0 END)::HUGEINT AS sb,
    sum(CASE WHEN k = '{group_a}' THEN u * u ELSE 0 END)::HUGEINT AS qa,
    sum(CASE WHEN k = '{group_b}' THEN u * u ELSE 0 END)::HUGEINT AS qb
  FROM b
)
SELECT n_a, n_b,
       ({_div_round4_sql("sa", f"n_a::HUGEINT * {q}")})::DOUBLE / 10000.0
         + 0.0::DOUBLE AS mean_a,
       ({_div_round4_sql("sb", f"n_b::HUGEINT * {q}")})::DOUBLE / 10000.0
         + 0.0::DOUBLE AS mean_b,
       round(
         (sa::DOUBLE / n_a::DOUBLE - sb::DOUBLE / n_b::DOUBLE)
         / sqrt(
             ((qa::DOUBLE - sa::DOUBLE * sa::DOUBLE / n_a::DOUBLE)
                / (n_a::DOUBLE - 1.0)) / n_a::DOUBLE
             + ((qb::DOUBLE - sb::DOUBLE * sb::DOUBLE / n_b::DOUBLE)
                / (n_b::DOUBLE - 1.0)) / n_b::DOUBLE
           ),
         4) + 0.0::DOUBLE AS t_stat
FROM agg
"""


def normalize_agg_sql(
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> str:
    """normalize pipeline-agg oracle (query/grouping.py normalize_agg):
    integer unit sums, both normalized columns via _div_round4_sql
    (ratios of exact integers), +0.0 on the signed emissions, NULL
    rescale when all buckets are equal, NULL percent when the total
    is not positive (the engine's _tot > 0 guard)."""
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    q = int(quantize)
    return f"""
WITH per AS (
  SELECT strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
         count(*) AS n_events,
         sum(CAST(round({value_col} * {q}, 0) AS BIGINT))::HUGEINT AS q
  FROM events GROUP BY 1
),
tot AS (SELECT sum(q) AS t, min(q) AS lo, max(q) AS hi FROM per)
SELECT bucket, n_events,
       round(q::DOUBLE / {q}.0, 4) AS sum_value,
       CASE WHEN t > 0 THEN
         ({_div_round4_sql("q * 100", "t")})::DOUBLE / 10000.0
           + 0.0::DOUBLE
       END AS percent_of_sum,
       CASE WHEN hi <> lo THEN
         ({_div_round4_sql("q - lo", "hi - lo")})::DOUBLE / 10000.0
           + 0.0::DOUBLE
       END AS rescale_0_1
FROM per CROSS JOIN tot
ORDER BY bucket
"""


def cumulative_cardinality_sql(
    interval: str = "day",
    id_col: str = "user_id",
) -> str:
    """cumulative_cardinality oracle (query/grouping.py
    cumulative_cardinality): same first-seen-minimum identity,
    independently expressed in SQL — all integers, so parity is
    algebraic (an id counts once, at min(bucket))."""
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[interval]
    return f"""
WITH b AS (
  SELECT strftime(date_trunc('{interval}', ts), '{fmt}') AS bucket,
         {id_col} AS id
  FROM events
),
per AS (
  SELECT bucket, count(*) AS n_events, count(DISTINCT id) AS n_unique
  FROM b GROUP BY 1
),
fs AS (SELECT id, min(bucket) AS bucket FROM b GROUP BY 1),
nw AS (SELECT bucket, count(*) AS n_new FROM fs GROUP BY 1)
SELECT per.bucket, per.n_events, per.n_unique,
       sum(coalesce(nw.n_new, 0))
         OVER (ORDER BY per.bucket ROWS UNBOUNDED PRECEDING)::BIGINT
         AS cum_unique
FROM per LEFT JOIN nw ON per.bucket = nw.bucket
ORDER BY per.bucket
"""


def linear_fusion_sql(
    terms: list[str],
    query_vec: list[float],
    n_each: int = 100,
    k: int = 10,
    w_lex: int = 2,
    w_dense: int = 1,
) -> str:
    """Linear-retriever oracle (query/rescore.py linear_fusion_topk):
    each leg min-max normalized in EXACT integer 1/10⁴ units
    (_div_round4_sql; degenerate max==min list -> 10000), INTEGER
    weights folded before the single divide-back — no float rounding
    after normalization, mirroring the engine exactly."""
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH {_bm25_topn_cte(terms, n_each, 4)},
lexu AS (
  SELECT doc_id, CAST(round(score * 10000, 0) AS BIGINT)::HUGEINT AS u
  FROM bm25
),
lexmm AS (SELECT min(u) AS lo, max(u) AS hi FROM lexu),
lexn AS (
  SELECT doc_id,
         CASE WHEN hi = lo THEN 10000
              ELSE ({_div_round4_sql("u - lo", "hi - lo")})::BIGINT END AS nu
  FROM lexu CROSS JOIN lexmm
),
qv AS (SELECT {q} AS v),
emb AS (
  SELECT vec_id AS doc_id, round({_cos_sql("embedding", "qv.v")}, 4) AS sim
  FROM embeddings, qv
  ORDER BY sim DESC, doc_id ASC
  LIMIT {n_each}
),
denu AS (
  SELECT doc_id, CAST(round(sim * 10000, 0) AS BIGINT)::HUGEINT AS u
  FROM emb
),
denmm AS (SELECT min(u) AS lo, max(u) AS hi FROM denu),
denn AS (
  SELECT doc_id,
         CASE WHEN hi = lo THEN 10000
              ELSE ({_div_round4_sql("u - lo", "hi - lo")})::BIGINT END AS nu
  FROM denu CROSS JOIN denmm
),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         coalesce(l.nu, 0) AS lu, coalesce(d.nu, 0) AS du
  FROM lexn l FULL OUTER JOIN denn d ON l.doc_id = d.doc_id
)
SELECT doc_id,
       ({int(w_lex)} * lu + {int(w_dense)} * du)::DOUBLE / 10000.0 AS score,
       lu::DOUBLE / 10000.0 AS lex_norm,
       du::DOUBLE / 10000.0 AS dense_norm
FROM fused
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def variable_width_histogram_sql(
    centroids: list[int],
    value_col: str = "value",
    quantize: int = 100,
) -> str:
    """variable_width_histogram oracle (query/grouping.py
    variable_width_histogram): replays bucket assignment from the same
    trained integer micro-unit centroid literals (the ann_ivf oracle
    strategy) — strict integer midpoint crossings, ties to the smaller
    centroid; min/max/centroid divided once from exact integers."""
    q = int(quantize)
    cent = [int(c) for c in centroids]
    crossings = " + ".join(
        f"(CASE WHEN 2 * v * 10000 > {cent[i] + cent[i + 1]} THEN 1 ELSE 0 END)"
        for i in range(len(cent) - 1)
    ) or "0"
    centroid_case = (
        "CASE bucket "
        + " ".join(f"WHEN {i} THEN {c}::DOUBLE / 1000000.0" for i, c in enumerate(cent))
        + " END"
    )
    return f"""
WITH b AS (
  SELECT CAST(round({value_col} * {q}, 0) AS BIGINT) AS v FROM events
),
a AS (SELECT v, ({crossings})::INT AS bucket FROM b)
SELECT bucket, count(*) AS n_events,
       min(v)::DOUBLE / {q}.0 AS min_value,
       max(v)::DOUBLE / {q}.0 AS max_value,
       {centroid_case} AS centroid
FROM a
GROUP BY bucket
ORDER BY bucket
"""


def complete_context_sql(prefix: str, context_lang: str, k: int = 10) -> str:
    """Context-suggester oracle (query/suggest.py complete_context):
    context-local df re-derived over the lang-filtered corpus; ascii
    tokens keep LIKE-prefix and startswith equal. The prefix is
    LIKE-escaped via _like_prefix (engine side is a literal
    startswith — '%'/'_' in the prefix must not act as wildcards)."""
    esc = _like_prefix(prefix)
    return f"""
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS term
    FROM documents
    WHERE lang = '{context_lang}'
  )
  WHERE term LIKE '{esc}' ESCAPE '\\'
)
SELECT term, count(*)::BIGINT AS df
FROM t
GROUP BY term
ORDER BY df DESC, term ASC
LIMIT {int(k)}
"""
