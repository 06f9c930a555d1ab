"""Spell suggestion ("did you mean") over the term dictionary.

Lucene's suggest/spellchecker module (DirectSpellChecker) proposes
corrections for a query term by walking the live term dictionary
under a Levenshtein automaton and ranking candidates by document
frequency — exactly the machinery this repo already has: the
in-memory minimal FST (fst/transducer.py) intersected with the lazy
DP-row Levenshtein DFS (Fst.levenshtein_items), the same expansion
FuzzyQuery uses (query/term_index.py fuzzy_stats_mem, which the
automaton-vs-exhaustive equality test in tests/test_fst.py pins).

Zero Spark jobs for the expansion: the dictionary is the segment's
FST, resident on the driver (the reference's whole term dictionary
is likewise a driver-side structure, terms_enumerator.ml). On a
cluster the FST ships in the broadcast term index; suggestion is a
metadata-sized lookup, never a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .term_index import fuzzy_stats_mem


def spell_suggest(
    spark: SparkSession,
    index_dir: str,
    term: str,
    max_edits: int = 2,
    k: int = 10,
) -> DataFrame:
    """Top-k correction candidates for ``term``: dictionary terms
    within ``max_edits`` Levenshtein edits, ranked by
    (df desc, term asc) — higher document frequency = more likely
    intended spelling, DirectSpellChecker's default comparator.

    Returns (term, df) rows. The SQL oracle recomputes the expansion
    independently with DuckDB's levenshtein() over the
    tokenize-and-aggregate df table, checking the automaton∩FST walk
    end to end."""
    stats = fuzzy_stats_mem(index_dir, term, max_edits)
    rows = sorted(
        ((t, int(df)) for t, (df, _ttf) in stats.items()),
        key=lambda r: (-r[1], r[0]),
    )[:k]
    return spark.createDataFrame(rows, "term string, df long")


def complete_prefix(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """Completion suggester (Lucene suggest module's Analyzing/
    FSTCompletion shape): top-k dictionary terms extending ``prefix``,
    ranked (df desc, term asc) — the popularity-weighted autocomplete
    ordering. The candidate walk is the FST prefix-subtree enumeration
    PrefixQuery already uses (zero Spark jobs); only the ranking
    differs (popularity, not score expansion)."""
    from .term_index import prefix_stats_mem

    stats = prefix_stats_mem(index_dir, prefix)
    rows = sorted(
        ((t, int(df)) for t, (df, _ttf) in stats.items()),
        key=lambda r: (-r[1], r[0]),
    )[:k]
    return spark.createDataFrame(rows, "term string, df long")


def complete_fuzzy(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    max_edits: int = 1,
    k: int = 10,
) -> DataFrame:
    """Typo-tolerant completion suggester (Lucene suggest's
    FuzzyCompletionQuery): top-k dictionary terms some prefix of which
    is within ``max_edits`` Levenshtein edits of the typed ``prefix``,
    ranked (df desc, term asc) like complete_prefix — autocomplete
    that survives a typo in the already-typed characters. The
    candidate walk is the subtree-emitting Levenshtein-automaton∩FST
    DFS (fst/transducer.fuzzy_prefix_items; zero Spark jobs), with an
    exhaustive DP-scan reference equality-tested in tests/test_fst.py.
    The SQL oracle re-derives acceptance independently as
    min over non-empty prefixes p of levenshtein(p, prefix) — use a
    ``prefix`` longer than ``max_edits`` so the empty prefix can never
    qualify on the engine side (the oracle only enumerates non-empty
    prefixes)."""
    from .term_index import fuzzy_prefix_stats_mem

    stats = fuzzy_prefix_stats_mem(index_dir, prefix, max_edits)
    rows = sorted(
        ((t, int(df)) for t, (df, _ttf) in stats.items()),
        key=lambda r: (-r[1], r[0]),
    )[:k]
    return spark.createDataFrame(rows, "term string, df long")


def phrase_suggest(
    spark: SparkSession,
    index_dir: str,
    docs,
    first: str,
    second: str,
    max_edits: int = 2,
    k: int = 5,
) -> "DataFrame":
    """PhraseSuggester (Lucene's suggest.phrase / the did-you-mean for
    a multi-word query): per-word correction candidates come from the
    same Levenshtein-automaton∩FST dictionary walk as spell_suggest
    (zero Spark jobs; a correctly-spelled word is its own candidate),
    and candidate PAIRS are ranked by the corpus's adjacent-bigram
    count — the collocation evidence that separates a plausible phrase
    from two independently-plausible words. Returns (w1, w2, n_bigram)
    top-k ordered (n_bigram desc, w1, w2) — a total order, (w1, w2)
    unique.

    Plan: the candidate sets are dictionary-tiny literal lists, so the
    bigram pass is ONE arrays_zip shift over the corpus (the
    bigram_collocations shape) with the pair filter applied BEFORE the
    groupBy — only candidate-pair occurrences ever reach the
    shuffle."""
    from pyspark.sql import functions as F

    from .term_index import fuzzy_stats_mem

    cand1 = sorted(fuzzy_stats_mem(index_dir, first, max_edits))
    cand2 = sorted(fuzzy_stats_mem(index_dir, second, max_edits))
    if not cand1 or not cand2:
        return spark.createDataFrame([], "w1 string, w2 string, n_bigram long")
    from ..functions.analysis import tokens_col

    toks = docs.select(tokens_col("text").alias("t"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))).alias("w1"),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    return (
        pairs.filter(F.col("w1").isin(cand1) & F.col("w2").isin(cand2))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_bigram"))
        .orderBy(F.desc("n_bigram"), "w1", "w2")
        .limit(k)
    )


def complete_context(
    docs,
    prefix: str,
    context_lang: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
):
    """Context suggester (ES completion `contexts` / Lucene
    ContextSuggestField): completion candidates restricted to a
    CONTEXT — here the language category — ranked by the
    CONTEXT-LOCAL document frequency (df desc, term asc), the
    popularity ordering complete_prefix uses but scoped to the
    context. Context-local popularity lives in the data, not the
    global dictionary FST, so unlike the zero-job completions this is
    one Spark pass: lang predicate pushed to the parquet scan, one
    distinct (doc, term) projection, prefix filter, one groupBy,
    TakeOrdered k. Returns (term, df).

    Determinism: integer dfs, (df DESC, term ASC) total order."""
    from pyspark.sql import functions as F

    from ..functions.analysis import tokens_col

    toks = (
        docs.filter(F.col(lang_col) == context_lang)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokens_col(text_col))).alias("term"),
        )
        .filter(F.col("term").startswith(prefix))
    )
    return (
        toks.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
