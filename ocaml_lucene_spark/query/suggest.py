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
