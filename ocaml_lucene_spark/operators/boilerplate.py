"""Boilerplate span detection and removal (the C4 / RefinedWeb
cleaning stage at k-gram granularity): a token k-gram occurring in
many DOCUMENTS is boilerplate (nav bars, cookie banners, license
headers); every token position covered by a frequent k-gram is a
boilerplate position, and removal drops exactly those positions.

Scale shape (the 100 TB lens): one k-gram document-frequency shuffle
(distinct (gram, doc) then count — map-side combine absorbs within-doc
repeats), a join of occurrences against the frequent-gram set (Zipf
head: tiny; AQE broadcasts it when it fits), then a doc-co-partitioned
position union. Nothing is ever quadratic: a gram shared by m docs
emits m join rows, not m².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col


def _positional_grams(t: Column, k: int) -> Column:
    """array<string> of k-grams; index i = 0-based start position.
    Docs shorter than k have no k-grams (explicit empty guard —
    F.sequence(0, negative) would generate a DESCENDING range)."""
    return F.when(
        F.size(t) < k, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.array_join(F.slice(t, i + 1, k), " "),
        )
    )


def _covered_positions(base: DataFrame, k: int, min_df: int) -> DataFrame:
    """(doc_id, p) distinct positions covered by any k-gram whose
    document frequency >= min_df. ``base`` carries (doc_id, t)."""
    occ = base.select(
        "doc_id",
        F.posexplode(_positional_grams(F.col("t"), k)).alias("start", "gram"),
    )
    hot = (
        occ.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("gdf"))
        .filter(F.col("gdf") >= min_df)
        .select("gram")
    )
    return (
        occ.join(hot, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (k - 1))
            ).alias("p"),
        )
        .distinct()
    )


def boilerplate_coverage(
    docs: DataFrame,
    k: int = 3,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc boilerplate statistics: (doc_id, n_tokens, n_covered)
    where n_covered counts token positions lying inside at least one
    k-gram whose document frequency (distinct docs containing it) is
    >= min_df. Every doc appears (n_covered = 0 when clean); ordered
    by doc_id (unique). The removal decision a pipeline makes
    (drop doc if n_covered/n_tokens > threshold, or strip the spans —
    ``remove_boilerplate``) derives from exactly these counts."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t")
    )
    per_cov = (
        _covered_positions(base, k, min_df)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_covered"))
    )
    return (
        base.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(per_cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_covered"), F.lit(0)).cast("long").alias(
                "n_covered"
            ),
        )
        .orderBy("doc_id")
    )


def remove_boilerplate(
    docs: DataFrame,
    k: int = 3,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The removal stage: (doc_id, clean_tokens) with every covered
    position dropped, order of surviving tokens preserved. Covered
    positions arrive as a per-doc sorted array (one co-partitioned
    collect_list after the distinct) and the filter is a JVM lambda
    over the token array — no Python, no per-position join."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t")
    )
    cov = (
        _covered_positions(base, k, min_df)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("p")).alias("cov"))
    )
    joined = base.join(cov, "doc_id", "left").withColumn(
        "cov", F.coalesce(F.col("cov"), F.array().cast("array<long>"))
    )
    clean = F.filter(
        F.transform(
            F.col("t"), lambda x, i: F.struct(x.alias("w"), i.alias("i"))
        ),
        lambda s: ~F.array_contains(F.col("cov"), s["i"].cast("long")),
    )
    return joined.select(
        "doc_id",
        F.transform(clean, lambda s: s["w"]).alias("clean_tokens"),
    ).orderBy("doc_id")
