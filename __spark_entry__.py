"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship BM25 disjunctive top-k over sf0.001 documents.
queries(): one callable per implemented operator (SURVEY.md §2).
oracle_sql(): DuckDB-equivalent SQL per query key.

Column names are aliased identically on both sides; float scores are
rounded to 4 decimals on both sides before the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ocaml_lucene_spark.query.bm25 import bm25_topk

    docs = _docs(spark, "/root/testdata/sf0.001")
    return bm25_topk(docs, ["spark", "query", "dup"], mode="or", k=10, round_to=4)


# --------------------------------------------------------------------
# query registry: each entry returns a DataFrame given (spark, sf_dir)
# --------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocaml_lucene_spark.query import bm25

    def q_bm25_or(spark, sf):
        return bm25.bm25_topk(_docs(spark, sf), ["spark", "query", "dup"], "or", 10, round_to=4)

    def q_bm25_and(spark, sf):
        return bm25.bm25_topk(_docs(spark, sf), ["join", "hash", "scan"], "and", 10, round_to=4)

    def q_bm25_single_rare(spark, sf):
        return bm25.bm25_topk(_docs(spark, sf), ["dup"], "or", 100, round_to=4)

    def q_bm25_or_with_absent(spark, sf):
        return bm25.bm25_topk(_docs(spark, sf), ["spark", "zzzabsent"], "or", 10, round_to=4)

    def q_bm25_and_absent_empty(spark, sf):
        return bm25.bm25_topk(_docs(spark, sf), ["spark", "zzzabsent"], "and", 10, round_to=4)

    def q_term_postings(spark, sf):
        return bm25.term_postings(_docs(spark, sf), "dup")

    def q_term_stats(spark, sf):
        return bm25.term_stats(_docs(spark, sf))

    def q_corpus_stats(spark, sf):
        return bm25.corpus_stats(_docs(spark, sf)).select(
            "n_docs", F.round("avgdl", 6).alias("avgdl")
        )

    def q_doc_lengths(spark, sf):
        from ocaml_lucene_spark.functions.analysis import doc_lengths

        return doc_lengths(_docs(spark, sf))

    def q_phrase_counts(spark, sf):
        return bm25.phrase_counts(_docs(spark, sf), "table", "hash")

    return {
        "bm25_or_top10": q_bm25_or,
        "bm25_and_top10": q_bm25_and,
        "bm25_single_rare": q_bm25_single_rare,
        "bm25_or_with_absent": q_bm25_or_with_absent,
        "bm25_and_absent_empty": q_bm25_and_absent_empty,
        "term_postings": q_term_postings,
        "term_stats": q_term_stats,
        "corpus_stats": q_corpus_stats,
        "doc_lengths": q_doc_lengths,
        "phrase_counts": q_phrase_counts,
    }


def oracle_sql() -> dict[str, str]:
    from ocaml_lucene_spark.query import oracle_sql as osql

    return {
        "bm25_or_top10": osql.bm25_topk_sql(["spark", "query", "dup"], "or", 10),
        "bm25_and_top10": osql.bm25_topk_sql(["join", "hash", "scan"], "and", 10),
        "bm25_single_rare": osql.bm25_topk_sql(["dup"], "or", 100),
        "bm25_or_with_absent": osql.bm25_topk_sql(["spark", "zzzabsent"], "or", 10),
        "bm25_and_absent_empty": osql.bm25_topk_sql(["spark", "zzzabsent"], "and", 10),
        "term_postings": osql.term_postings_sql("dup"),
        "term_stats": osql.term_stats_sql(),
        "corpus_stats": osql.corpus_stats_sql(),
        "doc_lengths": osql.doc_lengths_sql(),
        "phrase_counts": osql.phrase_counts_sql("table", "hash"),
    }
