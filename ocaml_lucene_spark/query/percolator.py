"""Percolator: reverse search (Lucene's percolator / monitor module).

Instead of a query finding documents, REGISTERED queries find each
arriving document — the primitive behind alerting, ingest routing,
and training-data filtering rules ("tag every crawled page matching
any of these 10k topic queries").

Data model: a queries table (query_id, terms array, min_match) where
min_match expresses the boolean semantics — len(terms) = AND, 1 = OR,
n = minimum-should-match.

Spark-first shape: the registered query set is broadcast (it is the
small side by construction — thousands of rules vs billions of
docs); each doc's DISTINCT token set joins the broadcast term->query
map, one groupBy((doc, query)) counts distinct matched terms, and a
filter keeps pairs meeting min_match. Cost per doc is proportional to
its distinct terms that appear in ANY rule — the isin-style semi-join
dies map-side for everything else, and no shuffle carries raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import _tokenized


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, query_id) for every registered query a doc satisfies,
    ordered (doc_id, query_id). ``queries`` columns: query_id (long),
    terms (array<string>), min_match (int) — min_match > size(terms)
    can never match (same as Lucene's BooleanQuery contract)."""
    doc_terms = (
        _tokenized(docs, id_col, text_col)
        .select("doc_id", F.explode(F.array_distinct("toks")).alias("term"))
    )
    rule_terms = queries.select(
        "query_id", "min_match", F.explode(F.array_distinct("terms")).alias("term")
    )
    hits = doc_terms.join(F.broadcast(rule_terms), "term")
    return (
        hits.groupBy("doc_id", "query_id", "min_match")
        .agg(F.count("*").alias("n_hit"))  # terms are distinct per side
        .filter(F.col("n_hit") >= F.col("min_match"))
        .select("doc_id", "query_id")
        .orderBy("doc_id", "query_id")
    )
