"""Passage selection: the UnifiedHighlighter surface above raw
offsets (query/exec.highlight_topk emits per-occurrence positions;
this picks the best snippet window per result doc).

Lucene's UnifiedHighlighter scores candidate passages by query-term
density and emits the best one; re-expressed Spark-first:

1. BM25 top-k (the standard logical plan, k rows);
2. ONLY those k docs tokenize (broadcast semi-join before the
   posexplode — at 100 TB the tokenize pass touches k documents, not
   the corpus);
3. every query-term hit anchors a candidate window of ``width``
   tokens; a per-doc self-join counts hits inside each candidate
   (per-doc hit counts are tiny, so the join is executor-local after
   the doc_id shuffle);
4. one window per doc survives: (n_hits desc, win_start asc) — a
   deterministic total order per doc.

The snippet is TOKEN-level (the window's tokens space-joined): char
faithfulness belongs to the offsets surface (highlight_topk); token
snippets keep the whole operator exactly reproducible in SQL (the
parallel-unnest zip), with integer window math and the already-pinned
BM25 score parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col
from ..session import ensure_compute_parallelism
from .bm25 import bm25_topk


def snippet_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, score, win_start, n_hits, snippet) — BM25 top-k with
    each doc's best ``width``-token window (most query-term hits,
    earliest window on ties; win_start is the 0-based token
    position). Ordered (score desc, doc_id asc)."""
    terms = list(dict.fromkeys(terms))
    top = bm25_topk(docs, terms, "or", k=k, round_to=round_to)
    toks = ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    )
    kdocs = toks.join(F.broadcast(top), "doc_id")
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = kdocs.select(
        "doc_id",
        "score",
        "toks",
        F.posexplode("toks").alias("pos", "tok"),
    ).filter(F.array_contains(term_arr, F.col("tok")))
    anchors = hits.select("doc_id", "score", "toks", F.col("pos").alias("win_start"))
    others = hits.select("doc_id", F.col("pos").alias("hit_pos"))
    counted = (
        anchors.join(others, "doc_id")
        .filter(
            (F.col("hit_pos") >= F.col("win_start"))
            & (F.col("hit_pos") < F.col("win_start") + width)
        )
        .groupBy("doc_id", "score", "toks", "win_start")
        .agg(F.count("*").alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_hits"), F.asc("win_start")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "score",
            F.col("win_start").cast("long").alias("win_start"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.array_join(
                F.slice(F.col("toks"), F.col("win_start") + 1, width), " "
            ).alias("snippet"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
