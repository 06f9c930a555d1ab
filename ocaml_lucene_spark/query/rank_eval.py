"""Ranking evaluation (the Elasticsearch `_rank_eval` API): score a
query's ranking against a judged relevance set with the standard IR
metrics — precision@k, recall@k, MRR, DCG@k.

The judged set here is itself a deterministic query (the docs matching
a conjunctive rule), so the whole evaluation — ranking, judgments,
metrics — replays independently in the SQL oracle.

Determinism: the ranking is the engine's (score DESC, doc_id) total
order; precision/recall/MRR are RATIOS OF EXACT INTEGERS and round via
_div_round_expr (integer half-away-from-zero — the engine-wide rule for
such ratios); DCG's per-rank gains 1/log2(rank+1) quantize to integer
1e-6 units BEFORE summing (the unigram_logprob idiom — log2 over small
integers, 6dp-rounded, is cross-engine stable) and the final divide
also rounds in integer arithmetic. All metrics are non-negative — no
signed-zero exposure.

Scale shape: the expensive part IS the BM25 ranking (all its pruning
applies); everything after runs over k rows (the single-partition
window is over the top-k only) plus one conjunctive match-set
aggregate for |judged|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import bm25_topk, candidate_tf
from .grouping import _div_round_expr


def _judged_set(docs: DataFrame, must: list[str], id_col: str, text_col: str) -> DataFrame:
    """(doc_id) docs containing ALL of ``must`` — the judged-relevant
    rule (conjunctive containment; same shape as facet_counts' match
    set)."""
    must = list(dict.fromkeys(must))
    tf = candidate_tf(docs, must, id_col, text_col)
    return (
        tf.groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(must))
        .select("doc_id")
    )


def rank_eval(
    docs: DataFrame,
    terms: list[str],
    judged_must: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row: (k, n_judged, n_hits, precision_at_k, recall_at_k,
    mrr, dcg_at_k) for the disjunctive BM25 ranking of ``terms``
    against the judged set {docs containing all ``judged_must``}.

    MRR = 1/rank of the first relevant hit (0.0 when none in the top
    k); DCG@k = sum over relevant hits of 1/log2(rank+1). Ties and
    cuts follow the engine-wide (score DESC, doc_id) total order, so
    rank assignments are exactly reproducible."""
    # round_to=4 is the engine-wide round-BEFORE-ranking contract: the
    # oracle's cut and rank assignment order by the ROUNDED score, so
    # an unrounded engine ranking could break near-ties differently
    ranked = bm25_topk(docs, terms, "or", k=k, round_to=4)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    # the window is over the k result rows only — single partition by
    # construction and bounded by k, never a data-volume sort
    ranked = ranked.select("doc_id", F.row_number().over(w).alias("rank"))
    judged = _judged_set(docs, judged_must, id_col, text_col)
    n_judged = judged.agg(F.count("*").cast("long").alias("n_judged"))
    flagged = ranked.join(
        judged.withColumn("_rel", F.lit(1)), "doc_id", "left"
    ).select("rank", F.coalesce(F.col("_rel"), F.lit(0)).alias("rel"))
    gain_q = F.round(
        F.round(F.lit(1.0) / F.log2(F.col("rank") + 1), 6) * F.lit(1000000.0)
    ).cast("long")
    agg = flagged.agg(
        F.sum("rel").cast("long").alias("_nh"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("_mr"),
        F.sum(F.when(F.col("rel") == 1, gain_q).otherwise(F.lit(0).cast("long"))).alias(
            "_s"
        ),
    )
    ten4f = F.lit(10000.0)
    return (
        agg.crossJoin(F.broadcast(n_judged))
        .select(
            F.lit(int(k)).cast("long").alias("k"),
            "n_judged",
            F.col("_nh").alias("n_hits"),
            (
                F.expr(_div_round_expr("_nh", str(int(k)))).cast("double") / ten4f
            ).alias("precision_at_k"),
            F.when(
                F.col("n_judged") > 0,
                F.expr(_div_round_expr("_nh", "n_judged")).cast("double") / ten4f,
            ).alias("recall_at_k"),
            F.when(
                F.col("_nh") > 0,
                F.expr(_div_round_expr("1", "_mr")).cast("double") / ten4f,
            )
            .otherwise(F.lit(0.0))
            .alias("mrr"),
            (
                F.expr(_div_round_expr("_s", "1000000")).cast("double") / ten4f
            ).alias("dcg_at_k"),
        )
    )
