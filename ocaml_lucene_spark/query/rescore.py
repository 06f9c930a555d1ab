"""Two-stage retrieval: rescoring and hybrid rank fusion.

The retrieve-then-rerank shape every modern search / LLM-data
pipeline uses, and Lucene's own QueryRescorer contract: a cheap
first pass produces a small candidate set; only those candidates pay
the expensive second scorer.

- rescore_topk: BM25 top-N candidates re-scored by
  alpha * bm25 + beta * cosine(query_vec, embedding) — lexical
  retrieval refined by a dense signal (the bridge between this
  engine's full-text and ANN halves).
- rrf_fusion_topk: reciprocal rank fusion (Cormack et al., the
  standard hybrid-search combiner): each doc scores
  sum_i 1/(rrf_k + rank_i) over the lexical and dense rankings;
  rank-based, so no score-scale calibration is needed.

Scale shape: the candidate set (N ≈ 100) is driver-tiny, so Spark
broadcasts it against the embeddings table — the dense pass costs a
pruned scan + broadcast join proportional to the candidates, never a
full-corpus score. Determinism: both stages round before combining
(rounded inputs + exact-binary weights → bit-identical combination on
both sides), ranks tie-break on doc_id, and the fused output orders
(score desc, doc_id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.ann import cosine_col
from .bm25 import bm25_topk


def _cosine_frame(
    vecs: DataFrame, query_vec: list[float], round_to: int, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # + 0.0 normalizes signed zero: a cosine of ~ -3e-5 rounds to -0.0
    # in DuckDB but +0.0 in Spark, and the driver's value hash is
    # repr-sensitive. Same convention as bigram pmi; mirrored in
    # oracle_sql.rescore_topk_sql.
    return vecs.select(
        F.col(id_col).alias("doc_id"),
        (F.round(cosine_col(F.col(vec_col), q), round_to) + F.lit(0.0)).alias("sim"),
    )


def rescore_topk(
    docs: DataFrame,
    vecs: DataFrame,
    terms: list[str],
    query_vec: list[float],
    n_first: int = 100,
    k: int = 10,
    alpha: float = 1.0,
    beta: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """QueryRescorer: BM25 top-``n_first`` (deterministic cut on
    (score desc, doc_id)), then combined = alpha*bm25 + beta*cosine
    over ONLY those candidates; docs without an embedding keep
    sim = 0 (combined falls back to the scaled first-pass score).
    Returns (doc_id, score, bm25, sim) ordered (score desc, doc_id).
    Use exact-binary alpha/beta (1.0, 0.5, 0.25 ...) so the combine is
    bit-identical to the SQL oracle."""
    first = bm25_topk(docs, terms, "or", k=n_first, round_to=round_to)
    # Semi-join the embeddings scan down to the candidate ids FIRST:
    # the candidate list (<= n_first rows) broadcasts, so the cosine is
    # computed for AT MOST n_first vectors — never the full corpus (a
    # left-outer join of candidates against a full cosine frame cannot
    # broadcast its preserved side, so without this the dense stage
    # would degrade to a full embeddings scan + shuffle at scale).
    cand_ids = first.select(F.col("doc_id").alias("vec_id"))
    vec_cand = vecs.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    emb = _cosine_frame(vec_cand, query_vec, round_to)
    joined = first.join(emb, "doc_id", "left").withColumn(
        "sim", F.coalesce(F.col("sim"), F.lit(0.0))
    )
    return (
        joined.select(
            "doc_id",
            # + 0.0: combined = alpha*bm25 + beta*sim can round to -0.0
            # when a weak lexical match meets a negative cosine
            (
                F.round(alpha * F.col("score") + beta * F.col("sim"), round_to)
                + F.lit(0.0)
            ).alias("combined"),
            F.col("score").alias("bm25"),
            "sim",
        )
        .withColumnRenamed("combined", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _rrf_combine(
    lex_scores: DataFrame,
    dense_sims: DataFrame,
    k: int,
    rrf_k: int,
    round_to: int,
) -> DataFrame:
    """Fuse a (doc_id, score) lexical frame with a (doc_id, sim) dense
    frame by reciprocal rank: rank 1-based within each list ordered
    (metric desc, doc_id asc), absent docs contribute 0. Shared by the
    brute-force and the indexed (IVF) fusion paths so the combine
    semantics cannot drift between them."""
    lex = lex_scores.withColumn(
        "bm25_rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
    ).select("doc_id", "bm25_rank")
    dense = dense_sims.withColumn(
        "sim_rank",
        F.row_number().over(Window.orderBy(F.desc("sim"), F.asc("doc_id"))),
    ).select("doc_id", "sim_rank")
    fused = lex.join(dense, "doc_id", "full").select(
        "doc_id",
        F.coalesce(F.col("bm25_rank"), F.lit(0)).alias("bm25_rank"),
        F.coalesce(F.col("sim_rank"), F.lit(0)).alias("sim_rank"),
    )
    contrib = (
        F.when(F.col("bm25_rank") > 0, F.lit(1.0) / (F.lit(rrf_k) + F.col("bm25_rank"))).otherwise(F.lit(0.0))
        + F.when(F.col("sim_rank") > 0, F.lit(1.0) / (F.lit(rrf_k) + F.col("sim_rank"))).otherwise(F.lit(0.0))
    )
    return (
        fused.select(
            "doc_id",
            F.round(contrib, round_to).alias("score"),
            "bm25_rank",
            "sim_rank",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fusion_topk(
    docs: DataFrame,
    vecs: DataFrame,
    terms: list[str],
    query_vec: list[float],
    n_each: int = 100,
    k: int = 10,
    rrf_k: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal rank fusion of the lexical (BM25) and dense (cosine)
    rankings: score(d) = sum over rankings of 1/(rrf_k + rank_d), with
    rank 1-based within each top-``n_each`` list and absent docs
    contributing 0. Returns (doc_id, score, bm25_rank, sim_rank) with
    absent ranks as 0 (integer-only rank columns keep the hash clean).

    The dense leg here is the EXACT full-corpus ranking (operators/ann
    brute_force_topk) — the correct oracle baseline, but a full scan
    per query; ``rrf_fusion_topk_indexed`` is the scale path."""
    lex = bm25_topk(docs, terms, "or", k=n_each, round_to=4)
    from ..operators.ann import brute_force_topk

    dense = brute_force_topk(vecs, query_vec, k=n_each).withColumnRenamed(
        "vec_id", "doc_id"
    )
    return _rrf_combine(lex, dense, k=k, rrf_k=rrf_k, round_to=round_to)


def rrf_fusion_topk_indexed(
    docs: DataFrame,
    spark,
    ivf_index_dir: str,
    centroids: list[list[float]],
    terms: list[str],
    query_vec: list[float],
    n_each: int = 100,
    k: int = 10,
    rrf_k: int = 60,
    round_to: int = 6,
    n_probe: int = 2,
) -> DataFrame:
    """Hybrid fusion over the persisted IVF layout — the 100-TB path:
    the dense leg probes only the ``n_probe`` nearest coarse-quantizer
    cells of the cell-partitioned parquet index (Catalyst partition
    pruning; see operators/ann.ivf_topk_indexed), never the full
    embeddings table. Same (doc_id, score, bm25_rank, sim_rank)
    contract as ``rrf_fusion_topk`` via the shared ``_rrf_combine``;
    the dense ranking is the IVF probe's — its recall/ranking
    semantics (not brute force's) are what the oracle mirrors, exactly
    as ann_ivf_indexed does."""
    from ..operators.ann import ivf_topk_indexed

    lex = bm25_topk(docs, terms, "or", k=n_each, round_to=4)
    dense = ivf_topk_indexed(
        spark, ivf_index_dir, query_vec, centroids, k=n_each, n_probe=n_probe
    ).withColumnRenamed("vec_id", "doc_id")
    return _rrf_combine(lex, dense, k=k, rrf_k=rrf_k, round_to=round_to)


def _minmax_units(scores: DataFrame, metric: str) -> DataFrame:
    """Min-max normalize a (doc_id, <metric>) retrieved list into EXACT
    integer 1/10⁴ units: units = round-half-away((m - min) / (max - min)
    at 4dp) computed entirely in integer arithmetic over the list's
    4dp-rounded metric (m*10⁴ snaps to an exact long — the metric is
    already rounded at 4dp). Degenerate lists (max == min, e.g. a
    single candidate) normalize to 10000 (= 1.0: every doc is equally
    the best — documented contract, mirrored in the oracle). The
    min/max frame is one row, broadcast."""
    from .grouping import _div_round_expr

    u = scores.select(
        "doc_id",
        F.round(F.col(metric) * 10000, 0).cast("long").cast("decimal(38,0)").alias("_u"),
    )
    mm = u.agg(F.min("_u").alias("_lo"), F.max("_u").alias("_hi"))
    return u.crossJoin(F.broadcast(mm)).select(
        "doc_id",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(10000).cast("long"))
        .otherwise(F.expr(_div_round_expr("_u - _lo", "_hi - _lo")).cast("long"))
        .alias("_norm_u"),
    )


def linear_fusion_topk(
    docs: DataFrame,
    vecs: DataFrame,
    terms: list[str],
    query_vec: list[float],
    n_each: int = 100,
    k: int = 10,
    w_lex: int = 2,
    w_dense: int = 1,
) -> DataFrame:
    """Linear hybrid retriever (the Elasticsearch `linear` retriever
    with `minmax` normalizers): each leg's top-``n_each`` scores are
    min-max normalized WITHIN the retrieved list, then combined as
    score = w_lex * norm_lex + w_dense * norm_dense, docs absent from
    a list contributing 0 for it. Returns
    (doc_id, score, lex_norm, dense_norm) ordered (score desc, doc_id)
    limit k.

    Determinism: weights are INTEGERS and normalization emits integer
    1/10⁴ units (_minmax_units), so the combined score is a pure
    integer fold divided back ONCE at emission — there is no float
    rounding after normalization at all. A double combine of 4dp
    norms with weight 0.5 would sit exactly on 4dp half-boundaries
    (the bm25_topk_boosting hazard); integer weights make the hazard
    unconstructible. All emitted values are >= 0 (no signed-zero
    exposure).

    Scale shape: both legs are top-n_each lists (driver-tiny); the
    min/max frames broadcast; the fusion join touches <= 2*n_each
    rows. The dense leg is brute-force by contract here (the exact
    oracle baseline) — a production deployment swaps in
    ivf_topk_indexed exactly as rrf_fusion_topk_indexed does."""
    if w_lex <= 0 or w_dense <= 0 or w_lex != int(w_lex) or w_dense != int(w_dense):
        raise ValueError("linear_fusion weights must be positive integers")
    from ..operators.ann import brute_force_topk

    lex = bm25_topk(docs, terms, "or", k=n_each, round_to=4)
    dense = brute_force_topk(vecs, query_vec, k=n_each).withColumnRenamed(
        "vec_id", "doc_id"
    )
    lex_n = _minmax_units(lex, "score").withColumnRenamed("_norm_u", "_lex_u")
    dense_n = _minmax_units(dense, "sim").withColumnRenamed("_norm_u", "_dense_u")
    fused = lex_n.join(dense_n, "doc_id", "full").select(
        "doc_id",
        F.coalesce(F.col("_lex_u"), F.lit(0)).alias("_lex_u"),
        F.coalesce(F.col("_dense_u"), F.lit(0)).alias("_dense_u"),
    )
    comb = F.lit(int(w_lex)) * F.col("_lex_u") + F.lit(int(w_dense)) * F.col("_dense_u")
    return (
        fused.select(
            "doc_id",
            (comb.cast("double") / F.lit(10000.0)).alias("score"),
            (F.col("_lex_u").cast("double") / F.lit(10000.0)).alias("lex_norm"),
            (F.col("_dense_u").cast("double") / F.lit(10000.0)).alias("dense_norm"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
