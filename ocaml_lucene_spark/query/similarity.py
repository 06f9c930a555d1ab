"""Pluggable similarities beyond the canonical BM25.

Lucene's Similarity is an extension point (TFIDFSimilarity/
ClassicSimilarity predate BM25Similarity as the default); the
reference engine has no scoring at all (its surface stops at
terms_enumerator.ml), so the repo's canonical BM25 (oracle.py) is
already an extension — this module adds the two other scoring
surfaces a Lucene user actually reaches for:

- ClassicSimilarity (pre-6.0 default): per term-doc
  ``sqrt(tf) * idf^2 / sqrt(dl)`` with ``idf = 1 + ln(N/(df+1))``,
  times the coord factor ``n_matched_terms / n_query_terms``.
  queryNorm is omitted: it is a per-query constant (rank-neutral),
  and Lucene itself removed it in 7.0.
- Per-term query boosts on BM25 (Lucene's BoostQuery wrapping
  TermQuery): ``boost * idf * tfn`` summed per doc.

Both reuse the engine-wide determinism contract: per-doc sums fold in
query-term order (bm25.py _query_order_sum) so Spark's float totals
are bit-identical to the SQL oracle's left-to-right sums, and ranking
ties break on (rounded score desc, doc_id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import _query_order_sum, candidate_tf, corpus_stats, idf_expr, tfn_expr


def tfidf_classic_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Disjunctive top-k under ClassicSimilarity. Same physical shape
    as bm25_topk (explode under isin filter, broadcast df/stats, one
    groupBy(doc_id), TakeOrderedAndProject) — only the score
    expression differs, which is the whole point of a pluggable
    similarity."""
    terms = list(dict.fromkeys(terms))
    tf = candidate_tf(docs, terms, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, id_col, text_col)
    idf = F.lit(1.0) + F.log(
        F.col("n_docs").cast("double") / (F.col("df").cast("double") + 1.0)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            F.sqrt(F.col("tf").cast("double"))
            * idf
            * idf
            / F.sqrt(F.col("dl").cast("double")),
        )
    )
    coord = F.count("*").cast("double") / F.lit(float(len(terms)))
    agg = scored.groupBy("doc_id").agg(
        _query_order_sum(terms).alias("raw"), coord.alias("coord")
    )
    return (
        agg.select(
            "doc_id",
            F.round(F.col("raw") * F.col("coord"), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_boosted(
    docs: DataFrame,
    boosts: dict[str, float],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Disjunctive BM25 top-k with a per-term query boost
    (BoostQuery): score(d) = sum_t boost[t] * idf(t) * tfn(t, d),
    folded in query-term order. boosts preserves insertion order —
    that order IS the fold order, mirroring the oracle's term list."""
    agg = boosted_doc_scores(docs, boosts, id_col, text_col, round_to)
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def boosted_doc_scores(
    docs: DataFrame,
    boosts: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, score) for every doc matching ANY boosted term — the
    bm25_topk_boosted scoring without the top-k cut, so callers
    (QueryParser execution) can apply filter clauses BEFORE limiting."""
    terms = list(dict.fromkeys(boosts))
    tf = candidate_tf(docs, terms, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, id_col, text_col)
    # the ONE canonical BM25 idf (bm25.idf_expr) — never inline a copy
    idf = idf_expr(F.col("n_docs").cast("double"), F.col("df").cast("double"))
    boost = F.create_map(
        *[x for t, b in boosts.items() for x in (F.lit(t), F.lit(float(b)))]
    )[F.col("term")]
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            boost
            * idf
            * tfn_expr(
                F.col("tf").cast("double"), F.col("dl").cast("double"), F.col("avgdl")
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(_query_order_sum(terms).alias("raw"))
    return agg.select("doc_id", F.round("raw", round_to).alias("score"))


def bm25_function_score_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    decay_col: str = "n_chars",
    decay_scale: float = 1000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """FunctionScoreQuery (Lucene FunctionScoreQuery / the ES
    `function_score` query): the relevance score modulated by a
    deterministic function of a doc-values column —
    score = round(bm25, 4) * 1/(1 + decay_col/scale), a RATIONAL decay
    (no exp/log: libm implementations differ between the JVM and
    DuckDB, while +,*,/ are IEEE-exact on both, so the combined score
    is bit-identical cross-engine). The relevance factor is rounded
    BEFORE the combine — same staging contract as rescore/RRF.
    Returns (doc_id, score, bm25, factor) ordered (score desc, doc_id).

    Plan: identical to bm25_topk until the top-k cut, plus one join of
    the 2-column (id, decay_col) projection — the same pruned-read +
    TakeOrderedAndProject shape, one extra broadcast-sized column."""
    # rank over the FULL match set (the function can reorder beyond
    # any prefix), so no first-pass cut: k=None semantics via a large
    # scored frame — use the shared full-score table
    from .grouping import _bm25_doc_scores

    scores = _bm25_doc_scores(docs, terms, id_col, text_col, round_to)
    meta = docs.select(F.col(id_col).alias("doc_id"), F.col(decay_col).alias("_d"))
    factor = F.lit(1.0) / (F.lit(1.0) + F.col("_d").cast("double") / F.lit(float(decay_scale)))
    return (
        scores.join(meta, "doc_id")
        .select(
            "doc_id",
            F.round(F.col("score") * factor, round_to).alias("fscore"),
            F.col("score").alias("bm25"),
            F.round(factor, round_to).alias("factor"),
        )
        .withColumnRenamed("fscore", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_analyzed(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Disjunctive BM25 top-k over the ANALYZED token stream —
    StopFilter + EnglishMinimalStem (functions/analyzers.py), Lucene's
    light `english` analyzer — applied on BOTH sides like Lucene
    applies one analyzer at index and query time: corpus stats count
    surviving tokens (dl = post-stop length, exactly how Lucene norms
    see removed stopwords), df/tf are over stemmed terms, and query
    terms pass through the same chain (stopword clauses vanish; a
    fully-stopword query returns empty with a stable schema).

    Physical shape is bm25_topk's (explode under isin filter,
    broadcast df/stats, one groupBy(doc_id), TakeOrderedAndProject);
    the canonical score expressions (idf_expr / tfn_expr /
    _query_order_sum) are reused verbatim — only the token stream
    differs."""
    from pyspark.sql import functions as F  # local alias for clarity

    from ..functions.analyzers import analyze_terms, analyzed_tokens_col
    from ..session import ensure_compute_parallelism
    from .bm25 import idf_expr, tfn_expr

    q = analyze_terms(terms)
    spark = docs.sparkSession
    if not q:
        return spark.createDataFrame([], "doc_id long, score double")
    base = (
        ensure_compute_parallelism(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            analyzed_tokens_col(text_col).alias("toks"),
        )
        .withColumn("dl", F.size("toks"))
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(q))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            idf_expr(
                F.col("n_docs").cast("double"), F.col("df").cast("double")
            )
            * tfn_expr(
                F.col("tf").cast("double"),
                F.col("dl").cast("double"),
                F.col("avgdl"),
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(_query_order_sum(q).alias("raw"))
    return (
        agg.select("doc_id", F.round(F.col("raw"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_pinned_topk(
    docs: DataFrame,
    terms: list[str],
    pinned_ids: list[int],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Pinned query (the Elasticsearch `pinned` query): the listed doc
    ids rank FIRST, in the given order, whether or not they match the
    organic query (non-matching pinned docs carry score 0.0); organic
    results follow in (score desc, doc_id) with pinned ids removed.
    Returns (doc_id, score, pinned) limit k.

    Plan: the pinned list is driver-literal (a handful of ids) — it
    broadcasts into the score table; ordering is a two-group sort key
    (group, position | score), still TakeOrderedAndProject."""
    from .grouping import _bm25_doc_scores

    pinned_ids = list(dict.fromkeys(int(i) for i in pinned_ids))
    spark = docs.sparkSession
    scores = _bm25_doc_scores(docs, terms, id_col, text_col, round_to)
    pin = spark.createDataFrame(
        [(d, p) for p, d in enumerate(pinned_ids)], "doc_id long, _pos int"
    )
    joined = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scores, "doc_id", "left")
        .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
        .join(F.broadcast(pin), "doc_id", "left")
    )
    # organic rows without a score never matched: drop unless pinned
    out = joined.filter(F.col("_pos").isNotNull() | (F.col("score") > 0.0))
    return (
        out.select(
            "doc_id",
            "score",
            F.col("_pos").isNotNull().alias("pinned"),
            F.coalesce(F.col("_pos"), F.lit(2147483647)).alias("_ord"),
        )
        .orderBy(
            F.desc("pinned"), F.asc("_ord"), F.desc("score"), F.asc("doc_id")
        )
        .select("doc_id", "score", "pinned")
        .limit(k)
    )


def random_score_topk(
    docs: DataFrame,
    must_term: str,
    seed: int = 7,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """function_score random_score with a seed + field (the ES
    deterministic-shuffle idiom): matching docs rank by
    u = md5(doc_id|seed)/16^15 — a pure function of (doc_id, seed),
    identical across runs/partitionings/cluster sizes, replayable in
    SQL (the sample_stratified uniform). Returns (doc_id, rscore)
    ordered (rscore desc, doc_id) limit k — the reproducible random
    eval-subset draw a training pipeline uses."""
    from .bm25 import _tokenized

    toks = _tokenized(docs, id_col, text_col)
    match = toks.filter(F.array_contains("toks", must_term)).select("doc_id")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(str(seed)))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    return (
        match.select("doc_id", F.round(u, round_to).alias("rscore"))
        .orderBy(F.desc("rscore"), F.asc("doc_id"))
        .limit(k)
    )


def rank_feature_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    feature_col: str = "n_chars",
    pivot: int = 300,
    boost: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """ES `rank_feature` query (saturation function) in a bool should
    beside a match query — the static-quality boost idiom (pagerank /
    length / freshness stored as a feature field):
    score = bm25(terms) + boost * sat(x), sat(x) = x / (x + pivot).

    Determinism: ONE round at the end, on raw_bm25 + boost*sat — the
    bm25_topk_boosting contract (the bm25 leg's irrational idf logs
    keep the sum off 4dp half-boundaries; rounding the stages
    separately would put boost*sat — a RATIO OF EXACT INTEGERS —
    exactly on boundaries). sat is one IEEE division of two exactly-
    representable integers (x, x+pivot), correctly rounded and
    bit-identical cross-engine; the fold is raw + (boost * sat) in
    that association on both sides. bm25 > 0 so no signed zero.

    Plan: the standard explode-under-isin + broadcast-stats pipeline,
    plus one join of the 2-column (id, feature) projection; top-k is
    TakeOrderedAndProject after the combine (the feature can reorder
    any bm25 prefix). Scale shape identical to bm25_function_score."""
    terms = list(dict.fromkeys(terms))
    tf = candidate_tf(docs, terms, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, id_col, text_col)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            idf_expr(F.col("n_docs").cast("double"), F.col("df").cast("double"))
            * tfn_expr(
                F.col("tf").cast("double"), F.col("dl").cast("double"), F.col("avgdl")
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(_query_order_sum(terms).alias("raw"))
    feat = docs.select(
        F.col(id_col).alias("doc_id"), F.col(feature_col).alias("feature")
    )
    sat = F.col("feature").cast("double") / (
        F.col("feature") + F.lit(int(pivot))
    ).cast("double")
    return (
        agg.join(feat, "doc_id")
        .select(
            "doc_id",
            F.round(F.col("raw") + F.lit(float(boost)) * sat, round_to).alias(
                "score"
            ),
            F.col("feature").cast("long").alias("feature"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def distance_feature_topk(
    events: DataFrame,
    origin: str = "2024-01-15 00:00:00",
    pivot_hours: int = 72,
    event_type: str | None = "click",
    k: int = 20,
) -> DataFrame:
    """ES `distance_feature` query on a date field — the recency boost:
    score = pivot / (pivot + |ts - origin|), ranked desc. Filtered to
    one event_type (the must clause), returning the k events nearest
    the origin instant with their proximity score.

    Determinism: all arithmetic is INTEGER micros (parquet ts reads as
    TIMESTAMP_NTZ -> cast to timestamp under the pinned-UTC session
    before unix_micros — the session_windows contract); the score is a
    RATIO OF EXACT INTEGERS pivot_us/(pivot_us+dist), which lands on
    4dp half-boundaries with real probability, so it rounds via
    grouping._div_round_expr (integer half-away-from-zero), never as a
    double. score > 0 always — no signed zero. ts emits epoch micros.

    Plan: one filtered scan, a per-row projection, and a global top-k
    (TakeOrderedAndProject) — no shuffle beyond the final cut."""
    from datetime import datetime, timezone

    from .grouping import _div_round_expr

    origin_us = int(
        datetime.strptime(origin, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1_000_000
    )
    pivot_us = int(pivot_hours) * 3_600_000_000
    base = events
    if event_type is not None:
        base = base.filter(F.col("event_type") == event_type)
    dist = F.abs(
        F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(origin_us)
    )
    units = F.expr(
        _div_round_expr(
            f"cast({pivot_us} as decimal(38,0))",
            f"cast({pivot_us} as decimal(38,0)) + cast(_dist as decimal(38,0))",
        )
    )
    return (
        base.select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            dist.alias("_dist"),
        )
        .select(
            "event_id",
            "ts_us",
            (units.cast("double") / F.lit(10000.0)).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(k)
    )
