"""Result grouping and faceting over the search surface.

Lucene ships these as the `grouping` (CollapsingTopDocsCollector /
field collapse) and `facet` modules; the reference engine stops at
raw top-k (its query surface ends at terms_enumerator.ml), so these
are part of the repo's "what a user of a full-text engine needs"
extension tier, same as MoreLikeThis and DisMax.

Spark-first shapes:
- collapse: the per-doc BM25 scores (the existing scoring contract —
  see query/bm25.py _query_order_sum) join the documents table on
  doc_id for the collapse key, then ONE window (row_number per key
  ordered by (score desc, doc_id)) keeps the best doc per group.
  At 100 TB the window partitions by the collapse key — the same
  shuffle a groupBy needs; no driver-side state.
- facets: the match set (docs containing every must term) is a
  doc_id list; ONE join brings in the facet column and ONE groupBy
  counts. With the indexed path the match set comes from the postings
  scan (doc-id stream only) — facet counting never touches text.

Determinism: scores are rounded BEFORE the window ranking on both
sides (round(·,4) totals are bit-identical Spark-vs-DuckDB because
the per-doc fold order is pinned), group ranking ties break on
doc_id, and facet output orders by the facet value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bm25 import (
    _query_order_sum,
    _tokenized,
    candidate_tf,
    corpus_stats,
    idf_expr,
    tfn_expr,
)


def _bm25_doc_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 4,
) -> DataFrame:
    """(doc_id, score) for every doc matching ANY query term —
    bm25_topk's disjunctive scoring without the top-k cut, so callers
    can re-rank (collapse, grouping) before limiting."""
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
    agg = scored.groupBy("doc_id").agg(_query_order_sum(terms).alias("score_raw"))
    score = (
        F.round(F.col("score_raw"), round_to)
        if round_to is not None
        else F.col("score_raw")
    )
    return agg.select("doc_id", score.alias("score"))


def bm25_collapse_topk(
    docs: DataFrame,
    terms: list[str],
    collapse_col: str = "source",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Field collapse (Lucene CollapsingTopDocsCollector): disjunctive
    BM25 top-k where each ``collapse_col`` value contributes at most
    ONE document — its best-scoring one (ties on doc_id asc).

    Returns (collapse value, doc_id, score) ordered by
    (score desc, doc_id asc), limit k groups.

    Plan: score agg (one shuffle on doc_id) -> join the collapse key
    (doc_id join against the pruned 2-column documents projection) ->
    window row_number partitioned BY THE COLLAPSE KEY (one shuffle on
    the key — same cost as any per-key agg) -> global top-k via
    TakeOrderedAndProject. No driver-side loops; group cardinality
    never materializes anywhere.
    """
    scores = _bm25_doc_scores(docs, terms, id_col, text_col, round_to)
    keys = docs.select(
        F.col(id_col).alias("doc_id"), F.col(collapse_col).alias("collapse_key")
    )
    w = Window.partitionBy("collapse_key").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scores.join(keys, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("collapse_key", "doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def facet_counts(
    docs: DataFrame,
    must: list[str],
    facet_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Facet counting (Lucene facet module): for the docs matching ALL
    ``must`` terms, count matches per ``facet_col`` value. Returns
    (facet_value, n_docs) ordered by facet_value — integer counts, no
    float anywhere.

    Plan: conjunctive match set (explode under an isin filter, one
    groupBy(doc_id) with HAVING count distinct = n_terms) -> join the
    2-column (id, facet) projection -> groupBy(facet). Both joins key
    on doc_id; the facet agg's partial (map-side) combine means only
    |distinct facet values| rows reach the final shuffle."""
    must = list(dict.fromkeys(must))
    if not must:
        raise ValueError("facet_counts needs at least one must term")
    tf = candidate_tf(docs, must, id_col, text_col)
    match = (
        tf.groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(must))
        .select("doc_id")
    )
    facets = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet_value")
    )
    return (
        match.join(facets, "doc_id")
        .groupBy("facet_value")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("facet_value")
    )


def drill_sideways(
    docs: DataFrame,
    must: list[str],
    selections: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DrillSideways (the Lucene facet module's drill-down-with-
    sideways-counts): for each drilled dimension, facet counts with
    every OTHER dimension's selection applied but NOT its own — the
    "what would I get if I changed this one filter" numbers a faceted
    UI shows next to the drill-down result. ``selections`` maps
    dimension column -> selected value. Returns (dim, value, n_docs)
    ordered (dim, value) — integer-only, a (dim, value) total order —
    plus one ('_hits', '', n) row for the fully-drilled count.

    Plan: ONE conjunctive match set (facet_counts' shape) joined once
    to the |selections|+1-column dimension projection, then each
    dimension's sideways frame is a conditional aggregate over that
    SAME joined frame — |dims| groupBys over match-set-sized input,
    no re-scan of the corpus per dimension (Lucene's single-pass
    DrillSideways collector, re-expressed relationally)."""
    must = list(dict.fromkeys(must))
    if not must:
        raise ValueError("drill_sideways needs at least one must term")
    if not selections:
        raise ValueError("drill_sideways needs at least one drilled dimension")
    for dim in selections:
        if dim not in docs.columns:
            raise ValueError(f"unknown dimension {dim!r}")
    tf = candidate_tf(docs, must, id_col, text_col)
    match = (
        tf.groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(must))
        .select("doc_id")
    )
    dims = sorted(selections)
    proj = docs.select(F.col(id_col).alias("doc_id"), *[F.col(d) for d in dims])
    joined = match.join(proj, "doc_id")
    parts = []
    for dim in dims:
        others = F.lit(True)
        for od in dims:
            if od != dim:
                others = others & (F.col(od) == F.lit(selections[od]))
        # NULL dim values coalesce to a sentinel BEFORE the groupBy:
        # Spark sorts NULLS FIRST, DuckDB NULLS LAST, and the gate
        # hash is order-sensitive — a non-null string keeps the
        # (dim, value) total order engine-identical (oracle matches).
        # The sentinel starts with \x01, outside the token/value
        # alphabet, so a value literally equal to any printable string
        # can never merge into the NULL bucket; it also sorts first
        # under both engines' binary collations.
        parts.append(
            joined.filter(others)
            .groupBy(
                F.coalesce(F.col(dim).cast("string"), F.lit("\x01null")).alias(
                    "value"
                )
            )
            .agg(F.count("*").cast("long").alias("n_docs"))
            .select(F.lit(dim).alias("dim"), "value", "n_docs")
        )
    alldims = F.lit(True)
    for od in dims:
        alldims = alldims & (F.col(od) == F.lit(selections[od]))
    hits = (
        joined.filter(alldims)
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(F.lit("_hits").alias("dim"), F.lit("").alias("value"), "n_docs")
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(hits).orderBy("dim", "value")


def facet_counts_indexed(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    must: list[str],
    facet_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Indexed facet counting: the match set comes from the postings
    scan (doc-id stream ONLY — tf/dl/positions pruned at the parquet
    reader), so the text column is never read; only the (id, facet)
    projection of the source table joins in. Must equal the logical
    facet_counts / SQL oracle exactly."""
    from .exec import matching_docs_indexed

    match = matching_docs_indexed(spark, index_dir, must=must)
    facets = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet_value")
    )
    return (
        match.join(facets, "doc_id")
        .groupBy("facet_value")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("facet_value")
    )


def _units_sum(value_col: str, quantize: int):
    """The single owner of the snap-to-units fold: each value snaps to
    an integer multiple of 1/quantize, the sum accumulates LONGS —
    order-independent by construction. Every quantized aggregate
    (histograms, pipelines, sessions) builds on this expression so the
    snap convention can never drift between call sites."""
    return F.sum(F.round(F.col(value_col) * quantize, 0).cast("long"))


def _quantized_sum(value_col: str, quantize: int | None):
    """Order-independent rounded sum: the _units_sum long fold divided
    back once — exact regardless of partial-aggregate order (the
    engine invariant that float gate totals never come from partial
    float sums). None = raw float sum for non-fixed-precision
    inputs."""
    if quantize is None:
        return F.round(F.sum(value_col), 4)
    return F.round(
        _units_sum(value_col, quantize).cast("double") / F.lit(float(quantize)),
        4,
    )


def date_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple = ("event_type",),
    interval: str = "day",
    value_col: str = "value",
    quantize: int | None = 100,
) -> DataFrame:
    """Date-histogram aggregation (the Lucene-facets / Elasticsearch
    date_histogram shape): bucket = truncate(ts, interval), per
    (bucket, keys...) count + rounded value sum. The bucket is emitted
    as a STRING (yyyy-MM-dd[ HH:00]) so the oracle compare never
    depends on timestamp-type hashing.

    ``quantize`` (default 100 = cent precision) snaps each value to an
    integer multiple of 1/quantize BEFORE summing, so the per-bucket
    total is an exact integer sum — order-independent by construction,
    honoring the engine-wide invariant that float gate totals never
    come from partial float sums (Spark's partial-aggregate addition
    order differs from DuckDB's scan-order sum; a pre-rounding ulp
    difference at a 4dp boundary would flip the repr-sensitive gate
    hash). ``quantize=None`` restores the raw float sum for inputs
    that aren't fixed-precision. Integer headroom: sums stay exact up
    to 2^53/quantize per bucket (~90 trillion value-units at
    quantize=100) — far past any real bucket.

    One groupBy with map-side partial aggregation — at 100 TB only
    |buckets x key cardinality| rows reach the shuffle; time-ordered
    ingest makes the partial combine nearly total."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    total = _quantized_sum(value_col, quantize)
    return (
        events.groupBy(bucket, *[F.col(k) for k in keys])
        .agg(
            F.count("*").alias("n_events"),
            total.alias("sum_value"),
        )
        .orderBy("bucket", *keys)
    )


def numeric_range_facets(
    docs: DataFrame, col: str = "n_chars", width: int = 50
) -> DataFrame:
    """Numeric range faceting: fixed-width buckets over a doc-values
    column, (bucket_lo, n_docs) ordered by bucket. Integer-only; the
    scan reads just the one column (doc values, never text)."""
    lo = (F.floor(F.col(col) / width) * width).cast("long").alias("bucket_lo")
    return (
        docs.groupBy(lo)
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket_lo")
    )


def match_stats(
    docs: DataFrame,
    must: list[str],
    stat_col: str = "n_chars",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stats aggregation over the match set (the Elasticsearch `stats`
    agg): one row of (n_docs, min/max/avg of a doc-values column) for
    the docs containing ALL ``must`` terms. The match set never leaves
    the executors — a semi-join into the 2-column (id, stat) projection
    feeds one global aggregate (partial + final)."""
    must = list(dict.fromkeys(must))
    if not must:
        raise ValueError("match_stats needs at least one must term")
    tf = candidate_tf(docs, must, id_col, text_col)
    match = (
        tf.groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(must))
        .select("doc_id")
    )
    vals = docs.select(F.col(id_col).alias("doc_id"), F.col(stat_col).alias("v"))
    return match.join(vals, "doc_id").agg(
        F.count("*").alias("n_docs"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
        F.round(F.avg("v"), 4).alias("avg_val"),
    )


def bm25_parent_join_topk(
    docs: DataFrame,
    terms: list[str],
    parent_col: str = "source",
    score_mode: str = "sum",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Parent block join (Lucene join module, ToParentBlockJoinQuery):
    score CHILD docs with the disjunctive BM25, then rank PARENTS by an
    aggregate of their children's scores — score_mode 'sum' | 'avg' |
    'max' | 'min', Lucene's ScoreMode values. Returns
    (parent, score, n_children) ordered (score desc, parent asc).

    Determinism: child scores are rounded BEFORE the parent aggregate
    (the per-doc fold contract makes them bit-identical to the oracle),
    and sum/avg fold over children in doc_id order via a sorted-array
    aggregate, so parent totals never depend on partitioning. avg is
    additionally rounded after division.

    Plan: the child score agg reuses bm25's one doc_id shuffle; the
    parent rollup is ONE groupBy on the parent key (same shuffle any
    per-parent agg needs). No driver-side state."""
    if score_mode not in ("sum", "avg", "max", "min"):
        raise ValueError(score_mode)
    scores = _bm25_doc_scores(docs, terms, id_col, text_col, round_to)
    parents = docs.select(
        F.col(id_col).alias("doc_id"), F.col(parent_col).alias("parent")
    )
    joined = scores.join(parents, "doc_id")
    ordered_sum = F.aggregate(
        F.sort_array(F.collect_list(F.struct(F.col("doc_id"), F.col("score")))),
        F.lit(0.0),
        lambda acc, x: acc + x["score"],
    )
    agg = joined.groupBy("parent").agg(
        ordered_sum.alias("_sum"),
        F.max("score").alias("_max"),
        F.min("score").alias("_min"),
        F.count("*").alias("n_children"),
    )
    expr = {
        "sum": F.round(F.col("_sum"), round_to),
        "avg": F.round(F.col("_sum") / F.col("n_children"), round_to),
        "max": F.col("_max"),
        "min": F.col("_min"),
    }[score_mode]
    return (
        agg.select("parent", expr.alias("score"), "n_children")
        .orderBy(F.desc("score"), F.asc("parent"))
        .limit(k)
    )


def significant_terms(
    docs: DataFrame,
    must: list[str],
    k: int = 10,
    min_doc_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    fg_broadcast_max: int = 5_000_000,
) -> DataFrame:
    """Significant-terms aggregation (the Elasticsearch agg): terms
    OVERREPRESENTED in the match set vs the background corpus, ranked
    by lift = (fg_df/fg_size) / (bg_df/bg_size), ties (term asc).
    Query terms themselves are excluded (they trivially have maximal
    lift). Returns (term, fg_df, bg_df, round(lift)).

    Plan: ONE tokenize pass computes per-(doc, term) rows; the match
    set (conjunctive doc ids) joins in to tag foreground rows, then a
    single groupBy(term) counts both sides (fg via conditional sum).
    The background df table is the same aggregate — no second scan.

    The foreground tag join broadcasts the match set only while it is
    provably small: n_fg is already counted (the lift denominator), so
    the broadcast hint is gated on ``fg_broadcast_max`` ids (default
    5M ~= 40 MB of longs) — past that a hot conjunctive ``must`` at
    corpus scale falls back to a plain shuffle join and AQE picks the
    strategy, the same guard pattern as exec.py's and_prune_max_df."""
    must = list(dict.fromkeys(must))
    if not must:
        raise ValueError("significant_terms needs at least one must term")
    toks = _tokenized(docs, id_col, text_col)
    doc_terms = toks.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term")
    )
    match = (
        doc_terms.filter(F.col("term").isin(must))
        .groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(must))
        .select("doc_id")
    )
    n_docs = docs.count()
    n_fg = match.count()
    if n_fg == 0:
        raise ValueError("empty match set")
    fg_tbl = match.withColumn("_fg", F.lit(1))
    if n_fg <= fg_broadcast_max:
        fg_tbl = F.broadcast(fg_tbl)
    tagged = doc_terms.join(fg_tbl, "doc_id", "left")
    agg = tagged.groupBy("term").agg(
        F.sum(F.when(F.col("_fg") == 1, 1).otherwise(0)).alias("fg_df"),
        F.count("*").alias("bg_df"),
    )
    lift = (F.col("fg_df") / F.lit(float(n_fg))) / (
        F.col("bg_df") / F.lit(float(n_docs))
    )
    return (
        agg.filter(~F.col("term").isin(must))
        .filter(F.col("fg_df") >= min_doc_count)
        .select(
            "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("bg_df").cast("long").alias("bg_df"),
            F.round(lift, round_to).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("term"))
        .limit(k)
    )


def top_hits_by_group(
    docs: DataFrame,
    terms: list[str],
    group_col: str = "lang",
    per_group: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Terms aggregation with a top_hits sub-aggregation (the
    Elasticsearch `terms` + `top_hits` composite): for every value of
    ``group_col``, the ``per_group`` best-scoring matching docs plus
    the group's total hit count. Returns
    (group_key, rank, doc_id, score, n_hits) ordered (group_key, rank)
    — a total order since rank is unique within a key.

    Plan: the per-doc disjunctive BM25 table (shared _bm25_doc_scores
    contract — rounded BEFORE ranking) joins the group column in, then
    ONE window partitioned by key ranks and counts; no per-group
    query, no driver loop. At 100 TB the window's key partitioning is
    the same shuffle a groupBy needs; skew only if one key dominates
    the match set."""
    scores = _bm25_doc_scores(docs, terms, id_col, text_col, round_to=4)
    keyed = scores.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("group_key")),
        "doc_id",
    )
    w_rank = Window.partitionBy("group_key").orderBy(F.desc("score"), F.asc("doc_id"))
    w_all = Window.partitionBy("group_key")
    return (
        keyed.withColumn("rank", F.row_number().over(w_rank))
        .withColumn("n_hits", F.count("*").over(w_all))
        .filter(F.col("rank") <= per_group)
        .select("group_key", "rank", "doc_id", "score", F.col("n_hits").cast("long").alias("n_hits"))
        .orderBy("group_key", "rank")
    )


def filters_agg(
    docs: DataFrame,
    filters: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Filters aggregation (the Elasticsearch `filters` agg): one
    named bucket per entry, counting docs that contain ALL the
    entry's terms. Returns (filter_name, n_docs) ordered by name.

    ONE tokenize pass: each doc's token array evaluates every named
    conjunction as a boolean column, one aggregate sums them all, and
    `stack` unpivots the single row into (name, count) rows — the
    whole agg is a scan + one-row exchange regardless of how many
    named filters ride along."""
    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    toks = _tokenized(docs, id_col, text_col)
    flags = [
        F.aggregate(
            F.array(*[F.array_contains("toks", t) for t in dict.fromkeys(terms)]),
            F.lit(True),
            lambda acc, x: acc & x,
        )
        .cast("long")
        .alias(f"_f_{i}")
        for i, (_, terms) in enumerate(sorted(filters.items()))
    ]
    one_row = toks.select(*flags).agg(
        *[F.sum(f"_f_{i}").alias(f"_c_{i}") for i in range(len(filters))]
    )
    names = [name for name, _ in sorted(filters.items())]
    stack_args = ", ".join(
        f"'{n}', _c_{i}" for i, n in enumerate(names)
    )
    return (
        one_row.select(
            F.expr(f"stack({len(names)}, {stack_args}) AS (filter_name, n_docs)")
        )
        .select("filter_name", F.col("n_docs").cast("long").alias("n_docs"))
        .orderBy("filter_name")
    )


def cardinality_agg(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Cardinality aggregation (exact mode): distinct ``id_col`` count
    per ``key_col`` bucket, plus the bucket's event count. Returns
    (key, n_unique, n_events) ordered by key — integers only, nothing
    to round.

    Exact distinct is a two-level shuffle on (key, id) then (key) —
    the gate-verifiable contract; an approximate HLL variant
    (approx_count_distinct) drops a shuffle at corpus scale but its
    sketch values are engine-specific and cannot be oracled
    exactly."""
    return (
        events.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.countDistinct(id_col).alias("n_unique"),
            F.count("*").alias("n_events"),
        )
        .orderBy("key")
    )


def value_histogram(
    events: DataFrame,
    value_col: str = "value",
    interval: int = 25,
    quantize: int | None = 100,
) -> DataFrame:
    """Histogram aggregation over a numeric field (the Elasticsearch
    `histogram` agg; date_histogram's numeric sibling): fixed-width
    buckets bucket_lo = floor(value/interval)*interval with count and
    the order-independent quantized value sum (shared _quantized_sum).
    Returns (bucket_lo, n_events, sum_value) ordered by bucket_lo.
    One groupBy, map-side partial aggregation — only |buckets| rows
    reach the shuffle."""
    lo = (F.floor(F.col(value_col) / interval) * interval).cast("long").alias("bucket_lo")
    return (
        events.groupBy(lo)
        .agg(
            F.count("*").alias("n_events"),
            _quantized_sum(value_col, quantize).alias("sum_value"),
        )
        .orderBy("bucket_lo")
    )


def session_windows(
    events: DataFrame,
    gap: str = "6 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    quantize: int | None = 100,
) -> DataFrame:
    """Session-window aggregation (sessionization — the event-analytics
    op Spark ships natively as ``F.session_window`` and the reference
    has no analogue for): per user, events closer than ``gap`` to the
    previous event merge into one session. Returns
    (user_id, start_us, end_us, n_events, sum_value) with the window
    bounds as epoch MICROSECOND integers — timestamps never enter the
    gate output, so the hash cannot depend on timestamp formatting;
    end_us = last event + gap (Spark's session_window contract).
    Ordered (user_id, start_us) — a total order, sessions of one user
    are disjoint.

    Scale shape: session_window is a first-class Catalyst aggregate —
    one shuffle on the user key, sessions merged executor-side; state
    is |open sessions|, not |events|. The value sum folds quantized
    longs (shared convention)."""
    agg = events.groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), gap)
    ).agg(
        F.count("*").alias("n_events"),
        _quantized_sum(value_col, quantize).alias("sum_value"),
    )
    return agg.select(
        F.col(user_col),
        # parquet timestamps read as TIMESTAMP_NTZ; the session TZ is
        # pinned UTC (session.py), so the cast to TIMESTAMP is a
        # deterministic identity on the epoch value
        F.unix_micros(F.col("session_window.start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_window.end").cast("timestamp")).alias("end_us"),
        "n_events",
        "sum_value",
    ).orderBy(user_col, "start_us")


def adjacency_matrix(
    docs: DataFrame,
    filters: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacency-matrix aggregation (the Elasticsearch
    `adjacency_matrix` agg): one bucket per named filter plus one per
    PAIR intersection, counting docs that satisfy both conjunctions.
    Pair buckets are keyed "a&b" with the names in sorted order (the
    ES separator); empty buckets are omitted (ES contract). Returns
    (bucket_key, n_docs) ordered by bucket_key.

    Same one-pass shape as filters_agg: each doc's token array
    evaluates every named conjunction once as a boolean column, pair
    flags are products of the singles (no second tokenize), one
    aggregate sums all |F| + |F|(|F|-1)/2 buckets, and `stack`
    unpivots the single row — a scan + one-row exchange regardless of
    filter count. ES caps |F| at 100 for exactly this quadratic;
    callers here inherit the same practical bound."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one named filter")
    names = sorted(filters)
    toks = _tokenized(docs, id_col, text_col)
    singles = [
        F.aggregate(
            F.array(*[F.array_contains("toks", t) for t in dict.fromkeys(filters[n])]),
            F.lit(True),
            lambda acc, x: acc & x,
        ).alias(f"_f_{i}")
        for i, n in enumerate(names)
    ]
    flagged = toks.select(*singles)
    aggs, labels = [], []
    for i, n in enumerate(names):
        aggs.append(F.sum(F.col(f"_f_{i}").cast("long")).alias(f"_c_{len(labels)}"))
        labels.append(n)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            aggs.append(
                F.sum((F.col(f"_f_{i}") & F.col(f"_f_{j}")).cast("long")).alias(
                    f"_c_{len(labels)}"
                )
            )
            labels.append(f"{names[i]}&{names[j]}")
    one_row = flagged.agg(*aggs)
    stack_args = ", ".join(f"'{n}', _c_{i}" for i, n in enumerate(labels))
    return (
        one_row.select(
            F.expr(f"stack({len(labels)}, {stack_args}) AS (bucket_key, n_docs)")
        )
        .filter(F.col("n_docs") > 0)
        .select("bucket_key", F.col("n_docs").cast("long").alias("n_docs"))
        .orderBy("bucket_key")
    )


def date_histogram_pipeline(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Pipeline aggregations (ES `cumulative_sum` + `derivative`
    parent-pipeline aggs) over a per-key date histogram: for each
    (key, bucket) emit the bucket's value sum, the running cumulative
    sum along the key's time series, and the bucket-over-bucket
    derivative (null for each key's first bucket — the ES contract).

    Determinism: the histogram keeps each bucket's sum as INTEGER
    quantize-units (shared _quantized_sum convention); the window
    cumsum and the lag difference fold those longs, dividing back only
    at emission — so both pipeline columns are exact integer sums in
    any partial-aggregate order. The derivative can go negative, so
    its rounded emission adds +0.0 (engine-wide signed-zero rule).

    Scale shape: the window runs AFTER the histogram groupBy, over
    |buckets x keys| rows (a few hundred at any corpus size — bucket
    count grows with time span, not data volume), partitioned by key:
    no large-window hazard."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    per = events.groupBy(F.col(key_col).alias("key"), bucket).agg(
        F.count("*").alias("n_events"),
        _units_sum(value_col, quantize).alias("_q"),
    )
    w = Window.partitionBy("key").orderBy("bucket")
    qd = F.lit(float(quantize))
    lag_q = F.lag("_q").over(w)
    return per.select(
        "key",
        "bucket",
        "n_events",
        F.round(F.col("_q").cast("double") / qd, 4).alias("sum_value"),
        F.round(
            F.sum("_q").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
            / qd,
            4,
        ).alias("cum_value"),
        (
            F.round((F.col("_q") - lag_q).cast("double") / qd, 4) + F.lit(0.0)
        ).alias("derivative"),
    ).orderBy("key", "bucket")


def stats_bucket(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Sibling pipeline aggregations (ES ``stats_bucket`` — subsuming
    ``max_bucket`` / ``min_bucket`` / ``avg_bucket`` / ``sum_bucket``):
    one row per key summarizing that key's per-interval histogram of
    value sums: (key, n_buckets, min_value, max_value, avg_value,
    total_value, min_bucket, max_bucket). min_bucket/max_bucket are
    the bucket LABELS holding the extreme sums; ES returns a keys
    ARRAY on ties — this engine scalarizes deterministically to the
    lexicographically FIRST such bucket string (min over struct, so
    ties can never depend on partitioning).

    Determinism: bucket sums are INTEGER quantize-units (_units_sum);
    min/max/total divide back exactly (multiples of 1/quantize — no
    rounding involved); avg is a RATIO OF EXACT INTEGERS and rounds
    via _div_round_expr; every emitted float adds +0.0 (value sums
    can be negative in general).

    Scale shape: histogram groupBy [one shuffle, map-side combine],
    then a key-level regroup over |keys x buckets| rows — bucket
    count grows with time span, not data volume; no window at all."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    per = events.groupBy(F.col(key_col).alias("key"), bucket).agg(
        _units_sum(value_col, quantize).alias("_q")
    )
    qd = F.lit(float(quantize))
    agg = per.groupBy("key").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.min("_q").alias("_min"),
        F.max("_q").alias("_max"),
        F.sum("_q").cast("decimal(38,0)").alias("_sum"),
        F.min(F.struct(F.col("_q").alias("q"), F.col("bucket").alias("b"))).alias(
            "_minrow"
        ),
        F.min(F.struct((-F.col("_q")).alias("nq"), F.col("bucket").alias("b"))).alias(
            "_maxrow"
        ),
    )
    avg_units = F.expr(
        _div_round_expr("_sum", f"cast(n_buckets as decimal(38,0)) * {quantize}")
    )
    return agg.select(
        "key",
        "n_buckets",
        (F.round(F.col("_min").cast("double") / qd, 4) + F.lit(0.0)).alias("min_value"),
        (F.round(F.col("_max").cast("double") / qd, 4) + F.lit(0.0)).alias("max_value"),
        (avg_units.cast("double") / F.lit(10000.0) + F.lit(0.0)).alias("avg_value"),
        (F.round(F.col("_sum").cast("double") / qd, 4) + F.lit(0.0)).alias(
            "total_value"
        ),
        F.col("_minrow.b").alias("min_bucket"),
        F.col("_maxrow.b").alias("max_bucket"),
    ).orderBy("key")


def percentiles_bucket(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
    ps: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Percentiles-bucket sibling pipeline aggregation (the
    Elasticsearch `percentiles_bucket` agg): exact linear-interp
    percentiles OF THE BUCKET METRICS — each key's per-interval value
    sums — the quartiles-of-daily-revenue shape stats_bucket's
    min/max/avg don't give. Returns (key, n_buckets, p_25, p_50, ...)
    ordered by key.

    Determinism: the bucket metrics are INTEGER quantize-units
    (_units_sum), and the requested fractions must be exact binary
    (k/2^m — asserted), so the interpolation q_lo + frac*(q_hi-q_lo)
    is exact IEEE arithmetic on integers: Spark's percentile() and
    DuckDB's quantile_cont share the (n-1)*p formula and are
    bit-identical on such inputs (the percentiles_agg precedent). The
    single divide-back by quantize happens once at emission.

    Scale shape: histogram groupBy [one shuffle, map-side combine],
    then a key-level aggregate over |keys x buckets| rows — the
    per-key sort lives inside one aggregate, no window, no global
    sort."""
    for p in ps:
        # any dyadic fraction with <= 20 fractional bits qualifies
        # (as_integer_ratio denominators are always powers of two —
        # the bound is what rejects 0.33's 2^52-ish denominator while
        # accepting 1/128 etc.)
        den = float(p).as_integer_ratio()[1]
        if den > (1 << 20):
            raise ValueError(
                f"p={p} is not an exact binary fraction (k/2^m, m<=20) "
                "— the interpolation would not be IEEE-exact cross-engine"
            )
    per = _quantized_key_histogram(events, ts_col, key_col, interval, value_col, quantize)
    p_list = ", ".join(repr(float(p)) for p in ps)
    arr = F.expr(f"percentile(_q, array({p_list}))")
    qd = F.lit(float(quantize))
    cols = [
        (
            F.round(F.element_at(F.col("_ps"), i + 1) / qd, 4) + F.lit(0.0)
        ).alias(f"p_{int(float(p) * 100)}")
        for i, p in enumerate(ps)
    ]
    return (
        per.groupBy("key")
        .agg(F.count("*").cast("long").alias("n_buckets"), arr.alias("_ps"))
        .select("key", "n_buckets", *cols)
        .orderBy("key")
    )


def percentiles_agg(
    docs: DataFrame,
    col: str = "n_chars",
    key_col: str = "lang",
    ps: tuple = (0.5, 0.9, 0.99),
    round_to: int = 4,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Percentiles aggregation (ES `percentiles`): linear-
    interpolation percentiles of a doc-values column per key bucket.
    Returns (key, p_50, p_90, ... one column per requested fraction)
    ordered by key.

    Two modes, the exact/approx split ES itself ships (t-digest at
    scale, exact for small sets; same stance as hll_values vs exact
    cardinality here):

    - exact (default, THE ORACLE CONTRACT): Spark's `percentile` and
      DuckDB's quantile_cont share the same interpolation formula
      ((n-1)·p between sorted neighbors), measured bit-identical on
      integer inputs — the gate rounds both sides to 4dp anyway per
      the float-column convention. Executor memory is O(rows per key)
      (the per-key value buffer lives inside one aggregate — no
      global sort), which is fine up to millions of rows per key but
      is the one aggregation shape that a skewed key can blow up at
      100 TB.
    - approx=True (THE AT-SCALE PATH): Spark's `approx_percentile`
      (Greenwald-Khanna quantile sketch — the mergeable-sketch role
      ES fills with t-digest), rank error <= n/accuracy per key.
      Partial sketches build map-side and merge across partitions
      (ObjectHashAggregate partial/final — plan-pinned in
      tests/test_approx_percentiles.py), so executor memory is
      O(accuracy · log n), NEVER O(rows per key). Results are
      engine-specific (sketch internals differ from DuckDB's) — no
      oracle row, property-tested against exact mode within the
      documented rank-error bound instead."""
    p_list = ", ".join(repr(float(p)) for p in ps)
    if approx:
        arr = F.expr(f"approx_percentile({col}, array({p_list}), {int(accuracy)})")
    else:
        arr = F.expr(f"percentile({col}, array({p_list}))")
    cols = [
        F.round(F.element_at(F.col("_ps"), i + 1), round_to).alias(
            f"p_{str(p).replace('0.', '').ljust(2, '0')}"
        )
        for i, p in enumerate(ps)
    ]
    return (
        docs.groupBy(F.col(key_col).alias("key"))
        .agg(arr.alias("_ps"))
        .select("key", *cols)
        .orderBy("key")
    )


def percentile_ranks(
    docs: DataFrame,
    col: str = "n_chars",
    key_col: str = "lang",
    values: tuple = (100, 250, 400),
) -> DataFrame:
    """Percentile-ranks aggregation (ES ``percentile_ranks``, exact
    mode): for each probe value, the PERCENT of the key bucket's rows
    with ``col`` <= value — the empirical CDF, the sketch-free inverse
    of percentiles_agg (ES serves this from t-digest at scale; exact
    mode is the oracle-verifiable contract). Returns
    (key, n_docs, rank_<v>...) ordered by key.

    Determinism: each percent is 100·count/n — a RATIO OF EXACT
    INTEGERS — rounded via _div_round_expr (never as a double: with
    n_docs a multiple of 20, 100·c/n lands exactly on 4dp
    half-boundaries). Non-negative by construction (no signed-zero
    exposure).

    Scale shape: ONE groupBy over the key [one shuffle, map-side
    combine]; the probe comparisons are conditional counts inside the
    same aggregate — no sort, no window, no second pass. Unlike the
    percentiles_agg/mad_agg/boxplot_agg exact modes, this needs NO
    approx/sketch variant: aggregate state is O(#probes) integers per
    key (ES only reaches for t-digest here because it inverts a
    pre-built digest; the relational form is already scale-safe)."""
    conds = [
        F.sum(F.when(F.col(col) <= v, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias(f"_c_{i}")
        for i, v in enumerate(values)
    ]
    agg = docs.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_docs"), *conds
    )
    ranks = [
        (
            F.expr(
                _div_round_expr(f"100 * _c_{i}", "cast(n_docs as decimal(38,0))")
            ).cast("double")
            / F.lit(10000.0)
        ).alias(f"rank_{v}")
        for i, v in enumerate(values)
    ]
    return agg.select("key", "n_docs", *ranks).orderBy("key")


def composite_agg(
    docs: DataFrame,
    keys: tuple = ("lang", "source"),
    after: tuple | None = None,
    size: int = 10,
) -> DataFrame:
    """Composite aggregation with after-key pagination (the ES
    `composite` agg — the scalable way to page through a huge bucket
    space in deterministic key order): buckets are the distinct key
    tuples ordered lexicographically; a page returns the first
    ``size`` buckets STRICTLY AFTER ``after`` (None = first page).
    Returns (*keys, n_docs).

    Scale shape: the after-key predicate pushes to the scan (a
    row-group min/max prunable conjunction of comparisons), the
    groupBy shuffles only surviving rows, and the page is a
    TakeOrderedAndProject — each page touches one shuffle of
    post-filter data, never the full bucket space."""
    if after is not None and len(after) != len(keys):
        raise ValueError("after key arity must match keys")
    out = docs
    if after is not None:
        # lexicographic strictly-greater over the key tuple
        cond = F.lit(False)
        for i in range(len(keys)):
            eq = F.lit(True)
            for j in range(i):
                eq = eq & (F.col(keys[j]) == F.lit(after[j]))
            cond = cond | (eq & (F.col(keys[i]) > F.lit(after[i])))
        out = out.filter(cond)
    return (
        out.groupBy(*[F.col(k) for k in keys])
        .agg(F.count("*").alias("n_docs"))
        .orderBy(*keys)
        .limit(size)
    )


def extended_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    quantize: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Extended-stats aggregation (the Elasticsearch `extended_stats`
    agg): per key-bucket count, min, max, sum, avg, sum of squares,
    population variance and standard deviation. Returns
    (key, n_events, min_val, max_val, sum_value, avg_value, sum_sq,
    variance, std_dev) ordered by key.

    Determinism: the input values are fixed-precision (1/quantize
    units), so BOTH moments fold as exact integers — values snap to
    long units (the _quantized_sum convention) and squares of those
    longs sum in decimal(38,0). avg and variance are RATIOS OF EXACT
    INTEGERS, which land exactly on 4dp half-boundaries with real
    probability (avg = S_units/(Q*n): for n = 2000 that's a 1-in-20
    chance per bucket) — and on an exact boundary Spark's
    decimal-repr HALF_UP and DuckDB's binary-value round diverge. So
    avg and variance are NOT rounded as doubles at all: the 4dp
    half-away-from-zero rounding happens in integer arithmetic —
    k = (2*|N|*10^4 + D) div (2*D) (both engines' integer division
    truncates toward zero; N >= 0 here except avg's sign, split out)
    — and only the final k/10^4 becomes a double, identical on both
    sides by construction. variance's numerator n*SS - S^2 >= 0
    exactly (Cauchy-Schwarz on integers), so no clamp is needed and
    -0.0 cannot appear; avg carries the +0.0 signed-zero
    normalization. sum, sum_sq, min, max are exact 1/Q- or 1/Q^2-unit
    values where round() is the identity, and std = round(sqrt(
    variance), 4) — a 4-decimal rational has no 5-decimal rational
    square root ending in 5, so sqrt can never land exactly on a
    boundary (the residual within-an-ulp risk is the same accepted
    class as every BM25 score). Integer headroom: the variance
    rounding computes 2*n*SS_u*10^4 ~ decimal(38,0), exact up to
    ~1e33 — past that, shard the key space or raise quantize scale.
    One groupBy, map-side partial aggregation — |keys| rows reach
    the shuffle."""
    q = int(quantize)
    qv = F.round(F.col(value_col) * q, 0).cast("long").cast("decimal(38,0)")
    agg = events.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_events"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
        F.sum(qv).alias("_s"),
        F.sum((qv * qv).cast("decimal(38,0)")).alias("_ss"),
    )
    ten4 = 10 ** round_to
    mid = agg.select(
        "key",
        "n_events",
        "_min",
        "_max",
        "_s",
        "_ss",
        F.col("n_events").cast("decimal(38,0)").alias("_n"),
    ).select(
        "key",
        "n_events",
        "_min",
        "_max",
        "_s",
        "_ss",
        F.expr(
            f"(2 * abs(_s) * {ten4} + {q} * _n) div (2 * {q} * _n)"
        ).alias("_avg_k"),
        F.expr(
            f"(2 * (_n * _ss - _s * _s) * {ten4} + _n * _n * {q * q})"
            f" div (2 * _n * _n * {q * q})"
        ).alias("_var_k"),
    )
    sgn = F.when(F.col("_s") < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    variance = F.col("_var_k").cast("double") / F.lit(float(ten4))
    return mid.select(
        "key",
        "n_events",
        F.round(F.col("_min"), round_to).alias("min_val"),
        F.round(F.col("_max"), round_to).alias("max_val"),
        (
            F.round(F.col("_s").cast("double") / F.lit(float(q)), round_to)
            + F.lit(0.0)
        ).alias("sum_value"),
        (
            sgn * F.col("_avg_k").cast("double") / F.lit(float(ten4))
            + F.lit(0.0)
        ).alias("avg_value"),
        F.round(
            F.col("_ss").cast("double") / F.lit(float(q) * float(q)), round_to
        ).alias("sum_sq"),
        variance.alias("variance"),
        F.round(F.sqrt(variance), round_to).alias("std_dev"),
    ).orderBy("key")


def rare_terms(
    docs: DataFrame,
    max_doc_count: int = 5,
    limit: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rare-terms aggregation (the Elasticsearch `rare_terms` agg —
    the long-tail inverse of significant/top terms): terms whose
    document frequency is <= ``max_doc_count``, rarest first. Returns
    (term, df) ordered (df asc, term asc) capped at ``limit`` — a
    total order (term is unique after the groupBy), so the cap is
    deterministic on both sides.

    Scale shape: distinct-per-doc terms (array_distinct before the
    explode — df counts docs, not occurrences), one shuffle on term
    with map-side partial counts, then TakeOrderedAndProject for the
    capped ascending cut. The df <= N filter cannot be pushed below
    the aggregate (it IS the aggregate), but only |terms| rows ever
    reach the final ordering."""
    toks = _tokenized(docs, id_col, text_col)
    return (
        toks.select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= int(max_doc_count))
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(int(limit))
    )


def multi_terms(
    docs: DataFrame,
    keys: tuple = ("lang", "source"),
    stat_col: str = "n_chars",
) -> DataFrame:
    """Multi-terms aggregation (the Elasticsearch `multi_terms` agg):
    buckets keyed by a TUPLE of fields with doc count and an integer
    stat sum, biggest buckets first. Returns
    (*keys, n_docs, sum_<stat_col>) ordered (n_docs desc, *keys) — a
    total order (the key tuple is unique per bucket). Integer-only
    metrics, nothing to round. One groupBy on the composite key,
    map-side partial aggregation."""
    return (
        docs.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(stat_col).cast("long")).alias(f"sum_{stat_col}"),
        )
        .orderBy(F.desc("n_docs"), *[F.col(k) for k in keys])
    )


def _div_round_expr(num: str, den: str, ten4: int = 10000) -> str:
    """SQL fragment: round-half-away-from-zero of num/den at 4dp as a
    signed BIGINT of 1/ten4 units, in EXACT integer arithmetic —
    k = sign(num) * ((2*|num|*ten4 + den) div (2*den)). Both Spark's
    `div` and DuckDB's `//` truncate toward zero, so with the
    abs/sign split the result is engine-identical; used wherever a
    gate column is a RATIO OF EXACT INTEGERS (avg, variance, cov,
    moving mean), because those land exactly on 4dp half-boundaries
    with real probability and double rounding diverges there.
    Operands must be decimal(38,0) columns/expressions."""
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END) * "
        f"((2 * abs({num}) * {ten4} + ({den})) div (2 * ({den})))"
    )


def matrix_stats(
    docs: DataFrame,
    x_col: str = "n_chars",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Matrix-stats aggregation (the Elasticsearch `matrix_stats` agg
    over two fields): one row of (n_docs, mean_x, mean_y, var_x,
    var_y, cov_xy, corr_xy) where x = a stored doc-values column and
    y = the token count — the length-vs-tokenization correlation a
    corpus-quality dashboard actually plots.

    Determinism: both fields are integers, so all five sums (S_x,
    S_y, S_xx, S_yy, S_xy) fold exactly in decimal(38,0); means,
    variances and covariance are ratios of exact integers and round
    via _div_round_expr (integer half-away-from-zero — never double
    rounding). Covariance can be negative (sign split in the
    fragment) and carries +0.0; variance numerators n*S_2 - S^2 >= 0
    exactly. Correlation = N_xy / sqrt(M_x * M_y) has an irrational
    denominator — sqrt of a non-square integer — so it can never sit
    exactly on a rounding boundary (accepted residual class); NULL
    when either field is constant (M = 0). One global aggregate,
    partial+final — nothing but one row crosses the exchange."""
    from ..functions.analysis import tokens_col
    from ..session import ensure_compute_parallelism

    ten4 = 10 ** round_to
    base = ensure_compute_parallelism(docs).select(
        F.col(x_col).cast("long").cast("decimal(38,0)").alias("x"),
        F.size(tokens_col(text_col)).cast("long").cast("decimal(38,0)").alias("y"),
    )
    agg = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.expr("x * x")).alias("_sxx"),
        F.sum(F.expr("y * y")).alias("_syy"),
        F.sum(F.expr("x * y")).alias("_sxy"),
    )
    mid = agg.select(
        "n_docs", "_sx", "_sy", "_sxx", "_syy", "_sxy",
        F.col("n_docs").cast("decimal(38,0)").alias("_n"),
    ).select(
        "n_docs", "_sx", "_sy", "_n",
        F.expr("_n * _sxx - _sx * _sx").alias("_mx"),
        F.expr("_n * _syy - _sy * _sy").alias("_my"),
        F.expr("_n * _sxy - _sx * _sy").alias("_nxy"),
    )
    keys = mid.select(
        "n_docs", "_mx", "_my", "_nxy",
        F.expr(_div_round_expr("_sx", "_n", ten4)).alias("_mxk"),
        F.expr(_div_round_expr("_sy", "_n", ten4)).alias("_myk"),
        F.expr(_div_round_expr("_mx", "_n * _n", ten4)).alias("_vxk"),
        F.expr(_div_round_expr("_my", "_n * _n", ten4)).alias("_vyk"),
        F.expr(_div_round_expr("_nxy", "_n * _n", ten4)).alias("_cvk"),
    )
    t4 = F.lit(float(ten4))
    corr = (
        F.round(
            F.col("_nxy").cast("double")
            / F.sqrt(F.col("_mx").cast("double") * F.col("_my").cast("double")),
            round_to,
        )
        + F.lit(0.0)
    )
    return keys.select(
        "n_docs",
        (F.col("_mxk").cast("double") / t4 + F.lit(0.0)).alias("mean_x"),
        (F.col("_myk").cast("double") / t4 + F.lit(0.0)).alias("mean_y"),
        (F.col("_vxk").cast("double") / t4).alias("var_x"),
        (F.col("_vyk").cast("double") / t4).alias("var_y"),
        (F.col("_cvk").cast("double") / t4 + F.lit(0.0)).alias("cov_xy"),
        F.when((F.col("_mx") > 0) & (F.col("_my") > 0), corr).alias("corr_xy"),
    )


def date_histogram_moving_avg(
    events: DataFrame,
    window: int = 3,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Moving-average pipeline aggregation (ES `moving_fn` /
    `moving_avg` with a trailing window INCLUDING the current bucket;
    partial windows at each key's series head average over the
    buckets seen so far). Returns (key, bucket, sum_value,
    moving_avg) ordered (key, bucket).

    Determinism: per-bucket sums stay INTEGER quantize-units through
    the window (the pipeline-agg convention); the moving mean is
    sum_units / (quantize * cnt) — a ratio of exact integers — and
    rounds via _div_round_expr, with +0.0 (values can be negative).
    Scale shape identical to date_histogram_pipeline: the window runs
    over |buckets x keys| post-aggregate rows, partitioned by key."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    per = events.groupBy(F.col(key_col).alias("key"), bucket).agg(
        _units_sum(value_col, quantize).alias("_q"),
    )
    ten4 = 10 ** round_to
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-(int(window) - 1), 0)
    )
    mid = per.select(
        "key",
        "bucket",
        "_q",
        F.sum("_q").over(w).cast("decimal(38,0)").alias("_wsum"),
        F.count("_q").over(w).cast("decimal(38,0)").alias("_wcnt"),
    ).select(
        "key",
        "bucket",
        "_q",
        F.expr(
            _div_round_expr("_wsum", f"{int(quantize)} * _wcnt", ten4)
        ).alias("_mak"),
    )
    qd = F.lit(float(quantize))
    return mid.select(
        "key",
        "bucket",
        (F.round(F.col("_q").cast("double") / qd, round_to) + F.lit(0.0)).alias(
            "sum_value"
        ),
        (
            F.col("_mak").cast("double") / F.lit(float(ten4)) + F.lit(0.0)
        ).alias("moving_avg"),
    ).orderBy("key", "bucket")


def weighted_avg(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    props_col: str = "props",
    weight_field: str = "k",
    quantize: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Weighted-average aggregation (the Elasticsearch `weighted_avg`
    agg) with the weight pulled from a JSON object field — the
    semi-structured `props` column a web-events table actually
    carries. Returns (key, n_events, sum_weight, weighted_avg) =
    sum(value·w) / sum(w) per key, ordered by key; NULL when a key's
    weights sum to zero (the ES empty-weight contract).

    Determinism: value snaps to integer quantize-units, the weight is
    an integer JSON field, so numerator (Σ q·w) and denominator
    (quantize·Σ w) are exact longs; the quotient — a RATIO OF EXACT
    INTEGERS that can land on 4dp half-boundaries — rounds via
    _div_round_expr (integer half-away-from-zero), never as a double.
    JSON extraction is `get_json_object($.field)` ↔ DuckDB
    `json_extract`, bit-identical for integer fields.

    Scale shape: ONE groupBy with map-side partial aggregation — the
    JSON parse is a per-row scan expression (codegen'd, no UDF), and
    only |keys| rows cross the exchange."""
    ten4 = 10 ** round_to
    w = F.get_json_object(F.col(props_col), f"$.{weight_field}").cast("long")
    q = F.round(F.col(value_col) * quantize, 0).cast("long")
    agg = events.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_events"),
        # cast BEFORE the fold: per-row q·w ≈ 10^7, so a long sum
        # wraps past ~10^12 rows per key — exactly the scale this
        # operator claims; decimal(38,0) accumulation keeps the
        # "exact integers" contract true (the hll fold does the same)
        F.sum(w.cast("decimal(38,0)")).alias("_sw"),
        F.sum((q * w).cast("decimal(38,0)")).alias("_num"),
    )
    return agg.select(
        "key",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("_sw").cast("long").alias("sum_weight"),
        F.when(
            F.col("_sw") > 0,
            F.expr(
                _div_round_expr("_num", f"{int(quantize)} * _sw", ten4)
            ).cast("double")
            / F.lit(float(ten4)),
        ).alias("weighted_avg"),
    ).orderBy("key")


def top_metrics(
    events: DataFrame,
    key_col: str = "event_type",
    sort_col: str = "ts",
    metric_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-metrics aggregation (the Elasticsearch `top_metrics` agg,
    size=1): per key, the metric value of the row with the LATEST sort
    value — "last reading per sensor". Returns (key, ts_us, event_id,
    top_value) ordered by key, with the sort bound emitted as an epoch
    MICROSECOND integer (the session_windows contract: timestamps
    never enter gate output).

    Determinism: the winner is max(struct(ts, id, value)) — a
    lexicographic max over (unique-ts, id) so ties on ts break on the
    integer id, identical on both engines; no floats participate in
    the ordering.

    Scale shape: ONE groupBy carrying a constant-size struct through
    map-side partial aggregation — deliberately NOT a window over the
    raw events (a per-key sort of the full table); only |keys| rows
    cross the exchange, the 100 TB plan you'd actually want."""
    mx = F.max(
        F.struct(
            F.col(sort_col).alias("ts"),
            F.col(id_col).alias("event_id"),
            F.col(metric_col).alias("v"),
        )
    ).alias("_mx")
    return (
        events.groupBy(F.col(key_col).alias("key"))
        .agg(mx)
        .select(
            "key",
            # parquet ts reads as TIMESTAMP_NTZ; session TZ pinned UTC
            F.unix_micros(F.col("_mx.ts").cast("timestamp")).alias("ts_us"),
            F.col("_mx.event_id").cast("long").alias("event_id"),
            F.round(F.col("_mx.v"), 4).alias("top_value"),
        )
        .orderBy("key")
    )


def _quantized_key_histogram(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    interval: str,
    value_col: str,
    quantize: int,
) -> DataFrame:
    """Shared per-(key, bucket) integer histogram: (key, bucket,
    n_events, _q) where _q is the value sum in INTEGER quantize-units
    (the _quantized_sum convention — order-independent long folds).
    One groupBy with map-side partial aggregation; every bucket-
    pipeline agg below runs over its |buckets x keys| output, never
    the raw events."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    return events.groupBy(F.col(key_col).alias("key"), bucket).agg(
        F.count("*").alias("n_events"),
        _units_sum(value_col, quantize).alias("_q"),
    )


def bucket_selector(
    events: DataFrame,
    min_sum: float,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Bucket-selector pipeline aggregation (the Elasticsearch
    `bucket_selector` agg): keep only histogram buckets whose value
    sum passes the predicate (sum_value > min_sum) — the HAVING of the
    aggregation DSL. Returns (key, bucket, n_events, sum_value)
    ordered by (key, bucket).

    Determinism: the predicate compares INTEGER quantize-units against
    an integer threshold (min_sum must be a short decimal with at most
    1/quantize precision — asserted), so bucket survival can never
    depend on float rounding; the emitted sum divides the long back
    once (shared _quantized_sum convention).

    Scale shape: the filter runs AFTER the histogram groupBy, over
    |buckets x keys| rows — a projection, no extra shuffle."""
    thr = float(min_sum) * int(quantize)
    thr_i = int(round(thr))
    if abs(thr - thr_i) > 1e-9:
        raise ValueError(
            f"min_sum={min_sum} has more precision than 1/{quantize} "
            "— the integer-units predicate would not be exact"
        )
    per = _quantized_key_histogram(events, ts_col, key_col, interval, value_col, quantize)
    return (
        per.filter(F.col("_q") > thr_i)
        .select(
            "key",
            "bucket",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("_q").cast("double") / F.lit(float(quantize)), 4).alias(
                "sum_value"
            ),
        )
        .orderBy("key", "bucket")
    )


def bucket_sort(
    events: DataFrame,
    size: int = 12,
    from_: int = 0,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Bucket-sort pipeline aggregation (the Elasticsearch
    `bucket_sort` agg with from/size): order histogram buckets by
    their metric and truncate — the "top N buckets by revenue" shape.
    Returns (key, bucket, n_events, sum_value) in (sum_value DESC,
    key, bucket) order, rows [from_, from_+size).

    Determinism: the sort key is the integer-units sum (distinct longs
    can't collide after the divide-back at quantize<=10^4 and 4dp
    emission), tie-broken by (key, bucket) — a total order, so the
    offset/limit cut is exact on both engines.

    Scale shape: sort + limit over |buckets x keys| rows AFTER the
    groupBy — TakeOrdered-sized, never a data-volume sort."""
    per = _quantized_key_histogram(events, ts_col, key_col, interval, value_col, quantize)
    out = (
        per.select(
            "key",
            "bucket",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("_q").cast("double") / F.lit(float(quantize)), 4).alias(
                "sum_value"
            ),
        )
        .orderBy(F.desc("sum_value"), "key", "bucket")
    )
    if from_:
        out = out.offset(int(from_))
    return out.limit(int(size))


def serial_diff(
    events: DataFrame,
    lag: int = 7,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Serial-differencing pipeline aggregation (the Elasticsearch
    `serial_diff` agg): value_t - value_{t-lag} along each key's
    bucket series — the seasonality-removal transform (lag=7 on daily
    buckets differences week-over-week). Returns (key, bucket,
    sum_value, diff_value) ordered by (key, bucket); diff_value is
    NULL for each key's first ``lag`` buckets (the ES contract).

    Determinism: the difference is LONG integer-units minus integer-
    units — exact in any partial-aggregate order — divided back once;
    it can go negative, so the rounded emission adds +0.0 (engine-wide
    signed-zero rule). The lag is positional over the bucket-string
    order within the key, same ORDER BY on both engines.

    Scale shape: one window over |buckets x keys| rows partitioned by
    key, after the histogram groupBy — no large-window hazard."""
    if lag < 1:
        raise ValueError("serial_diff needs lag >= 1")
    per = _quantized_key_histogram(events, ts_col, key_col, interval, value_col, quantize)
    w = Window.partitionBy("key").orderBy("bucket")
    qd = F.lit(float(quantize))
    lag_q = F.lag("_q", int(lag)).over(w)
    return per.select(
        "key",
        "bucket",
        F.round(F.col("_q").cast("double") / qd, 4).alias("sum_value"),
        (F.round((F.col("_q") - lag_q).cast("double") / qd, 4) + F.lit(0.0)).alias(
            "diff_value"
        ),
    ).orderBy("key", "bucket")


def has_parent_children(
    docs: DataFrame,
    terms: list[str],
    parent_col: str = "source",
    score_mode: str = "max",
    k_parents: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """ToChildBlockJoinQuery (the Lucene join module's downward
    direction; ES ``has_parent`` with score=true): rank parents by the
    block-join aggregate, then return the CHILDREN of the top-k
    parents, each child inheriting its parent's score — join-to-child
    score propagation, the reverse of bm25_parent_join_topk. Returns
    (doc_id, parent, parent_score) ordered (parent_score DESC, parent,
    doc_id) — a total order (parent breaks score ties, doc_id is
    unique).

    Determinism: parent scores come UNCHANGED from the parent-join row
    (already rounded under its doc_id-ordered fold contract); the
    child rows carry the score with no new float math at all.

    Plan: the top-k parent frame is k rows — broadcast into the
    children projection; no shuffle beyond the parent join's own
    aggregates."""
    top = bm25_parent_join_topk(
        docs, terms, parent_col, score_mode, k_parents, id_col, text_col, round_to
    )
    kids = docs.select(
        F.col(id_col).alias("doc_id"), F.col(parent_col).alias("parent")
    )
    return (
        kids.join(
            F.broadcast(top.select("parent", F.col("score").alias("parent_score"))),
            "parent",
        )
        .select("doc_id", "parent", "parent_score")
        .orderBy(F.desc("parent_score"), "parent", "doc_id")
    )


def cumulative_sum(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Cumulative-sum pipeline aggregation (the Elasticsearch
    `cumulative_sum` agg): the running total of each key's per-bucket
    value sum along its bucket series — the cumulative-revenue curve.
    Returns (key, bucket, sum_value, cum_value) ordered (key, bucket).
    The derivative agg is serial_diff at lag=1 and stays that row's
    surface.

    Determinism: the running fold accumulates INTEGER quantize-units
    (longs) over the bucket-string total order within the key, then
    divides back once per row — the running total is exact at every
    prefix, never a float cumsum whose intermediate rounding could
    drift from the oracle's.

    Scale shape: one window over |buckets x keys| rows partitioned by
    key AFTER the histogram groupBy — serial_diff's shape, no raw-data
    window."""
    per = _quantized_key_histogram(events, ts_col, key_col, interval, value_col, quantize)
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    qd = F.lit(float(quantize))
    return per.select(
        "key",
        "bucket",
        F.round(F.col("_q").cast("double") / qd, 4).alias("sum_value"),
        F.round(F.sum("_q").over(w).cast("double") / qd, 4).alias("cum_value"),
    ).orderBy("key", "bucket")


def bucket_script(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    pick_type: str = "click",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Bucket-script pipeline aggregation (the Elasticsearch
    `bucket_script` agg): a per-bucket arithmetic script over sibling
    metrics of the SAME histogram bucket — the canonical example is a
    click-through/share ratio per day. For each date bucket this
    emits (bucket, n_events, n_picked, picked_share, value_per_event)
    where picked_share = n_picked / n_events and value_per_event =
    sum(value) / n_events, both "scripts" over the bucket's own
    metrics. Ordered by bucket (unique — total order).

    Reference scope: the reference engine has no aggregation DSL; this
    row completes the ES pipeline-agg family next to bucket_selector /
    bucket_sort / serial_diff / stats_bucket (SURVEY §2.4 gap class).

    Determinism: both script outputs are RATIOS OF EXACT INTEGERS
    (counts and the quantized value sum), so they round via
    _div_round_expr in integer arithmetic — never double division
    (the CLAUDE.md half-boundary rule: S/(100n) lands exactly on 4dp
    half-boundaries with real probability). value_per_event is signed
    in general and carries +0.0.

    Scale shape: ONE groupBy over the date bucket with conditional
    partial aggregates riding along (map-side combine); the script is
    a projection over |buckets| rows — no second shuffle, no window."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    per = events.groupBy(bucket).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col(type_col) == pick_type, 1).otherwise(0))
        .cast("long")
        .alias("n_picked"),
        _units_sum(value_col, quantize).alias("_q"),
    )
    share_units = F.expr(
        _div_round_expr(
            "cast(n_picked as decimal(38,0))", "cast(n_events as decimal(38,0))"
        )
    )
    vpe_units = F.expr(
        _div_round_expr(
            "cast(_q as decimal(38,0))",
            f"cast(n_events as decimal(38,0)) * {int(quantize)}",
        )
    )
    return per.select(
        "bucket",
        "n_events",
        "n_picked",
        (share_units.cast("double") / F.lit(10000.0)).alias("picked_share"),
        (vpe_units.cast("double") / F.lit(10000.0) + F.lit(0.0)).alias(
            "value_per_event"
        ),
    ).orderBy("bucket")


def date_range_facets(
    events: DataFrame,
    ranges: list[tuple],
    ts_col: str = "ts",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Date-range aggregation (the Elasticsearch `date_range` agg):
    named [from, to) ranges — ``(name, lo_iso|None, hi_iso|None)``,
    None = unbounded — which MAY overlap: each bucket counts its
    matching events independently (overlap is why this is not a
    groupBy: it's the filters_agg one-pass shape — every range
    evaluates as a conditional sum inside ONE aggregate row, then
    stack unpivots). Returns (range_name, n_events, sum_value)
    ordered by range_name; sums fold quantized longs (engine-wide
    float-total convention). One scan, one single-row exchange,
    however many ranges ride along."""
    if not ranges:
        raise ValueError("date_range_facets needs at least one range")
    named = sorted(ranges, key=lambda r: r[0])
    aggs = []
    for i, (name, lo, hi) in enumerate(named):
        c = F.lit(True)
        if lo is not None:
            c = c & (F.col(ts_col) >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            c = c & (F.col(ts_col) < F.lit(hi).cast("timestamp"))
        aggs.append(F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"_n_{i}"))
        aggs.append(
            F.sum(
                F.when(
                    c, F.round(F.col(value_col) * quantize, 0).cast("long")
                ).otherwise(F.lit(0).cast("long"))
            ).alias(f"_q_{i}")
        )
    one = events.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _n_{i}, _q_{i}" for i, (name, _lo, _hi) in enumerate(named)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(named)}, {stack_args}) AS (range_name, n_events, _q)"
            )
        )
        .select(
            "range_name",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(
                F.col("_q").cast("double") / F.lit(float(quantize)), 4
            ).alias("sum_value"),
        )
        .orderBy("range_name")
    )


def auto_date_histogram(
    events: DataFrame,
    target_buckets: int = 1000,
    ts_col: str = "ts",
    keys: tuple = (),
    value_col: str = "value",
    quantize: int | None = 100,
) -> DataFrame:
    """Auto-interval date histogram (the Elasticsearch
    `auto_date_histogram` agg): picks the finest interval from the
    ladder (hour, day) whose bucket count stays <= ``target_buckets``,
    then runs the standard date_histogram at it. Returns
    (interval, bucket, keys..., n_events, sum_value) with the chosen
    interval as a literal column so the gate hash pins the CHOICE,
    not just the buckets.

    The choice reads one (min, max) row to the driver — bucket count
    = truncated-boundary crossings + 1, the same arithmetic the SQL
    oracle's date_diff ladder computes, so both sides pick the same
    rung. Spans past the ladder raise (the synthetic corpus spans 30
    days; extend the ladder before the data does)."""
    row = events.agg(F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx")).collect()[0]
    mn, mx = row["mn"], row["mx"]
    if mn is None:
        raise ValueError("auto_date_histogram: empty input")
    h0 = mn.replace(minute=0, second=0, microsecond=0)
    h1 = mx.replace(minute=0, second=0, microsecond=0)
    n_hours = int((h1 - h0).total_seconds() // 3600) + 1
    n_days = (mx.date() - mn.date()).days + 1
    if n_hours <= int(target_buckets):
        interval = "hour"
    elif n_days <= int(target_buckets):
        interval = "day"
    else:
        raise ValueError(
            f"auto_date_histogram: {n_days} daily buckets exceed the "
            f"target {target_buckets}; extend the interval ladder"
        )
    out = date_histogram(events, ts_col, keys, interval, value_col, quantize)
    return out.select(F.lit(interval).alias("interval"), "*")


def terms_shard_topk(
    docs: DataFrame,
    n_shards: int = 3,
    shard_size: int = 15,
    size: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sharded terms aggregation with error bounds (the Elasticsearch
    `terms` agg's DISTRIBUTED semantics: each shard returns only its
    local top `shard_size` terms, the coordinator merges what it
    received, and every returned bucket carries a
    doc_count_error_upper_bound). Returns (term, doc_count,
    error_upper) — doc_count sums only the counts the "shards"
    actually returned (it can undercount, exactly like ES), and
    error_upper = sum over non-returning shards of that shard's
    last-returned count (0 for exhausted shards: a shard that
    returned its whole term list can't be hiding anything). The true
    df is ALWAYS in [doc_count, doc_count + error_upper] — the ES
    guarantee, pinned by test.

    Shards are doc_id % n_shards — a pure function of the doc id, so
    the decomposition (and therefore the approximate counts) is
    cluster-size- and partitioning-invariant, the same determinism
    rule as docID assignment.

    Determinism: per-shard ranking is (cnt DESC, term ASC) row_number
    — a total order; all arithmetic is integer.

    Scale shape: df per (shard, term) is the standard distinct +
    groupBy shuffle; everything after runs over vocab-bounded rows
    (Heaps law), with the per-shard window partitioned by shard and
    the |shards|-row stats table broadcast. On a real cluster the
    "shards" map to index segments and the per-shard pass is
    segment-local — this operator demonstrates the coordinator merge
    + error-bound algebra at full fidelity."""
    from ..functions.analysis import tokens_col

    occ = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
        )
        .distinct()
        .select((F.col("doc_id") % n_shards).alias("shard"), "term")
    )
    per = occ.groupBy("shard", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = per.select(
        "shard",
        "term",
        "cnt",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("shard")).alias("n_terms"),
    )
    kept = ranked.filter(F.col("rn") <= int(shard_size))
    sstat = kept.groupBy("shard").agg(
        F.when(F.max("n_terms") <= int(shard_size), F.lit(0))
        .otherwise(F.min("cnt"))
        .cast("long")
        .alias("last_eff")
    )
    total_err = sstat.agg(F.sum("last_eff").alias("_te"))
    cand = (
        kept.join(F.broadcast(sstat), "shard")
        .groupBy("term")
        .agg(
            F.sum("cnt").cast("long").alias("doc_count"),
            F.sum("last_eff").cast("long").alias("_covered"),
        )
        .crossJoin(F.broadcast(total_err))
        .select(
            "term",
            "doc_count",
            (F.col("_te") - F.col("_covered")).cast("long").alias("error_upper"),
        )
    )
    return cand.orderBy(F.desc("doc_count"), "term").limit(int(size))


def diversified_sample_facets(
    docs: DataFrame,
    terms: list[str],
    dedup_col: str = "source",
    max_per_key: int = 2,
    sample_size: int = 50,
    facet_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Diversified-sampler aggregation (the Elasticsearch
    `diversified_sampler` agg with a sub-aggregation): restrict a
    sub-agg to a SAMPLE of the best-scoring matches, with at most
    ``max_per_key`` docs per ``dedup_col`` value (the anti-bias knob —
    one hot domain can't flood the sample), then run the facet
    sub-agg over the sample. Returns (facet_value, n_docs) ordered by
    facet_value.

    Sample selection is fully deterministic: per-doc BM25 scores are
    rounded BEFORE any ranking (the collapse contract), the per-key
    cap keeps row_number <= max_per_key over (score DESC, doc_id),
    and the global cut takes the top ``sample_size`` by the same
    total order.

    Scale shape: score agg (one doc_id shuffle) -> join the 3-column
    (id, dedup, facet) projection -> ONE window partitioned by the
    dedup key (the same shuffle a groupBy needs) -> global
    TakeOrdered(sample_size) -> facet groupBy over <= sample_size
    rows. No driver loops; the sample never materializes beyond one
    TakeOrdered."""
    scores = _bm25_doc_scores(docs, terms, id_col, text_col, round_to=4)
    keys = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(dedup_col).alias("_dk"),
        F.col(facet_col).alias("facet_value"),
    )
    w = Window.partitionBy("_dk").orderBy(F.desc("score"), F.asc("doc_id"))
    sample = (
        scores.join(keys, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(max_per_key))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(sample_size))
    )
    return (
        sample.groupBy("facet_value")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("facet_value")
    )


def hll_cardinality(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "item",
    m: int = 64,
) -> DataFrame:
    """HyperLogLog cardinality sketch (what the Elasticsearch
    `cardinality` agg actually runs): per key, estimate the distinct
    count of ``item_col`` (a STRING column — callers canonicalize:
    integers via CAST, fixed-precision doubles via their integer
    units, never raw double→string) from m first-bits-bucketed
    leading-zero registers. Returns (key, exact_distinct, v_empty,
    hll_estimate) ordered by key; exact_distinct is the evaluation
    baseline (a production run at 10^12 items omits it — the sketch
    is the point), v_empty the count of untouched registers.

    Flajolet et al.'s estimator with the small-range correction:
    register j = first 6 md5 bits, rank = leading zeros of the next
    60 bits + 1 (61 for an all-zero suffix); raw estimate
    alpha_64 * m^2 / sum_j 2^-M_j; when raw <= 2.5m and empty
    registers remain, linear counting m*ln(m/V) takes over.

    Determinism: the hash is md5 (bit-identical cross-engine, the
    simhash/sampling idiom); ranks come from bin()-length integer
    arithmetic, registers are integer maxes; the harmonic sum folds
    2^(61-M_j) as exact integers in decimal(38,0) (dyadic doubles
    would need 66 significant bits — a float fold would be order-
    sensitive), and the raw estimate is a RATIO OF EXACT INTEGERS
    (alpha_64 = 709/1000 exactly) rounded via _div_round_expr. The
    branch compares that integer-rounded estimate — both engines
    branch identically. Linear counting's ln(m/V) is a float of
    small-integer ratios, the gate-proven PMI exposure class.

    Scale shape: THE mergeable-sketch plan — groupBy (key, register)
    max(rank) with map-side combine means each executor ships at most
    m rows per key regardless of data volume; the register fold is a
    second |keys x m| aggregate. The exact_distinct baseline is the
    only data-volume-sized aggregate and exists for the gate."""
    if m != 64:
        raise ValueError("hll_cardinality: alpha is hardwired for m=64 (709/1000)")
    h = F.md5(F.col(item_col))
    j = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rank = F.when(w > 0, F.lit(61) - F.length(F.bin(w))).otherwise(F.lit(61))
    regs = (
        events.select(F.col(key_col).alias("key"), j.alias("j"), rank.alias("r"))
        .groupBy("key", "j")
        .agg(F.max("r").alias("M"))
    )
    per = regs.groupBy("key").agg(
        F.count("*").alias("_present"),
        # each term fits a long (<= 2^61) but 64 of them don't: cast
        # BEFORE the fold so the sum accumulates in decimal(38,0)
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - M) AS DECIMAL(38,0))")
        ).alias("_sp"),
    )
    num = 709 * m * m * (2 ** 61)
    per = per.select(
        "key",
        (F.lit(m) - F.col("_present")).cast("long").alias("v_empty"),
        (
            F.col("_sp")
            + (F.lit(m) - F.col("_present")).cast("decimal(38,0)")
            * F.expr(f"CAST('{2 ** 61}' AS DECIMAL(38,0))")
        ).alias("_S"),
    )
    est_raw = (
        F.expr(
            _div_round_expr(
                f"CAST('{num}' AS DECIMAL(38,0))", "CAST(1000 AS DECIMAL(38,0)) * _S"
            )
        ).cast("double")
        / F.lit(10000.0)
    )
    exact = events.groupBy(F.col(key_col).alias("key")).agg(
        F.countDistinct(F.col(item_col)).cast("long").alias("exact_distinct")
    )
    out = per.select(
        "key",
        "v_empty",
        F.when(
            (F.col("v_empty") > 0) & (est_raw <= F.lit(2.5 * m)),
            F.round(
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty")), 4
            ),
        )
        .otherwise(est_raw)
        .alias("hll_estimate"),
    )
    return (
        exact.join(out, "key")
        .select("key", "exact_distinct", "v_empty", "hll_estimate")
        .orderBy("key")
    )


def mad_agg(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    quantize: int = 100,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Median-absolute-deviation aggregation (ES
    ``median_absolute_deviation``, exact mode): per key, the median of
    |x - median(x)| — the robust dispersion metric ES serves from a
    t-digest sketch at scale; exact mode is the oracle-verifiable
    contract (same stance as percentiles_agg).

    Determinism: values snap to integer quantize-units DOUBLED
    (``d = 2 * round(value * quantize)``), so the interpolated median
    of the even integers is itself an exact INTEGER-valued double
    (midpoint of two even ints), the deviations |d - med| are exact
    integers, and the second percentile again runs on integer inputs —
    the domain where Spark ``percentile`` and DuckDB ``quantile_cont``
    are measured bit-identical ((n-1)·p interpolation). Emitted median
    is a multiple of 1/(2·quantize) and mad of 1/(4·quantize): exact
    short decimals at 4dp, never a rounding boundary. median can go
    negative -> + 0.0 (engine-wide signed-zero rule); mad >= 0 by
    construction.

    Scale shape: two key-grouped exact-percentile aggregates with the
    |keys|-row median table broadcast back between them — no global
    sort, no window; the per-key sort lives inside the aggregate.

    approx=True swaps both medians for Spark's mergeable
    approx_percentile sketch (rank error <= n/accuracy; map-side
    partial sketches, O(accuracy·log n) executor memory instead of
    the exact mode's O(rows per key) buffer) — the at-scale path,
    engine-specific like percentiles_agg(approx=True); exact mode
    stays the oracle contract. The sketch returns the nearest DATA
    point (an even integer here), so the /2q divide-back is exact
    either way."""
    med_fn = (
        f"approx_percentile(d, 0.5, {int(accuracy)})" if approx else "percentile(d, 0.5)"
    )
    mad_fn = (
        f"approx_percentile(dev2, 0.5, {int(accuracy)})"
        if approx
        else "percentile(dev2, 0.5)"
    )
    base = events.select(
        F.col(key_col).alias("key"),
        (F.round(F.col(value_col) * quantize, 0).cast("long") * 2).alias("d"),
    )
    med = base.groupBy("key").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(med_fn).alias("_med2"),
    )
    dev = base.join(F.broadcast(med.select("key", "_med2")), "key").select(
        "key", F.abs(F.col("d") - F.col("_med2")).cast("long").alias("dev2")
    )
    mad = dev.groupBy("key").agg(F.expr(mad_fn).alias("_mad2"))
    qd = F.lit(float(2 * quantize))
    return (
        med.join(mad, "key")
        .select(
            "key",
            "n_events",
            (F.round(F.col("_med2") / qd, 4) + F.lit(0.0)).alias("median"),
            F.round(F.col("_mad2") / qd, 4).alias("mad"),
        )
        .orderBy("key")
    )


def boxplot_agg(
    docs: DataFrame,
    col: str = "n_chars",
    key_col: str = "lang",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Boxplot aggregation (ES ``boxplot``, exact mode): per key the
    five-number summary — q1/q2/q3 (exact linear-interpolation
    percentiles), IQR, and Tukey whiskers: the SMALLEST data point
    >= q1 - 1.5·IQR and the LARGEST <= q3 + 1.5·IQR (ES boxplot's
    whisker contract — nearest actual values inside the fences, not
    the fences themselves). ES serves this from t-digest at scale;
    exact mode is the oracle-verifiable contract.

    Determinism: integer inputs make every quantile a multiple of
    0.25 ((n-1)·p interpolation at p in {.25,.5,.75}) — exact short
    decimals, no rounding boundary; 1.5 is exact-binary so the fences
    are exact doubles, identical on both engines, and the whisker
    comparisons are exact. Whiskers are data values (longs).

    Scale shape: one percentile aggregate, the |keys|-row quantile
    table broadcast back, one conditional min/max aggregate — no
    global sort, no window.

    approx=True swaps the quartiles for Spark's mergeable
    approx_percentile sketch (rank error <= n/accuracy; map-side
    partial sketches, O(accuracy·log n) executor memory instead of
    the exact mode's O(rows per key) buffer) — the at-scale path,
    engine-specific like percentiles_agg(approx=True); the whisker
    pass is conditional min/max either way (O(1) state). Exact mode
    stays the oracle contract."""
    if approx:
        q_expr = f"approx_percentile(x, array(0.25D, 0.5D, 0.75D), {int(accuracy)})"
    else:
        q_expr = "percentile(x, array(0.25D, 0.5D, 0.75D))"
    base = docs.select(F.col(key_col).alias("key"), F.col(col).alias("x"))
    q = base.groupBy("key").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(q_expr).alias("_q"),
    ).select(
        "key",
        "n_docs",
        F.element_at("_q", 1).alias("_q1"),
        F.element_at("_q", 2).alias("_q2"),
        F.element_at("_q", 3).alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    fenced = base.join(F.broadcast(q), "key").select(
        "key",
        "x",
        (F.col("_q1") - F.lit(1.5) * iqr).alias("_lo"),
        (F.col("_q3") + F.lit(1.5) * iqr).alias("_hi"),
    )
    whisk = fenced.groupBy("key").agg(
        F.min(F.when(F.col("x") >= F.col("_lo"), F.col("x"))).alias("lower_whisker"),
        F.max(F.when(F.col("x") <= F.col("_hi"), F.col("x"))).alias("upper_whisker"),
    )
    return (
        q.join(whisk, "key")
        .select(
            "key",
            "n_docs",
            F.round("_q1", 4).alias("q1"),
            F.round("_q2", 4).alias("q2"),
            F.round("_q3", 4).alias("q3"),
            F.round(iqr, 4).alias("iqr"),
            "lower_whisker",
            "upper_whisker",
        )
        .orderBy("key")
    )


def string_stats(docs: DataFrame, col: str = "source") -> DataFrame:
    """String-stats aggregation (the Elasticsearch `string_stats` agg
    over a keyword field): one row of (n_values, min_length,
    max_length, avg_length, entropy) — Shannon entropy (log2) of the
    CHARACTER distribution across all field values, ES's
    show_distribution source metric.

    Determinism: lengths are integers; avg_length is a RATIO OF EXACT
    INTEGERS -> _div_round_expr. Entropy follows the unigram_logprob
    idiom exactly: -sum_c (c/N)*log2(c/N) = -(1/N) * sum_c c*log2(c/N);
    each char's log2(c/N) quantizes to 1e-6 units SEPARATELY, weights
    by the exact integer count c, folds as integers (order-free), and
    divides back once — the only cross-engine float op is log2 over a
    division of exact integers, the exposure the PMI/surprisal rows
    already pass the gate with. entropy > 0 whenever two distinct
    chars exist; no signed-zero exposure here.

    Scale shape: the first groupBy collapses to DISTINCT field values
    (keyword cardinality, not row count); chars explode over that
    small frame only. One row out."""
    vals = docs.groupBy(F.col(col).alias("v")).agg(
        F.count("*").cast("decimal(38,0)").alias("nv")
    )
    lens = vals.agg(
        F.sum("nv").alias("_n"),
        F.min(F.length("v")).cast("long").alias("min_length"),
        F.max(F.length("v")).cast("long").alias("max_length"),
        F.sum(
            (F.col("nv") * F.length("v")).cast("decimal(38,0)")
        ).alias("_sl"),
    )
    ch = vals.select(
        "nv", F.explode(F.split("v", "")).alias("ch")
    ).filter(F.col("ch") != "")
    cc = ch.groupBy("ch").agg(F.sum("nv").alias("c"))
    tot = cc.agg(F.sum("c").alias("N"))
    units = F.round(
        F.round(
            F.log2(F.col("c").cast("double") / F.col("N").cast("double")), 6
        )
        * F.lit(1000000.0)
    ).cast("long")
    ent = (
        cc.crossJoin(F.broadcast(tot))
        .select((F.col("c") * units).cast("decimal(38,0)").alias("ci"), "N")
        .groupBy("N")
        .agg(F.sum("ci").alias("_s"))
        .select(
            F.round(
                -(
                    F.col("_s").cast("double")
                    / F.lit(1000000.0)
                    / F.col("N").cast("double")
                ),
                4,
            ).alias("entropy")
        )
    )
    return lens.crossJoin(ent).select(
        F.col("_n").cast("long").alias("n_values"),
        "min_length",
        "max_length",
        (
            F.expr(_div_round_expr("_sl", "_n")).cast("double")
            / F.lit(10000.0)
        ).alias("avg_length"),
        "entropy",
    )


def t_test(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    group_a: str = "click",
    group_b: str = "error",
    quantize: int = 100,
) -> DataFrame:
    """t_test aggregation (the Elasticsearch `t_test` agg,
    heteroscedastic = Welch's unpaired two-sample t, the ES default):
    one row (n_a, n_b, mean_a, mean_b, t_stat) for the metric split by
    two key values.

    Determinism: sums and sums-of-squares fold as exact integers in
    1/quantize units (decimal(38,0) — the extended_stats convention);
    means are RATIOS OF EXACT INTEGERS -> _div_round_expr. The t
    statistic is computed in doubles from those exact integers with a
    PINNED op order mirrored textually in the oracle —
    var = (ss - s*s/n) / (n-1), se = sqrt(var_a/n_a + var_b/n_b),
    t = (s_a/n_a - s_b/n_b) / se — every op is IEEE-exact (+,-,*,/,
    sqrt), so the pre-round double is bit-identical cross-engine; the
    quantize scale cancels in t. The sqrt denominator keeps the
    rounded value off 4dp boundaries (no 5-decimal rational ending in
    5 squares to a 4-decimal rational); t is signed -> + 0.0.

    Scale shape: one conditional aggregate over the filtered scan —
    a single row reaches the driver."""
    q = int(quantize)
    qv = F.round(F.col(value_col) * q, 0).cast("long").cast("decimal(38,0)")
    is_a = F.col(key_col) == group_a
    is_b = F.col(key_col) == group_b
    zero = F.lit(0).cast("decimal(38,0)")
    agg = events.filter(is_a | is_b).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, qv).otherwise(zero)).alias("_sa"),
        F.sum(F.when(is_b, qv).otherwise(zero)).alias("_sb"),
        F.sum(F.when(is_a, (qv * qv).cast("decimal(38,0)")).otherwise(zero)).alias("_qa"),
        F.sum(F.when(is_b, (qv * qv).cast("decimal(38,0)")).otherwise(zero)).alias("_qb"),
    )
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    u1 = F.col("_sa").cast("double")
    u2 = F.col("_sb").cast("double")
    q1 = F.col("_qa").cast("double")
    q2 = F.col("_qb").cast("double")
    var1 = (q1 - u1 * u1 / n1) / (n1 - F.lit(1.0))
    var2 = (q2 - u2 * u2 / n2) / (n2 - F.lit(1.0))
    se = F.sqrt(var1 / n1 + var2 / n2)
    t = (u1 / n1 - u2 / n2) / se
    return agg.select(
        "n_a",
        "n_b",
        (
            F.expr(
                _div_round_expr("_sa", f"cast(n_a as decimal(38,0)) * {q}")
            ).cast("double")
            / F.lit(10000.0)
            + F.lit(0.0)
        ).alias("mean_a"),
        (
            F.expr(
                _div_round_expr("_sb", f"cast(n_b as decimal(38,0)) * {q}")
            ).cast("double")
            / F.lit(10000.0)
            + F.lit(0.0)
        ).alias("mean_b"),
        (F.round(t, 4) + F.lit(0.0)).alias("t_stat"),
    )


def normalize_agg(
    events: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    value_col: str = "value",
    quantize: int = 100,
) -> DataFrame:
    """Normalize pipeline aggregation (the Elasticsearch `normalize`
    parent-pipeline agg, methods `percent_of_sum` and `rescale_0_1`)
    over a date histogram: each bucket's value sum rescaled against
    the sums of ALL buckets. Returns (bucket, n_events, sum_value,
    percent_of_sum, rescale_0_1) ordered by bucket.

    Determinism: bucket sums are exact integer quantize-units
    (_units_sum); both normalized columns are RATIOS OF EXACT INTEGERS
    -> _div_round_expr (percent = 100*q/Q; rescale = (q-qmin)/
    (qmax-qmin)), never double division — percent-of-sum lands on 4dp
    half-boundaries with real probability. Sums can be negative in
    general, so both emissions add +0.0. Degenerate rescale (all
    buckets equal) emits NULL; percent_of_sum is NULL unless the
    grand total is strictly positive (_div_round_expr's sign split
    needs den > 0, and DuckDB's // errors on zero). Documented here
    and in the oracle.

    Scale shape: histogram groupBy first (map-side partial agg, only
    |buckets| rows shuffle), then a broadcast one-row totals frame —
    the normalize pass never re-reads the events."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    per = events.groupBy(bucket).agg(
        F.count("*").alias("n_events"),
        _units_sum(value_col, quantize).cast("decimal(38,0)").alias("_q"),
    )
    tot = per.agg(
        F.sum("_q").alias("_tot"),
        F.min("_q").alias("_lo"),
        F.max("_q").alias("_hi"),
    )
    qd = F.lit(float(quantize))
    # _div_round_expr's sign split assumes den > 0: a zero total would
    # be NULL in Spark's div but a hard error in DuckDB's //, and a
    # negative total flips the half-away direction — guard with
    # _tot > 0 (NULL percent otherwise), mirroring the hi != lo
    # rescale guard; the oracle carries the identical CASE.
    pct = F.when(
        F.col("_tot") > 0,
        F.expr(_div_round_expr("_q * 100", "_tot")).cast("double") / F.lit(10000.0),
    )
    resc = F.when(
        F.col("_hi") != F.col("_lo"),
        F.expr(_div_round_expr("_q - _lo", "_hi - _lo")).cast("double")
        / F.lit(10000.0)
        + F.lit(0.0),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_events",
            F.round(F.col("_q").cast("double") / qd, 4).alias("sum_value"),
            (pct + F.lit(0.0)).alias("percent_of_sum"),
            resc.alias("rescale_0_1"),
        )
        .orderBy("bucket")
    )


def cumulative_cardinality(
    events: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    id_col: str = "user_id",
) -> DataFrame:
    """Cumulative-cardinality pipeline aggregation (the Elasticsearch
    `cumulative_cardinality` agg over a per-bucket `cardinality`):
    per date-histogram bucket, the bucket's own distinct-id count plus
    the EXACT cumulative distinct-id count up to and including the
    bucket (ES computes this incrementally from HLL sketches and is
    approximate; the exact mode is the gate-verifiable contract).
    Returns (bucket, n_events, n_unique, cum_unique) ordered by
    bucket — integers only, nothing to round.

    Exact cumulative distinct WITHOUT a per-prefix re-count: an id
    enters the cumulative exactly once, at its FIRST bucket — so
    groupBy(id).min(bucket) -> per-bucket new-id counts -> running sum.
    Scale shape: one shuffle over |ids| for first-seen, one over
    |buckets| for the histogram; the unpartitioned running-sum window
    runs over the |buckets|-row frame only (bucket count grows with
    time span, not data volume — same bound as date_histogram_pipeline
    documents)."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH:00"}[interval]
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)), fmt).alias("bucket")
    base = events.select(bucket, F.col(id_col).alias("_id"))
    per = base.groupBy("bucket").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("_id").alias("n_unique"),
    )
    new_ids = (
        base.groupBy("_id")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.join(new_ids, "bucket", "left")
        .select(
            "bucket",
            "n_events",
            "n_unique",
            F.sum(F.coalesce(F.col("_new"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_unique"),
        )
        .orderBy("bucket")
    )


def vwh_centroids(
    hist: dict[int, int], k: int = 6, n_iters: int = 8
) -> list[int]:
    """Deterministic 1-D weighted Lloyd k-means over a (value-unit ->
    count) histogram, returning k sorted INTEGER micro-unit centroids
    (micro = unit/10⁴; with quantize=100 cent units that is 6dp of the
    original value — the kmeans 6dp rounding contract, made exact by
    staying integral).

    Determinism contract (what lets the DuckDB oracle replay bucket
    assignment from the same centroid literals): init = k rank-evenly-
    spaced distinct values; assignment = nearest centroid with ties to
    the SMALLER centroid (strict `2v > c_i + c_{i+1}` midpoint
    crossings — all integer, no float anywhere); empty clusters keep
    their previous centroid; the weighted-mean update rounds half away
    from zero to integer micro-units every iteration. Runs on the
    DRIVER over the distinct-value histogram — bounded by the value
    domain (2-decimal values -> <= ~10⁴ distinct), never by row
    count."""
    if not hist:
        raise ValueError("empty histogram")
    vals = sorted(hist)
    m = len(vals)
    kk = min(int(k), m)
    if kk < 1:
        raise ValueError("k must be >= 1")
    cent = [vals[(j * (m - 1)) // max(kk - 1, 1)] * 10000 for j in range(kk)]
    for _ in range(n_iters):
        sums = [0] * kk
        cnts = [0] * kk
        for v in vals:
            vm = v * 10000
            b = 0
            for i in range(kk - 1):
                if 2 * vm > cent[i] + cent[i + 1]:
                    b = i + 1
            c = hist[v]
            sums[b] += vm * c
            cnts[b] += c
        nxt = []
        for j in range(kk):
            if cnts[j]:
                num, den = sums[j], cnts[j]
                sign = 1 if num >= 0 else -1
                nxt.append(sign * ((2 * abs(num) + den) // (2 * den)))
            else:
                nxt.append(cent[j])
        cent = sorted(nxt)
    return cent


def variable_width_histogram(
    events: DataFrame,
    k: int = 6,
    n_iters: int = 8,
    value_col: str = "value",
    quantize: int = 100,
    centroids: list[int] | None = None,
    max_distinct: int = 100_000,
) -> DataFrame:
    """Variable-width histogram (the Elasticsearch
    `variable_width_histogram` agg): values cluster into at most ``k``
    variable-width buckets. ES's implementation is a one-pass
    collector heuristic (order-dependent, approximate); the
    deterministic contract here is 1-D weighted k-means over the
    distinct-value histogram (vwh_centroids), which is what makes the
    result oracle-able. Returns non-empty buckets
    (bucket, n_events, min_value, max_value, centroid) ordered by
    bucket — min/max exact unit values divided once; centroid is the
    trained integer micro-unit centroid divided once (never a
    recomputed float mean).

    Scale shape: training reads a (distinct unit value -> count)
    histogram — ONE map-side-combined groupBy whose cardinality is the
    value DOMAIN (guarded at ``max_distinct``), independent of row
    count; assignment is a k-1-term integer CASE chain folded into the
    scan projection (no join, no UDF), then one |k|-bucket groupBy."""
    q = int(quantize)
    vu = F.round(F.col(value_col) * q, 0).cast("long")
    if centroids is None:
        hist_rows = (
            events.select(vu.alias("_v")).groupBy("_v").count().collect()
        )
        if len(hist_rows) > max_distinct:
            raise ValueError(
                f"value domain {len(hist_rows)} exceeds max_distinct={max_distinct}"
            )
        centroids = vwh_centroids(
            {r._v: r["count"] for r in hist_rows}, k=k, n_iters=n_iters
        )
    cent = [int(c) for c in centroids]
    bucket = F.lit(0)
    for i in range(len(cent) - 1):
        bucket = bucket + F.when(
            (F.lit(2) * vu * 10000) > F.lit(cent[i] + cent[i + 1]), 1
        ).otherwise(0)
    qd = F.lit(float(q))
    cmap = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(cent))]),
        F.array(*[F.lit(c) for c in cent]),
    )
    return (
        events.select(vu.alias("_v"), bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_v").alias("_lo"),
            F.max("_v").alias("_hi"),
        )
        .select(
            "bucket",
            "n_events",
            (F.col("_lo").cast("double") / qd).alias("min_value"),
            (F.col("_hi").cast("double") / qd).alias("max_value"),
            (cmap[F.col("bucket")].cast("double") / F.lit(1000000.0)).alias(
                "centroid"
            ),
        )
        .orderBy("bucket")
    )
