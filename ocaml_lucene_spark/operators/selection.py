"""Quality-ranked selection under a token budget.

The data-selection step of a pretraining pipeline: rank documents by
a quality score and keep the best prefix whose cumulative token count
fits the training budget. A naive implementation is a GLOBAL ordered
window cumsum — one partition holding the whole corpus, the classic
driver-shaped bottleneck. Here the cut is computed in two phases:

1. bucket the score (floor(score * bucket_quant)) and aggregate ONE
   (bucket -> sum_tokens) row per bucket — |buckets| is bounded by
   quant x score range (e.g. 101 buckets for a [0, 1] ratio at
   quant=100), so the driver-side cumulative walk is metadata-sized
   at any corpus scale;
2. buckets strictly above the boundary are included with a plain
   filter (no window at all); ONLY the boundary bucket — a 1/|buckets|
   fraction of the data — pays an ordered cumsum window.

Because the bucketization is monotone in score and score ties always
share a bucket, the result is EXACTLY the global greedy prefix
(a doc is kept iff its prefix-cumulative under (score desc, doc_id
asc) is <= budget), which is what the SQL oracle computes with a
single global window — the two algorithms agreeing is the test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# driver-safety guard: the phase-1 collect is |buckets| rows; a quant
# chosen badly for an unbounded score range should fail loudly, not
# OOM the driver
MAX_BUCKETS = 100_000


def token_budget_select(
    scored: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_quant: int = 100,
) -> DataFrame:
    """Greedy prefix selection: order docs (score desc, doc_id asc)
    and keep each doc whose running token total stays <= ``budget``.
    Input is a pre-scored frame (doc_id, score, n_tokens) — scores
    must already be rounded/deterministic (gate convention). Returns
    (doc_id, score, n_tokens) ordered (score desc, doc_id asc).

    Determinism: the keep/drop decision is a pure function of the
    (score, doc_id) total order and integer token counts — the
    bucketed evaluation strategy cannot change the result (see module
    docstring), only where the work happens."""
    budget = int(budget)
    out_cols = [
        F.col(id_col).alias("doc_id"),
        F.col(score_col).alias("score"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ]
    bucket = F.floor(F.col(score_col) * F.lit(float(bucket_quant))).cast("long")
    per_bucket = (
        scored.groupBy(bucket.alias("b"))
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("toks"))
        .collect()
    )
    if len(per_bucket) > MAX_BUCKETS:
        raise ValueError(
            f"token_budget_select: {len(per_bucket)} score buckets exceeds "
            f"{MAX_BUCKETS}; lower bucket_quant for this score range"
        )
    spark = scored.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double, n_tokens long")
    full: list[int] = []
    boundary: int | None = None
    offset = 0
    cum = 0
    for b, toks in sorted(((r["b"], r["toks"]) for r in per_bucket), reverse=True):
        if cum + toks <= budget:
            full.append(int(b))
            cum += toks
        else:
            boundary = int(b)
            offset = cum
            break
    parts: list[DataFrame] = []
    if full:
        parts.append(scored.filter(bucket.isin(full)).select(*out_cols))
    if boundary is not None:
        # partition on the bucket expression: constant over the
        # filtered frame (one partition holds just the boundary
        # bucket), but a real column, so Catalyst doesn't constant-fold
        # it into an unpartitioned global window
        w = Window.partitionBy(bucket).orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        parts.append(
            scored.filter(bucket == boundary)
            .withColumn("_cum", F.sum(F.col(tokens_col).cast("long")).over(w))
            .filter(F.col("_cum") + F.lit(offset) <= budget)
            .select(*out_cols)
        )
    if not parts:
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


def domain_cap_select(
    docs: DataFrame,
    cap: int = 10,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb / CCNet-style "keep at
    most N documents per registered domain" selection): within each
    source, rank docs by (n_chars DESC, doc_id ASC) — longest-first,
    the quality proxy stored in-table — and keep rank <= cap. Returns
    EVERY doc as (doc_id, source, rank_in_source, kept) ordered by
    doc_id, so the row doubles as an audit log of what the cap
    dropped.

    Determinism: rank is a row_number over a TOTAL order (doc_id is
    unique within a source), and every emitted column is an integer or
    boolean — no float contract at all.

    Scale shape: one window partitioned by the domain — the natural
    key at corpus scale (CommonCrawl-sized inputs have ~10^7 domains,
    so partitions stay small; a single pathological domain is one
    task, not a global sort). The final orderBy is gate-determinism
    only."""
    w = Window.partitionBy(source_col).orderBy(
        F.desc(len_col), F.asc(id_col)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            F.col(len_col).alias(len_col),
        )
        .withColumn("rank_in_source", F.row_number().over(w).cast("long"))
        .select(
            "doc_id",
            "source",
            "rank_in_source",
            (F.col("rank_in_source") <= int(cap)).alias("kept"),
        )
        .orderBy("doc_id")
    )
