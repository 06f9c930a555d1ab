"""Deterministic sampling for data mixing.

A pretraining pipeline re-weights its sources (down-sample the
dominant crawl, up-weight rare high-quality strata); doing that with
``df.sample`` ties the selection to partition-local RNG state, so the
"same" sample changes with partitioning and cluster size. Here the
keep/drop decision is a pure hash function of (doc_id, seed) — the
same reproducibility contract as assign_doc_ids' input-derived ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def sample_stratified(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling — the data-mixing step of a
    pretraining pipeline (down-sample the dominant stratum, up-weight
    the rare ones, reproducibly). A doc survives iff
    u(doc_id, seed) < fractions[stratum], where u = the first 15 hex
    digits of md5(doc_id|seed) scaled to [0, 1).

    Unlike ``df.sample`` (partition-dependent RNG), u is a pure
    function of (doc_id, seed): the sample is identical across runs,
    partitionings, and cluster sizes, and an oracle can replay it
    exactly. Strata absent from ``fractions`` are dropped (rate 0).
    Returns (doc_id, stratum) ordered by doc_id.

    Scale shape: one scan, one codegen'd filter (md5 + a CASE over the
    handful of strata) — no shuffle at all until the caller aggregates;
    use exactly-representable fractions (0.5, 0.25, …) so the
    threshold compare has no decimal-vs-binary ambiguity."""
    if not fractions:
        raise ValueError("sample_stratified needs at least one stratum rate")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    thresh = F.lit(0.0)
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(stratum_col) == stratum
        expr = F.when(cond, F.lit(float(frac))) if expr is None else expr.when(cond, F.lit(float(frac)))
    thresh = expr.otherwise(F.lit(0.0))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            u.alias("_u"),
            thresh.alias("_t"),
        )
        .filter(F.col("_u") < F.col("_t"))
        .select("doc_id", "stratum")
        .orderBy("doc_id")
    )


def mix_to_proportions(
    docs: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Mix strata to TARGET proportions (the pretraining data-mixing
    recipe expressed as weights, e.g. {en: 5, de: 2, fr: 1}): derive
    the per-stratum acceptance fraction that realizes the mixture in
    expectation while keeping the most-constrained stratum whole —
    scale = min_s(n_s / w_s), fraction_s = w_s * scale / n_s — then
    apply the deterministic md5-uniform filter (sample_stratified).

    The fraction derivation is double arithmetic in a FIXED operation
    order ((w * scale) / n after scale = min(n / w)), replayed
    verbatim by the SQL oracle, so the survivor set is bit-identical.
    Strata absent from ``weights`` are dropped. Returns
    (doc_id, stratum) ordered by doc_id.

    Scale shape: one tiny groupBy(stratum) count (|strata| rows to the
    driver — the only collect), then sample_stratified's scan +
    codegen'd filter; nothing shuffles at data size."""
    if not weights:
        raise ValueError("mix_to_proportions needs at least one stratum weight")
    counts = {
        r["stratum"]: r["n"]
        for r in docs.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["stratum"] in weights
    }
    if not counts:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, stratum string"
        )
    scale = min(counts[s] / weights[s] for s in counts)
    fractions = {s: weights[s] * scale / counts[s] for s in counts}
    return sample_stratified(docs, fractions, stratum_col, seed, id_col)
