"""End-to-end training-data preparation: clean -> dedup -> select.

The composition a real pretraining pipeline runs over raw webtext,
expressed as ONE dataflow so the gate verifies the stage BOUNDARIES
(what survives cleaning feeds dedup; what survives dedup competes for
the token budget), not just each stage in isolation:

1. Gopher-rule cleaning (functions/textstats.gopher_quality_filter):
   a doc survives iff no quality/repetition rule fires;
2. exact dedup over the survivors: canonical = min doc_id per
   md5(text) (operators/dedup semantics restricted to the kept set —
   a dropped dirty duplicate must NOT shadow a kept clean one);
3. quality-ranked selection under a token budget
   (operators/selection.token_budget_select, score =
   lexical_diversity): the greedy (score desc, doc_id) prefix whose
   cumulative token count fits.

Scale shape is the three stages' own (each documented in its module):
the composition adds only doc_id semi-joins between them. Every stage
is individually gate-green; this row pins the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_dedup_select(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    **gopher_kwargs,
) -> DataFrame:
    """(doc_id, score, n_tokens) — the docs a budget-bounded training
    run would keep, ordered (score desc, doc_id asc)."""
    from ..functions.textstats import gopher_quality_filter, quality_features
    from .selection import token_budget_select

    kept_ids = (
        gopher_quality_filter(docs, id_col=id_col, text_col=text_col, **gopher_kwargs)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    kept = docs.join(
        kept_ids.withColumnRenamed("doc_id", id_col), on=id_col, how="left_semi"
    )
    canon = (
        kept.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cdocs = docs.join(canon, on=id_col, how="left_semi")
    scored = quality_features(cdocs, id_col, text_col).select(
        "doc_id", F.col("lexical_diversity").alias("score"), "n_tokens"
    )
    return token_budget_select(scored, budget=budget)
