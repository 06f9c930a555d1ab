"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions (codegen) with DuckDB-oracle equivalents —
the heuristics are deliberately simple/deterministic (n-gram/stopword
counting, ratio features, md5 fingerprints), the point is the Spark
plumbing: one pass, no UDFs, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens_col

# tiny deterministic stopword profiles (mirrored in the oracle SQL)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "that"],
    "de": ["der", "und", "die", "das", "nicht", "mit", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"],
}


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, hits): argmax of stopword-profile hits;
    'und' (undetermined) when no profile matches. Ties broken by
    profile order en < de < fr via max(struct(hits, rank)).

    Plan shape (r9): tokenize -> per-profile hit counts -> ONE
    ``greatest(struct)`` in its own projection -> field extraction.
    Referencing the greatest() from a single select expanded the whole
    struct (and its three array filters) once per output column — 9
    filter scans per row in the before-plan; the split keeps each hit
    count and the greatest evaluated exactly once (CollapseProject
    leaves multiply-referenced non-cheap aliases alone). The source is
    routed through ensure_compute_parallelism: a single-row-group
    parquet corpus is one scan task however small maxPartitionBytes
    is, which serialized this whole CPU-bound pipeline."""
    from ..session import ensure_compute_parallelism

    toks = tokens_col(text_col).alias("toks")
    base = ensure_compute_parallelism(docs).select(F.col(id_col).alias("doc_id"), toks)
    cands = []
    for rank, (lang, words) in enumerate(LANG_PROFILES.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))
        cands.append(F.struct(hits.alias("hits"), F.lit(-rank).alias("prio"), F.lit(lang).alias("lang")))
    best_base = base.select("doc_id", F.greatest(*cands).alias("_best"))
    best = F.col("_best")
    return best_base.select(
        "doc_id",
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und")).alias("pred_lang"),
        best.getField("hits").alias("hits"),
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_unique, avg_token_len,
    stopword_ratio, alnum_ratio, quality_score) — the usual cheap
    quality filters (length, lexical diversity, stopword density,
    punctuation/noise share), rounded for oracle comparison."""
    # One evaluation per heavy expression (r9): the before-plan
    # computed length(regexp_replace(lower(text), ...)) TWICE (avg
    # token len + alnum ratio) inside one projection; hoisting the
    # counts into their own select pins single evaluation
    # (CollapseProject keeps multiply-referenced non-cheap aliases
    # split). ensure_compute_parallelism: single-row-group corpora
    # otherwise run this CPU-bound pipeline in one scan task.
    from ..session import ensure_compute_parallelism

    toks = tokens_col(text_col)
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    base = ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_unique"),
        # (A regexp_count('[a-z0-9]') formulation was A/B-measured r9:
        # within noise of this, slightly slower — kept as-is.)
        F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")).alias("_alnum"),
        F.size(F.filter("toks", lambda t: F.array_contains(en, t))).alias("_stop"),
    )
    alnum_chars = F.col("_alnum")
    stop_hits = F.col("_stop")
    out = base.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_unique",
        F.round(
            F.when(F.col("n_tokens") > 0, alnum_chars / F.col("n_tokens")).otherwise(0.0), 4
        ).alias("avg_token_len"),
        F.round(
            F.when(F.col("n_tokens") > 0, stop_hits / F.col("n_tokens")).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(F.col("n_chars") > 0, alnum_chars / F.col("n_chars")).otherwise(0.0), 4
        ).alias("alnum_ratio"),
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("n_unique") / F.col("n_tokens")).otherwise(0.0), 4
        ).alias("lexical_diversity"),
    )
    return out


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_tokens, n_unique): whitespace split vs
    the [a-z0-9]+ regex grammar."""
    toks = tokens_col(text_col)
    ws = F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != F.lit(""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
    )


# GPT-style pre-tokenizer classes (the BPE input segmentation): runs of
# letters, runs of digits, runs of other non-space symbols — evaluated
# over lowercased text; dialect-neutral so Spark (Java regex) and
# DuckDB (RE2) agree byte-for-byte.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def bpe_token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bpe_tokens, n_bpe_unique): BPE-ish pre-tokenization
    counts — the token-budget estimator a training-data pipeline runs
    before the (proprietary) BPE merge table is applied. One codegen
    pass, no UDF."""
    # pattern as a literal Column — embedding it in a SQL string would
    # eat the \s escape (Spark SQL string literals process backslashes)
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_bpe_unique"),
    )


def bigram_collocations(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n_pairs, pmi): adjacent-bigram collocation strength —
    pmi = ln((n_pairs/P) / ((c1/T)·(c2/T))) with T = total tokens and
    P = total adjacent pairs. The phrase-mining / tokenizer-merge
    signal a training pipeline computes corpus-wide.

    All JVM expressions: bigrams come from zipping the token array with
    its shift (arrays_zip of two slices — no position join, no UDF);
    unigram counts from one explode. Two aggregations, each one
    shuffle. The unigram side is vocabulary-sized (Heaps-bounded): AQE
    broadcasts it when it fits, else it stays a co-partitioned shuffle
    join — both scale-safe; the one-row totals are broadcast.

    Output is deterministically ordered (pmi DESC, w1, w2 — a total
    order since (w1, w2) is unique): the result is vocabulary²-bounded
    (min_count-filtered, far smaller in practice), so the sort is
    negligible next to the two aggregations even at corpus scale."""
    toks = tokens_col(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))).alias("w1"),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = (
        base.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    totals = base.select(
        F.sum(F.size("t")).alias("T"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("P"),
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        pair_counts.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pairs",
            # + 0.0 normalizes signed zero (IEEE: -0.0 + 0.0 = +0.0).
            # pmi can round to exactly zero from below (raw ~ -3e-6 at
            # sf0.01); the driver's value hash is repr-sensitive, so
            # Spark 0.0 vs DuckDB -0.0 is a gate failure even though
            # Python == calls them equal. Convention: EVERY rounded
            # float gate column that can go negative gets + 0.0 on BOTH
            # sides (here and in oracle_sql_ops.bigram_collocations_sql).
            (
                F.round(
                    F.log(
                        (F.col("n_pairs") / F.col("P"))
                        / ((F.col("c1") / F.col("T")) * (F.col("c2") / F.col("T")))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, exact_fp, min_shingle_fp): exact md5 of text plus the
    minimum shingle hash (winnowing-style content fingerprint that
    survives small edits at the ends)."""
    from ..operators.dedup import shingles_col

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("exact_fp"),
        F.array_min(
            F.transform(shingles_col(text_col, n), lambda s: F.md5(s))
        ).alias("min_shingle_fp"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_3grams, dup_3gram_frac, top_2gram_frac): the
    Gopher-style within-document repetition filters a training-data
    pipeline runs (Rae et al. 2021 §A1.1 "repetition" rules, adapted
    to word n-grams since this corpus has no line structure):

    - dup_3gram_frac: fraction of 3-gram OCCURRENCES whose 3-gram
      appears at least twice in the doc (boilerplate / loop detector);
    - top_2gram_frac: occurrences of the doc's most frequent 2-gram
      over all its 2-gram occurrences (stuck-phrase detector).

    Both ratios are counts-over-counts (integers divided once at the
    end, rounded 4dp — no float folding). Plan: one shingle explode
    per gram size, groupBy (doc_id, gram) with map-side combine, then
    a per-doc aggregate — two shuffles, both carrying gram COUNTS, not
    text. Docs shorter than the gram size contribute their single
    whole-doc shingle (shingles_col's documented short-doc case)."""
    from ..operators.dedup import shingles_col

    def per_doc(n: int, dup_col: str, top_col: str) -> DataFrame:
        grams = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles_col(F.col(text_col), n)).alias("g"),
        )
        counts = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        return counts.groupBy("doc_id").agg(
            F.sum("c").alias("_total"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("_dup"),
            F.max("c").alias("_top"),
        ).select(
            "doc_id",
            F.col("_total"),
            F.round(F.col("_dup").cast("double") / F.col("_total"), 4).alias(dup_col),
            F.round(F.col("_top").cast("double") / F.col("_total"), 4).alias(top_col),
        )

    g3 = per_doc(3, "dup_3gram_frac", "_unused3").select(
        "doc_id", F.col("_total").cast("long").alias("n_3grams"), "dup_3gram_frac"
    )
    g2 = per_doc(2, "_unused2", "top_2gram_frac").select("doc_id", "top_2gram_frac")
    return g3.join(g2, "doc_id").orderBy("doc_id")

def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, surprisal): CCNet-style unigram LM scoring —
    surprisal = -(1/n) * sum over tokens of ln(c(t)/T), where c(t) is
    the corpus count of t and T the corpus token total (Wenzek et al.
    2020 filter web text by LM perplexity; the unigram model is its
    deterministic, training-free core). High surprisal = rare-word doc.

    Float-sum invariant (CLAUDE.md): the per-doc sum NEVER folds raw
    doubles. Each term's log-probability is rounded to 6dp, quantized
    to an integer in 1e-6 units, weighted by the integer tf, and summed
    as longs — addition order can't change an integer sum — then
    divided back once. The only cross-engine float op is ln(c/T)
    itself, the same exposure PMI (bigram_collocations) already passes
    the gate with.

    Plan: explode -> groupBy (doc_id, term) tf [shuffle 1, map-side
    combine], corpus counts reuse the same term-keyed data [vocab-sized,
    Heaps-bounded], tf joins counts on term (AQE broadcasts the vocab
    side when it fits), one-row totals broadcast, then a per-doc
    groupBy [shuffle 2]. Same shape as bigram_collocations — both
    scale-safe at corpus scale."""
    toks = tokens_col(text_col)
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    uni = tf.groupBy("w").agg(F.sum("tf").alias("c"))
    totals = uni.select(F.sum("c").alias("T"))
    contrib = F.round(
        F.round(F.log(F.col("c") / F.col("T")), 6) * F.lit(1000000.0)
    ).cast("long")
    return (
        tf.join(uni, "w")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "tf", (F.col("tf") * contrib).alias("ci"))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("ci").alias("s"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            # identical operand order on both sides:
            # -(s / 1e6 / n_tokens); surprisal >= 0 (every p <= 1), so
            # the signed-zero +0.0 convention is not needed here.
            F.round(
                -(F.col("s").cast("double") / F.lit(1000000.0) / F.col("n_tokens")),
                4,
            ).alias("surprisal"),
        )
        .orderBy("doc_id")
    )


def gopher_quality_filter(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 90,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 4.8,
    min_alnum_ratio: float = 0.8,
    min_stopword_ratio: float = 0.005,
    max_dup_3gram_frac: float = 0.1,
    max_top_2gram_frac: float = 0.08,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Composite Gopher-style rule filter (Rae et al. 2021 §A1.1; the
    C4/Gopher cleaning stage of a pretraining pipeline): every rule
    thresholds one of the already-gate-green quality_features /
    repetition_signals metrics, and a doc is kept iff NO rule fires.
    Returns (doc_id, keep, n_failed, failed) ordered by doc_id, with
    ``failed`` the comma-joined rule names in the FIXED rule order
    below (deterministic string on both sides).

    Determinism: every compared metric is the 4dp-ROUNDED output of
    its source op — identical doubles on both engines — so the
    strict-inequality threshold tests are exact; thresholds should be
    short-decimal literals (the oracle casts them ::DOUBLE, dodging
    DuckDB's DECIMAL literal arithmetic).

    Scale shape: two metric scans (the quality pass and the shingle
    pass) joined on doc_id — a production pipeline would cache the
    tokenized frame across the two; the rule evaluation itself is one
    codegen'd projection, no extra shuffle beyond the join."""
    qf = quality_features(docs, id_col, text_col)
    rep = repetition_signals(docs, id_col, text_col)
    rules = [
        ("n_tokens_low", F.col("n_tokens") < int(min_tokens)),
        ("n_tokens_high", F.col("n_tokens") > int(max_tokens)),
        ("avg_token_len_low", F.col("avg_token_len") < float(min_avg_token_len)),
        ("avg_token_len_high", F.col("avg_token_len") > float(max_avg_token_len)),
        ("alnum_ratio_low", F.col("alnum_ratio") < float(min_alnum_ratio)),
        ("stopword_ratio_low", F.col("stopword_ratio") < float(min_stopword_ratio)),
        ("dup_3gram_high", F.col("dup_3gram_frac") > float(max_dup_3gram_frac)),
        ("top_2gram_high", F.col("top_2gram_frac") > float(max_top_2gram_frac)),
    ]
    failed = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in rules]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        qf.join(rep, "doc_id")
        .select(F.col("doc_id"), failed.alias("_failed"))
        .select(
            "doc_id",
            (F.size("_failed") == 0).alias("keep"),
            F.size("_failed").cast("long").alias("n_failed"),
            F.array_join("_failed", ",").alias("failed"),
        )
        .orderBy("doc_id")
    )


def dsir_importance(
    docs: DataFrame,
    target_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, n_tokens, logratio): DSIR-style importance weights
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score each doc by the mean per-token
    log-likelihood ratio between a TARGET unigram distribution (the
    ``lang_col == target_lang`` subset) and the RAW corpus
    distribution — logratio = (1/n) * sum over tokens of
    ln(p_T(w)) - ln(p_R(w)), add-one smoothed over the corpus vocab
    (p(w) = (c(w)+1)/(T+V)). High logratio = looks like the target;
    sampling proportional to exp(logratio·n) IS importance resampling.

    Float-sum invariant (CLAUDE.md): each distribution's per-term
    log-probability is rounded to 6dp and quantized to integer 1e-6
    units SEPARATELY (the unigram_logprob idiom — ln over a division
    of exact integers-as-doubles, IEEE-identical cross-engine); the
    per-doc sum folds tf-weighted integer DIFFERENCES as longs, and
    the final mean — a ratio of exact integers that can land on 4dp
    half-boundaries — rounds via _div_round_expr in integer
    arithmetic, with +0.0 (logratio is signed).

    Plan: one explode -> (doc, term) tf [shuffle 1, map-side combine];
    target and raw counts come from the SAME term-keyed aggregate
    (conditional sum — no second pass over the data); vocab-sized
    stats join back (AQE broadcasts when it fits), one-row totals
    broadcast, one per-doc groupBy [shuffle 2]. Same scale-safe shape
    as bigram_collocations / unigram_logprob."""
    from ..query.grouping import _div_round_expr

    toks = tokens_col(text_col)
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            (F.col(lang_col) == target_lang).alias("is_t"),
            F.explode(toks).alias("w"),
        )
        .groupBy("doc_id", "is_t", "w")
        .agg(F.count("*").alias("tf"))
    )
    uni = tf.groupBy("w").agg(
        F.sum("tf").alias("c_r"),
        F.sum(F.when(F.col("is_t"), F.col("tf")).otherwise(0)).alias("c_t"),
    )
    totals = uni.agg(
        F.sum("c_r").alias("TR"),
        F.sum("c_t").alias("TT"),
        F.count("*").alias("V"),
    )
    k_t = F.round(
        F.round(
            F.log(
                (F.col("c_t") + F.lit(1)).cast("double")
                / (F.col("TT") + F.col("V")).cast("double")
            ),
            6,
        )
        * F.lit(1000000.0)
    ).cast("long")
    k_r = F.round(
        F.round(
            F.log(
                (F.col("c_r") + F.lit(1)).cast("double")
                / (F.col("TR") + F.col("V")).cast("double")
            ),
            6,
        )
        * F.lit(1000000.0)
    ).cast("long")
    return (
        tf.join(uni, "w")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "tf", (F.col("tf") * (k_t - k_r)).alias("ci"))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("_n"), F.sum("ci").alias("_s"))
        .select(
            "doc_id",
            F.col("_n").cast("long").alias("n_tokens"),
            (
                F.expr(_div_round_expr("_s", "1000000 * _n")).cast("double")
                / F.lit(10000.0)
                + F.lit(0.0)
            ).alias("logratio"),
        )
        .orderBy("doc_id")
    )


def frequent_item_sets(
    docs: DataFrame,
    min_support: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequent item-set mining at set size 2 (the Elasticsearch
    `frequent_item_sets` agg over a keyword/token field): pairs of
    DISTINCT per-doc tokens co-occurring in >= ``min_support`` docs.
    Returns (item_a, item_b, support) with item_a < item_b, ordered
    (support DESC, item_a, item_b) — a total order, (a, b) is unique;
    all integers, nothing to round.

    Apriori level-1 pruning is EXACT, not heuristic: a pair's support
    is bounded by each member's document frequency, so items with
    df < min_support cannot appear in any frequent pair — the df
    filter shrinks the quadratic pair-generation base without changing
    the result (tested: pruned == unpruned).

    Scale shape: pairs are generated MAP-SIDE from each doc's sorted
    frequent-item array (nested JVM `transform` over the array — no
    self-join, no shuffle to form pairs), then ONE groupBy(item_a,
    item_b) with map-side partial aggregation. Per-doc cost is
    O(f²) where f = the doc's frequent-item count — the same quadratic
    ES bounds with its `size`/filter knobs; min_support is the
    pruning dial (it scales with corpus size, keeping f flat). The
    frequent-items side of the pruning join is vocabulary-bounded
    (Heaps): AQE broadcasts it when it fits. The pairs array is
    computed in its own projection BEFORE the explode (the Spark
    generator rewrite drops nested struct aliases when a generator
    shares the select — the pinned greatest(struct) pitfall)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens_col(text_col)).alias("items"),
    )
    di = base.select("doc_id", F.explode("items").alias("item"))
    freq = (
        di.groupBy("item")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_support)
        .select("item")
    )
    kept = di.join(freq, "item")
    arrs = kept.groupBy("doc_id").agg(F.sort_array(F.collect_list("item")).alias("a"))
    pair_arrays = arrs.select(
        F.expr(
            "flatten(transform(a, (x, i) -> "
            "transform(slice(a, i + 2, size(a)), y -> "
            "struct(x AS item_a, y AS item_b))))"
        ).alias("pairs")
    )
    pairs = pair_arrays.select(F.explode("pairs").alias("p")).select(
        "p.item_a", "p.item_b"
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(F.desc("support"), "item_a", "item_b")
    )
