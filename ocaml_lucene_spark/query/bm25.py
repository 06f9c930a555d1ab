"""BM25 top-k over DataFrames — the *logical* query path.

Declarative plan, Catalyst-optimized end to end (no Python UDFs):

  tokens (codegen) -> filter to query terms BEFORE any shuffle ->
  per-(doc,term) tf agg -> broadcast-joined per-term df ->
  broadcast scalar (N, avgdl) -> per-row float64 score ->
  groupBy(doc).sum -> TakeOrderedAndProject(k)

Scale notes (100 TB): only postings of the *query terms* ever shuffle
(the term filter sits under the explode, so whole partitions of
non-matching tokens die map-side); per-term df and corpus stats are
broadcast (a handful of rows); top-k is Spark's TakeOrderedAndProject
(per-partition heaps, no global sort). The indexed physical path
(query/exec.py) replaces the tokenize+agg front end with packed
segment scans; the scoring tail is identical.

Canonical BM25 constants/formula shared with oracle.py (k1=1.2,
b=0.75, Lucene idf) — scores derive from integer tf/df/dl, never from
partial float sums across partitions, so ranks are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col
from ..oracle import B, K1
from ..session import ensure_compute_parallelism


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # tokenize is the CPU-heavy front end of every logical query:
    # decouple its parallelism from input splits (a single-row-group
    # parquet file is one task however small maxPartitionBytes is)
    return ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))


def corpus_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row: (n_docs, avgdl) — the per-field stats the reference keeps
    in field_reader.ml:3-16, computed by a partial+final agg.

    dl here is ``regexp_count(lower(text), '[a-z0-9]+')`` — the count
    of maximal token runs, integer-identical to
    ``size(filter(split(lower(text), '[^a-z0-9]+'), x != ''))`` (both
    count exactly the maximal [a-z0-9] runs; both are NULL on NULL
    text) without materializing the token array. This pass runs over
    the FULL corpus on every scoring query, so it is the cheapest
    possible shape that still matches the canonical grammar."""
    dl = F.regexp_count(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"))
    return ensure_compute_parallelism(docs).select(dl.alias("dl")).agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )


def candidate_tf(
    docs: DataFrame, terms: list[str], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, dl, tf) for query terms only; the isin filter runs
    under the explode so non-candidate tokens never reach a shuffle."""
    base = _tokenized(docs, id_col, text_col)
    return (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )


def _query_order_sum(terms: list[str]):
    """Deterministic per-doc score sum: fold the per-term components in
    QUERY-TERM order, bit-identical to the pure-Python oracle's
    ``sum(score(t, d) for t in terms)``.

    A plain F.sum's partial-aggregate addition order depends on the
    physical partitioning, so two docs whose true scores tie can come
    out one ulp apart and flip the (score desc, doc_id asc) tie-break
    — reproducible ranks are part of the engine contract.

    Implementation (r9): a fixed-order pivot —
    ``((0.0 + sum(sc | term=t0)) + sum(sc | term=t1)) + ...`` with
    absent terms contributing a literal ``0.0``. Each conditional sum
    aggregates AT MOST ONE row (every caller feeds one row per
    (doc_id, term): candidate_tf groups by (doc, term); packed-index
    blocks are doc-disjoint per term), so no float addition happens
    inside the sums and the outer fold is the exact left fold the
    contract requires. Interleaving ``+ 0.0`` for absent terms is an
    IEEE identity here: per-term components are never ±0.0 (idf > 0,
    tfn > 0; boosted variants scale by non-zero factors) and finite
    cancellation yields +0.0, never -0.0, so every partial acc is
    either the same value as the skip-absent fold or +0.0 in both.
    vs the r1-r8 collect_list(struct) + sort_array + aggregate fold:
    this is a codegen'd HashAggregate with map-side partials instead
    of an object aggregate building a per-doc array (measured: the
    object agg dominated the logical-BM25 reduce stage)."""
    total = F.lit(0.0)
    for t in terms:
        total = total + F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("sc"))), F.lit(0.0)
        )
    return total


import re as _re

_SIMPLE_TOKEN_RE = _re.compile(r"^[a-z0-9]+$")


def _bm25_topk_regex(
    docs: DataFrame,
    terms: list[str],
    k: int,
    id_col: str,
    text_col: str,
    round_to: int | None,
    exclude: list[str],
    must_set: list[str],
    min_should_match: int,
) -> DataFrame:
    """Zero-explode logical BM25 for small term sets (r9 fast path).

    tf of token t = ``regexp_count(lower(text), '(?<![a-z0-9])t(?![a-z0-9])')``
    — the lookarounds are zero-width, so adjacent occurrences are all
    counted, and the count equals the number of maximal [a-z0-9] runs
    equal to t, i.e. exactly the explode-path tf. dl likewise counts
    maximal token runs. One projection computes every per-doc quantity;
    ONE broadcast row carries (n_docs, avgdl, df_t) from an aggregate
    over the same projection; candidates, must, NOT and
    min_should_match are plain filters; the per-doc score folds
    when(tf>0, idf*tfn, 0.0) in query-term order (the +0.0 identity of
    _query_order_sum). No token arrays, no explode, no (doc,term)
    shuffle, no anti-join — measured 4x the explode plan at sf1.

    Exactness: integer tf/dl/df/n identical to the explode path; the
    score expression is the same idf_expr*tfn_expr over the same
    doubles; prototype + replica compare bit-equal. The projection is
    evaluated twice (stats agg job + candidate job — Spark re-executes
    shared subplans), which is why the path is gated to small term
    sets where k+1 regex passes beat tokenize+explode twice over."""
    low = F.lower(F.col(text_col))
    tf_cols = [
        F.regexp_count(low, F.lit(f"(?<![a-z0-9]){t}(?![a-z0-9])")).alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    ex_cols = [
        F.regexp_count(low, F.lit(f"(?<![a-z0-9]){t}(?![a-z0-9])")).alias(f"_ex_{j}")
        for j, t in enumerate(exclude)
    ]
    base = ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(low, F.lit("[a-z0-9]+")).alias("dl"),
        *tf_cols,
        *ex_cols,
    )
    # df/N/avgdl over the FULL corpus, BEFORE exclusion (Lucene
    # semantics) — one broadcast row
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    cond = None
    for i in range(len(terms)):
        c = F.col(f"_tf_{i}") > 0
        cond = c if cond is None else (cond | c)
    cand = base.filter(cond)
    for t in must_set:
        cand = cand.filter(F.col(f"_tf_{terms.index(t)}") > 0)
    if min_should_match:
        n_should = None
        for i, t in enumerate(terms):
            if t in must_set:
                continue
            c = (F.col(f"_tf_{i}") > 0).cast("int")
            n_should = c if n_should is None else (n_should + c)
        if n_should is not None:
            cand = cand.filter(n_should >= min_should_match)
    for j in range(len(exclude)):
        cand = cand.filter(F.col(f"_ex_{j}") == 0)
    cand = cand.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        sc_i = idf_expr(
            F.col("n_docs").cast("double"), F.col(f"_df_{i}").cast("double")
        ) * tfn_expr(
            F.col(f"_tf_{i}").cast("double"), F.col("dl").cast("double"), F.col("avgdl")
        )
        score = score + F.when(F.col(f"_tf_{i}") > 0, sc_i).otherwise(F.lit(0.0))
    score = F.round(score, round_to) if round_to is not None else score
    return (
        cand.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def idf_expr(n_col, df_col):
    return F.log(F.lit(1.0) + (n_col - df_col + 0.5) / (df_col + 0.5))


def tfn_expr(tf_col, dl_col, avgdl_col):
    return (tf_col * (K1 + 1.0)) / (tf_col + K1 * (1.0 - B + B * dl_col / avgdl_col))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    mode: str = "or",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = None,
    exclude: list[str] | None = None,
    must: list[str] | None = None,
    min_should_match: int = 0,
) -> DataFrame:
    """Top-k (doc_id, score); tie-break (score desc, doc_id asc).

    mode='and' keeps only docs containing *all* query terms (sorted
    intersection semantics, SURVEY.md §2.3); 'or' is the score-
    accumulating union. must: BooleanQuery must clauses (a subset of
    ``terms``; the rest are score-only should clauses — mode='and' is
    shorthand for must=terms). min_should_match: results must hit at
    least this many non-must terms (Lucene minimumNumberShouldMatch).

    exclude: NOT clause — drop docs containing ANY excluded term
    (SURVEY.md §2.3 anti join; reference semantics: docID-sorted
    anti-join over postings, /root/reference/codec/terms_enumerator.ml
    skip data). Lucene semantics: exclusion filters matches only; it
    does not change N/avgdl/df, so surviving docs score identically.
    The Spark re-expression is a left_anti join on doc_id — excluded
    postings are term-filtered under the explode, so only the excluded
    terms' doc lists ever shuffle.
    """
    terms = list(dict.fromkeys(terms))
    if must and not set(must) <= set(terms):
        raise ValueError(
            f"must clauses {sorted(set(must) - set(terms))} are not in terms; "
            "must is a subset of the scored terms (add them to terms)"
        )
    must_set = list(dict.fromkeys(must)) if must else (
        terms if mode == "and" else []
    )
    exclude = list(dict.fromkeys(exclude or []))
    # r9 fast path: for small simple-token term sets the zero-explode
    # regex plan wins (see _bm25_topk_regex); larger sets (MoreLikeThis
    # style) keep the explode plan whose cost is O(text + postings),
    # not O(k * text).
    if (
        terms
        and len(terms) + len(exclude) <= 8
        and all(_SIMPLE_TOKEN_RE.match(t) for t in terms + exclude)
    ):
        return _bm25_topk_regex(
            docs, terms, k, id_col, text_col, round_to, exclude,
            must_set, min_should_match,
        )
    tf = candidate_tf(docs, terms, id_col, text_col)
    # df/idf over the FULL corpus (before exclusion) — Lucene
    # semantics. df = count of tf rows per term, computed as a WINDOW
    # over the candidate frame: the r1-r8 shape
    # (tf.join(broadcast(tf.groupBy("term").count()))) referenced the
    # candidate subtree twice, and Spark re-evaluates shared subplans —
    # the whole tokenize+explode ran once more just to count df. The
    # window shuffles only the small candidate frame by term and reads
    # the corpus once. Same integers, same idf, same scores.
    from pyspark.sql import Window

    tf = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    if exclude:
        ex_docs = (
            candidate_tf(docs, list(dict.fromkeys(exclude)), id_col, text_col)
            .select("doc_id")
            .distinct()
        )
        tf = tf.join(ex_docs, "doc_id", "left_anti")
    stats = corpus_stats(docs, id_col, text_col)
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            idf_expr(F.col("n_docs").cast("double"), F.col("df").cast("double"))
            * tfn_expr(
                F.col("tf").cast("double"), F.col("dl").cast("double"), F.col("avgdl")
            ),
        )
    )
    n_hit = (
        F.sum(F.when(F.col("term").isin(must_set), 1).otherwise(0))
        if must_set
        else F.count("*")
    )
    agg = scored.groupBy("doc_id").agg(
        _query_order_sum(terms).alias("score_raw"),
        n_hit.alias("n_terms_hit"),
        F.sum(F.when(~F.col("term").isin(must_set), 1).otherwise(0)).alias(
            "n_should_hit"
        ),
    )
    if must_set:
        agg = agg.filter(F.col("n_terms_hit") == len(must_set))
    if min_should_match:
        agg = agg.filter(F.col("n_should_hit") >= min_should_match)
    score = F.round(F.col("score_raw"), round_to) if round_to is not None else F.col("score_raw")
    return (
        agg.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_bool(
    docs: DataFrame,
    must: list[str],
    should: list[str] | None = None,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = None,
    exclude: list[str] | None = None,
    min_should_match: int = 0,
) -> DataFrame:
    """Lucene BooleanQuery semantics: a result doc contains EVERY
    ``must`` term; ``should`` terms are optional but add to the score
    (at least ``min_should_match`` of them must hit); ``exclude``
    (must_not) drops docs. Score = BM25 sum over all matched
    must+should terms, folded in clause order (must first) — the same
    _query_order_sum determinism contract as the other paths. Plain AND
    is must-only; plain OR is should-only."""
    must = list(dict.fromkeys(must))
    should = [t for t in dict.fromkeys(should or []) if t not in must]
    return bm25_topk(
        docs, must + should, "or", k, id_col, text_col, round_to, exclude,
        must=must or None, min_should_match=min_should_match,
    )


def bm25_topk_synonym(
    docs: DataFrame,
    synonyms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Lucene SynonymQuery: the synonym set scores as ONE pseudo-term
    with blended statistics — df = max df over the set (SynonymQuery's
    documented blending; a doc matching several synonyms is still one
    conceptual term match) and tf = the SUM of the member tfs in the
    doc. score(d) = idf(df_max) * tfn(tf_sum, dl). A single pseudo-term
    means a single float product per doc — no fold-order contract
    needed.

    Plan: the same explode-under-isin + broadcast shape as bm25_topk;
    the per-doc tf sum happens in the one groupBy(doc_id) that the
    disjunction needs anyway."""
    synonyms = list(dict.fromkeys(synonyms))
    tf = candidate_tf(docs, synonyms, id_col, text_col)
    df_max = tf.groupBy("term").agg(F.count("*").alias("df")).agg(
        F.max("df").alias("df_max")
    )
    stats = corpus_stats(docs, id_col, text_col)
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("tf_syn"), F.first("dl").alias("dl")
    )
    scored = (
        agg.crossJoin(F.broadcast(df_max))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            idf_expr(F.col("n_docs").cast("double"), F.col("df_max").cast("double"))
            * tfn_expr(
                F.col("tf_syn").cast("double"),
                F.col("dl").cast("double"),
                F.col("avgdl"),
            ),
        )
    )
    return (
        scored.select("doc_id", F.round("sc", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_boosting(
    docs: DataFrame,
    positive: list[str],
    negative: list[str],
    negative_boost: float = 0.5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Lucene BoostingQuery (ES `boosting` query): docs are matched and
    scored by the ``positive`` disjunction only; a doc that ALSO
    matches any ``negative`` term keeps its rank-eligibility but has
    its score multiplied by ``negative_boost`` (0 < nb < 1 demotes).
    Unlike must_not, negative matches are demoted, never dropped.

    Determinism contract: ONE round, at the end. The demotion
    multiplies the RAW per-doc sum (query-term-order fold) by
    ``negative_boost``, which must be exact-binary (0.5, 0.25, ...) so
    the multiply is exact in IEEE binary (exponent decrement only) and
    equivalence to the SQL oracle reduces to the standard bm25 sum
    contract. Do NOT round the positive stage first: a 4dp-rounded
    score times 0.5 lands EXACTLY on a 5dp half-boundary whenever the
    4th decimal is odd, where Spark (decimal shortest-repr HALF_UP)
    and DuckDB (binary-value round) disagree — measured 17/204
    divergences on adversarial inputs. BM25 scores are strictly
    positive, so no signed-zero normalization is needed.

    Plan shape: the positive leg is the standard explode-under-isin +
    broadcast-stats pipeline; the negative match set is a distinct
    doc-id frame joined as a marker (left join on the aggregated
    per-doc frame — only negative-term postings ever shuffle); top-k
    is TakeOrderedAndProject AFTER demotion (the cut must see demoted
    scores — demotion can reorder)."""
    positive = list(dict.fromkeys(positive))
    negative = list(dict.fromkeys(negative))
    tf = candidate_tf(docs, positive, id_col, text_col)
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
    agg = scored.groupBy("doc_id").agg(_query_order_sum(positive).alias("raw"))
    neg_docs = (
        candidate_tf(docs, negative, id_col, text_col)
        .select("doc_id")
        .distinct()
        .withColumn("neg_hit", F.lit(True))
    )
    demoted = agg.join(neg_docs, "doc_id", "left").select(
        "doc_id",
        F.round(
            F.when(
                F.col("neg_hit").isNotNull(),
                F.lit(float(negative_boost)) * F.col("raw"),
            ).otherwise(F.col("raw")),
            round_to,
        ).alias("score"),
    )
    return demoted.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def term_postings(
    docs: DataFrame, term: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, tf) posting list for one term — seek_exact analogue
    (/root/reference/codec/terms_enumerator.ml:212-277)."""
    return candidate_tf(docs, [term], id_col, text_col).select("doc_id", "tf")


def term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, df, ttf) over the whole corpus — terms-dict stats decode
    analogue (decode_metadata, terms_enumerator.ml:172-196)."""
    tf = (
        _tokenized(docs, id_col, text_col)
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("ttf")
    )


def phrase_counts(
    docs: DataFrame, first: str, second: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_phrase): adjacent '<first> <second>' occurrences —
    the positions stream consumer (.pos semantics)."""
    return phrase_counts_multi(docs, [first, second], id_col, text_col)


def proximity_counts(
    docs: DataFrame,
    first: str,
    second: str,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_pairs): occurrences of ``first`` and ``second`` within
    ``window`` token positions of each other (order-insensitive,
    excluding identical positions) — the proximity/sloppy-phrase
    primitive, expressed as a RANGE JOIN: equi-join on doc_id plus a
    band predicate |p2 - p1| <= window. Both sides are term-filtered
    under the explode, so only the two terms' occurrences shuffle; the
    band condition evaluates inside the co-partitioned join."""
    pos = (
        ensure_compute_parallelism(docs).select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens_col(text_col)).alias("pos", "term"),
        )
    )
    a = pos.filter(F.col("term") == first).select(
        "doc_id", F.col("pos").alias("p1")
    )
    b = pos.filter(F.col("term") == second).select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("p2")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_id_b"))
            & (F.abs(F.col("p2") - F.col("p1")) <= window)
            & (F.col("p1") != F.col("p2")),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_pairs"))
    )


def phrase_counts_multi(
    docs: DataFrame,
    words: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_phrase) for an exact n-word phrase: occurrences where
    words[i] sits at position p+i for every i.

    Single-pass (r9): anchor positions are counted directly on the
    token array — ``filter(sequence(1, dl-L+1), p -> AND_i toks[p+i-1]
    == words[i])`` — so the phrase count needs NO explode, NO join and
    NO shuffle. The r1-r8 slot-join chain referenced its posexplode
    subtree once per slot, and Spark re-evaluates shared subplans: a
    2-word phrase tokenized the corpus twice and shuffled the
    occurrence lists. Same integers (an anchor matches iff every slot
    matches — exactly the chain-join predicate; repeated words and
    L=1 degenerate identically); docs with zero matches are dropped on
    both shapes."""
    assert words, "empty phrase"
    L = len(words)
    base = ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    )

    def match_at(p):
        cond = None
        for i, w in enumerate(words):
            c = F.element_at("toks", p + F.lit(i)) == F.lit(w)
            cond = c if cond is None else (cond & c)
        return cond

    anchors = F.filter(
        F.sequence(F.lit(1), F.size("toks") - F.lit(L - 1)), match_at
    )
    guarded = F.when(F.size("toks") >= L, anchors).otherwise(
        F.array().cast("array<int>")
    )
    # explode + count, NOT a size()>0 filter: a filter on the counted
    # alias gets predicate-pushed below the compute repartition with
    # the whole anchor expression (and its tokenize) INLINED — running
    # it single-threaded in the scan task (observed: 45s at sf1). The
    # generator is a pushdown barrier, zero-match docs simply produce
    # no rows, and the post-explode shuffle is one row per phrase
    # OCCURRENCE (tiny).
    return (
        base.select("doc_id", F.explode(guarded).alias("_p"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_phrase"))
    )


def explain_score(
    docs: DataFrame,
    terms: list[str],
    doc_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """IndexSearcher.explain analogue: the per-term BM25 breakdown for
    ONE document — (term, tf, df, dl, idf, tfn, contribution) rows,
    ordered by term. The factors are the exact intermediates of
    bm25_topk's score expression (idf and tfn rounded for display; the
    contribution is computed from the UNROUNDED factors then rounded,
    like every score in the engine), so the sum of contributions
    reproduces the doc's ranked score.

    Plan note: df/N/avgdl must be CORPUS-wide, so the stats legs are
    unchanged; only the tf leg filters to the one doc — at scale the
    doc filter reaches the scan while the tiny df/stats aggregates
    broadcast, so explaining one doc costs one pruned pass, not a
    full query."""
    terms = list(dict.fromkeys(terms))
    tf = candidate_tf(docs, terms, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, id_col, text_col)
    one = tf.filter(F.col("doc_id") == doc_id)
    idf = idf_expr(F.col("n_docs").cast("double"), F.col("df").cast("double"))
    tfn = tfn_expr(F.col("tf").cast("double"), F.col("dl").cast("double"), F.col("avgdl"))
    return (
        one.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("dl").cast("long").alias("dl"),
            F.round(idf, round_to).alias("idf"),
            F.round(tfn, round_to).alias("tfn"),
            F.round(idf * tfn, round_to).alias("contribution"),
        )
        .orderBy("term")
    )


def bm25_topk_combined_fields(
    docs: DataFrame,
    terms: list[str],
    field_weights: dict[str, float] | None = None,
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Lucene CombinedFieldQuery / ES `combined_fields` (Robertson's
    simple BM25F): the fields blend into ONE synthetic field —
    tf_c(t,d) = sum_f w_f * tf_f(t,d), dl_c(d) = sum_f w_f * dl_f(d),
    df(t) counts docs with tf_c > 0, and the standard BM25 formula
    runs over (tf_c, dl_c, avgdl_c). Unlike DisMax (best field wins),
    a term matching in several fields accumulates.

    Determinism: weights must be exact-binary (1.0, 2.0, 0.5, ...) so
    every weighted sum of integer tf/dl is an exactly-representable
    double — order-independent, no float-fold contract needed below
    the standard per-doc term fold (_query_order_sum). Fields process
    in sorted-name order on both sides (irrelevant given exactness,
    pinned anyway). avgdl folds integer-valued doubles (exact to
    2^53).

    Plan: one dl projection per doc (no join — all field sizes in one
    select), one explode-under-isin per field unioned before the
    (doc_id, term) aggregate — the candidate_tf shape per field;
    stats broadcast; top-k TakeOrderedAndProject."""
    terms = list(dict.fromkeys(terms))
    fw = sorted((field_weights or {"text": 1.0, "source": 2.0}).items())
    dl_expr = None
    for fcol, wt in fw:
        piece = F.size(tokens_col(fcol)).cast("double") * F.lit(float(wt))
        dl_expr = piece if dl_expr is None else dl_expr + piece
    dlc = ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), dl_expr.alias("dl")
    )
    stats = dlc.agg(
        F.count("*").alias("n_docs"), (F.sum("dl") / F.count("*")).alias("avgdl")
    )
    occ = None
    for fcol, wt in fw:
        part = (
            ensure_compute_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"), tokens_col(fcol).alias("toks"))
            .select("doc_id", F.explode("toks").alias("term"))
            .filter(F.col("term").isin(terms))
            .select("doc_id", "term", F.lit(float(wt)).alias("w"))
        )
        occ = part if occ is None else occ.unionByName(part)
    tf = occ.groupBy("doc_id", "term").agg(F.sum("w").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dlc, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "sc",
            idf_expr(F.col("n_docs").cast("double"), F.col("df").cast("double"))
            * tfn_expr(F.col("tf"), F.col("dl"), F.col("avgdl")),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(_query_order_sum(terms), round_to).alias("score")
    )
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def terms_lookup_filter(
    docs: DataFrame,
    lookup_doc_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES `terms` query with LOOKUP: the term list is not a literal in
    the request but fetched from another document — here the distinct
    tokens of row ``lookup_doc_id`` of the same table. Filter context
    (constant score, like the ES terms query), so the output is
    integer-only: (doc_id, n_matched) for every doc containing at
    least one lookup term, n_matched = how many DISTINCT lookup terms
    it contains, ordered by doc_id (unique — total order). The lookup
    doc itself is not excluded (it matches all of its own terms).

    Spark-first shape: the lookup list never touches the driver — the
    single lookup row tokenizes, explodes and broadcasts into a join
    against the corpus's distinct (doc_id, term) projection (the
    percolator's token stream). At 100 TB the lookup side is still one
    document, so the broadcast is exact and free; everything else is
    one groupBy with map-side combine."""
    from ..functions.analysis import tokens_col

    lk = docs.filter(F.col(id_col) == int(lookup_doc_id)).select(
        F.explode(F.array_distinct(tokens_col(text_col))).alias("term")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("term"),
    )
    return (
        toks.join(F.broadcast(lk), "term")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched"))
        .orderBy("doc_id")
    )


def terms_set_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    msm_mod: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Lucene CoveringQuery (the ES `terms_set` query): a doc matches
    when the number of DISTINCT query terms it contains reaches a
    PER-DOC threshold read from a numeric field
    (minimum_should_match_field) — unlike bool minShouldMatch, whose
    threshold is one query-wide constant. The table has no dedicated
    msm field, so the threshold derives deterministically from the
    stored n_chars doc-values column: required = 1 + (n_chars % mod),
    values in 1..mod.

    Scoring is CoveringQuery's: the sum of the matching TermQuery
    sub-scorers — the standard disjunctive BM25 sum over the terms
    present, folded in query-term order (_query_order_sum), rounded
    once (irrational idf logs keep it off 4dp boundaries). Returns
    (doc_id, n_matched, required, score) ordered (score desc, doc_id).

    Plan: the standard candidate-tf pipeline; n_matched falls out of
    the same per-doc aggregate as the score (tf rows are already
    distinct per (doc, term)); one join of the 2-column threshold
    projection, filter, TakeOrderedAndProject."""
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
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_matched"),
        _query_order_sum(terms).alias("raw"),
    )
    req = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.lit(1) + F.col("n_chars") % F.lit(int(msm_mod)))
        .cast("long")
        .alias("required"),
    )
    return (
        agg.join(req, "doc_id")
        .filter(F.col("n_matched") >= F.col("required"))
        .select(
            "doc_id",
            "n_matched",
            "required",
            F.round("raw", round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
