"""Deduplication operators for large-scale training-data pipelines.

All five families, each a declarative DataFrame plan (JVM expressions,
no Python in the hot path) with a matching DuckDB oracle in
query/oracle_sql_ops.py:

- exact:        md5(text) hash-groupBy; canonical = min doc_id
- minhash-lsh:  word-shingles -> per-permutation min(md5(seed|shingle))
                signatures -> banded LSH bucket join -> candidate pairs
                with estimated Jaccard (fraction of equal components)
- simhash:      per-token 60-bit hash, tf-weighted bit-majority
- ngram-jaccard: exact Jaccard over distinct shingle sets via a
                shared-shingle join (the verifier stage behind LSH)
- embedding:    cosine near-dup pairs inside sign-bit LSH buckets
                (operators/ann.py provides the primitives)

Scale notes: exact/minhash/simhash are linear + one shuffle each.
ngram-jaccard's pair join is quadratic in bucket size — at 10^12 docs
it is only ever run on LSH candidate pairs (compose: minhash_candidates
-> exact jaccard verify), never on the raw corpus. Hash functions are
md5 (same bytes in Spark and DuckDB), making every stage oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col

N_MINHASH = 16
LSH_BANDS = 4  # 16 signatures / 4 rows per band


def shingles_col(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (distinct not applied)."""
    toks = tokens_col(text)
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_hash, n_docs, canonical_doc_id) per distinct text; dup
    groups are rows with n_docs > 1. One hash-groupBy shuffle."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_MINHASH
) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): per-'permutation' minimum of
    md5(seed|shingle) — strings compare lexicographically identically
    in Spark and DuckDB, so signatures are oracle-checkable."""
    sh = shingles_col(text_col).alias("sh")
    base = docs.select(F.col(id_col).alias("doc_id"), sh)

    def seeded_md5(h: int):
        # arity-1 lambda: F.transform passes (elem, idx) to arity-2
        # lambdas, which would silently shadow the seed
        return lambda s: F.md5(F.concat(F.lit(f"{h}|"), s))

    cols = [
        F.array_min(F.transform("sh", seeded_md5(h))).alias(f"sig_{h}")
        for h in range(n_hashes)
    ]
    return base.select("doc_id", *cols)


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs;
    est_jaccard = fraction of equal signature components.

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b. The band
    join is an equi-join on (band_id, band_hash) — co-partitioned by
    Catalyst, quadratic only within a bucket (by construction small)."""
    sigs = minhash_signatures(docs, id_col, text_col, n_hashes).cache()
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *parts)).alias("band_hash"))
        )
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", "b.band_id", "b.band_hash"
    )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(r, ["band_id", "band_hash"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    eq_terms = [
        F.when(F.col(f"a.sig_{h}") == F.col(f"b.sig_{h}"), 1).otherwise(0)
        for h in range(n_hashes)
    ]
    est = sum(eq_terms[1:], eq_terms[0]) / float(n_hashes)
    return (
        pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
        .join(b, pairs.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    min_jaccard: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a, doc_b, jaccard).

    Shared-shingle equi-join computes |A∩B|; |A∪B| = |A|+|B|-|A∩B|.
    Quadratic within shingle buckets — the verify stage for LSH
    candidates at scale, exhaustive only at test scale."""
    sh = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(shingles_col(text_col, n))).alias("sh"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, "sh")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        inter.join(sa, inter.doc_a == F.col("sa.doc_id"))
        .join(sb, inter.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(doc_id, simhash): tf-weighted bit-majority over per-token 60-bit
    md5-derived hashes, truncated to ``bits``. All JVM expressions:
    explode tokens -> tf -> explode bit positions -> signed sum -> pack."""
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    h = F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
    bitsum = (
        tf.withColumn("h", h)
        .select(
            "doc_id",
            "tf",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
            "h",
        )
        .withColumn(
            "contrib",
            F.when(F.expr("(h >> j) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("contrib").alias("s"))
    )
    return (
        bitsum.withColumn(
            "bit",
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bit").alias("simhash"))
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within Hamming distance; blocked by
    16-bit halves (a pair within distance d<=3 shares at least one half)."""
    sig = simhash_signatures(docs, id_col, text_col, bits)
    half = bits // 2
    blocked = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("part"), (F.col("simhash") % (1 << half)).alias("key")),
                F.struct(F.lit(1).alias("part"), F.shiftright("simhash", half).alias("key")),
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.part", "b.key")
    l, r = blocked.alias("l"), blocked.alias("r")
    return (
        l.join(r, ["part", "key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
