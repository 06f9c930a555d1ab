"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — JVM-side zip_with /
  aggregate expressions (no UDF), one TakeOrderedAndProject.
- LSH-bucketed ANN: sign-bit buckets (axis-aligned random-hyperplane
  LSH with deterministic planes = the first ``n_bits`` dimensions, so
  the DuckDB oracle can reproduce buckets exactly); candidates searched
  within the query's bucket only.
- embedding cosine near-dup pairs within buckets (dedup by embedding).

Scale notes: brute force is a full scan per query — fine batched (join
queries x docs co-partitioned), the baseline for recall checks. The
LSH variant prunes the scan to one bucket (or multi-probe neighbors);
at 10^12 scale buckets are additionally partition keys so a probe is
partition-pruned. IVF (k-means coarse quantizer) would slot into the
same shape; sign-bit LSH keeps the oracle deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_with_query(a: Column, query_vec: list[float]) -> Column:
    """``cosine_col(a, lit(query_vec))`` with the query's norm folded
    to a literal. The norm is computed in Python with the exact same
    left fold (0.0 + q0*q0 + q1*q1 + ...) and IEEE sqrt the in-plan
    expression performs, so the resulting double — and therefore every
    similarity — is bit-identical; it just stops being re-evaluated
    per row (64 multiplies + adds per row for a constant) and shrinks
    the expression tree by a third (faster analysis of the 64-literal
    arrays)."""
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    acc = 0.0
    for x in query_vec:
        acc = acc + float(x) * float(x)
    return _dot(a, q) / (_norm(a) * F.lit(math.sqrt(acc)))


def brute_force_topk(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: int | None = None,
) -> DataFrame:
    """(vec_id, sim) exact cosine top-k; tie-break (sim desc, vec_id).

    The cosine is a higher-order-function expression (interpreted, not
    codegen) over every row — decouple its parallelism from input
    splits (a single-row-group embeddings file is ONE scan task)."""
    from ..session import ensure_compute_parallelism

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = ensure_compute_parallelism(vecs).select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_with_query(F.col(vec_col), query_vec), 4).alias("sim"),
    )
    if exclude_self is not None:
        df = df.filter(F.col("vec_id") != exclude_self)
    return df.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


def suggest_n_bits(n_rows: int, target_bucket: int = 100_000) -> int:
    """Bucket-count sizing rule for the sign-bit LSH family:
    n_bits ≈ ceil(log2(n_rows / target_bucket)), clamped to [1, 24].

    The defaults here (n_bits=8 → 256 buckets) are TEST-scale; at 10⁹
    rows a 256-bucket layout averages ~4M rows per bucket and the
    bucketed self-joins go quadratic. Aim buckets at ~10⁵ rows (fits an
    executor's working set for the within-bucket pair join): 10⁹ rows →
    14 bits, 10¹² → 24 bits. More bits also lowers per-bucket recall
    for probe queries, so pair larger n_bits with a larger ``n_probe``."""
    import math

    if n_rows <= target_bucket:
        return 1
    return min(24, max(1, math.ceil(math.log2(n_rows / target_bucket))))


def signbit_bucket(vec_col: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_bits dims
    (sizing rule for n_bits: suggest_n_bits)."""
    bits = F.transform(
        F.slice(vec_col, 1, n_bits),
        lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.aggregate(
        bits, F.lit(0), lambda acc, b: acc * 2 + b
    ).alias("bucket")


def lsh_probe_buckets(
    query_vec: list[float], n_bits: int = 8, n_probe: int = 1
) -> list[int]:
    """Multi-probe LSH bucket sequence: the query's own bucket, then
    buckets with ONE sign bit flipped, least-confident dimension first
    (smallest |component| = the hyperplane the query sits closest to).
    Deterministic from the query vector, so the SQL oracle reproduces
    the probe set exactly."""
    qbucket = 0
    for x in query_vec[:n_bits]:
        qbucket = qbucket * 2 + (1 if x >= 0 else 0)
    probes = [qbucket]
    order = sorted(range(n_bits), key=lambda i: (abs(query_vec[i]), i))
    for i in order:
        if len(probes) >= n_probe:
            break
        probes.append(qbucket ^ (1 << (n_bits - 1 - i)))
    return probes[:n_probe]


def lsh_topk(
    vecs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: search the query's sign-bit bucket (plus, with n_probe > 1,
    the buckets across the query's nearest hyperplanes — multi-probe
    LSH, the standard recall dial that avoids building more tables).
    Approximate by construction; recall vs brute_force_topk in tests."""
    probes = lsh_probe_buckets(query_vec, n_bits, n_probe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    from ..session import ensure_compute_parallelism

    return (
        ensure_compute_parallelism(vecs).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
        )
        .filter(F.col("bucket").isin(probes))
        .select("vec_id", F.round(cosine_with_query(F.col("v"), query_vec), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def build_ann_index(
    vecs: DataFrame,
    index_dir: str,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the scale path for ANN: a parquet layout PARTITIONED BY
    the sign-bit bucket. At 10^12 vectors a query probe then reads only
    its bucket's partition directory — Catalyst partition pruning, no
    full scan (``lsh_topk`` computes buckets on the fly and still scans
    everything; this is its persisted counterpart)."""
    (
        vecs.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
        )
        .repartition("bucket")  # one writer wave, files co-located per bucket
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(index_dir)
    )


def lsh_topk_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
) -> DataFrame:
    """ANN probe over the persisted bucket-partitioned layout: the
    bucket equality predicate prunes to one partition directory
    (PartitionFilters in .explain), then exact cosine re-ranks inside
    the bucket. Results identical to ``lsh_topk`` (same oracle)."""
    qbucket = 0
    for x in query_vec[:n_bits]:
        qbucket = qbucket * 2 + (1 if x >= 0 else 0)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(index_dir)
        .filter(F.col("bucket") == qbucket)
        .select("vec_id", F.round(cosine_with_query(F.col("embedding"), query_vec), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_cell_expr(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Coarse-quantizer cell id: argmax over centroids of cosine
    similarity, ties to the smallest cell id (greatest over
    (sim, -id) structs — lexicographic, matching the oracle's ordered
    CASE chain). Similarities are rounded to 12dp BEFORE the argmax —
    JVM fold order, numpy SIMD dot, and DuckDB list_aggregate associate
    float sums differently, and an ulp-level wobble at a near-tie would
    flip a vector's cell (moving the next k-means centroid by far more
    than the per-iteration 1e-6 rounding absorbs). All three assigners
    (this expr, kmeans_centroids_local's argmax, ivf_topk_sql's CASE
    chain) round identically, so tie regions coincide."""
    cands = []
    for i, c in enumerate(centroids):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        cands.append(
            F.struct(
                F.round(cosine_with_query(vec_col, [float(x) for x in c]), 12).alias("s"),
                F.lit(-i).alias("ni"),
                F.lit(i).alias("i"),
            )
        )
    return F.greatest(*cands).getField("i")


def ivf_topk(
    vecs: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize vectors into centroid cells, probe only
    the query's n_probe nearest cells, exact cosine re-rank inside.

    Centroids are caller-provided (deterministic — e.g. the first K
    vectors — so the DuckDB oracle reproduces cells exactly; on a real
    pipeline they come from a k-means job). Scale path: like the LSH
    layout, cells become partition keys via build_ann_index-style
    persistence, so a probe is partition-pruned instead of scanned."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    order = sorted(
        range(len(centroids)), key=lambda i: (-cos(query_vec, centroids[i]), i)
    )
    probes = order[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vecs.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            ivf_cell_expr(F.col(vec_col), centroids).alias("cell"),
        )
        .filter(F.col("cell").isin([int(p) for p in probes]))
        .select("vec_id", F.round(cosine_with_query(F.col("v"), query_vec), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def kmeans_centroids_local(
    vectors, ids, k: int = 4, n_iters: int = 3, round_to: int = 6
) -> list[list[float]]:
    """Deterministic Lloyd k-means over an in-memory matrix (the
    coarse-quantizer trainer at test/driver scale; ``kmeans_centroids``
    is the Spark job with identical semantics).

    Determinism contract (what lets the DuckDB oracle replay cell
    assignment exactly): init = the embeddings of the k smallest ids;
    assignment = argmax cosine with ties to the smallest cell (same
    tie-break as ivf_cell_expr); empty cells keep their previous
    centroid; centroids are ROUNDED to ``round_to`` decimals after
    every iteration, so sub-ulp float-summation wobble between
    implementations cannot leak into the next assignment."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    order = np.argsort(np.asarray(ids))[:k]
    cent = np.round(x[order], round_to)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for _ in range(n_iters):
        cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        # 12dp rounding before argmax: same tie regions as ivf_cell_expr
        cells = np.argmax(np.round(xn @ cn.T, 12), axis=1)  # first max = smallest cell
        nxt = cent.copy()
        for c in range(k):
            members = x[cells == c]
            if len(members):
                nxt[c] = members.mean(axis=0)
        cent = np.round(nxt, round_to)
    return [list(map(float, c)) for c in cent]


def kmeans_centroids(
    vecs: DataFrame,
    k: int = 4,
    n_iters: int = 3,
    round_to: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means as a Spark job (Lloyd iterations over the
    DataFrame): assignment is a Column expression (ivf_cell_expr), the
    per-cell mean is one groupBy over posexploded dimensions (k x dim
    rows collected per iteration — driver traffic is centroid-sized,
    never data-sized). Same contract as ``kmeans_centroids_local``; the
    per-iteration rounding absorbs partial-aggregation float wobble."""
    import numpy as np

    seed_rows = (
        vecs.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    cent = np.round(
        np.array([list(r.v) for r in seed_rows], dtype=np.float64), round_to
    )
    for _ in range(n_iters):
        # two selects: a generator (posexplode) in the same projection
        # as ivf_cell_expr makes Spark's generator rewrite drop the
        # aliases inside the nested greatest(struct(...)) expression
        cells = vecs.select(
            ivf_cell_expr(F.col(vec_col), [list(c) for c in cent]).alias("cell"),
            F.col(vec_col).alias("v"),
        ).select("cell", F.posexplode("v").alias("dim", "x"))
        rows = (
            cells.groupBy("cell", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        nxt = cent.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(r.cell, {})[r.dim] = r.m
        for c, dims in by_cell.items():
            nxt[c] = [dims[d] for d in range(len(dims))]
        cent = np.round(nxt, round_to)
    return [list(map(float, c)) for c in cent]


def build_ivf_index(
    vecs: DataFrame,
    index_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF layout: parquet PARTITIONED BY the coarse-
    quantizer cell (mirror of build_ann_index's bucket layout). At
    10^12 vectors a probe reads only its n_probe cells' partition
    directories — Catalyst partition pruning, no full scan."""
    (
        vecs.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            ivf_cell_expr(F.col(vec_col), centroids).alias("cell"),
        )
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(index_dir)
    )


def ivf_topk_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF probe over the persisted cell-partitioned layout: the cell
    membership predicate prunes to n_probe partition directories
    (PartitionFilters in .explain), exact cosine re-ranks inside.
    Results identical to ``ivf_topk`` with the same centroids."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    order = sorted(
        range(len(centroids)), key=lambda i: (-cos(query_vec, centroids[i]), i)
    )
    probes = [int(p) for p in order[:n_probe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(index_dir)
        .filter(F.col("cell").isin(probes))
        .select("vec_id", F.round(cosine_with_query(F.col("embedding"), query_vec), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    vecs: DataFrame,
    min_sim: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, sim) pairs with cosine >= min_sim, candidate-
    generated inside sign-bit buckets (bucket equi-join, quadratic only
    within a bucket). Size n_bits with suggest_n_bits (the 8-bit
    default is test-scale); max_bucket_size guards degenerate buckets
    (see _bucketed_pair_join)."""
    b = vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    return _bucketed_pair_join(b, min_sim, max_bucket_size)


def _bucketed_pair_join(
    b: DataFrame,
    min_sim: float,
    max_bucket_size: int | None = None,
    key: str = "bucket",
) -> DataFrame:
    """(vec_a, vec_b, sim) self-join of a (vec_id, v, <key>) relation
    on the blocking key (sign-bit bucket or k-means cell); quadratic
    only within a block.

    max_bucket_size: rows in a bucket larger than this are dropped from
    the pair join (lost recall for those members, but bounded work —
    the max_shingle_df escape hatch for embedding space, where a dense
    cluster or a degenerate sign-bit pattern can put a large corpus
    fraction in one bucket). None = exact within-bucket semantics."""
    if max_bucket_size is not None:
        counts = b.groupBy(key).agg(F.count("*").alias("_bn"))
        b = (
            b.join(counts, key)
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, key)
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine_col(F.col("l.v"), F.col("r.v")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= min_sim)
    )


def embedding_near_dup_pairs_indexed(
    spark, index_dir: str, min_sim: float = 0.95,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """embedding_near_dup_pairs over a persisted build_ann_index layout:
    the self-join key IS the partition key, so each join task reads one
    bucket directory — dedup-by-embedding as a metadata-pruned scan
    instead of an on-the-fly bucketing pass (results identical for the
    same n_bits; gated against the same SQL oracle)."""
    b = spark.read.parquet(index_dir).select(
        "vec_id", F.col("embedding").alias("v"), "bucket"
    )
    return _bucketed_pair_join(b, min_sim, max_bucket_size)


def knn_filtered_topk(
    vecs: DataFrame,
    query_vec: list[float],
    filter_label: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pre-filtered exact kNN (the Elasticsearch 8 `knn` query with a
    `filter` clause): the metadata predicate restricts candidates
    BEFORE the similarity ranking, so the top-k is exact over the
    filtered subset — never post-filtered approximate results that
    can return fewer than k.

    Scale shape: the label equality pushes down to the parquet scan
    (row-group zone maps / partition pruning if the layout partitions
    by label), so the cosine only runs over the filter's selectivity
    slice; top-k is TakeOrderedAndProject. sim carries the +0.0
    signed-zero normalization (cosines can round to -0.0)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = vecs.filter(F.col(label_col) == int(filter_label)).select(
        F.col(id_col).alias("vec_id"),
        (F.round(cosine_with_query(F.col(vec_col), query_vec), 4) + F.lit(0.0)).alias("sim"),
    )
    return df.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


def semdedup(
    vecs: DataFrame,
    centroids: list[list[float]],
    min_sim: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-
    duplicate pruning for pretraining corpora — cluster embeddings
    with the deterministic k-means coarse quantizer, then WITHIN each
    cell drop every vector whose 4dp-rounded cosine to a LOWER-id
    member of the same cell reaches ``min_sim`` (keep-the-first: the
    reproducible stand-in for the paper's keep-farthest-from-centroid
    choice — lower id wins, so the verdict can never depend on
    partitioning). Returns EVERY vector as (vec_id, cell, kept)
    ordered by vec_id — an audit log, like domain_cap_select.

    Determinism: cell assignment rounds cosine to 12dp before argmax
    (the ivf_cell_expr contract shared by all three assigners); the
    duplicate predicate compares the 4dp-rounded cosine against
    min_sim exactly like embedding_near_dup_pairs.

    Scale shape: the pair join is equi-keyed on the CELL — quadratic
    only within a cell, the paper's own per-cluster pairwise bound;
    k-means keeps cells balanced by construction and max_cell_size is
    the escape hatch for a degenerate cluster (dropped members keep
    kept=true — bounded work over lost pruning, the max_shingle_df
    trade)."""
    b = vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        ivf_cell_expr(F.col(vec_col), centroids).cast("long").alias("cell"),
    )
    # the shared candidate-pair machinery, blocked on the cell key
    # (sim filter, oversize-block escape hatch, and rounding semantics
    # stay single-owner in _bucketed_pair_join)
    dropped = (
        _bucketed_pair_join(b, min_sim, max_cell_size, key="cell")
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return (
        b.join(dropped, "vec_id", "left")
        .select("vec_id", "cell", F.col("_d").isNull().alias("kept"))
        .orderBy("vec_id")
    )
