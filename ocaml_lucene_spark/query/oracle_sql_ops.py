"""DuckDB oracle SQL for the training-data pipeline operators
(operators/dedup.py, operators/ann.py, functions/textstats.py).

Same md5-based hash functions and token/shingle grammar as the Spark
plans, so signatures, buckets, and scores agree bit-for-bit (floats
rounded to 4 on both sides)."""

from __future__ import annotations

from ..operators.dedup import simhash_slices as _simhash_slices

TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def _shingles(n: int = 3) -> str:
    return f"""
sh_base AS (
  SELECT doc_id, {TOKS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < {n} THEN [array_to_string(t, ' ')]
              ELSE list_transform(range(len(t) - {n} + 1), i -> array_to_string(t[i+1:i+{n}], ' '))
         END AS shingles
  FROM sh_base
)
"""


def streamed_dedup_sql(n_batches: int = 3) -> str:
    """Replay of the stateful streaming dedup (first-seen-wins across
    ordered micro-batches where batch i = docs with doc_id % n == i):
    canonical per text hash = arg-min over (batch_no, doc_id)."""
    return f"""
SELECT arg_min(doc_id, (doc_id % {n_batches}) * 10000000000 + doc_id) AS doc_id,
       md5(text) AS text_hash
FROM documents
GROUP BY md5(text)
"""


def exact_dup_groups_sql() -> str:
    return """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM documents GROUP BY md5(text)
"""


def minhash_signatures_sql(n_hashes: int = 16) -> str:
    sig_cols = ",\n       ".join(
        f"list_min(list_transform(shingles, s -> md5('{h}|' || s))) AS sig_{h}"
        for h in range(n_hashes)
    )
    return f"""
WITH {_shingles()}
SELECT doc_id,
       {sig_cols}
FROM sh
"""


def minhash_candidate_pairs_sql(
    n_hashes: int = 16, bands: int = 4, min_est_jaccard: float = 0.5
) -> str:
    rows = n_hashes // bands
    band_selects = []
    for b in range(bands):
        parts = " || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({parts}) AS band_hash FROM sigs"
        )
    banded = " UNION ALL ".join(band_selects)
    eq = " + ".join(
        f"CASE WHEN a.sig_{h} = b.sig_{h} THEN 1 ELSE 0 END" for h in range(n_hashes)
    )
    return f"""
WITH {_shingles()},
sigs AS (
  SELECT doc_id,
         {", ".join(f"list_min(list_transform(shingles, s -> md5('{h}|' || s))) AS sig_{h}" for h in range(n_hashes))}
  FROM sh
),
banded AS ({banded}),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r USING (band_id, band_hash)
  WHERE l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, round(({eq}) / {float(n_hashes)}, 4) AS est_jaccard
FROM pairs JOIN sigs a ON pairs.doc_a = a.doc_id JOIN sigs b ON pairs.doc_b = b.doc_id
WHERE round(({eq}) / {float(n_hashes)}, 4) >= {min_est_jaccard}
"""


def ngram_jaccard_pairs_sql(min_jaccard: float = 0.8, n: int = 3) -> str:
    return f"""
WITH {_shingles(n)},
ds AS (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS n_inter
  FROM ds l JOIN ds r ON l.s = r.s AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE, 4) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE, 4) >= {min_jaccard}
"""


def near_dup_pairs_sql(
    min_jaccard: float = 0.8,
    n: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.25,
) -> str:
    """Composed pipeline: MinHash-LSH candidates -> exact Jaccard verify
    on candidates only — same composition as operators/dedup.py
    near_dup_pairs."""
    rows = n_hashes // bands
    band_selects = []
    for b in range(bands):
        parts = " || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({parts}) AS band_hash FROM sigs"
        )
    banded = " UNION ALL ".join(band_selects)
    eq = " + ".join(
        f"CASE WHEN a.sig_{h} = b.sig_{h} THEN 1 ELSE 0 END" for h in range(n_hashes)
    )
    return f"""
WITH {_shingles(n)},
sigs AS (
  SELECT doc_id,
         {", ".join(f"list_min(list_transform(shingles, s -> md5('{h}|' || s))) AS sig_{h}" for h in range(n_hashes))}
  FROM sh
),
banded AS ({banded}),
bpairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r USING (band_id, band_hash)
  WHERE l.doc_id < r.doc_id
),
cand AS (
  SELECT doc_a, doc_b
  FROM bpairs JOIN sigs a ON bpairs.doc_a = a.doc_id
              JOIN sigs b ON bpairs.doc_b = b.doc_id
  WHERE round(({eq}) / {float(n_hashes)}, 4) >= {min_est_jaccard}
),
ds AS (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN ds la ON la.doc_id = c.doc_a
  JOIN ds rb ON rb.doc_id = c.doc_b AND rb.s = la.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE, 4) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE, 4) >= {min_jaccard}
"""


def simhash_signatures_sql(bits: int = 60) -> str:
    return f"""
WITH base AS (SELECT doc_id, {TOKS} AS t FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  GROUP BY doc_id, term
),
h AS (
  SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS hv FROM tf
),
bitsum AS (
  SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM h, unnest(range({bits})) AS u(j)
  GROUP BY doc_id, j
)
SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS simhash
FROM bitsum GROUP BY doc_id
"""


def simhash_near_pairs_sql(max_hamming: int = 3, bits: int = 60) -> str:
    """max_hamming+1-slice pigeonhole blocking (exact recall for
    d <= max_hamming: d errors over d+1 disjoint slices leave one slice
    clean) + exact Hamming verify. NOTE on circularity: because the
    blocking is exact-recall, this oracle is equivalent to the
    brute-force all-pairs filter — the independent all-pairs check
    lives in tests/test_dedup_ann.py (planted 2+1-split pair + full
    numpy brute-force recall)."""
    slices = _simhash_slices(bits, max_hamming)
    blocked_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {i} AS part,"
        f" (simhash >> {off}) & {(1 << w) - 1} AS key FROM sims"
        for i, (off, w) in enumerate(slices)
    )
    return f"""
WITH base AS (SELECT doc_id, {TOKS} AS t FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM base)
  GROUP BY doc_id, term
),
h AS (
  SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS hv FROM tf
),
bitsum AS (
  SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM h, unnest(range({bits})) AS u(j)
  GROUP BY doc_id, j
),
sims AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS simhash
  FROM bitsum GROUP BY doc_id
),
blocked AS (
{blocked_rows}
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       bit_count(xor(l.simhash, r.simhash))::INT AS hamming
FROM blocked l JOIN blocked r USING (part, key)
WHERE l.doc_id < r.doc_id
  AND bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
"""


def language_id_sql() -> str:
    # mirrors functions/textstats.py LANG_PROFILES; argmax with ties
    # resolved by profile order (en < de < fr), same as Spark's
    # greatest(struct(hits, prio, lang))
    from ..functions.textstats import LANG_PROFILES

    hit_cols = []
    langs = list(LANG_PROFILES)
    for lang, words in LANG_PROFILES.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hit_cols.append(
            f"len(list_filter(t, x -> list_contains({arr}, x))) AS h_{lang}"
        )
    # CASE chain in profile order: earlier profile wins ties via >=
    case = "CASE "
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} >= h_{other}" for other in langs[i + 1 :]]
        cond = " AND ".join(conds) if conds else "TRUE"
        case += f"WHEN {cond} THEN '{lang}' "
    case += "END"
    best = "greatest(" + ", ".join(f"h_{la}" for la in langs) + ")"
    return f"""
WITH base AS (SELECT doc_id, {TOKS} AS t FROM documents),
scored AS (
  SELECT doc_id, {", ".join(hit_cols)} FROM base
)
SELECT doc_id,
       CASE WHEN {best} > 0 THEN {case} ELSE 'und' END AS pred_lang,
       {best}::INT AS hits
FROM scored
"""


def quality_features_sql() -> str:
    from ..functions.textstats import LANG_PROFILES

    en = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES["en"]) + "]"
    return f"""
WITH base AS (
  SELECT doc_id, text, {TOKS} AS t FROM documents
),
m AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         len(t)::BIGINT AS n_tokens,
         len(list_distinct(t))::BIGINT AS n_unique,
         length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE AS alnum,
         len(list_filter(t, x -> list_contains({en}, x)))::DOUBLE AS stop_hits
  FROM base
)
SELECT doc_id, n_chars, n_tokens, n_unique,
       round(CASE WHEN n_tokens > 0 THEN alnum / n_tokens ELSE 0 END, 4) AS avg_token_len,
       round(CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0 END, 4) AS stopword_ratio,
       round(CASE WHEN n_chars > 0 THEN alnum / n_chars ELSE 0 END, 4) AS alnum_ratio,
       round(CASE WHEN n_tokens > 0 THEN n_unique / n_tokens::DOUBLE ELSE 0 END, 4) AS lexical_diversity
FROM m
"""


def token_counts_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, text, {TOKS} AS t FROM documents
)
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
       len(t)::BIGINT AS n_tokens,
       len(list_distinct(t))::BIGINT AS n_unique
FROM base
"""


def bpe_token_counts_sql() -> str:
    # same dialect-neutral pattern as functions/textstats.BPE_ISH_PATTERN
    pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
    return f"""
WITH p AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{pat}', 0) AS pieces
  FROM documents
)
SELECT doc_id,
       len(pieces)::BIGINT AS n_bpe_tokens,
       len(list_distinct(pieces))::BIGINT AS n_bpe_unique
FROM p
"""


def bigram_collocations_sql(min_count: int = 2) -> str:
    """PMI collocations mirror of functions/textstats.bigram_collocations."""
    mc = int(min_count)
    return f"""
WITH toks AS (
  SELECT doc_id, {TOKS} AS t FROM documents
),
pos AS (SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS p FROM toks),
pairs AS (
  SELECT a.w AS w1, b.w AS w2
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
),
uni AS (SELECT w, count(*) AS c FROM pos GROUP BY w),
totals AS (
  SELECT sum(len(t))::DOUBLE AS T,
         sum(greatest(len(t) - 1, 0))::DOUBLE AS P
  FROM toks
),
pc AS (
  SELECT w1, w2, count(*) AS n_pairs FROM pairs GROUP BY w1, w2
  HAVING count(*) >= {mc}
)
SELECT pc.w1, pc.w2, pc.n_pairs,
       -- + 0.0::DOUBLE normalizes signed zero: DuckDB's round keeps
       -- -0.0 where Spark's BigDecimal HALF_UP drops the sign, and the
       -- driver hash is repr-sensitive (the one red r5 row was exactly
       -- this, on ('order','spark')). Mirrors textstats.py's + 0.0.
       round(ln((pc.n_pairs / t.P) / ((u1.c / t.T) * (u2.c / t.T))), 4) + 0.0::DOUBLE AS pmi
FROM pc
JOIN uni u1 ON u1.w = pc.w1
JOIN uni u2 ON u2.w = pc.w2
CROSS JOIN totals t
ORDER BY pmi DESC, pc.w1, pc.w2
"""


def media_metadata_fake_sql(n_media: int = 64) -> str:
    """Oracle for the multimodal_metadata gate entry: the synthetic
    blobs are a pure function of doc_id (encode_fake_image with
    width = 16 + id % 17, height = 8 + id % 9, n_frames = 1 + id % 4),
    so the expected metadata — incl. n_bytes = HEADER_LEN(20) + w*h*f
    and kind = video iff n_frames > 1 — is recomputed here directly
    from the ``n_media`` lowest doc_ids, independently of the binary
    round-trip the Spark plan performs."""
    return f"""
WITH ids AS (
  SELECT doc_id FROM documents ORDER BY doc_id LIMIT {int(n_media)}
),
dims AS (
  SELECT doc_id,
         (16 + doc_id % 17) AS w,
         (8 + doc_id % 9) AS h,
         (1 + doc_id % 4) AS f
  FROM ids
)
SELECT doc_id::BIGINT AS media_id,
       CASE WHEN f > 1 THEN 'video' ELSE 'image' END AS kind,
       w::INTEGER AS width,
       h::INTEGER AS height,
       f::INTEGER AS n_frames,
       (20 + w * h * f)::BIGINT AS n_bytes,
       TRUE AS valid
FROM dims
ORDER BY media_id
"""


def fingerprints_sql(n: int = 3) -> str:
    return f"""
WITH {_shingles(n)}
SELECT s.doc_id,
       md5(d.text) AS exact_fp,
       list_min(list_transform(s.shingles, x -> md5(x))) AS min_shingle_fp
FROM sh s JOIN documents d ON s.doc_id = d.doc_id
"""


# ---- embeddings ------------------------------------------------------

def _cos(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)) / "
        f"(sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) * "
        f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))"
    )


def brute_force_topk_sql(query_vec: list[float], k: int = 10, exclude_self: int | None = None) -> str:
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    where = f"WHERE vec_id <> {exclude_self}" if exclude_self is not None else ""
    return f"""
WITH q AS (SELECT {q} AS qv)
SELECT vec_id, round({_cos("embedding", "qv")}, 4) AS sim
FROM embeddings, q {where}
ORDER BY sim DESC, vec_id ASC
LIMIT {k}
"""


def _bucket(vec: str, n_bits: int) -> str:
    return (
        f"list_aggregate(list_transform({vec}[1:{n_bits}], "
        f"x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END), 'sum') "
    )


def signbit_bucket_expr(vec: str, n_bits: int) -> str:
    # base-2 accumulate: fold bits left to right
    expr = "0"
    for i in range(1, n_bits + 1):
        expr = f"({expr}) * 2 + (CASE WHEN {vec}[{i}] >= 0 THEN 1 ELSE 0 END)"
    return expr


def lsh_topk_sql(
    query_vec: list[float], k: int = 10, n_bits: int = 8, n_probe: int = 1
) -> str:
    from ..operators.ann import lsh_probe_buckets

    probes = ", ".join(str(b) for b in lsh_probe_buckets(query_vec, n_bits, n_probe))
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH q AS (SELECT {q} AS qv)
SELECT vec_id, round({_cos("embedding", "qv")}, 4) AS sim
FROM embeddings, q
WHERE {signbit_bucket_expr("embedding", n_bits)} IN ({probes})
ORDER BY sim DESC, vec_id ASC
LIMIT {k}
"""


def ivf_cells_and_probes(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> tuple[str, str, str]:
    """The IVF probe's SQL building blocks, shared by ivf_topk_sql and
    the indexed-RRF oracle so the probe semantics cannot drift:
    (sim_cols, case_expr, probes_csv) — per-centroid 12dp-rounded
    cosine columns, the argmax-with-smallest-id CASE chain (same tie
    regions as ivf_cell_expr / kmeans_centroids_local), and the probe
    cell ids computed at SQL-generation time."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    order = sorted(
        range(len(centroids)), key=lambda i: (-cos(query_vec, centroids[i]), i)
    )
    probes = ", ".join(str(i) for i in order[:n_probe])
    cvecs = [
        "[" + ", ".join(repr(float(x)) for x in c) + "]::DOUBLE[]" for c in centroids
    ]
    sim_cols = ", ".join(
        f"round({_cos('embedding', cv)}, 12) AS s_{i}" for i, cv in enumerate(cvecs)
    )
    # earlier centroid wins ties (>= chain in id order)
    case = "CASE "
    n = len(centroids)
    for i in range(n):
        conds = [f"s_{i} >= s_{j}" for j in range(n) if j != i and j > i]
        prior = [f"s_{i} > s_{j}" for j in range(i)]
        cond = " AND ".join(prior + conds) if (prior or conds) else "TRUE"
        case += f"WHEN {cond} THEN {i} "
    case += "END"
    return sim_cols, case, probes


def ivf_topk_sql(
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> str:
    """IVF probe mirroring operators/ann.ivf_topk: same centroids, same
    argmax-with-smallest-id tie-break (ordered CASE chain), probe cells
    computed at SQL-generation time."""
    sim_cols, case, probes = ivf_cells_and_probes(query_vec, centroids, n_probe)
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH sims AS (
  SELECT vec_id, embedding, {sim_cols} FROM embeddings
),
cells AS (
  SELECT vec_id, embedding, {case} AS cell FROM sims
),
q AS (SELECT {q} AS qv)
SELECT vec_id, round({_cos("embedding", "qv")}, 4) AS sim
FROM cells, q
WHERE cell IN ({probes})
ORDER BY sim DESC, vec_id ASC
LIMIT {k}
"""


def embedding_near_dup_pairs_sql(min_sim: float = 0.95, n_bits: int = 8) -> str:
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {signbit_bucket_expr("embedding", n_bits)} AS bucket
  FROM embeddings
)
SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
       round({_cos("l.embedding", "r.embedding")}, 4) AS sim
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round({_cos("l.embedding", "r.embedding")}, 4) >= {min_sim}
"""


def _shingle_case(n: int) -> str:
    """The shingle expression over a token-array column t (same
    short-doc whole-text case as operators/dedup.shingles_col)."""
    return (
        f"CASE WHEN len(t) < {n} THEN [array_to_string(t, ' ')] "
        f"ELSE list_transform(range(len(t) - {n} + 1), "
        f"i -> array_to_string(t[i+1:i+{n}], ' ')) END"
    )


def ngram_contamination_sql(n: int = 5, bench_mod: int = 13) -> str:
    """Decontamination oracle (operators/dedup.ngram_contamination with
    benchmark = documents where doc_id % bench_mod = 0): distinct
    benchmark n-grams joined against each doc's distinct n-grams."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (SELECT doc_id, {_shingle_case(n)} AS shingles FROM tok),
bench AS (
  SELECT DISTINCT unnest(shingles) AS g FROM sh WHERE doc_id % {bench_mod} = 0
),
corpus AS (SELECT doc_id, unnest(list_distinct(shingles)) AS g FROM sh)
SELECT c.doc_id, count(*)::BIGINT AS n_overlap
FROM corpus c JOIN bench b ON c.g = b.g
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


def repetition_signals_sql() -> str:
    """Repetition-filter oracle (functions/textstats.repetition_signals):
    per-doc duplicated-3-gram occurrence fraction and top-2-gram
    occupancy, counts divided once at the end."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS t FROM documents),
g3 AS (SELECT doc_id, unnest({_shingle_case(3)}) AS g FROM tok),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
a3 AS (
  SELECT doc_id, sum(c) AS total3,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
  FROM c3 GROUP BY doc_id
),
g2 AS (SELECT doc_id, unnest({_shingle_case(2)}) AS g FROM tok),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
a2 AS (SELECT doc_id, sum(c) AS total2, max(c) AS top2 FROM c2 GROUP BY doc_id)
SELECT a3.doc_id,
       total3::BIGINT AS n_3grams,
       round(dup3::DOUBLE / total3::DOUBLE, 4) AS dup_3gram_frac,
       round(top2::DOUBLE / total2::DOUBLE, 4) AS top_2gram_frac
FROM a3 JOIN a2 ON a3.doc_id = a2.doc_id
ORDER BY a3.doc_id
"""


def pack_sequences_sql(budget: int = 2048) -> str:
    """Sequence-packing oracle (operators/packing.pack_sequences): the
    naive single-window formulation — exactly what the engine's
    two-pass range/offset plan must reproduce."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS t FROM documents)
SELECT doc_id,
       len(t)::BIGINT AS n_tokens,
       floor(
         coalesce(sum(len(t)) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::DOUBLE / {budget}
       )::BIGINT AS pack_id
FROM tok
ORDER BY doc_id
"""


def sample_stratified_sql(
    fractions: dict[str, float], stratum_col: str = "lang", seed: int = 7
) -> str:
    """Stratified-sampling oracle (operators/sampling.sample_stratified):
    identical md5-derived uniform u and per-stratum thresholds."""
    case = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {float(f)!r}::DOUBLE"
        for s, f in sorted(fractions.items())
    )
    return f"""
SELECT doc_id, {stratum_col} AS stratum
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || '|' || '{seed}'), 1, 15))::BIGINT::DOUBLE
        / {float(16**15)!r}
      < (CASE {case} ELSE 0.0::DOUBLE END)
ORDER BY doc_id
"""


def dedup_clusters_sql(
    min_jaccard: float = 0.8,
    n: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.25,
) -> str:
    """Connected-components oracle (operators/dedup.dedup_clusters over
    near_dup_pairs): full reachability via a RECURSIVE CTE (UNION
    dedups states, so it terminates), cluster = min reachable id —
    an entirely different algorithm from the engine's label
    propagation, which is the point."""
    pairs = near_dup_pairs_sql(min_jaccard, n, n_hashes, bands, min_est_jaccard)
    body = pairs.strip().removeprefix("WITH")
    # body = "<cte list> SELECT <final select>": wrap the final select
    # as one more CTE so the recursive reachability can consume it
    cte_list, final_select = body.rsplit("SELECT", 1)
    return f"""
WITH RECURSIVE {cte_list.rstrip().rstrip(",")},
final_pairs AS (
  SELECT{final_select}
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM final_pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM final_pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT u.a, rc.r FROM und u JOIN reach rc ON u.b = rc.node
)
SELECT node AS doc_id, min(r)::BIGINT AS cluster_id
FROM reach
GROUP BY node
ORDER BY doc_id
"""


def mix_to_proportions_sql(
    weights: dict[str, float], stratum_col: str = "lang", seed: int = 7
) -> str:
    """Mix-to-proportions oracle (operators/sampling.mix_to_proportions):
    re-derives the per-stratum acceptance fractions from the SAME
    fixed-order double arithmetic — scale = min(n / w), fraction =
    (w * scale) / n — then replays the md5-uniform filter. Division
    and multiplication are IEEE-exact in both engines, so the
    survivor sets are bit-identical."""
    w_case = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {float(w)!r}::DOUBLE"
        for s, w in sorted(weights.items())
    )
    in_list = ", ".join(f"'{s}'" for s in sorted(weights))
    return f"""
WITH counts AS (
  SELECT {stratum_col} AS stratum, count(*)::DOUBLE AS n,
         (CASE {w_case.replace(stratum_col, stratum_col)} END) AS w
  FROM documents
  WHERE {stratum_col} IN ({in_list})
  GROUP BY {stratum_col}
),
scaled AS (
  SELECT stratum, (w * (SELECT min(n / w) FROM counts)) / n AS f FROM counts
)
SELECT d.doc_id, d.{stratum_col} AS stratum
FROM documents d JOIN scaled s ON d.{stratum_col} = s.stratum
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '|' || '{seed}'), 1, 15))::BIGINT::DOUBLE
        / {float(16**15)!r}
      < s.f
ORDER BY d.doc_id
"""

def unigram_logprob_sql() -> str:
    """Unigram LM surprisal oracle (functions/textstats.unigram_logprob):
    per-term log-probability rounded to 6dp, quantized to integer 1e-6
    units, tf-weighted and summed as BIGINTs (order-free), divided back
    once — the same quantized-fold contract as the engine. Operand
    order of the final division matches the Spark expression exactly:
    -(s / 1000000.0 / n_tokens)."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS t FROM documents),
w AS (SELECT doc_id, unnest(t) AS w FROM tok),
tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY doc_id, w),
uni AS (SELECT w, sum(tf) AS c FROM tf GROUP BY w),
totals AS (SELECT sum(c)::DOUBLE AS T FROM uni),
ci AS (
  SELECT tf.doc_id, tf.tf,
         tf.tf * CAST(round(round(ln(uni.c / t.T), 6) * 1000000.0) AS BIGINT) AS ci
  FROM tf JOIN uni ON tf.w = uni.w CROSS JOIN totals t
)
SELECT doc_id,
       sum(tf)::BIGINT AS n_tokens,
       round(-(sum(ci)::DOUBLE / 1000000.0 / sum(tf)), 4) AS surprisal
FROM ci
GROUP BY doc_id
ORDER BY doc_id
"""


def _gopher_rule_ctes(
    min_tokens: int,
    max_tokens: int,
    min_avg_token_len: float,
    max_avg_token_len: float,
    min_alnum_ratio: float,
    min_stopword_ratio: float,
    max_dup_3gram_frac: float,
    max_top_2gram_frac: float,
) -> str:
    """Shared WITH-body: quality + repetition metrics -> per-doc
    failed-rule list (CTE `f`); used by gopher_quality_filter_sql and
    the clean->dedup->select pipeline oracle so the rule semantics
    cannot drift between them."""
    from ..functions.textstats import LANG_PROFILES

    en = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES["en"]) + "]"
    rules = [
        ("n_tokens_low", f"q.n_tokens < {int(min_tokens)}"),
        ("n_tokens_high", f"q.n_tokens > {int(max_tokens)}"),
        ("avg_token_len_low", f"q.avg_token_len < {float(min_avg_token_len)!r}::DOUBLE"),
        ("avg_token_len_high", f"q.avg_token_len > {float(max_avg_token_len)!r}::DOUBLE"),
        ("alnum_ratio_low", f"q.alnum_ratio < {float(min_alnum_ratio)!r}::DOUBLE"),
        ("stopword_ratio_low", f"q.stopword_ratio < {float(min_stopword_ratio)!r}::DOUBLE"),
        ("dup_3gram_high", f"r.dup_3gram_frac > {float(max_dup_3gram_frac)!r}::DOUBLE"),
        ("top_2gram_high", f"r.top_2gram_frac > {float(max_top_2gram_frac)!r}::DOUBLE"),
    ]
    arr = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' ELSE NULL END" for name, cond in rules
    )
    return f"""base AS (
  SELECT doc_id, text, {TOKS} AS t FROM documents
),
qm AS (
  SELECT doc_id,
         len(t)::BIGINT AS n_tokens,
         length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE AS alnum,
         len(list_filter(t, x -> list_contains({en}, x)))::DOUBLE AS stop_hits,
         length(text)::BIGINT AS n_chars
  FROM base
),
q AS (
  SELECT doc_id, n_tokens,
         round(CASE WHEN n_tokens > 0 THEN alnum / n_tokens ELSE 0 END, 4) AS avg_token_len,
         round(CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0 END, 4) AS stopword_ratio,
         round(CASE WHEN n_chars > 0 THEN alnum / n_chars ELSE 0 END, 4) AS alnum_ratio
  FROM qm
),
g3 AS (SELECT doc_id, unnest({_shingle_case(3)}) AS g FROM base),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
a3 AS (
  SELECT doc_id, sum(c) AS total3,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
  FROM c3 GROUP BY doc_id
),
g2 AS (SELECT doc_id, unnest({_shingle_case(2)}) AS g FROM base),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
a2 AS (SELECT doc_id, sum(c) AS total2, max(c) AS top2 FROM c2 GROUP BY doc_id),
r AS (
  SELECT a3.doc_id,
         round(dup3::DOUBLE / total3::DOUBLE, 4) AS dup_3gram_frac,
         round(top2::DOUBLE / total2::DOUBLE, 4) AS top_2gram_frac
  FROM a3 JOIN a2 ON a3.doc_id = a2.doc_id
),
f AS (
  SELECT q.doc_id,
         list_filter([{arr}], x -> x IS NOT NULL) AS failed_list
  FROM q JOIN r ON q.doc_id = r.doc_id
)"""


def gopher_quality_filter_sql(
    min_tokens: int = 20,
    max_tokens: int = 90,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 4.8,
    min_alnum_ratio: float = 0.8,
    min_stopword_ratio: float = 0.005,
    max_dup_3gram_frac: float = 0.1,
    max_top_2gram_frac: float = 0.08,
) -> str:
    """Gopher-rule-filter oracle (functions/textstats
    gopher_quality_filter): recomputes the quality + repetition
    metrics independently (the two source oracles' expressions), then
    evaluates the same fixed-order rule list; every float literal is
    ::DOUBLE so DuckDB's DECIMAL literals never enter the compare."""
    ctes = _gopher_rule_ctes(
        min_tokens, max_tokens, min_avg_token_len, max_avg_token_len,
        min_alnum_ratio, min_stopword_ratio, max_dup_3gram_frac,
        max_top_2gram_frac,
    )
    return f"""
WITH {ctes}
SELECT doc_id,
       len(failed_list) = 0 AS keep,
       len(failed_list)::BIGINT AS n_failed,
       coalesce(list_aggregate(failed_list, 'string_agg', ','), '') AS failed
FROM f
ORDER BY doc_id
"""


def clean_dedup_select_sql(
    budget: int,
    min_tokens: int = 20,
    max_tokens: int = 90,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 4.8,
    min_alnum_ratio: float = 0.8,
    min_stopword_ratio: float = 0.005,
    max_dup_3gram_frac: float = 0.1,
    max_top_2gram_frac: float = 0.08,
) -> str:
    """Oracle for the end-to-end training-data pipeline
    (operators/pipeline.clean_dedup_select): Gopher cleaning (shared
    rule CTEs) -> exact dedup (min doc_id per md5(text) among kept) ->
    lexical-diversity-ranked greedy token-budget prefix (the
    token_budget_select window formulation)."""
    ctes = _gopher_rule_ctes(
        min_tokens, max_tokens, min_avg_token_len, max_avg_token_len,
        min_alnum_ratio, min_stopword_ratio, max_dup_3gram_frac,
        max_top_2gram_frac,
    )
    return f"""
WITH {ctes},
kept AS (SELECT doc_id FROM f WHERE len(failed_list) = 0),
canon AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d JOIN kept USING (doc_id)
  GROUP BY md5(d.text)
),
sel AS (
  SELECT b.doc_id,
         CASE WHEN len(b.t) > 0
              THEN round(len(list_distinct(b.t))::BIGINT / len(b.t)::DOUBLE, 4)
              ELSE 0 END AS score,
         len(b.t)::BIGINT AS n_tokens
  FROM base b JOIN canon USING (doc_id)
),
c AS (
  SELECT doc_id, score, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM sel
)
SELECT doc_id, score, n_tokens FROM c
WHERE cum <= {int(budget)}
ORDER BY score DESC, doc_id ASC
"""


def knn_filtered_topk_sql(
    query_vec: list[float], filter_label: int, k: int = 10
) -> str:
    """Pre-filtered exact-kNN oracle (operators/ann.knn_filtered_topk):
    WHERE label = X before the cosine ranking; + 0.0 mirrors the
    engine's signed-zero normalization."""
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH q AS (SELECT {q} AS qv)
SELECT vec_id, round({_cos("embedding", "qv")}, 4) + 0.0::DOUBLE AS sim
FROM embeddings, q
WHERE label = {int(filter_label)}
ORDER BY sim DESC, vec_id ASC
LIMIT {k}
"""


def dsir_importance_sql(target_lang: str = "en") -> str:
    """DSIR importance-weight oracle (functions/textstats.
    dsir_importance): target/raw unigram log-probs each rounded to 6dp
    and quantized to integer 1e-6 units, tf-weighted integer
    differences summed as BIGINTs, mean rounded in integer arithmetic
    (the ratio-of-exact-integers rule) with +0.0 on the signed
    result."""
    t = target_lang.replace("'", "''")
    div = (
        "(CASE WHEN (s) < 0 THEN -1 ELSE 1 END) * "
        "((2 * abs(s) * 10000 + (1000000 * n)) // (2 * (1000000 * n)))"
    )
    return f"""
WITH tok AS (SELECT doc_id, lang = '{t}' AS is_t, {TOKS} AS t FROM documents),
w AS (SELECT doc_id, is_t, unnest(t) AS w FROM tok),
tf AS (SELECT doc_id, is_t, w, count(*) AS tf FROM w GROUP BY doc_id, is_t, w),
uni AS (
  SELECT w, sum(tf) AS c_r, sum(CASE WHEN is_t THEN tf ELSE 0 END) AS c_t
  FROM tf GROUP BY w
),
totals AS (SELECT sum(c_r) AS tr, sum(c_t) AS tt, count(*) AS v FROM uni),
ci AS (
  SELECT tf.doc_id, tf.tf,
         tf.tf * (
           CAST(round(round(ln((uni.c_t + 1)::DOUBLE / (t.tt + t.v)::DOUBLE), 6) * 1000000.0) AS BIGINT)
           - CAST(round(round(ln((uni.c_r + 1)::DOUBLE / (t.tr + t.v)::DOUBLE), 6) * 1000000.0) AS BIGINT)
         ) AS ci
  FROM tf JOIN uni ON tf.w = uni.w CROSS JOIN totals t
),
per AS (SELECT doc_id, sum(tf)::HUGEINT AS n, sum(ci)::HUGEINT AS s FROM ci GROUP BY doc_id)
SELECT doc_id,
       n::BIGINT AS n_tokens,
       ({div})::DOUBLE / 10000.0 + 0.0::DOUBLE AS logratio
FROM per
ORDER BY doc_id
"""


def dup_spans_sql(n: int = 5) -> str:
    """ExactSubstr duplicated-span oracle (operators/dedup.dup_spans):
    positions via the positional parallel-unnest zip (the snippet_topk
    idiom), gram df over DISTINCT docs, gaps-and-islands merge. Docs
    with fewer than n tokens are excluded on both sides. All-integer;
    bespoke total order (doc_id, span_start)."""
    return f"""
WITH toks AS (
  SELECT doc_id, {TOKS} AS t FROM documents
),
pos AS (
  SELECT doc_id,
         unnest(range(len(t) - {n} + 1)) + 1 AS pos,
         unnest(list_transform(range(len(t) - {n} + 1),
                i -> array_to_string(t[i+1:i+{n}], ' '))) AS g
  FROM toks WHERE len(t) >= {n}
),
dupg AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM pos GROUP BY g)
  WHERE df >= 2
),
d AS (SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM dupg)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM d
)
SELECT doc_id,
       min(pos)::BIGINT AS span_start,
       (max(pos) + {n} - 1)::BIGINT AS span_end,
       (max(pos) + {n} - min(pos))::BIGINT AS span_len
FROM isl GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def cross_doc_repetition_sql(n: int = 3) -> str:
    """Cross-doc repetition oracle (operators/dedup.
    cross_doc_repetition): gram df counts DISTINCT docs; the fraction
    rounds in HUGEINT arithmetic (ratio-of-exact-integers rule)."""
    div = (
        "((2 * dup * 10000 + total) // (2 * total))"
    )
    return f"""
WITH {_shingles(n)},
occ AS (
  SELECT doc_id, g, count(*) AS occ
  FROM (SELECT doc_id, unnest(shingles) AS g FROM sh)
  GROUP BY doc_id, g
),
gdf AS (SELECT g, count(*) AS df FROM occ GROUP BY g),
per AS (
  SELECT doc_id,
         sum(occ)::HUGEINT AS total,
         sum(CASE WHEN gdf.df >= 2 THEN occ ELSE 0 END)::HUGEINT AS dup
  FROM occ JOIN gdf USING (g)
  GROUP BY doc_id
)
SELECT doc_id,
       total::BIGINT AS n_grams,
       ({div})::DOUBLE / 10000.0 AS cross_dup_frac
FROM per
ORDER BY doc_id
"""


def frequent_item_sets_sql(min_support: int = 300) -> str:
    """frequent_item_sets oracle (functions/textstats.py
    frequent_item_sets): deliberately a DIFFERENT algorithm — a
    (doc, item) SELF-JOIN with item_a < item_b instead of the engine's
    map-side sorted-array pair generation (ascii [a-z0-9]+ tokens keep
    the two sides' string orderings equal — the phrase_prefix collation
    precedent). The df pruning is Apriori-exact on both sides: a
    pair's support <= each member's df."""
    s = int(min_support)
    return f"""
WITH base AS (SELECT doc_id, list_distinct({TOKS}) AS items FROM documents),
di AS (SELECT doc_id, unnest(items) AS item FROM base),
freq AS (SELECT item FROM di GROUP BY item HAVING count(*) >= {s}),
kept AS (SELECT doc_id, item FROM di JOIN freq USING (item))
SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS support
FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.item < b.item
GROUP BY 1, 2
HAVING count(*) >= {s}
ORDER BY support DESC, item_a, item_b
"""


def domain_cap_select_sql(cap: int = 10) -> str:
    """Per-domain-cap oracle (operators/selection.py
    domain_cap_select): the same row_number over the same total order
    (n_chars DESC, doc_id ASC) within each source; integer/boolean
    output ordered by the unique doc_id."""
    return f"""
SELECT doc_id,
       source,
       row_number() OVER (
         PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
       )::BIGINT AS rank_in_source,
       row_number() OVER (
         PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
       ) <= {int(cap)} AS kept
FROM documents
ORDER BY doc_id
"""


def semdedup_sql(
    centroids: list[list[float]], min_sim: float = 0.9
) -> str:
    """SemDeDup oracle (operators/ann.semdedup): cell assignment via
    the shared argmax-with-smallest-id CASE chain (12dp-rounded sims —
    ivf_cells_and_probes building blocks), the dropped set re-derived
    with an independent within-cell self-join on the 4dp-rounded
    cosine, keep = not dropped; ordered by the unique vec_id."""
    sim_cols, case, _ = ivf_cells_and_probes(centroids[0], centroids, 1)
    return f"""
WITH sims AS (
  SELECT vec_id, embedding, {sim_cols} FROM embeddings
),
cells AS (
  SELECT vec_id, embedding, {case} AS cell FROM sims
),
dropped AS (
  SELECT DISTINCT r.vec_id
  FROM cells l JOIN cells r ON l.cell = r.cell AND l.vec_id < r.vec_id
  WHERE round({_cos("l.embedding", "r.embedding")}, 4) >= {min_sim}
)
SELECT c.vec_id, c.cell::BIGINT AS cell, d.vec_id IS NULL AS kept
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
ORDER BY c.vec_id
"""


def chunk_windows_sql(window: int = 64, stride: int = 48) -> str:
    """Sliding-window chunking oracle (operators/packing.py
    chunk_windows): per-doc chunk starts from an unnested integer
    range, 1-based inclusive list slices (DuckDB clamps past-end
    bounds exactly like Spark's slice length cap); bespoke
    (doc_id, chunk_id) total order."""
    w, s = int(window), int(stride)
    return f"""
WITH base AS (
  SELECT doc_id, {TOKS} AS t FROM documents
),
ks AS (
  SELECT doc_id, t,
         unnest(range(0, (len(t) + {s} - 1) // {s})) AS k
  FROM base
  WHERE len(t) > 0
)
SELECT doc_id,
       k::BIGINT AS chunk_id,
       (k * {s} + 1)::BIGINT AS start_token,
       len(t[k * {s} + 1 : k * {s} + {w}])::BIGINT AS n_tokens,
       array_to_string(t[k * {s} + 1 : k * {s} + {w}], ' ') AS chunk_text
FROM ks
ORDER BY doc_id, chunk_id
"""
