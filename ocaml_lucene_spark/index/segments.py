"""Segment format: term-sorted packed-postings parquet + stats + manifest.

The reference reads Lucene segments: .si (segment info), .fnm (field
schema), .tim/.tip/.tmd (terms dict + FST index + stats), .doc/.pos
(postings streams) — SURVEY.md §1.1. Our Spark-first re-expression of
each piece:

| Lucene file              | here                                         |
|--------------------------|----------------------------------------------|
| segments_N manifest      | index_dir/manifest/*.json rows (generations)  |
| .si per-segment info     | segment row in the manifest (+ metrics)       |
| .fnm field infos         | stats.json index_options + input schema      |
| .tim terms dict blocks   | postings parquet sorted by term (row-group    |
|                          | min/max term stats = zone maps = floor blocks)|
| .tip FST terms index     | parquet row-group pruning (+ optional fst/)   |
| .tmd per-field stats     | terms parquet (term, df, ttf) + stats.json    |
| .doc/.pos postings       | packed binary columns (delta+FOR/PFOR blocks) |
| norms doc-values         | dl_bytes stream inlined per block             |
| multi-level skip lists   | first_doc/last_doc/max_tf/min_dl columns      |

A segment here is a *generation* of the index: one build (or merge)
over a set of docs with globally-unique docIDs. Within a segment the
postings table is hash-partitioned by (term, salt) — deterministic for
resume, hot terms split across partitions — and term-sorted within
files so Catalyst prunes row groups on term predicates.

Cited reference semantics: block size 128
(codec/block_tree_terms_reader.ml:27-28), per-field stats invariants
(meta_file_reader.ml:90-98), segment generations (segments.ml:106-115).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd

POSTINGS_SCHEMA = (
    "term string, block_no int, n int, first_doc long, last_doc long, "
    "max_tf int, sum_tf long, min_dl int, doc_bytes binary, tf_bytes binary, "
    "dl_bytes binary, pos_bytes binary"
)

CHECKPOINT_SCHEMA = (
    "segment string, partition_id int, min_term string, max_term string, "
    "n_terms long, n_postings long, n_blocks long, bytes_packed long, "
    "elapsed_sec double, postings_per_sec double, status string, "
    "fingerprint string"
)


def segment_paths(index_dir: str, segment: str) -> dict[str, str]:
    base = os.path.join(index_dir, "segments", segment)
    return {
        "base": base,
        "postings": os.path.join(base, "postings"),
        "terms": os.path.join(base, "terms"),
        "norms": os.path.join(base, "norms"),
        "stats": os.path.join(base, "stats.json"),
        "checkpoints": os.path.join(index_dir, "checkpoints", segment),
        "manifest": os.path.join(index_dir, "manifest"),
    }


def pack_partition(
    pdf: pd.DataFrame,
    segment: str,
    postings_dir: str,
    checkpoint_dir: str,
    with_positions: bool,
) -> pd.DataFrame:
    """mapInPandas kernel: one shuffle partition of (term, salt,
    doc_id, tf, dl[, positions]) rows -> packed block rows written as a
    term-sorted parquet shard + one checkpoint/metrics row returned.

    Resumable: if this partition's shard + checkpoint already exist
    (same fingerprint), the write is skipped and the existing
    checkpoint row is returned (build DAG restart without recompute).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..codecs.blocks import encode_posting_blocks

    import hashlib

    t0 = time.monotonic()
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=[c.split(" ")[0] for c in CHECKPOINT_SCHEMA.split(", ")]
        )
    pid = int(pdf["pid"].iloc[0])

    # input is JVM-sorted by (term, salt, doc_id); verify cheaply and
    # only fall back to a pandas sort if the invariant is broken
    terms = pdf["term"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    salts_arr = pdf["salt"].to_numpy()
    same_group = (terms[1:] == terms[:-1]) & (salts_arr[1:] == salts_arr[:-1])
    docs_ok = bool((~same_group | (np.diff(doc_ids) > 0)).all())
    terms_ok = bool((terms[1:] >= terms[:-1]).all())
    if not (docs_ok and terms_ok):
        pdf = pdf.sort_values(["term", "salt", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        salts_arr = pdf["salt"].to_numpy()
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    pos_flat = None
    if with_positions:
        pos_flat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
        ) if len(pdf) else np.zeros(0, np.int64)

    # deterministic CONTENT fingerprint (vectorized md5 over the actual
    # column buffers, sort-normalized above): aggregate-sum fingerprints
    # collide when values swap between rows, which would silently resume
    # onto a stale shard for different input data
    h = hashlib.md5()
    h.update(pd.util.hash_pandas_object(pdf["term"], index=False).to_numpy().tobytes())
    h.update(np.ascontiguousarray(salts_arr, dtype=np.int64).tobytes())
    h.update(doc_ids.tobytes())
    h.update(tfs.tobytes())
    h.update(dls.tobytes())
    if pos_flat is not None:
        h.update(pos_flat.tobytes())
    fingerprint = f"{len(pdf)}-{h.hexdigest()}"
    shard = os.path.join(postings_dir, f"part-{pid:05d}.parquet")
    ckpt = os.path.join(checkpoint_dir, f"part-{pid:05d}.json")
    if os.path.exists(ckpt) and os.path.exists(shard):
        with open(ckpt) as f:
            row = json.load(f)
        if row.get("fingerprint") == fingerprint:
            row["status"] = "skipped_checkpoint"
            return pd.DataFrame([row])

    # group boundaries per (term, salt) run
    change = np.nonzero(
        (terms[1:] != terms[:-1]) | (pdf["salt"].to_numpy()[1:] != pdf["salt"].to_numpy()[:-1])
    )[0] + 1
    bounds = np.concatenate([[0], change, [len(pdf)]])
    pos_offsets = (
        np.concatenate([[0], np.cumsum(tfs)]) if with_positions else None
    )

    out = {k: [] for k in (
        "term", "block_no", "n", "first_doc", "last_doc", "max_tf", "sum_tf",
        "min_dl", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes")}
    n_blocks = 0
    for gi in range(len(bounds) - 1):
        s, e = int(bounds[gi]), int(bounds[gi + 1])
        grp_pos = (
            pos_flat[pos_offsets[s] : pos_offsets[e]] if with_positions else None
        )
        blocks = encode_posting_blocks(doc_ids[s:e], tfs[s:e], grp_pos, dls[s:e])
        salt = int(pdf["salt"].iloc[s])
        for b in blocks:
            out["term"].append(terms[s])
            # salt shards of one term get disjoint block_no ranges
            out["block_no"].append(salt * 100_000 + b.block_no)
            out["n"].append(b.n)
            out["first_doc"].append(b.first_doc)
            out["last_doc"].append(b.last_doc)
            out["max_tf"].append(b.max_tf)
            out["sum_tf"].append(b.sum_tf)
            out["min_dl"].append(b.min_dl)
            out["doc_bytes"].append(b.doc_bytes)
            out["tf_bytes"].append(b.tf_bytes)
            out["dl_bytes"].append(b.dl_bytes)
            out["pos_bytes"].append(b.pos_bytes)
            n_blocks += 1

    table = pa.table(
        {
            "term": pa.array(out["term"], pa.string()),
            "block_no": pa.array(out["block_no"], pa.int32()),
            "n": pa.array(out["n"], pa.int32()),
            "first_doc": pa.array(out["first_doc"], pa.int64()),
            "last_doc": pa.array(out["last_doc"], pa.int64()),
            "max_tf": pa.array(out["max_tf"], pa.int32()),
            "sum_tf": pa.array(out["sum_tf"], pa.int64()),
            "min_dl": pa.array(out["min_dl"], pa.int32()),
            "doc_bytes": pa.array(out["doc_bytes"], pa.binary()),
            "tf_bytes": pa.array(out["tf_bytes"], pa.binary()),
            "dl_bytes": pa.array(out["dl_bytes"], pa.binary()),
            "pos_bytes": pa.array(out["pos_bytes"], pa.binary()),
        }
    )
    os.makedirs(postings_dir, exist_ok=True)
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = shard + f".tmp-{uuid.uuid4().hex[:8]}"
    # cheap page compression: payload columns are already FOR/PFOR-
    # packed, so a fast codec wins on build throughput (snappy — the
    # pyarrow lz4 framing is not readable by Spark's parquet reader)
    pq.write_table(table, tmp, row_group_size=4096, compression="snappy")
    os.replace(tmp, shard)  # atomic publish

    elapsed = time.monotonic() - t0
    n_postings = int(len(pdf))
    bytes_packed = int(
        sum(len(x) for x in out["doc_bytes"])
        + sum(len(x) for x in out["tf_bytes"])
        + sum(len(x) for x in out["dl_bytes"])
        + sum(len(x) for x in out["pos_bytes"] if x is not None)
    )
    row = {
        "segment": segment,
        "partition_id": pid,
        "min_term": str(terms[0]),
        "max_term": str(terms[-1]),
        "n_terms": int((terms[1:] != terms[:-1]).sum()) + 1,
        "n_postings": n_postings,
        "n_blocks": n_blocks,
        "bytes_packed": bytes_packed,
        "elapsed_sec": elapsed,
        "postings_per_sec": n_postings / elapsed if elapsed > 0 else 0.0,
        "status": "ok",
        "fingerprint": fingerprint,
    }
    with open(ckpt + ".tmp", "w") as f:
        json.dump(row, f)
    os.replace(ckpt + ".tmp", ckpt)
    return pd.DataFrame([row])


def read_stats(index_dir: str, segment: str) -> dict:
    with open(segment_paths(index_dir, segment)["stats"]) as f:
        return json.load(f)


def write_stats(index_dir: str, segment: str, stats: dict) -> None:
    p = segment_paths(index_dir, segment)["stats"]
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(stats, f, indent=1)


def list_segments(index_dir: str, live_only: bool = True) -> list[dict]:
    """Read manifest rows (newest generation wins per segment name) —
    Segments.latest semantics (codec/segments.ml:106-115)."""
    mdir = os.path.join(index_dir, "manifest")
    if not os.path.isdir(mdir):
        return []
    rows = []
    for fn in sorted(os.listdir(mdir)):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                rows.append(json.load(f))
    by_name: dict[str, dict] = {}
    for r in rows:
        cur = by_name.get(r["segment"])
        if cur is None or r["generation"] >= cur["generation"]:
            by_name[r["segment"]] = r
    out = list(by_name.values())
    if live_only:
        out = [r for r in out if r.get("status") == "live"]
    return sorted(out, key=lambda r: r["generation"])


def write_manifest_row(index_dir: str, row: dict) -> None:
    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    fn = f"{row['generation']:06d}-{row['segment']}.json"
    with open(os.path.join(mdir, fn) + ".tmp", "w") as f:
        json.dump(row, f, indent=1)
    os.replace(os.path.join(mdir, fn) + ".tmp", os.path.join(mdir, fn))


def next_generation(index_dir: str) -> int:
    segs = list_segments(index_dir, live_only=False)
    return (max((r["generation"] for r in segs), default=0)) + 1
