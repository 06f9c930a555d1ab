"""Point lookups + index integrity checks — seek_exact / codec_util parity.

``seek_exact`` reproduces the reference's term-lookup pipeline surface
(/root/reference/codec/terms_enumerator.ml:212-277): given a term,
return its Block_term_state analogue — (df, ttf, block metadata) —
without decoding any postings payloads. The walk maps as:

  min/max-term prune  -> parquet row-group stats prune (zone maps)
  FST walk            -> terms-parquet predicate pushdown on sorted term
  floor-block select  -> block rows keyed (term, block_no)
  stats decode        -> df/ttf columns

``verify_index`` is the check_index_header/check_footer analogue
(/root/reference/codec/codec_util.ml:22-60): every shard must match its
checkpoint row's content fingerprint and row counts; manifests must be
consistent with per-segment stats.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..index import segments as seg


def seek_exact(
    spark: SparkSession, index_dir: str, term: str, use_fst: bool = False
) -> dict | None:
    """Block_term_state analogue: None if the term is absent (the
    min/max prune and dictionary walk happen inside the parquet scan).

    use_fst=True serves the dictionary walk from the in-memory FST term
    index (query/term_index.py, hot-segment path): absent terms return
    None with ZERO Spark jobs, and df/ttf come from the aligned stats
    arrays; only the block-metadata gather still scans parquet."""
    rows = seg.list_segments(index_dir)
    if not rows:
        return None
    if use_fst:
        from .term_index import seek_exact_mem

        mem = seek_exact_mem(index_dir, term)
        if mem is None:
            return None
        stats = type("S", (), {"df": mem["doc_freq"], "ttf": mem["total_term_freq"]})
    else:
        term_paths = [
            seg.segment_paths(index_dir, r["segment"])["terms"] for r in rows
        ]
        stats = (
            spark.read.parquet(*term_paths)
            .filter(F.col("term") == term)
            .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            .collect()[0]
        )
        if stats.df is None:
            return None
    post_paths = [seg.segment_paths(index_dir, r["segment"])["postings"] for r in rows]
    blocks = (
        spark.read.parquet(*post_paths)
        .filter(F.col("term") == term)
        .select("block_no", "n", "first_doc", "last_doc", "max_tf", "min_dl")
        .collect()
    )
    return {
        "term": term,
        "doc_freq": int(stats.df),
        "total_term_freq": int(stats.ttf),
        "n_blocks": len(blocks),
        "singleton_doc_id": (
            int(blocks[0].first_doc) if stats.df == 1 and blocks else None
        ),
        "blocks": [
            {
                "block_no": b.block_no,
                "n": b.n,
                "first_doc": b.first_doc,
                "last_doc": b.last_doc,
                "max_tf": b.max_tf,
                "min_dl": b.min_dl,
            }
            for b in sorted(blocks, key=lambda b: (b.first_doc, b.block_no))
        ],
    }


def verify_index(spark: SparkSession, index_dir: str) -> dict:
    """Integrity check across all live segments. Raises on corruption;
    returns a summary dict on success.

    Checks (reference codec_util.check_index_header/check_footer
    semantics, re-expressed):
    - every checkpoint row's shard exists and its decoded row counts
      match the recorded fingerprint components;
    - segment postings totals match the manifest row;
    - per-field stats invariants (meta_file_reader.ml:90-98):
      doc_count <= n_docs, ttf >= df per term, sum(df) == n_postings.
    """
    summary = {"segments": 0, "shards": 0, "postings": 0}
    for row in seg.list_segments(index_dir):
        name = row["segment"]
        paths = seg.segment_paths(index_dir, name)
        ckpt_dir = paths["checkpoints"]
        n_postings = 0
        if os.path.isdir(ckpt_dir):
            for fn in sorted(os.listdir(ckpt_dir)):
                if not fn.endswith(".json"):
                    continue
                with open(os.path.join(ckpt_dir, fn)) as f:
                    ck = json.load(f)
                pid = ck["partition_id"]
                shard = os.path.join(paths["postings"], f"part-{pid:05d}.parquet")
                if not os.path.exists(shard):
                    raise ValueError(f"{name}: missing shard for checkpoint {fn}")
                got = (
                    spark.read.parquet(shard)
                    .agg(F.sum("n").alias("np"), F.count("*").alias("nb"))
                    .collect()[0]
                )
                if int(got.np) != ck["n_postings"] or int(got.nb) != ck["n_blocks"]:
                    raise ValueError(
                        f"{name}/part-{pid}: shard contents do not match "
                        f"checkpoint ({got.np}/{got.nb} vs "
                        f"{ck['n_postings']}/{ck['n_blocks']})"
                    )
                n_postings += ck["n_postings"]
                summary["shards"] += 1
        if n_postings and n_postings != row["n_postings"]:
            raise ValueError(
                f"{name}: manifest n_postings {row['n_postings']} != "
                f"checkpoint sum {n_postings}"
            )
        # block skip-metadata invariants (one metadata-only scan): the
        # pareto frontier must contain the block's max tf and min dl
        # (by construction — the max-tf point and a min-dl point are
        # never dominated), and doc ranges must be ordered; WAND
        # soundness rests on these
        bstats = (
            spark.read.parquet(paths["postings"])
            .agg(
                F.max(F.col("max_tf") != F.array_max("ub_tfs")).alias("bad_tf"),
                F.max(F.col("min_dl") != F.array_min("ub_dls")).alias("bad_dl"),
                F.max(F.col("first_doc") > F.col("last_doc")).alias("bad_rng"),
            )
            .collect()[0]
        )
        if bool(bstats.bad_tf) or bool(bstats.bad_dl):
            raise ValueError(f"{name}: block frontier disagrees with max_tf/min_dl")
        if bool(bstats.bad_rng):
            raise ValueError(f"{name}: block with first_doc > last_doc")
        # stats invariants from the terms table
        tstats = (
            spark.read.parquet(paths["terms"])
            .agg(
                F.sum("df").alias("sum_df"),
                F.count("*").alias("n_terms"),
                F.max(F.col("df") > F.col("ttf")).alias("bad_ttf"),
            )
            .collect()[0]
        )
        if bool(tstats.bad_ttf):
            raise ValueError(f"{name}: term with ttf < df")
        if int(tstats.sum_df) != row["n_postings"]:
            raise ValueError(
                f"{name}: sum(df) {tstats.sum_df} != n_postings {row['n_postings']}"
            )
        summary["segments"] += 1
        summary["postings"] += row["n_postings"]
    return summary
