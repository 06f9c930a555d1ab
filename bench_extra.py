#!/usr/bin/env python
"""Round-9 optimization harness (bench.py itself is FROZEN for
measurement — this file carries the extra instrumentation the
optimization guide §1 asks for).

Modes:
  python bench_extra.py time  [query ...]   # min-of-k wall times, collect() like bench.py
  python bench_extra.py noop  [query ...]   # noop-sink isolation (guide §1.4)
  python bench_extra.py plan  [query ...]   # .explain("formatted") -> plans/r09/<q>_<tag>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
     OLSPARK_EXTRA_REPS (default 3), OLSPARK_PLAN_TAG (default "before").

Reuses the same session config and the same query registry wiring as
bench.py's query phase, including the indexed/WAND queries over the
version-keyed bench corpus workdir.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def build_registry(spark, sf_dir):
    import __spark_entry__ as entry
    from ocaml_lucene_spark.index.build import assign_doc_ids, build_index
    from ocaml_lucene_spark.query.exec import (
        bm25_topk_auto,
        bm25_topk_indexed,
        bm25_topk_wand_exec,
        bm25_topk_wand_parallel,
        phrase_counts_indexed,
    )
    from ocaml_lucene_spark.sources.corpus import generate_corpus, make_vocab
    import ocaml_lucene_spark as _pkg

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    workdir = f"/tmp/olspark_bench_{_pkg.__version__}_{n_docs}"
    corpus = os.path.join(workdir, "c", "webtext")
    if not os.path.isdir(corpus):
        os.makedirs(workdir, exist_ok=True)
        generate_corpus(os.path.join(workdir, "c"), n_docs, seed=9, shards=64)
    index_dir = os.path.join(workdir, "idx_q")
    if not os.path.isdir(os.path.join(index_dir, "manifest")):
        docs = assign_doc_ids(
            spark.read.parquet(corpus).select("url", "text")
        ).select("doc_id", "text")
        build_index(docs, index_dir, n_partitions=32, salt_df_threshold=20_000, n_salts=8)
    idx_pos = os.path.join(workdir, "idx_pos")
    if not os.path.isdir(os.path.join(idx_pos, "manifest")):
        pdocs = assign_doc_ids(spark.read.parquet(corpus).select("url", "text")).select(
            "doc_id", "text"
        )
        build_index(pdocs, idx_pos, segment="pos", n_partitions=32,
                    salt_df_threshold=20_000, n_salts=8, with_positions=True)

    vocab = make_vocab(seed=9)
    hot_terms = ["the", "and", "of"]
    mixed_terms = ["the", vocab[300], vocab[600]]
    rare_hot_terms = [vocab[6000], "the"]

    registry = entry.queries(ordered=False)
    return {
        "bm25_logical_or": registry["bm25_or_top10"],
        "bm25_logical_and": registry["bm25_and_top10"],
        "term_stats": registry["term_stats"],
        "phrase_counts": registry["phrase_counts"],
        "dedup_exact": registry["dedup_exact"],
        "minhash_pairs": registry["minhash_candidate_pairs"],
        "simhash": registry["simhash_signatures"],
        "language_id": registry["language_id"],
        "quality": registry["quality_features"],
        "ann_brute_force": registry["ann_brute_force"],
        "ann_lsh": registry["ann_lsh"],
        "bm25_indexed_or": lambda s, _sf: bm25_topk_indexed(s, index_dir, hot_terms, "or", 10),
        "bm25_indexed_and": lambda s, _sf: bm25_topk_indexed(s, index_dir, hot_terms, "and", 10),
        "bm25_indexed_not": lambda s, _sf: bm25_topk_indexed(
            s, index_dir, ["the", "data"], "or", 10, exclude=["zipf"]
        ),
        "phrase_indexed": lambda s, _sf: phrase_counts_indexed(s, idx_pos, "of", "the"),
        "bm25_auto_rare_hot": lambda s, _sf: bm25_topk_auto(s, index_dir, rare_hot_terms, "or", 10),
        "bm25_parallel_hot": lambda s, _sf: bm25_topk_wand_parallel(s, index_dir, hot_terms, "or", 10),
        "bm25_wand_rare_hot": lambda s, _sf: bm25_topk_wand_exec(s, index_dir, rare_hot_terms, "or", 10),
        "bm25_wand_or": lambda s, _sf: bm25_topk_wand_exec(s, index_dir, mixed_terms, "or", 10),
        "bm25_wand_hot": lambda s, _sf: bm25_topk_wand_exec(s, index_dir, hot_terms, "or", 10),
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("OLSPARK_EXTRA_REPS", "3"))
    tag = os.environ.get("OLSPARK_PLAN_TAG", "before")

    from ocaml_lucene_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry(spark, sf_dir)
    if not names:
        names = list(reg)

    # warmup like bench.py
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    if mode == "plan":
        os.makedirs(os.path.join(_REPO, "plans", "r09"), exist_ok=True)
        for name in names:
            df = reg[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(_REPO, "plans", "r09", f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        return

    out = {}
    for name in names:
        fn = reg[name]
        best = float("inf")
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.monotonic()
            if mode == "noop":
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).collect()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        out[name] = {"best": round(best, 3), "samples": samples}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({k: v["best"] for k, v in out.items()}))
    print("total", round(sum(v["best"] for v in out.values()), 3))


if __name__ == "__main__":
    main()
