"""Composed ``open_index`` over a real Lucene 8.x directory — the
public equivalent of the reference's only application,
/root/reference/app/lucene_tools.ml:7-27, which chains
Segments.latest -> Segment_info.read (.si) -> Field_infos.read (.fnm)
-> Block_tree_terms_reader.create (.tim/.tip/.tmd headers + per-field
FST) -> Terms_enumerator.seek_exact to a Block_term_state.

Every step already exists in this package
(segments_manifest / segment_meta / fst_reader / block_pointer /
terms_block); this module is the composition plus a tiny CLI:

    python -m ocaml_lucene_spark.interop.open_index DIR FIELD TERM

Semantics provenance, step by step:
- directory layout + latest commit: segments_manifest.read_latest
  (codec/segments.ml Segments.latest)
- per-segment files ``{seg}.si`` / ``{seg}.fnm`` /
  ``{seg}_Lucene84_0.{tmd,tim,tip}``:
  codec/block_tree_terms_reader.ml:9-11 make_segment_file_name
- .tim header BlockTreeTermsDict v3..6, separate-meta (>= 6) gate,
  .tip header BlockTreeTermsIndex pinned to the .tim version:
  block_tree_terms_reader.ml:13-24
- .tmd parse incl. per-field FST metadata: segment_meta.read_terms_meta
  (segment/meta_file_reader.ml)
- the field's FST bytes live in .tip at index_start_fp, num_bytes
  long; node addresses are relative to that slice
  (block_tree_terms_reader.ml:55-58 clone + set_file_pointer)
- seek_exact: min/max-term pruning, FST prefix walk + build_output,
  floor-pointer find_block on the label AFTER the matched prefix,
  leaf-block suffix scan, metadata decode to Block_term_state:
  terms-enumerator/terms_enumerator.ml:212-277

These are driver-side, metadata-sized reads (the same open-time cost
Lucene itself pays per segment); nothing here sits on a per-row path —
the Spark engine queries its own parquet segment format
(docs/SEGMENT_FORMAT.md), and this reader is the interop bridge for
inspecting real Lucene indexes.

EVIDENCE CAVEAT: the metadata steps (segments_N, .si, .fnm, .tmd, the
FST, floor pointers) are pinned by the reference's golden fixtures,
but the ``.doc``/``.pos``/``.pay`` postings decode this module
composes (postings_stream.py) is pinned by this repo's own
grammar-inverse writer↔reader round-trips plus Hypothesis grammar
fuzzing, an INDEPENDENT spec-derived PFOR decoder, and bit-flip
mutation properties (tests/test_postings_mutation.py — which caught
the writers' magic byte-order divergence from real Lucene). The
reference stubs its postings read path and ships no postings fixture,
so a shared misreading of the prose spec that both the reader and the
independent decoder repeat could still survive this evidence model.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

from .block_pointer import find_block
from .data_input import DataInput
from .fst_reader import FstReader
from .norms import NormsReader
from .segment_meta import (
    check_index_header,
    read_field_infos,
    read_segment_info,
    read_terms_meta,
)
from .postings_stream import (
    DocStreamReader,
    PayStreamReader,
    PosStreamReader,
    read_term_postings_and_positions,
    read_term_postings_positions_payloads,
)
from .segments_manifest import read_latest
from .terms_block import BlockTermState, FieldFlags, read_block, seek_exact_in_block

_SUFFIX = b"Lucene84_0"


def _flags_for(field_info: dict) -> FieldFlags:
    """Field_infos predicates -> the decode flags
    (terms_enumerator.ml:141-189 consults has_freqs/has_positions/
    has_offsets/has_payloads)."""
    opts = field_info["index_options"]
    return FieldFlags(
        has_freqs="FREQS" in opts,
        has_positions="POSITIONS" in opts,
        has_offsets="OFFSETS" in opts,
        has_payloads=field_info["store_payloads"],
    )


@dataclass(frozen=True)
class FieldTermsReader:
    """One field's terms access: .tmd meta + the FST index slice
    (the reference's (field_info, Field_reader, fst) triple,
    block_tree_terms_reader.ml:59-73)."""

    field_info: dict
    meta: dict
    fst: FstReader
    flags: FieldFlags


class SegmentReader:
    """One opened segment: parsed .si/.fnm records, the .tim bytes,
    and per-field terms readers."""

    def __init__(self, dir_path: str, seg_name: str, seg_id: bytes):
        self.seg_name = seg_name
        self.seg_id = seg_id

        def load(ext: str, codec_suffix: bool = False) -> bytes:
            name = (
                f"{seg_name}_{_SUFFIX.decode()}.{ext}"
                if codec_suffix
                else f"{seg_name}.{ext}"
            )
            with open(os.path.join(dir_path, name), "rb") as f:
                return f.read()

        self.segment_info = read_segment_info(load("si"))
        if self.segment_info["index_header"]["object_id"] != seg_id:
            raise ValueError(
                f"segment id mismatch between segments_N and {seg_name}.si"
            )
        self.field_infos = read_field_infos(load("fnm"))

        # .tim / .tip headers (block_tree_terms_reader.ml:13-24)
        self.tim = load("tim", codec_suffix=True)
        tim_header = check_index_header(
            DataInput(self.tim), "BlockTreeTermsDict", 3, 6, seg_id, _SUFFIX
        )
        version = tim_header["version"]
        if version < 6:
            raise ValueError(
                "We only support versions with a separate meta file"
            )
        tip = load("tip", codec_suffix=True)
        check_index_header(
            DataInput(tip), "BlockTreeTermsIndex", version, version, seg_id, _SUFFIX
        )

        tmd = read_terms_meta(
            load("tmd", codec_suffix=True),
            segment_id=seg_id,
            field_infos=self.field_infos,
            version=version,
            max_doc_count=self.segment_info["doc_count"],
        )
        by_number = {
            f["field_number"]: f for f in self.field_infos["field_infos"]
        }
        self.field_readers: dict[str, FieldTermsReader] = {}
        for meta in tmd["field_metas"]:
            info = by_number[meta["field_id"]]
            fm = meta["fst_meta"]
            start = meta["index_start_fp"]
            blob = tip[start : start + fm["num_bytes"]]
            if len(blob) != fm["num_bytes"]:
                raise EOFError("FST slice overruns .tip")
            fst = FstReader(
                blob, fm["start_node"], fm["empty_output"], output_type="bytes"
            )
            self.field_readers[info["name"]] = FieldTermsReader(
                field_info=info, meta=meta, fst=fst, flags=_flags_for(info)
            )

        # .doc/.pos postings streams open LAZILY (cached_property
        # below): they are the bulk of a real segment's bytes, and
        # open-time cost must stay metadata-sized — a seek_exact-only
        # session (the reference app's whole surface,
        # lucene_tools.ml:7-27) never touches them
        self._dir_path = dir_path

    def _stream_path(self, ext: str) -> str:
        return os.path.join(
            self._dir_path, f"{self.seg_name}_{_SUFFIX.decode()}.{ext}"
        )

    @functools.cached_property
    def doc_reader(self) -> DocStreamReader | None:
        """The .doc stream, read on first postings call — the
        reference's create opens doc_in and checks its header
        (lucene_84_postings_reader.ml:24-28) but stubs iteration
        (:51-53); interop/postings_stream.py finishes that read path."""
        path = self._stream_path("doc")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return DocStreamReader(f.read(), self.seg_id)

    @functools.cached_property
    def pos_reader(self) -> PosStreamReader | None:
        """The .pos stream, read on first positions call — opened by
        the reference exactly when the field infos say has_prox
        (lucene_84_postings_reader.ml:29-33), likewise never iterated."""
        path = self._stream_path("pos")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return PosStreamReader(f.read(), self.seg_id)

    @functools.cached_property
    def norms_reader(self) -> NormsReader | None:
        """The Lucene80 norms pair ({seg}.nvd/{seg}.nvm — the default
        norms format writes no codec suffix), read on first norms
        call. The reference never reads norms (its postings path is
        stubbed before scoring enters the picture), so this surface
        has no OCaml analogue; it is what BM25 scoring over a real
        index needs for per-doc field lengths."""
        nvd_path = os.path.join(self._dir_path, f"{self.seg_name}.nvd")
        nvm_path = os.path.join(self._dir_path, f"{self.seg_name}.nvm")
        if not (os.path.exists(nvd_path) and os.path.exists(nvm_path)):
            return None
        with open(nvd_path, "rb") as f:
            nvd = f.read()
        with open(nvm_path, "rb") as f:
            nvm = f.read()
        return NormsReader(nvd, nvm, self.seg_id)

    def norms(self, field: str):
        """Per-doc norm longs for ``field`` (length max_doc from the
        .si record; for a BM25 text field these are SmallFloat-encoded
        quantized lengths), or None when the segment has no norms
        files, the field has no entry, or no doc has the field."""
        nr = self.norms_reader
        if nr is None:
            return None
        fr = self.field_readers.get(field)
        if fr is None:
            raise KeyError(f"field {field!r} has no terms dictionary")
        number = fr.field_info["field_number"]
        if number not in nr.entries:
            return None
        return nr.norms(number, self.segment_info["doc_count"])

    @functools.cached_property
    def pay_reader(self) -> PayStreamReader | None:
        """The .pay stream, read on first payloads/offsets call — the
        third file the reference's create opens
        (lucene_84_postings_reader.ml:36-44) and never reads."""
        path = self._stream_path("pay")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return PayStreamReader(f.read(), self.seg_id)

    def seek_exact(self, field: str, term: bytes) -> BlockTermState | None:
        """terms_enumerator.ml seek_exact: min/max pruning, FST prefix
        walk, build_output, find_block on the char after the prefix,
        leaf-block suffix scan + metadata decode."""
        if isinstance(term, str):
            term = term.encode()
        fr = self.field_readers.get(field)
        if fr is None:
            raise KeyError(f"field {field!r} has no terms dictionary")
        meta = fr.meta
        if meta["num_terms"] > 0 and (
            term < meta["min_term"] or term > meta["max_term"]
        ):
            return None
        fst = fr.fst
        arc = fst.first_arc()
        path = [arc]
        for b in term:
            if arc.target <= 0:  # stop arc: no outgoing node
                break
            nxt = fst.read_next_arc(b, arc)
            if nxt is None:
                break
            path.append(nxt)
            arc = nxt
        prefix_length = len(path) - 1
        if prefix_length >= len(term):
            # the reference crashes here too (String.get past the end,
            # terms_enumerator.ml:225): its index FSTs only hold strict
            # prefixes of indexed terms
            raise NotImplementedError(
                "FST prefix consumed the whole target term"
            )
        out = b"".join(a.output for a in path[:-1])
        out += path[-1].output + path[-1].final_output
        if not out:
            # no arc matched and the walked prefix carries no pointer
            # bytes: nothing in the dictionary starts with this byte.
            # (A real Lucene root block would make the output
            # non-empty; the synthetic fixtures hold strict leaf
            # prefixes only, so an unmatched first byte lands here.)
            return None
        fp = find_block(out, term[prefix_length])
        if fp is None:
            return None
        block = read_block(DataInput(self.tim, fp))
        return seek_exact_in_block(block, term[prefix_length:], fr.flags)


class LuceneIndex:
    """An opened index: the latest commit's segments, each a
    SegmentReader."""

    def __init__(self, dir_path: str):
        self.dir_path = dir_path
        self.manifest = read_latest(dir_path)
        self.segments = [
            SegmentReader(dir_path, s["seg_name"], s["seg_id"])
            for s in self.manifest["segments"]
        ]

    def seek_exact(
        self, field: str, term: bytes
    ) -> list[tuple[str, BlockTermState]]:
        """(seg_name, Block_term_state) for every segment where the
        term exists (the app loops segments; lucene_tools.ml:9-27)."""
        out = []
        for seg in self.segments:
            state = seg.seek_exact(field, term)
            if state is not None:
                out.append((seg.seg_name, state))
        return out

    def postings(self, field: str, term: bytes, target: int | None = None):
        """(seg_name, doc_ids, freqs) per matching segment: the
        composed seek -> .doc walk the reference never finished
        (postings stub at lucene_84_postings_reader.ml:51-53). With
        ``target``, each segment advances via its skip list and
        returns docs from the first block that can contain it."""
        out = []
        for seg in self.segments:
            state = seg.seek_exact(field, term)
            if state is None:
                continue
            if seg.doc_reader is None:
                raise FileNotFoundError(
                    f"segment {seg.seg_name} has no .doc stream"
                )
            docs, freqs = seg.doc_reader.postings(
                state, seg.field_readers[field].flags, target=target
            )
            out.append((seg.seg_name, docs, freqs))
        return out

    def positions(self, field: str, term: bytes, target: int | None = None):
        """(seg_name, doc_ids, freqs, per-doc position arrays) per
        matching segment: the full doc+pos walk, sharing one skip
        advance (the .doc skip entries carry the .pos resume state)."""
        out = []
        for seg in self.segments:
            state = seg.seek_exact(field, term)
            if state is None:
                continue
            if seg.doc_reader is None or seg.pos_reader is None:
                raise FileNotFoundError(
                    f"segment {seg.seg_name} lacks a .doc or .pos stream"
                )
            docs, freqs, positions = read_term_postings_and_positions(
                seg.doc_reader.data,
                seg.pos_reader.data,
                state,
                seg.field_readers[field].flags,
                target=target,
            )
            out.append((seg.seg_name, docs, freqs, positions))
        return out

    def positions_with_payloads(
        self, field: str, term: bytes, target: int | None = None
    ):
        """(seg_name, doc_ids, freqs, per-doc positions, per-doc
        payloads | None, per-doc (starts, ends) offsets | None) per
        matching segment: the full three-stream walk over the .pay
        file the reference opens but never reads
        (lucene_84_postings_reader.ml:36-44), one shared skip
        advance."""
        out = []
        for seg in self.segments:
            state = seg.seek_exact(field, term)
            if state is None:
                continue
            if (
                seg.doc_reader is None
                or seg.pos_reader is None
                or seg.pay_reader is None
            ):
                raise FileNotFoundError(
                    f"segment {seg.seg_name} lacks a .doc/.pos/.pay stream"
                )
            out.append(
                (seg.seg_name,)
                + read_term_postings_positions_payloads(
                    seg.doc_reader.data,
                    seg.pos_reader.data,
                    seg.pay_reader.data,
                    state,
                    seg.field_readers[field].flags,
                    target=target,
                )
            )
        return out


    def bm25_topk(
        self, field: str, terms: list[str], k: int = 10, mode: str = "or"
    ) -> list[tuple[int, float]]:
        """Exact BM25 top-k over the opened index, block-max pruned by
        the stored skip impacts (interop/wand_search.py); requires the
        Lucene80 norms pair. [(global_doc_id, score)]."""
        from .wand_search import bm25_topk as _topk

        hits, _metrics = _topk(self, field, terms, k=k, mode=mode)
        return hits


def open_index(dir_path: str) -> LuceneIndex:
    """Open a real Lucene index directory (latest commit point)."""
    return LuceneIndex(dir_path)


def main(argv: list[str] | None = None) -> int:
    """CLI mirror of app/lucene_tools.ml: seek one term in one field
    across the latest commit's segments."""
    import sys

    args = sys.argv[1:] if argv is None else argv
    if len(args) != 3:
        print(
            "usage: python -m ocaml_lucene_spark.interop.open_index "
            "DIR FIELD TERM",
            file=sys.stderr,
        )
        return 2
    dir_path, field, term = args
    index = open_index(dir_path)
    hits = index.seek_exact(field, term.encode())
    if not hits:
        print("Failed to match!")
        return 1
    for seg_name, state in hits:
        print(f"Segment = {seg_name}")
        print(f"Block state = {state}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
