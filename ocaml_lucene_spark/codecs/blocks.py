"""Postings block framing: 128-doc blocks with skip metadata.

Mirrors the reference's postings layout semantics (/root/reference/codec/
lucene_84_postings_reader.ml streams; skip pointers decoded at
/root/reference/codec/terms_enumerator.ml:154-161): a term's posting
list is chunked into BLOCK_SIZE-doc blocks; docIDs are delta+FOR/PFOR
packed, term frequencies PFOR packed, positions (within-doc deltas)
PFOR stream packed. Each block is independently decodable (its first
docID is stored absolutely), so a reader can *skip* whole blocks using
the columnar skip metadata (first_doc/last_doc/max_tf/min_dl) — that
metadata replaces Lucene's interleaved multi-level skip lists and also
carries what block-max WAND needs (upper-bounding BM25 via max_tf and
min_dl, both monotone in the score).

In the Spark engine these functions run inside applyInPandas /
mapInPandas over numpy arrays — never per-row Python in the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bitpack import BLOCK_SIZE
from .delta import delta_decode, delta_encode, stream_decode, stream_encode
from . import pfor


@dataclass
class PostingBlock:
    block_no: int
    n: int
    first_doc: int
    last_doc: int
    max_tf: int
    sum_tf: int
    min_dl: int
    doc_bytes: bytes
    tf_bytes: bytes
    dl_bytes: bytes | None  # per-posting doc length (denormalized norms —
    # Lucene keeps norms in a separate doc-values file; inlining them
    # makes a block self-scoring, no norms join at query time)
    pos_bytes: bytes | None
    off_bytes: bytes | None = None  # .pay analogue: per-occurrence char
    # start offsets (within-doc deltas, same framing as positions)
    ub_tfs: list[int] | None = None  # pareto frontier of (tf, dl) pairs:
    ub_dls: list[int] | None = None  # the non-dominated postings (tf max,
    # dl min). For ANY query-time avgdl, max over the frontier of
    # tfn(tf_j, dl_j, avgdl) is the EXACT block-max BM25 tf-norm — a far
    # tighter WAND bound than pairing max_tf with min_dl when the two
    # come from different postings (the hot+mid pruning headroom).


def _pareto_frontier(tf: np.ndarray, dl: np.ndarray) -> tuple[list[int], list[int]]:
    """Non-dominated (tf, dl) points of one block: no other point has
    tf' >= tf and dl' <= dl. BM25's tf-norm is increasing in tf and
    decreasing in dl, so for any avgdl the block-max score is attained
    on this frontier. Sorted by tf desc / dl asc; strictly-decreasing
    dl scan keeps it (n <= BLOCK_SIZE, typically a handful of points)."""
    order = np.lexsort((dl, -tf))
    tfs, dls = tf[order], dl[order]
    keep = np.empty(dls.size, dtype=bool)
    keep[0] = True
    keep[1:] = dls[1:] < np.minimum.accumulate(dls)[:-1]
    return tfs[keep].tolist(), dls[keep].tolist()


def _per_doc_delta_stream(
    values: np.ndarray, tf: np.ndarray, pos_offsets: np.ndarray, start: int, end: int
) -> bytes:
    """Pack a flat per-occurrence value stream (ascending within each
    doc) as within-doc deltas: first value of each doc absolute."""
    chunk = values[pos_offsets[start] : pos_offsets[end]].astype(np.int64)
    deltas = np.diff(chunk, prepend=np.int64(0))
    starts = (pos_offsets[start:end] - pos_offsets[start]).astype(np.int64)
    deltas[starts] = chunk[starts]
    return stream_encode(deltas.astype(np.uint64))


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None = None,
    dls: np.ndarray | None = None,
    offsets: np.ndarray | None = None,
) -> list[PostingBlock]:
    """Chunk one term's (docID-ascending) postings into packed blocks.

    positions: concatenation of every doc's ascending position list
    (lengths given by tfs). dls: doc length per posting row (for the
    min_dl WAND bound); defaults to 0 (bound disabled -> conservative).
    offsets: per-occurrence char start offsets, same flat layout as
    positions (.pay stream analogue, highlighting-class features).
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    blocks: list[PostingBlock] = []
    pos_offsets = None
    if positions is not None or offsets is not None:
        pos_offsets = np.concatenate([[0], np.cumsum(tf)])
    for bno, start in enumerate(range(0, ids.size, BLOCK_SIZE)):
        end = min(start + BLOCK_SIZE, ids.size)
        cid = ids[start:end]
        ctf = tf[start:end]
        pos_b = (
            _per_doc_delta_stream(positions, ctf, pos_offsets, start, end)
            if positions is not None
            else None
        )
        off_b = (
            _per_doc_delta_stream(offsets, ctf, pos_offsets, start, end)
            if offsets is not None
            else None
        )
        if dls is not None:
            ub_tfs, ub_dls = _pareto_frontier(ctf, dls[start:end])
        else:
            ub_tfs, ub_dls = [int(ctf.max())], [0]
        blocks.append(
            PostingBlock(
                block_no=bno,
                n=int(end - start),
                first_doc=int(cid[0]),
                last_doc=int(cid[-1]),
                max_tf=int(ctf.max()),
                sum_tf=int(ctf.sum()),
                min_dl=int(dls[start:end].min()) if dls is not None else 0,
                doc_bytes=delta_encode(cid),
                tf_bytes=pfor.encode(ctf.astype(np.uint64)),
                dl_bytes=(
                    pfor.encode(np.asarray(dls[start:end], dtype=np.uint64))
                    if dls is not None
                    else None
                ),
                pos_bytes=pos_b,
                off_bytes=off_b,
                ub_tfs=ub_tfs,
                ub_dls=ub_dls,
            )
        )
    return blocks


def decode_doc_ids(doc_bytes: bytes) -> np.ndarray:
    return delta_decode(doc_bytes)


def decode_tfs(tf_bytes: bytes, n: int) -> np.ndarray:
    return pfor.decode(tf_bytes, n).astype(np.int64)


def decode_positions(pos_bytes: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Return per-doc ascending position arrays (also decodes the
    offsets stream, which shares the framing)."""
    deltas = stream_decode(pos_bytes).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(np.asarray(tfs, dtype=np.int64))])
    return [np.cumsum(deltas[offsets[i] : offsets[i + 1]]) for i in range(len(tfs))]


def decode_flat_stream(data: bytes, tfs: np.ndarray) -> np.ndarray:
    """Vectorized flat decode of a per-doc-delta stream (positions or
    offsets): one cumsum minus a repeated per-doc base — no Python
    lists, no per-doc loop."""
    tf = np.asarray(tfs, dtype=np.int64)
    deltas = stream_decode(data).astype(np.int64)
    c = np.cumsum(deltas)
    starts = np.concatenate([[0], np.cumsum(tf)])[:-1]
    base = c[starts] - deltas[starts]
    return c - np.repeat(base, tf)
