"""Block-max WAND: exact top-k BM25 with block-level pruning.

The reference stores skip pointers (skip_offset when df>128,
/root/reference/codec/terms_enumerator.ml:154-161) precisely so posting
iterators can jump blocks; our columnar skip metadata
(first_doc/last_doc/max_tf/min_dl per block) additionally carries what
Block-Max WAND (Ding & Suel 2011, public literature) needs: a per-block
score upper bound idf * tfn(max_tf, min_dl) — valid because BM25 is
monotone increasing in tf and decreasing in dl.

Safety property (tested): returns exactly the exhaustive top-k with
tie-break (score desc, doc_id asc). Pruning predicates are strict
(bound < theta) so boundary ties are always fully evaluated.

Runs single-threaded over numpy block arrays: on a cluster this
executes inside one task per query (the posting lists of a handful of
query terms), while query/exec.py's distributed path handles candidate
sets too big for one task.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from ..oracle import B, K1

INF_DOC = 1 << 62


def tfn_ub(max_tf: float, min_dl: float, avgdl: float) -> float:
    return max_tf * (K1 + 1.0) / (max_tf + K1 * (1.0 - B + B * min_dl / avgdl))


@dataclass
class PostingList:
    """One doc-sorted posting unit: a (term, salt-shard) block sequence."""

    term: str
    idf: float
    avgdl: float
    # block metadata arrays (sorted by first_doc; doc-disjoint blocks)
    first_doc: np.ndarray
    last_doc: np.ndarray
    ub: np.ndarray  # per-block score upper bound
    payloads: list  # (doc_bytes, tf_bytes, dl_bytes) per block, lazily decoded
    bi: int = 0
    pi: int = 0
    docs: np.ndarray | None = None
    scores: np.ndarray | None = None
    decoded_blocks: int = field(default=0)

    @property
    def max_ub(self) -> float:
        return float(self.ub.max()) if self.ub.size else 0.0

    def _decode(self) -> None:
        from ..codecs import pfor
        from ..codecs.delta import delta_decode

        db, tb, lb = self.payloads[self.bi]
        docs = delta_decode(db)
        tf = pfor.decode(tb, docs.size).astype(np.float64)
        dl = pfor.decode(lb, docs.size).astype(np.float64)
        self.docs = docs
        self.scores = (
            self.idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
        )
        self.pi = 0
        self.decoded_blocks += 1

    def exhausted(self) -> bool:
        return self.bi >= len(self.payloads)

    def current_doc(self) -> int:
        """Smallest not-yet-consumed docID; decode deferred (metadata
        gives the block's first_doc exactly)."""
        if self.exhausted():
            return INF_DOC
        if self.docs is None:
            return int(self.first_doc[self.bi])
        return int(self.docs[self.pi])

    def current_block_last(self) -> int:
        return int(self.last_doc[self.bi])

    def current_block_ub(self) -> float:
        return float(self.ub[self.bi]) if not self.exhausted() else 0.0

    def advance_to(self, target: int) -> None:
        """Position at the first posting with doc >= target."""
        while True:
            while not self.exhausted() and int(self.last_doc[self.bi]) < target:
                self.bi += 1
                self.docs = None
            if self.exhausted():
                return
            if self.docs is None:
                if int(self.first_doc[self.bi]) >= target:
                    return  # metadata position suffices; decode stays lazy
                self._decode()
            self.pi = int(np.searchsorted(self.docs, target, side="left"))
            if self.pi < self.docs.size:
                return
            self.bi += 1
            self.docs = None

    def score_at(self, doc: int) -> float:
        """Score if ``doc`` is present (advances the iterator to doc)."""
        self.advance_to(doc)
        if self.exhausted():
            return 0.0
        if self.docs is None:
            if int(self.first_doc[self.bi]) != doc:
                return 0.0
            self._decode()
            self.pi = int(np.searchsorted(self.docs, doc, side="left"))
        if self.pi < self.docs.size and int(self.docs[self.pi]) == doc:
            return float(self.scores[self.pi])
        return 0.0

    def contains(self, doc: int) -> bool:
        """Membership probe (advances the iterator): the NOT-clause
        leapfrog — blocks whose [first_doc, last_doc] cannot hold
        ``doc`` are skipped via metadata, never decoded."""
        self.advance_to(doc)
        if self.exhausted():
            return False
        if self.docs is None:
            if int(self.first_doc[self.bi]) != doc:
                return False
            self._decode()
            self.pi = int(np.searchsorted(self.docs, doc, side="left"))
        return self.pi < self.docs.size and int(self.docs[self.pi]) == doc


def block_max_wand(
    lists: list[PostingList],
    k: int,
    require_all_terms: set[str] | None = None,
    round_to: int | None = None,
    exclude_lists: list[PostingList] | None = None,
) -> tuple[list[tuple[int, float]], dict]:
    """Exact top-k [(doc_id, score)] over posting lists.

    require_all_terms: conjunctive mode — results must hit every term in
    the set (a term may be represented by several salt-shard lists).

    exclude_lists: NOT clause — posting lists whose docs are dropped
    from the results (docID-sorted leapfrog anti-join: each exclusion
    iterator only advances forward and only decodes blocks that might
    contain a surviving pivot, reference skip-data semantics,
    /root/reference/codec/terms_enumerator.ml:154-161).

    round_to: when set, the heap orders by round(score, round_to) (then
    doc_id asc) so the k-boundary tie-break matches the exhaustive paths
    and the SQL oracle, which compare rounded scores. Pruning then uses
    theta - 0.5*10^-round_to: a pruned doc's raw score is strictly below
    that, so its rounded score is strictly below theta — no rounded tie
    at the boundary can be lost.
    """
    heap: list[tuple[float, int]] = []  # (score_key, -doc_id) min-heap
    theta: float | None = None  # kth best score key once heap is full
    eps = 0.5 * 10.0 ** (-round_to) if round_to is not None else 0.0

    def score_key(s: float) -> float:
        return round(s, round_to) if round_to is not None else s

    and_mode = require_all_terms is not None
    if and_mode:
        covered = {pl.term for pl in lists}
        if not (covered >= require_all_terms):
            return [], {"decoded_blocks": 0, "total_blocks": 0, "n_lists": len(lists)}

    while True:
        live = [pl for pl in lists if not pl.exhausted()]
        if not live:
            break
        live.sort(key=lambda pl: pl.current_doc())
        # pivot selection
        pivot_doc = None
        if and_mode:
            seen = set()
            for pl in live:
                seen.add(pl.term)
                if seen >= require_all_terms:
                    pivot_doc = pl.current_doc()
                    break
        else:
            acc = 0.0
            for pl in live:
                acc += pl.max_ub
                if theta is None or acc >= theta - eps:  # >= keeps boundary ties
                    pivot_doc = pl.current_doc()
                    break
        if pivot_doc is None or pivot_doc >= INF_DOC:
            break
        cand = [pl for pl in live if pl.current_doc() <= pivot_doc]
        # block-max refinement, both modes: strict < so ties survive.
        # Sound in AND mode too: with the jump capped at the next live
        # list's current doc, any doc in (pivot, jump) can only draw
        # contributions from the candidate lists' CURRENT blocks, whose
        # ub sum is exactly the bound tested here.
        if theta is not None:
            bm = sum(pl.current_block_ub() for pl in cand)
            if bm < theta - eps:
                # Safe skip target: past the candidate blocks, but never
                # past another live list's current doc — docs in
                # (pivot, jump) may score from non-candidate lists, and
                # an uncapped jump would advance candidate lists past
                # them, permanently losing their contributions.
                jump = min(pl.current_block_last() for pl in cand) + 1
                nxt = [
                    pl.current_doc() for pl in live
                    if pl.current_doc() > pivot_doc
                ]
                if nxt:
                    jump = min(jump, min(nxt))
                jump = max(jump, pivot_doc + 1)
                for pl in cand:
                    pl.advance_to(jump)
                continue
        # full evaluation at pivot_doc
        score = 0.0
        hit = set()
        for pl in lists:
            s = pl.score_at(pivot_doc)
            if s > 0.0:
                score += s
                hit.add(pl.term)
        ok = (hit >= require_all_terms) if and_mode else bool(hit)
        if ok and exclude_lists:
            ok = not any(xl.contains(pivot_doc) for xl in exclude_lists)
        if ok:
            item = (score_key(score), -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= k:
                theta = heap[0][0]
        for pl in lists:
            if not pl.exhausted() and pl.current_doc() <= pivot_doc:
                pl.advance_to(pivot_doc + 1)

    out = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
    all_lists = lists + (exclude_lists or [])
    metrics = {
        "decoded_blocks": sum(pl.decoded_blocks for pl in all_lists),
        "total_blocks": sum(len(pl.payloads) for pl in all_lists),
        "n_lists": len(lists),
    }
    return out, metrics
