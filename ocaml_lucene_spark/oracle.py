"""Slow, obviously-correct pure-Python oracle: inverted index + BM25.

The executable spec every engine path is tested against (the same role
the in-memory monadic FST plays for the reference's byte-array FST,
/root/reference/fst/fst.ml:54-349). Canonical BM25 (SURVEY.md §7
"hard parts"):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))        # Lucene's
    tfn(t,d) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score    = sum_t idf(t) * tfn(t,d)     k1=1.2  b=0.75

float64 throughout; scores computed from integer (tf, df, dl) inputs —
never partial float sums across partitions — so engine and oracle are
bit-comparable. Tie-break: (score desc, doc_id asc).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .functions.analysis import py_tokenize

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self):
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> doc -> tf
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_lens: dict[int, int] = {}

    @classmethod
    def from_texts(cls, texts: dict[int, str]) -> "OracleIndex":
        idx = cls()
        for doc_id, text in texts.items():
            toks = py_tokenize(text)
            idx.doc_lens[doc_id] = len(toks)
            for pos, t in enumerate(toks):
                idx.postings[t][doc_id] = idx.postings[t].get(doc_id, 0) + 1
                idx.positions[t].setdefault(doc_id, []).append(pos)
        return idx

    @property
    def n_docs(self) -> int:
        return len(self.doc_lens)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_lens.values()) / max(self.n_docs, 1)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, term: str, doc_id: int) -> float:
        tf = self.postings.get(term, {}).get(doc_id, 0)
        if tf == 0:
            return 0.0
        dl = self.doc_lens[doc_id]
        tfn = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
        return self.idf(term) * tfn

    def query(self, terms: list[str], mode: str = "or", k: int = 10):
        """Top-k [(doc_id, score)] — rank-identity contract surface."""
        terms = list(dict.fromkeys(terms))  # dedupe, keep order
        present = [t for t in terms if t in self.postings]
        if mode == "and":
            if len(present) != len(terms) or not terms:
                return []
            docs = set(self.postings[present[0]])
            for t in present[1:]:
                docs &= set(self.postings[t])
        else:
            docs = set()
            for t in present:
                docs |= set(self.postings[t])
        scored = [(d, sum(self.score(t, d) for t in present)) for d in docs]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def phrase_count(self, first: str, second: str) -> dict[int, int]:
        """docs where `first second` occur adjacent; -> count per doc."""
        out: dict[int, int] = {}
        for doc_id, pos1 in self.positions.get(first, {}).items():
            pos2 = self.positions.get(second, {}).get(doc_id)
            if not pos2:
                continue
            s2 = set(pos2)
            n = sum(1 for p in pos1 if p + 1 in s2)
            if n:
                out[doc_id] = n
        return out

    def term_stats(self) -> dict[str, tuple[int, int]]:
        """term -> (df, ttf) — the per-field stats of field_reader.ml:3-16."""
        return {
            t: (len(docs), sum(docs.values())) for t, docs in self.postings.items()
        }
