"""Deterministic synthetic webtext corpus + reference query set.

Input shape per BASELINE.json input_hint: (url string, warc_ts
timestamp, html binary, text string, lang string). Zipfian unigram
draws (exponent ~1.1) over a fixed vocabulary so hot terms genuinely
skew (exercises salting); log-normal doc lengths (mean ~200 tokens);
~2% planted exact duplicates and ~3% near-duplicates (exercise dedup
operators). text is extract_text(html) BY CONSTRUCTION, so the
per-url byte-identity invariant is checkable end to end.

Generation is seeded numpy — no wall clock, no external data — and
writes plain parquet via pyarrow (sharded for parallel Spark scans).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.analysis import py_extract_text

VOCAB_SIZE = 10_000
ZIPF_EXPONENT = 1.1
BASE_TS = np.datetime64("2024-01-01T00:00:00")

_CONSONANTS = list("bcdfghjklmnpqrstvwz")
_VOWELS = list("aeiou")


def make_vocab(size: int = VOCAB_SIZE, seed: int = 42) -> list[str]:
    """Deterministic pronounceable fake words, unique, 2-12 chars."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = []
    seen = set()
    while len(vocab) < size:
        n_syl = int(rng.integers(1, 5))
        w = "".join(
            rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(n_syl)
        )
        if rng.random() < 0.3:
            w += rng.choice(_CONSONANTS)
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def zipf_weights(n: int, exponent: float = ZIPF_EXPONENT) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** exponent
    return w / w.sum()


_LANG_EXTRA = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "that"],
    "de": ["der", "und", "die", "das", "nicht", "mit", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"],
}


def generate_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    mean_len: int = 200,
    dup_frac: float = 0.02,
    near_dup_frac: float = 0.03,
    shards: int = 8,
) -> str:
    """Write webtext parquet shards to out_dir/webtext; returns that path."""
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(seed=seed))
    weights = zipf_weights(vocab.size)

    langs = rng.choice(["en", "de", "fr"], size=n_docs, p=[0.9, 0.05, 0.05])
    lens = np.clip(rng.lognormal(np.log(mean_len), 0.6, n_docs), 8, 3000).astype(int)

    # token ids drawn in one flat vectorized pass
    offsets = np.concatenate([[0], np.cumsum(lens)])
    flat = rng.choice(vocab.size, size=int(offsets[-1]), p=weights)

    texts: list[str] = []
    for i in range(n_docs):
        toks = vocab[flat[offsets[i] : offsets[i + 1]]].tolist()
        # sprinkle language stopwords so lang-id has signal
        extra = _LANG_EXTRA[langs[i]]
        step = max(len(toks) // 10, 1)
        for j in range(0, len(toks), step):
            toks[j] = extra[(i + j) % len(extra)]
        texts.append(" ".join(toks))

    # planted exact + near duplicates (of earlier docs only)
    n_dup = int(n_docs * dup_frac)
    n_near = int(n_docs * near_dup_frac)
    if n_docs > 10 and n_dup:
        src = rng.choice(n_docs // 2, n_dup, replace=False)
        dst = n_docs // 2 + rng.choice(n_docs // 2, n_dup, replace=False)
        for s, d in zip(src, dst):
            texts[d] = texts[s]
    if n_docs > 10 and n_near:
        src = rng.choice(n_docs // 2, n_near, replace=False)
        dst = n_docs // 2 + rng.choice(n_docs // 2, n_near, replace=False)
        for s, d in zip(src, dst):
            toks = texts[s].split(" ")
            for k in rng.choice(len(toks), max(1, len(toks) // 50), replace=False):
                toks[k] = str(vocab[rng.integers(vocab.size)])
            texts[d] = " ".join(toks)

    titles = [" ".join(t.split(" ")[:4]) for t in texts]
    htmls = [
        f"<html><head><title>{ti}</title></head><body><p>{tx}</p></body></html>".encode()
        for ti, tx in zip(titles, texts)
    ]
    full_texts = [py_extract_text(h) for h in htmls]  # byte-identity by construction

    urls = [f"https://site{int(k)}.example/p/{i}" for i, k in
            enumerate(rng.integers(0, 1000, n_docs))]
    ts = BASE_TS + rng.integers(0, 365 * 24 * 3600, n_docs).astype("timedelta64[s]")

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(full_texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )
    path = os.path.join(out_dir, "webtext")
    os.makedirs(path, exist_ok=True)
    shard_size = (n_docs + shards - 1) // shards
    for s in range(shards):
        chunk = table.slice(s * shard_size, shard_size)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{s:05d}.parquet"))
    return path


def generate_query_set(seed: int = 42, n_queries: int = 40) -> list[dict]:
    """Reference query set: hot/mid/rare/absent term mixes, and/or, k."""
    rng = np.random.default_rng(seed + 1)
    vocab = make_vocab(seed=seed)
    pools = {
        "hot": vocab[:50],
        "mid": vocab[200:1000],
        "rare": vocab[5000:],
        "absent": [w + "xq" for w in vocab[:100]],
    }
    queries = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 6))
        terms = []
        for _ in range(n_terms):
            pool = pools[rng.choice(["hot", "mid", "mid", "rare", "absent"],
                                    p=[0.3, 0.25, 0.25, 0.15, 0.05])]
            terms.append(str(pool[rng.integers(len(pool))]))
        queries.append(
            {
                "query_id": qid,
                "terms": terms,
                "mode": str(rng.choice(["and", "or"])),
                "k": int(rng.choice([1, 10, 10, 100])),
            }
        )
    return queries
