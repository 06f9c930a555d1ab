"""LZ4 block-format compress/decompress.

Semantic parity with the reference's term-block suffix compression
(/root/reference/terms-enumerator/lz4_compression.ml:51-191 and
doc/lz4_compression.md): greedy match finder over a 4-byte rolling hash
table (last-offset wins, 64 KiB window), token byte with two 4-bit
nibbles (literal length / match length - 4, 15 = extended with 255-run
bytes), 2-byte little-endian match offsets, and a final literal-only
sequence of >= 5 bytes (standard LZ4 block end rule).

This codec compresses *term-dictionary suffix blocks* only (small, cold
metadata); postings hot paths use the numpy FOR/PFOR codecs. Pure
Python here is acceptable and keeps the implementation auditable
against the LZ4 block spec.
"""

from __future__ import annotations

MIN_MATCH = 4
LAST_LITERALS = 5
MF_LIMIT = 12  # matches may not start within the last 12 bytes
MAX_OFFSET = 0xFFFF


def _hash(word: int) -> int:
    return ((word * 2654435761) & 0xFFFFFFFF) >> 20


def compress(data: bytes) -> bytes:
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - MF_LIMIT

    def emit(literal_end: int, match_len: int, offset: int) -> None:
        nonlocal out
        lit_len = literal_end - anchor
        token_lit = 15 if lit_len >= 15 else lit_len
        token_match = 0
        if match_len:
            m = match_len - MIN_MATCH
            token_match = 15 if m >= 15 else m
        out.append((token_lit << 4) | token_match)
        if lit_len >= 15:
            rest = lit_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out += data[anchor:literal_end]
        if match_len:
            out += offset.to_bytes(2, "little")
            m = match_len - MIN_MATCH
            if m >= 15:
                rest = m - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    while i < limit:
        word = int.from_bytes(data[i : i + 4], "little")
        h = _hash(word)
        cand = table.get(h)
        table[h] = i
        if cand is None or i - cand > MAX_OFFSET or data[cand : cand + 4] != data[i : i + 4]:
            i += 1
            continue
        # extend match, but leave the final LAST_LITERALS bytes as literals
        match_end = i + 4
        cand_end = cand + 4
        hard_end = n - LAST_LITERALS
        while match_end < hard_end and data[match_end] == data[cand_end]:
            match_end += 1
            cand_end += 1
        emit(i, match_end - i, i - cand)
        anchor = match_end
        i = match_end
    # final literal-only sequence
    emit(n, 0, 0)
    return bytes(out)


def decompress(data: bytes, max_len: int | None = None) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        token = data[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        out += data[i : i + lit_len]
        i += lit_len
        # the last sequence has no match part: stop on end-of-input OR
        # on reaching the target length (the reference decompressor is
        # length-driven — lz4_compression.ml Make_reader.decompress
        # checks the buffer against uncompressed_length before reading
        # the offset, which is what lets it stop cleanly on golden
        # streams whose final literals land exactly on the target)
        if i >= n or (max_len is not None and len(out) >= max_len):
            break
        offset = int.from_bytes(data[i : i + 2], "little")
        i += 2
        match_len = (token & 0xF) + MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                b = data[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        for j in range(match_len):  # byte-wise: overlapping back-references are legal
            out.append(out[start + j])
        if max_len is not None and len(out) >= max_len:
            break
    return bytes(out)
