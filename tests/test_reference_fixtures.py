"""Parse the reference repo's golden BINARY fixtures to exactly the
records its own test suite asserts — the strongest available evidence
that this engine's understanding of real Lucene 8.x structures matches
the reference:

- data/segment.si      vs test-segment/test_segment_file_reader.ml:22-49
- data/field_infos.fnm vs test-segment/test_field_infos_reader.ml:27-117
- data/terms_meta.tmd  vs test-segment/test_meta_file_reader.ml:14-205
- data/fst-{1..5}.bytes + data/spellings.txt
                       vs test-fst/test_byte_array_fst_reader.ml:36-220

Expected literals are copied VERBATIM from the OCaml tests and decoded
with a tiny OCaml-string-literal decoder (\\DDD escapes are decimal).
No Spark involved: these are driver-side metadata reads, exactly how
Lucene uses them at segment open.
"""

import re
from pathlib import Path

import pytest

from ocaml_lucene_spark.interop import (
    FstReader,
    read_field_infos,
    read_segment_info,
    read_terms_meta,
)

DATA = Path("/root/reference/data")

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference fixtures not present"
)


def ocaml(s: str) -> bytes:
    """Decode an OCaml string literal body (copied verbatim) to bytes:
    \\DDD is a DECIMAL byte escape; \\b \\t \\n \\r \\\\ \\" as usual."""
    out = bytearray()
    i = 0
    esc = {"b": 8, "t": 9, "n": 10, "r": 13, "\\": 92, '"': 34}
    while i < len(s):
        c = s[i]
        if c == "\\":
            m = re.match(r"\\(\d{3})", s[i:])
            if m:
                out.append(int(m.group(1)))
                i += 4
                continue
            out.append(esc[s[i + 1]])
            i += 2
            continue
        out.append(ord(c))
        i += 1
    return bytes(out)


SEGMENT_ID = ocaml(r"=\020\221\026\2524\191\141\200\188<\\\151+29")


def test_segment_si_record():
    rec = read_segment_info((DATA / "segment.si").read_bytes())
    h = rec["index_header"]
    assert h["magic"] == 393008959
    assert h["name"] == "Lucene86SegmentInfo"
    assert h["version"] == 0
    assert h["object_id"] == SEGMENT_ID
    assert h["suffix_bytes"] == b""
    assert rec["version"] == (134217728, 150994944, 0)
    assert rec["min_version"] == (134217728, 150994944, 0)
    assert rec["doc_count"] == 65460
    assert rec["is_compound_file"] is False
    assert rec["diagnostic_map"] == [
        ("os", "Mac OS X"),
        ("java.vendor", "Oracle Corporation"),
        ("java.version", "16.0.2"),
        ("java.vm.version", "16.0.2+7-67"),
        ("lucene.version", "8.9.0"),
        ("os.arch", "x86_64"),
        ("java.runtime.version", "16.0.2+7-67"),
        ("source", "flush"),
        ("os.version", "10.15.7"),
        ("timestamp", "1632532656606"),
    ]
    assert rec["files"] == [
        "_m.fdm", "_m.si", "_m_Lucene84_0.tmd", "_m.tvm", "_m.fnm", "_m.nvm",
        "_m.tvd", "_m_Lucene84_0.tim", "_m_Lucene84_0.doc", "_m.nvd",
        "_m_Lucene84_0.tip", "_m.fdx", "_m.tvx", "_m.fdt",
    ]
    assert rec["attributes"] == [("Lucene87StoredFieldsFormat.mode", "BEST_SPEED")]
    assert rec["sort_fields"] == []


EXPECTED_FIELDS = [
    # (name, number, store_tv, omit_norms, index_options)
    ("id", 0, False, True, "DOCS"),
    ("type", 1, False, True, "DOCS"),
    ("issued_date", 2, False, True, "DOCS"),
    ("title", 3, True, False, "DOCS_AND_FREQS"),
    ("language", 4, False, True, "DOCS"),
    ("authors", 5, True, False, "DOCS_AND_FREQS"),
    ("subjects", 6, True, False, "DOCS_AND_FREQS"),
    ("bookshelves", 7, True, False, "DOCS_AND_FREQS"),
]


def _field_infos():
    return read_field_infos((DATA / "field_infos.fnm").read_bytes())


def test_field_infos_fnm_record():
    rec = _field_infos()
    assert len(rec["field_infos"]) == 8
    for f, (name, num, tv, omit, io) in zip(rec["field_infos"], EXPECTED_FIELDS):
        assert f["name"] == name
        assert f["field_number"] == num
        assert f["store_term_vector"] is tv
        assert f["omit_norms"] is omit
        assert f["store_payloads"] is False
        assert f["is_soft_deletes_field"] is False
        assert f["index_options"] == io
        assert f["doc_values_type"] == "NONE"
        assert f["doc_values_gen"] == -1
        assert f["attributes"] == [
            ("PerFieldPostingsFormat.format", "Lucene84"),
            ("PerFieldPostingsFormat.suffix", "0"),
        ]
        assert f["point_data_dimension_count"] == 0
        assert f["point_index_dimension_count"] == 0
        assert f["point_num_bytes"] == 0
    assert rec["has_prox"] is False
    assert rec["has_payloads"] is False
    assert rec["has_offsets"] is False


# (field_id, num_terms, root_code, sum_ttf, sum_df, doc_count,
#  index_start_fp, min_term, max_term, fst_empty_output, fst_start_node,
#  fst_num_bytes) — copied verbatim from test_meta_file_reader.ml
EXPECTED_METAS = [
    (5, 23065, r"\247\2132\0037\209\0039\223\bg\187\011", 420554, 405325,
     65293, 55, "1", r"\197\190ivojin",
     r"\011\187g\b\2239\003\2097\0032\213\247\r", 5542, 5543),
    (7, 480, r"\183\2193\005f\189\bh\193\015j\199\022o\253\028s\215!", 47242,
     46269, 17168, 5598, "1895", "zoology",
     r"!\215s\028\253o\022\199j\015\193h\b\189f\0053\219\183\019", 42, 43),
    (0, 65460, r"\158\150}", 65460, 65460, 65460, 5641, "1", "9999",
     r"}\150\158\003", 7823, 7824),
    (2, 6322, r"\162\181\132\001", 65460, 65460, 65460, 13465, "1971-12-01",
     "2021-06-06", r"\001\132\181\162\004", 1816, 1817),
    (4, 6322, r"\158\210\139\001", 65460, 65460, 65460, 15282, "1971-12-01",
     "2021-06-06", r"\001\139\210\158\004", 1894, 1895),
    (6, 15704, r"\147\227\176\001\0049\159\004i\203\007n\249\nw\203\015",
     535992, 423272, 65380, 17177, "1",
     r"\215\153\215\148\215\149\215\147\215\148",
     r"\015\203w\n\249n\007\203i\004\1599\004\001\176\227\147\017", 4054, 4055),
    (3, 43456, r"\211\189\146\002\0042\206\004r\215\006\206\141\n\224\139\016",
     382834, 372032, 65456, 21232, "0", r"\239\189\145",
     r"\016\139\224\n\141\206\006\215r\004\2062\004\002\146\189\211\017",
     11400, 11401),
    (1, 7, r"\246\236\146\002", 65460, 65460, 65460, 32633, "Collection",
     "Text", r"\002\146\236\246\004", 0, 1),
]


def test_terms_meta_tmd_record():
    rec = read_terms_meta(
        (DATA / "terms_meta.tmd").read_bytes(),
        segment_id=SEGMENT_ID,
        field_infos=_field_infos(),
        version=6,
        max_doc_count=70000,
    )
    assert len(rec["field_metas"]) == 8
    for got, exp in zip(rec["field_metas"], EXPECTED_METAS):
        (fid, n_terms, root, sttf, sdf, dc, fp, mn, mx, empty, start, nbytes) = exp
        assert got["field_id"] == fid
        assert got["num_terms"] == n_terms
        assert got["root_code"] == ocaml(root)
        assert got["sum_total_term_freq"] == sttf
        assert got["sum_doc_freq"] == sdf
        assert got["doc_count"] == dc
        assert got["index_start_fp"] == fp
        assert got["min_term"] == ocaml(mn)
        assert got["max_term"] == ocaml(mx)
        fm = got["fst_meta"]
        assert fm["empty_output"] == ocaml(empty)
        assert fm["input_type"] == "Byte1"
        assert fm["start_node"] == start
        assert fm["num_bytes"] == nbytes
    assert rec["index_length"] == 756323262421532672
    assert rec["terms_length"] == 661484886967713792


# -- reversed-bytes FST fixtures --------------------------------------
def _fst(name: str, start_node: int, empty, output_type="int") -> FstReader:
    return FstReader(
        (DATA / name).read_bytes(), start_node, empty, output_type=output_type
    )


def test_fst1_term_lookups():
    fst = _fst("fst-1.bytes", start_node=45, empty=0)
    expected = [
        ("ca", 5), ("car", 7), ("cat", 12), ("cataract", 3), ("cataracts", 13),
        ("co", 23), ("cot", 2), ("dog", 10), ("dogs", 10), ("dot", 10),
    ]
    for term, out in expected:
        assert fst.lookup(term.encode()) == out, term


def test_fst5_binary_search_lookups():
    fst = _fst("fst-5.bytes", start_node=54, empty=0)
    expected = [
        ("D", 5), ("DB", 7), ("K", 12), ("KB", 3), ("O", 13), ("OB", 23),
        ("S", 2), ("SB", 10), ("a", 10), ("ab", 10), ("m", 12), ("mb", 14),
        ("z", 16), ("zb", 16),
        # missing keys: the walk stops at the root with empty output
        ("x", 0), ("c", 0), ("0", 0), ("Z", 0),
    ]
    for term, out in expected:
        assert fst.lookup(term.encode()) == out, term


def test_fst2_spelling_corrections_string_outputs():
    pairs = [
        line.split(" ")
        for line in (DATA / "spellings.txt").read_text().splitlines()
        if line
    ]
    fst = _fst("fst-2.bytes", start_node=32136, empty=b"", output_type="bytes")
    for wrong, right in pairs:
        assert fst.lookup(wrong.encode()) == right.encode(), wrong


def _arc_tuples(arcs):
    return [(a.label, a.target, a.output, a.final_output) for a in arcs]


def test_fst4_linear_node_arcs():
    fst = _fst("fst-4.bytes", start_node=13, empty=0)
    assert _arc_tuples(fst.read_arcs_at_target(13)) == [
        (97, 3, 5, 0),
        (99, 5, 3, 9),
    ]


def test_fst3_direct_addressing_node_arcs():
    fst = _fst("fst-3.bytes", start_node=36, empty=0)
    assert _arc_tuples(fst.read_arcs_at_target(36)) == [
        (97, 3, 5, 0),
        (99, 5, 3, 9),
        (100, 8, 13, 0),
        (101, 11, 2, 0),
        (102, 5, 10, 0),
    ]


def test_fst5_binary_search_node_arcs():
    fst = _fst("fst-5.bytes", start_node=54, empty=0)
    assert _arc_tuples(fst.read_arcs_at_target(54)) == [
        (68, 3, 5, 0),
        (75, 5, 3, 9),
        (79, 8, 13, 0),
        (83, 11, 2, 0),
        (97, 13, 10, 0),
        (109, 16, 12, 0),
        (122, 13, 16, 0),
    ]


def test_data_input_bytes_primitives():
    """data/data-input.bytes vs test-data-input-2/test_data_input.ml:
    every primitive at its fixture offset, including the reference's
    wrap quirks (vint 0x80000000 -> -2147483648 via Int32; longs/vlongs
    through OCaml's 63-bit native int) and both list orderings (plain
    lists reverse read order, assoc lists preserve it)."""
    from ocaml_lucene_spark.interop import DataInput

    data = (DATA / "data-input.bytes").read_bytes()
    di = DataInput(data)
    assert [di.read_int() for _ in range(4)] == [
        24, 98237, 2147483647, -2147483648
    ]
    assert di.pos == 16
    assert [di.read_long() for _ in range(6)] == [
        24, 98237, 2147483647, -2147483648,
        4611686018427387903, -4611686018427387904,
    ]
    assert di.pos == 64
    assert [di.read_vint() for _ in range(4)] == [
        24, 98237, 2147483647, -2147483648
    ]
    assert di.pos == 78
    assert [di.read_vlong() for _ in range(4)] == [
        24, 98237, 2147483647, 4611686018427387903
    ]
    assert di.pos == 96
    assert di.read_string() == b"hello world" and di.pos == 108
    assert di.read_list_of_strings() == [b"hello", b"world"] and di.pos == 121
    assert di.read_assoc_list_of_strings() == [
        (b"world", b"mundo"), (b"hello", b"hola")
    ]


def test_reverse_data_input_wrap_parity():
    """ReverseDataInput applies the SAME Int32/63-bit wraps as the
    forward reader (the reference instantiates one Make-functor vint
    implementation over both byte sources): the 0x80000000 vint reads
    as -2147483648 and a 2^62 vlong wraps negative, byte-for-byte
    mirroring the forward fixture values."""
    from ocaml_lucene_spark.interop.data_input import DataInput, ReverseDataInput

    def enc(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    for raw, expect_vint in [(24, 24), (2147483647, 2147483647),
                             (0x80000000, -2147483648)]:
        fwd = DataInput(enc(raw))
        rev = ReverseDataInput(enc(raw)[::-1])
        assert fwd.read_vint() == rev.read_vint() == expect_vint, raw
    for raw, expect_vlong in [(98237, 98237),
                              (4611686018427387903, 4611686018427387903),
                              (1 << 62, -4611686018427387904)]:
        fwd = DataInput(enc(raw))
        rev = ReverseDataInput(enc(raw)[::-1])
        assert fwd.read_vlong() == rev.read_vlong() == expect_vlong, raw


def test_block_pointer_floor_blocks():
    """The reference's three golden floor-block pointer byte strings
    (test-terms-enumerator/test_block_pointer.ml:8-23) replay through
    our find_block to the exact expected file pointers, incl. the
    floor-entry walk past two follow-block labels and the has_terms
    miss ('p' in case 1 lands before the first floor label on a
    no-terms leading block)."""
    from ocaml_lucene_spark.interop import find_block

    def hx(s: str) -> bytes:
        return bytes(int(tok, 16) for tok in s.split())

    cases = [
        ("d3 bd 92 2 4 32 ce 4 72 d7 6 ce 8d a e0 8b 10",
         [("z", 1124998), ("p", None)]),
        ("db 82 b9 1 4 69 d1 4 6c 81 a 75 b1 d 7a 81 12",
         [("z", 760790)]),
        ("b3 f7 b5 1 2 6d 99 5 72 ef a",
         [("z", 746223)]),
    ]
    for data, expects in cases:
        for label, expected in expects:
            assert find_block(hx(data), label) == expected, (data, label)
    # non-floor pointers: vlong code with is_floor=0 — fp when
    # has_terms else None (the function's first branch)
    def enc_vlong(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    assert find_block(enc_vlong((12345 << 2) | 2), "a") == 12345
    assert find_block(enc_vlong(12345 << 2), "a") is None


def _synth_segments_bytes(
    version: int,
    seg_name: str,
    user: list[tuple[str, str]],
    seg_id: bytes | None = None,
) -> bytes:
    """Synthesize segments_N bytes per the grammar codec/segments.ml
    parses (no golden fixture exists in the reference's data/): header
    (BE magic, vint-length name, BE format version, 16-byte id, empty
    suffix), vint lucene version triple, vint created-major, BE long
    version, vlong name_counter, BE int seg_count, vint ms version
    triple, ONE segment entry, assoc user data, 16-byte footer."""

    def vint(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def s(x: str) -> bytes:
        return vint(len(x)) + x.encode()

    buf = bytearray()
    buf += (0x3FD76C17).to_bytes(4, "big")          # codec magic (BE read)
    buf += s("segments")
    buf += (9).to_bytes(4, "big")                   # format version
    buf += bytes(range(16))                         # object id
    buf += b"\x00"                                  # suffix length 0
    buf += vint(8) + vint(6) + vint(2)              # lucene 8.6.2
    buf += vint(8)                                  # created major
    buf += version.to_bytes(8, "big")               # commit version (BE long)
    buf += vint(5)                                  # name_counter
    buf += (2).to_bytes(4, "big")                   # seg_count = 2 (quirk: 1 read)
    buf += vint(8) + vint(6) + vint(2)              # ms lucene version
    # one segment entry
    buf += s(seg_name)
    buf += seg_id if seg_id is not None else bytes(reversed(range(16)))
    buf += s("Lucene87")
    buf += (2).to_bytes(8, "big")                   # del_gen
    buf += (3).to_bytes(4, "big")                   # del_count
    buf += (0xFFFFFFFFFFFFFFFF).to_bytes(8, "big")  # field_infos_gen = -1
    buf += (0xFFFFFFFFFFFFFFFF).to_bytes(8, "big")  # doc_values_gen = -1
    buf += (0).to_bytes(4, "big")                   # soft_del_count
    buf += b"\x00"                                  # no sci_id
    buf += vint(2) + s("_0.fnm") + s("_0_1.fnm")    # field_infos_files
    buf += (1).to_bytes(4, "big")                   # dv updates: 1 entry
    buf += (7).to_bytes(4, "big") + vint(2) + s("a.dvd") + s("b.dvd")
    buf += vint(len(user))
    for k, v in user:
        buf += s(k) + s(v)
    buf += (~0x3FD76C17 & 0xFFFFFFFF).to_bytes(4, "big") + bytes(12)  # footer
    return bytes(buf)


def test_segments_manifest_parse_and_latest():
    """Synthesized segments_N round-trips through the manifest reader
    with the reference's quirks intact (ONE segment entry read despite
    seg_count=2; string lists reversed from byte order; assoc lists in
    order), and Segments.latest picks the newest of two generations."""
    import os
    import tempfile

    from ocaml_lucene_spark.interop import read_latest, read_segments_file
    from ocaml_lucene_spark.interop.segments_manifest import latest_segments_file

    data = _synth_segments_bytes(41, "_0", [("commit", "first")])
    rec = read_segments_file(data)
    assert rec["index_header"]["magic"] == 0x3FD76C17
    assert rec["index_header"]["name"] == "segments"
    assert rec["lucene_version"] == (8, 6, 2)
    assert rec["index_created_major_version"] == 8
    assert rec["version"] == 41 and rec["name_counter"] == 5
    assert rec["seg_count"] == 2 and len(rec["segments"]) == 1  # quirk
    seg = rec["segments"][0]
    assert seg["seg_name"] == "_0" and seg["seg_codec"] == "Lucene87"
    assert seg["del_gen"] == 2 and seg["del_count"] == 3
    assert seg["field_infos_gen"] == -1 and seg["doc_values_gen"] == -1
    assert seg["sci_id"] is None
    # cons quirk: first-read string lands at the tail
    assert seg["field_infos_files"] == ["_0_1.fnm", "_0.fnm"]
    assert seg["doc_values_updates_files"] == [(7, ["b.dvd", "a.dvd"])]
    assert rec["user_data"] == [("commit", "first")]

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "segments_1"), "wb") as f:
            f.write(data)
        with open(os.path.join(d, "segments_a"), "wb") as f:  # gen 10 base36
            f.write(_synth_segments_bytes(99, "_7", [("commit", "second")]))
        assert latest_segments_file(d) == "segments_a"
        latest = read_latest(d)
        assert latest["version"] == 99
        assert latest["segments"][0]["seg_name"] == "_7"
        assert latest["user_data"] == [("commit", "second")]


def test_lz4_compressed_bytes_golden_stream():
    """data/lz4-compressed.bytes vs
    test-terms-enumerator/test_lz4_compression.ml:14-19: our LZ4 block
    decoder must decompress the reference's golden compressed stream to
    the exact 245-byte suffix-block payload its test asserts."""
    from ocaml_lucene_spark.codecs import lz4

    data = (DATA / "lz4-compressed.bytes").read_bytes()
    expected = (
        "1-04-011-05-011-08-011-10-011-12-012-02-012-03-012-04-012-06-01"
        "2-08-012-09-012-10-013-01-013-02-013-03-013-04-013-05-013-06-01"
        "3-07-013-08-013-09-013-10-013-11-013-12-014-01-014-02-014-03-01"
        "4-04-014-05-014-06-014-07-014-08-014-09-014-10-014-11-01"
    ).encode()
    assert len(expected) == 245
    assert lz4.decompress(data, 245) == expected


def test_latest_segments_file_ignores_non_commit_names():
    """Only 'segments' (gen 0) and 'segments_<base36>' are commit
    points: temp/backup files ('segments_2.tmp'), 'segments.gen', and
    int()-quirk names ('segments_+1', 'segments_1_0') must neither
    crash the scan nor outrank a real generation."""
    import os
    import tempfile

    import pytest as _pytest

    from ocaml_lucene_spark.interop.segments_manifest import latest_segments_file

    with tempfile.TemporaryDirectory() as d:
        for name in (
            "segments_1", "segments_2.tmp", "segments.gen",
            "segments_+1", "segments_1_0", "segmentsFoo", "segments_A",
        ):
            with open(os.path.join(d, name), "wb") as f:
                f.write(b"x")
        assert latest_segments_file(d) == "segments_1"
        os.remove(os.path.join(d, "segments_1"))
        with _pytest.raises(FileNotFoundError):
            latest_segments_file(d)
