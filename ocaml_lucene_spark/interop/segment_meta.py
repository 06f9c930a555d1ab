"""Readers for real Lucene 8.x segment metadata files (.si / .fnm /
.tmd), producing the same records the reference's golden-fixture tests
assert.

Semantics provenance:
- header / footer framing: /root/reference/segment/header.ml:58-110
  (read_header: LE magic, vint-length codec name, BE version, 16-byte
  object id, byte-length suffix; check_footer: exactly 16 trailing
  bytes opening with ~codec_magic)
- .si: /root/reference/segment/segment_file_reader.ml (versions as
  3x read_int, optional min_version, BE doc_count, diagnostics /
  files / attributes / sort_fields as vint-counted string lists)
- .fnm: /root/reference/segment/field_infos_reader.ml (per-field
  flag byte, index-options + doc-values codes, LE doc_values_gen
  long, point dims gated on format version)
- .tmd: /root/reference/segment/meta_file_reader.ml (two index
  headers, 128 block size, per-field stats with sum_doc_freq elided
  for DOCS-only fields, trailing FST metadata per field)

Fixture-expected records: test-segment/test_segment_file_reader.ml:22-49,
test_field_infos_reader.ml:27-117, test_meta_file_reader.ml:14-205.
"""

from __future__ import annotations

from .data_input import DataInput

CODEC_MAGIC = 0x3FD76C17
# what a real (big-endian-written) codec magic reads as through the
# reference's little-endian read_int quirk — the value index headers
# must carry on the wire (see check_index_header)
MAGIC_LE_READ = int.from_bytes(CODEC_MAGIC.to_bytes(4, "big"), "little")
FOOTER_MAGIC = ~CODEC_MAGIC & 0xFFFFFFFF
FOOTER_LENGTH = 16

INDEX_OPTIONS = [
    "NONE",
    "DOCS",
    "DOCS_AND_FREQS",
    "DOCS_AND_FREQS_AND_POSITIONS",
    "DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS",
]
DOC_VALUES_TYPES = ["NONE", "NUMERIC", "BINARY", "SORTED", "SORTED_NUMERIC", "SORTED_SET"]
INPUT_TYPES = ["Byte1", "Byte2", "Byte4"]

_MASK_STORE_TERM_VECTOR = 0x1
_MASK_OMIT_NORMS = 0x2
_MASK_STORE_PAYLOADS = 0x4
_MASK_SOFT_DELETES = 0x8
_FORMAT_SELECTIVE_INDEXING = 2


def read_header(di: DataInput) -> dict:
    magic = di.read_int()
    name = di.read_string().decode("ascii")
    version = di.read_uint()
    object_id = di.read_bytes(16)
    suffix = di.read_bytes(di.read_byte())
    return {
        "magic": magic,
        "name": name,
        "version": version,
        "object_id": object_id,
        "suffix_bytes": suffix,
    }


def check_footer(di: DataInput) -> None:
    if di.length() - di.pos != FOOTER_LENGTH:
        raise ValueError("Invalid footer length")
    if di.read_uint() & 0xFFFFFFFF != FOOTER_MAGIC:
        raise ValueError("Invalid footer magic")


def check_index_header(
    di: DataInput,
    codec_name: str,
    min_version: int,
    max_version: int,
    expected_id: bytes,
    segment_suffix: bytes,
) -> dict:
    h = read_header(di)
    # real Lucene's CodecUtil.checkIndexHeader validates the magic;
    # the reference's check_index_header forgets it (header.ml:90-103
    # — only its check_header_exn variant checks), leaving the first 4
    # bytes of every file unvalidated. Found by the bit-flip mutation
    # property (tests/test_postings_mutation.py). Real Lucene WRITES
    # the magic big-endian while read_header reads it with the
    # reference's little-endian read_int quirk, so a real file's magic
    # arrives byte-swapped — the golden .tmd fixture proves it
    # (0x176cd73f); that swapped value is the wire constant to check.
    if h["magic"] != MAGIC_LE_READ:
        raise ValueError(
            f"codec magic mismatch: got {h['magic']:#x}, want {MAGIC_LE_READ:#x}"
        )
    if h["name"] != codec_name:
        raise ValueError(f"codec name: expected {codec_name!r} got {h['name']!r}")
    if not (min_version <= h["version"] <= max_version):
        raise ValueError(f"unsupported version {h['version']}")
    if h["object_id"] != expected_id:
        raise ValueError("segment id mismatch")
    if h["suffix_bytes"] != segment_suffix:
        raise ValueError("segment suffix mismatch")
    return h


def _read_lucene_version(di: DataInput) -> tuple[int, int, int]:
    return (di.read_int(), di.read_int(), di.read_int())


def read_segment_info(data: bytes) -> dict:
    """Parse a .si file to the record test_segment_file_reader.ml
    asserts (incl. the LE-read version triple quirk)."""
    di = DataInput(data)
    header = read_header(di)
    version = _read_lucene_version(di)
    min_version = _read_lucene_version(di) if di.read_byte() == 1 else version
    doc_count = di.read_uint()
    is_compound = di.read_byte() == 1
    diagnostics = [
        (k.decode(), v.decode()) for k, v in di.read_assoc_list_of_strings()
    ]
    files = [f.decode() for f in di.read_list_of_strings()]
    attributes = [
        (k.decode(), v.decode()) for k, v in di.read_assoc_list_of_strings()
    ]
    sort_fields = [f.decode() for f in di.read_list_of_strings()]
    check_footer(di)
    return {
        "index_header": header,
        "version": version,
        "min_version": min_version,
        "doc_count": doc_count,
        "is_compound_file": is_compound,
        "diagnostic_map": diagnostics,
        "files": files,
        "attributes": attributes,
        "sort_fields": sort_fields,
    }


def read_field_infos(data: bytes) -> dict:
    """Parse a .fnm file to the record test_field_infos_reader.ml
    asserts (has_* aggregates use for_all, as the reference does)."""
    di = DataInput(data)
    header = read_header(di)
    version = header["version"]
    fields = []
    for _ in range(di.read_vint()):
        name = di.read_string().decode()
        number = di.read_vint()
        bits = di.read_byte()
        index_options = INDEX_OPTIONS[di.read_byte()]
        doc_values_type = DOC_VALUES_TYPES[di.read_byte()]
        doc_values_gen = di.read_long()
        attributes = [
            (k.decode(), v.decode()) for k, v in di.read_assoc_list_of_strings()
        ]
        pd_count = di.read_vint()
        if pd_count != 0:
            pi_count = di.read_vint() if version >= _FORMAT_SELECTIVE_INDEXING else pd_count
            p_bytes = di.read_vint()
        else:
            pi_count, p_bytes = pd_count, 0
        fields.append(
            {
                "name": name,
                "field_number": number,
                "store_term_vector": bool(bits & _MASK_STORE_TERM_VECTOR),
                "omit_norms": bool(bits & _MASK_OMIT_NORMS),
                "store_payloads": bool(bits & _MASK_STORE_PAYLOADS),
                "is_soft_deletes_field": bool(bits & _MASK_SOFT_DELETES),
                "index_options": index_options,
                "doc_values_type": doc_values_type,
                "doc_values_gen": doc_values_gen,
                "attributes": attributes,
                "point_data_dimension_count": pd_count,
                "point_index_dimension_count": pi_count,
                "point_num_bytes": p_bytes,
            }
        )
    check_footer(di)
    has = lambda pred: all(pred(f) for f in fields)  # noqa: E731
    return {
        "field_infos": fields,
        "has_prox": has(lambda f: "POSITIONS" in f["index_options"]),
        "has_payloads": has(lambda f: f["store_payloads"]),
        "has_offsets": has(lambda f: "OFFSETS" in f["index_options"]),
    }


def _read_fst_meta(di: DataInput) -> dict:
    magic = di.read_uint()
    name = di.read_string().decode()
    version = di.read_uint()
    if magic != CODEC_MAGIC:
        raise ValueError("FST codec magic mismatch")
    if name != "FST" or not (6 <= version <= 7):
        raise ValueError(f"unexpected FST header {name} v{version}")
    empty_output = None
    if di.read_byte() == 1:
        empty_output = di.read_bytes(di.read_vint())
    input_type = INPUT_TYPES[di.read_byte()]
    start_node = di.read_vlong()
    num_bytes = di.read_vlong()
    return {
        "empty_output": empty_output,
        "input_type": input_type,
        "start_node": start_node,
        "num_bytes": num_bytes,
    }


def read_terms_meta(
    data: bytes,
    segment_id: bytes,
    field_infos: dict,
    version: int,
    max_doc_count: int,
) -> dict:
    """Parse a BlockTree .tmd file to the record
    test_meta_file_reader.ml asserts, field by field."""
    di = DataInput(data)
    suffix = b"Lucene84_0"
    check_index_header(di, "BlockTreeTermsMeta", version, version, segment_id, suffix)
    check_index_header(di, "Lucene84PostingsWriterTerms", 0, 1, segment_id, suffix)
    if di.read_vint() != 128:
        raise ValueError("Unsupported block size")
    by_number = {f["field_number"]: f for f in field_infos["field_infos"]}
    field_metas = []
    for _ in range(di.read_vint()):
        field_id = di.read_vint()
        num_terms = di.read_vlong()
        root_code = di.read_string()
        info = by_number[field_id]
        sum_total_term_freq = di.read_vlong()
        sum_doc_freq = (
            sum_total_term_freq
            if info["index_options"] == "DOCS"
            else di.read_vlong()
        )
        doc_count = di.read_vint()
        if version < 4:
            raise ValueError("No support for older indexes")
        min_term = di.read_string()
        max_term = di.read_string()
        if not (0 <= doc_count <= max_doc_count):
            raise ValueError("doc count out of range")
        if sum_doc_freq < doc_count or sum_total_term_freq < sum_doc_freq:
            raise ValueError("inconsistent term stats")
        index_start_fp = di.read_vlong()
        fst_meta = _read_fst_meta(di)
        field_metas.append(
            {
                "field_id": field_id,
                "num_terms": num_terms,
                "root_code": root_code,
                "sum_total_term_freq": sum_total_term_freq,
                "sum_doc_freq": sum_doc_freq,
                "doc_count": doc_count,
                "index_start_fp": index_start_fp,
                "min_term": min_term,
                "max_term": max_term,
                "fst_meta": fst_meta,
            }
        )
    index_length = di.read_long()
    terms_length = di.read_long()
    return {
        "field_metas": field_metas,
        "index_length": index_length,
        "terms_length": terms_length,
    }
