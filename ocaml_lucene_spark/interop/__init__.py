"""Real-Lucene 8.x binary interop: readers for the metadata files and
the reversed-bytes FST layout that the reference engine consumes.

The engine's own segment format is parquet-native (docs/SEGMENT_FORMAT.md)
— SURVEY scopes byte-compatibility out ("rank fidelity, not byte
fidelity"). This package exists as *parity evidence*: it parses the
reference repo's golden fixtures (`data/segment.si`,
`data/field_infos.fnm`, `data/terms_meta.tmd`, `data/fst-{1..5}.bytes`)
to exactly the records the reference's own test suite asserts
(test-segment/test_segment_file_reader.ml:22-49,
test_field_infos_reader.ml, test_meta_file_reader.ml:14-205,
test-fst/test_byte_array_fst_reader.ml:36-220), demonstrating that the
Spark engine's understanding of Lucene's on-disk structures matches the
reference byte for byte where it matters.

These are driver-side, metadata-sized reads (a .si/.fnm/.tmd file is
hundreds of bytes; an FST walk touches O(term length) nodes) — exactly
how Lucene itself uses them at segment open; nothing here sits on a
per-row path.
"""

from .block_pointer import find_block  # noqa: F401
from .data_input import DataInput, ReverseDataInput  # noqa: F401
from .export_index import (  # noqa: F401
    ShardedIndex,
    export_lucene_index,
    export_lucene_partitions,
    open_exported_shards,
    write_lucene_directory,
)
from .fst_reader import FstReader  # noqa: F401
from .import_index import import_lucene_index  # noqa: F401
from .norms import NormsReader, byte4_to_int, int_to_byte4  # noqa: F401
from .open_index import LuceneIndex, open_index  # noqa: F401
from .segment_meta import (  # noqa: F401
    read_field_infos,
    read_segment_info,
    read_terms_meta,
)
from .segments_manifest import (  # noqa: F401
    read_latest,
    read_segments_file,
)
from .wand_search import bm25_topk  # noqa: F401
