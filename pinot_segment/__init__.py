"""pinot_segment — pure-Python reader for Apache Pinot v3 segment files.

Spark-independent storage layer, mirroring the reference's ``pinot-segment``
crate split (reference: /root/reference/pinot-segment/src/lib.rs). A segment is
a directory holding ``metadata.properties``, ``index_map`` and a single data
blob ``columns.psf`` (segment_reader.rs:16-32). Supported encodings:

- dictionary encoding for INT/LONG/FLOAT/DOUBLE/STRING (dictionary.rs)
- fixed-bit big-endian packed forward index for dict columns (fixed_bit.rs)
- RAW V4 var-byte chunk forward index for STRING, PASS_THROUGH / LZ4 /
  LZ4_LENGTH_PREFIXED compression (var_byte.rs)

All decoders are numpy-vectorized (the reference uses per-value Rust loops,
fast enough natively; a literal Python port would be ~100x too slow —
SURVEY.md §4.2).
"""

from pinot_segment.errors import (
    ColumnNotFoundError,
    InvalidFormatError,
    ParseError,
    PinotSegmentError,
    UnsupportedFeatureError,
)
from pinot_segment.metadata import ColumnMetadata, DataType, SegmentMetadata
from pinot_segment.index_map import IndexLocation, IndexMap
from pinot_segment.segment_reader import SegmentReader

__all__ = [
    "ColumnMetadata",
    "ColumnNotFoundError",
    "DataType",
    "IndexLocation",
    "IndexMap",
    "InvalidFormatError",
    "ParseError",
    "PinotSegmentError",
    "SegmentMetadata",
    "SegmentReader",
    "UnsupportedFeatureError",
]
