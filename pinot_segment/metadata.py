"""Parser for a Pinot segment's ``metadata.properties`` file.

Behavioral spec: reference pinot-segment/src/metadata.rs:52-239.
Java-properties text; keys of interest:

- ``segment.name`` / ``segment.table.name`` / ``segment.total.docs``
  (metadata.rs:83-97) — all required.
- column list = union of ``columns`` (older format) and the v3 keys
  ``segment.dimension.column.names`` / ``segment.metric.column.names`` /
  ``segment.datetime.column.names`` (metadata.rs:106-119).
- per-column props ``column.{name}.{prop}`` (metadata.rs:144-172):
  dataType (required), cardinality, bitsPerElement, hasDictionary,
  isSorted, lengthOfEachEntry — all defaulted when absent.
- values carry Java escapes (``\\uXXXX`` ``\\t`` ``\\n`` ``\\r`` ``\\\\``),
  decoded per metadata.rs:186-239.

Deviation from the reference (deliberate, SURVEY.md §4.3): column order is
preserved as *declared* (Python dict insertion order), fixing the reference's
HashMap-iteration-order hazard so every segment of a table agrees on order.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from pathlib import Path

from pinot_segment.errors import ColumnNotFoundError, ParseError


class DataType(enum.Enum):
    """Pinot primitive column types (metadata.rs:7-15).

    TIMESTAMP is beyond the reference (README.md:314 lists it unsupported):
    Pinot's TIMESTAMP is epoch *milliseconds* stored as LONG, and that is
    the on-disk encoding here too (both dictionary and RAW numeric paths
    reuse the LONG machinery)."""

    INT = "INT"
    LONG = "LONG"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    STRING = "STRING"
    BYTES = "BYTES"
    BOOLEAN = "BOOLEAN"
    TIMESTAMP = "TIMESTAMP"
    # Beyond the reference (and like TIMESTAMP, piggybacking on existing
    # machinery): Pinot's exact-decimal type, stored as its BigDecimal
    # byte serialization ([int16 BE scale][two's-complement unscaled BE])
    # in BYTES columns; the column-level (precision, scale) ride along as
    # decimalPrecision/decimalScale properties so readers surface Arrow
    # decimal128 / Spark DecimalType losslessly.
    BIG_DECIMAL = "BIG_DECIMAL"

    @classmethod
    def from_string(cls, s: str) -> "DataType":
        try:
            return cls(s)
        except ValueError:
            raise ParseError(f"Unknown data type: {s}") from None


@dataclass(frozen=True)
class ColumnMetadata:
    """Per-column segment metadata (metadata.rs:32-42).

    ``is_single_value`` / ``total_number_of_entries`` / ``max_number_of_
    multi_values`` use Pinot's real property names (``isSingleValue``,
    ``totalNumberOfEntries``, ``maxNumberOfMultiValues``); the reference
    parser ignores them (multi-value is unsupported there,
    README.md:310-316) — this rebuild reads them for its MV columns."""

    name: str
    data_type: DataType
    cardinality: int
    total_docs: int
    bits_per_element: int
    has_dictionary: bool
    is_sorted: bool
    length_of_each_entry: int
    is_single_value: bool = True
    total_number_of_entries: int = 0
    max_number_of_multi_values: int = 0
    # Zone-map stats (Pinot's ``minValue``/``maxValue`` properties), kept as
    # raw strings; consumers convert by data_type. None when absent.
    min_value: str | None = None
    max_value: str | None = None
    # Nullable-column support (beyond the reference, whose schema mapping is
    # non-nullable-only, schema.rs:29-30): true when the segment carries a
    # null-vector index for this column (writer.py's ``hasNullValues``).
    has_null_values: bool = False
    # Inverted-index support (beyond the reference; Pinot's real property
    # name): true when the segment carries per-value doc bitmaps.
    has_inverted_index: bool = False
    # Bloom-filter support (beyond the reference; Pinot's bloom_filter
    # index type): true when the segment carries a distinct-value bloom
    # filter for point-lookup segment skipping (bloom.py).
    has_bloom_filter: bool = False
    # Range-index support (beyond the reference; Pinot's range_index
    # type): true when the segment carries equal-count value buckets with
    # doc bitmaps for the column (range_index.py).
    has_range_index: bool = False
    # JSON-index support (beyond the reference; Pinot's json_index type):
    # true when the segment carries flattened path=value -> doc-bitmap
    # postings for the column (json_index.py).
    has_json_index: bool = False
    # Text-index support (beyond the reference; Pinot's text_index type):
    # true when the segment carries token -> doc-bitmap postings for the
    # column (text_index.py).
    has_text_index: bool = False
    # Column partition map (beyond the reference; Pinot's
    # segmentPartitionConfig / per-segment partition metadata): the
    # partition function, modulus, and the partition ids actually present
    # in this segment — equality probes on the column prune segments at
    # PLANNING time by residue class.
    # BIG_DECIMAL columns: the fixed column-level (precision, scale) the
    # writer validated every value against (0 when not a decimal column).
    decimal_precision: int = 0
    decimal_scale: int = 0
    partition_function: str | None = None
    num_partitions: int = 0
    partition_values: tuple = ()


def decode_java_string(s: str) -> str:
    """Decode Java-properties escapes: \\uXXXX, \\t, \\n, \\r, \\\\.

    Mirrors metadata.rs:186-239, including the fallback of emitting the raw
    text when a \\u escape has bad hex digits.
    """
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch != "\\" or i + 1 >= n:
            out.append(ch)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt == "u":
            hexdigits = s[i + 2 : i + 6]
            try:
                out.append(chr(int(hexdigits, 16)))
            except ValueError:
                out.append("\\u" + hexdigits)
            i += 2 + len(hexdigits)
        elif nxt in ("t", "n", "r", "\\"):
            out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}[nxt])
            i += 2
        else:
            # Unknown escape: keep the backslash, reprocess the next char.
            out.append(ch)
            i += 1
    return "".join(out)


def _parse_properties(content: str) -> dict[str, str]:
    props: dict[str, str] = {}
    for raw in content.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        eq = line.find("=")
        if eq < 0:
            continue
        key = line[:eq].strip()
        props[key] = decode_java_string(line[eq + 1 :].strip())
    return props


class SegmentMetadata:
    """Parsed segment metadata: name, table, totalDocs, ordered columns."""

    def __init__(
        self,
        segment_name: str,
        table_name: str,
        total_docs: int,
        columns: dict[str, ColumnMetadata],
    ) -> None:
        self.segment_name = segment_name
        self.table_name = table_name
        self.total_docs = total_docs
        self.columns = columns  # insertion order == declared order

    @classmethod
    def from_file(cls, path: str | Path) -> "SegmentMetadata":
        return cls.parse(Path(path).read_text(encoding="utf-8"))

    @classmethod
    def parse(cls, content: str) -> "SegmentMetadata":
        props = _parse_properties(content)

        try:
            segment_name = props["segment.name"]
        except KeyError:
            raise ParseError("Missing segment.name") from None
        try:
            table_name = props["segment.table.name"]
        except KeyError:
            raise ParseError("Missing segment.table.name") from None
        try:
            total_docs = int(props["segment.total.docs"])
        except KeyError:
            raise ParseError("Missing segment.total.docs") from None
        except ValueError as e:
            raise ParseError(f"Invalid total.docs: {e}") from None

        # Declared column order: `columns` first, then dimension/metric/datetime
        # lists (metadata.rs:106-119); dedupe while preserving first occurrence.
        names: list[str] = []
        for key in (
            "columns",
            "segment.dimension.column.names",
            "segment.metric.column.names",
            "segment.datetime.column.names",
        ):
            if key in props:
                for part in props[key].split(","):
                    name = part.strip()
                    if name and name not in names:
                        names.append(name)

        columns: dict[str, ColumnMetadata] = {}
        for name in names:
            columns[name] = _parse_column(name, props, total_docs)

        return cls(segment_name, table_name, total_docs, columns)

    def get_column(self, name: str) -> ColumnMetadata:
        try:
            return self.columns[name]
        except KeyError:
            raise ColumnNotFoundError(name) from None

    def column_names(self) -> list[str]:
        return list(self.columns)


def _parse_column(
    name: str, props: dict[str, str], total_docs: int
) -> ColumnMetadata:
    def get(suffix: str) -> str | None:
        return props.get(f"column.{name}.{suffix}")

    dtype_str = get("dataType")
    if dtype_str is None:
        raise ParseError(f"Missing dataType for column {name}")

    def get_int(suffix: str) -> int:
        v = get(suffix)
        if v is None:
            return 0
        try:
            return int(v)
        except ValueError:
            return 0

    return ColumnMetadata(
        name=name,
        data_type=DataType.from_string(dtype_str),
        cardinality=get_int("cardinality"),
        total_docs=total_docs,
        bits_per_element=get_int("bitsPerElement"),
        has_dictionary=get("hasDictionary") == "true",
        is_sorted=get("isSorted") == "true",
        length_of_each_entry=get_int("lengthOfEachEntry"),
        is_single_value=get("isSingleValue") != "false",
        total_number_of_entries=get_int("totalNumberOfEntries"),
        max_number_of_multi_values=get_int("maxNumberOfMultiValues"),
        min_value=get("minValue"),
        max_value=get("maxValue"),
        has_null_values=get("hasNullValues") == "true",
        has_inverted_index=get("hasInvertedIndex") == "true",
        has_bloom_filter=get("hasBloomFilter") == "true",
        has_text_index=get("hasTextIndex") == "true",
        has_range_index=get("hasRangeIndex") == "true",
        has_json_index=get("hasJsonIndex") == "true",
        decimal_precision=get_int("decimalPrecision"),
        decimal_scale=get_int("decimalScale"),
        partition_function=get("partitionFunction"),
        num_partitions=get_int("numPartitions"),
        partition_values=tuple(
            int(p)
            for p in (get("partitionValues") or "").split(",")
            if p.strip().lstrip("-").isdigit()
        ),
    )
