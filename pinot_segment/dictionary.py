"""Dictionary decoder for dictionary-encoded columns.

Behavioral spec: reference pinot-segment/src/forward_index/dictionary.rs.
Layout at the index_map's ``dictionary`` offset inside columns.psf:

- 8-byte big-endian magic ``0xDEADBEEFDEAFBEAD`` (dictionary.rs:7,37-47)
- ``cardinality`` values, big-endian fixed width:
  INT i32 / LONG i64 / FLOAT f32 / DOUBLE f64 (dictionary.rs:50-86)
- STRING: either fixed-length entries null-padded to ``lengthOfEachEntry``
  (truncated at the first NUL, dictionary.rs:90-104) or, when
  ``lengthOfEachEntry == 0``, 4-byte-BE-length-prefixed entries
  (dictionary.rs:106-121).
- BOOLEAN: BE int32 0/1 entries (beyond the reference — dictionary.rs:125-134
  rejects BOOLEAN/BYTES).
- BYTES: 4-byte-BE-length-prefixed entries (var-length layout only — beyond
  the reference; the fixed NUL-padded layout is refused as ambiguous for
  binary values).

Numeric decode is numpy ``frombuffer`` with big-endian dtypes (vectorized);
Pinot dictionaries are value-sorted, which the reader exploits for min/max
zone-map pruning (a rebuild improvement, SURVEY.md §4.1).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pinot_segment.errors import InvalidFormatError, ParseError, UnsupportedFeatureError
from pinot_segment.metadata import DataType

MAGIC_MARKER = 0xDEADBEEFDEAFBEAD

_NUMERIC_DTYPES = {
    DataType.INT: np.dtype(">i4"),
    DataType.LONG: np.dtype(">i8"),
    DataType.FLOAT: np.dtype(">f4"),
    DataType.DOUBLE: np.dtype(">f8"),
    # TIMESTAMP dictionaries hold epoch-millis LONGs (beyond the reference)
    DataType.TIMESTAMP: np.dtype(">i8"),
}


class DictionaryReader:
    """Decoded dictionary: numpy array (numeric) or list[str] (STRING)."""

    def __init__(self, data_type: DataType, values) -> None:
        self.data_type = data_type
        self.values = values

    @classmethod
    def read(
        cls,
        file_path: str | Path,
        offset: int,
        size: int,
        data_type: DataType,
        cardinality: int,
        length_of_each_entry: int = 0,
    ) -> "DictionaryReader":
        with open(file_path, "rb") as f:
            f.seek(offset)
            blob = f.read(size)
        return cls.from_bytes(blob, data_type, cardinality, length_of_each_entry)

    @classmethod
    def from_bytes(
        cls,
        blob: bytes,
        data_type: DataType,
        cardinality: int,
        length_of_each_entry: int = 0,
    ) -> "DictionaryReader":
        if len(blob) < 8:
            raise InvalidFormatError("dictionary blob too small for magic marker")
        magic = int.from_bytes(blob[:8], "big")
        if magic != MAGIC_MARKER:
            raise InvalidFormatError(
                f"Invalid magic marker: expected 0x{MAGIC_MARKER:X}, got 0x{magic:X}"
            )
        body = blob[8:]

        if data_type in _NUMERIC_DTYPES:
            dt = _NUMERIC_DTYPES[data_type]
            need = cardinality * dt.itemsize
            if len(body) < need:
                raise InvalidFormatError("dictionary blob truncated")
            # Native-endian copy so downstream fancy-indexing is cheap.
            values = (
                np.frombuffer(body, dtype=dt, count=cardinality)
                .astype(dt.newbyteorder("="), copy=True)
            )
            return cls(data_type, values)

        if data_type is DataType.STRING:
            values: list[str] = []
            if length_of_each_entry > 0:
                need = cardinality * length_of_each_entry
                if len(body) < need:
                    raise InvalidFormatError("dictionary blob truncated")
                for i in range(cardinality):
                    raw = body[i * length_of_each_entry : (i + 1) * length_of_each_entry]
                    raw = raw.split(b"\x00", 1)[0]  # trim at first NUL pad
                    try:
                        values.append(raw.decode("utf-8"))
                    except UnicodeDecodeError as e:
                        raise ParseError(f"Invalid UTF-8 in dictionary: {e}") from None
            else:
                pos = 0
                for _ in range(cardinality):
                    if pos + 4 > len(body):
                        raise InvalidFormatError("dictionary blob truncated")
                    n = int.from_bytes(body[pos : pos + 4], "big")
                    pos += 4
                    if pos + n > len(body):
                        raise InvalidFormatError("dictionary blob truncated")
                    try:
                        values.append(body[pos : pos + n].decode("utf-8"))
                    except UnicodeDecodeError as e:
                        raise ParseError(f"Invalid UTF-8 in dictionary: {e}") from None
                    pos += n
            return cls(data_type, values)

        if data_type is DataType.BOOLEAN:
            # Beyond the reference (dictionary.rs:125-134 rejects BOOLEAN):
            # stored as BE int32 0/1 entries, Pinot's internal INT encoding
            # for booleans; decoded to a numpy bool array.
            need = cardinality * 4
            if len(body) < need:
                raise InvalidFormatError("dictionary blob truncated")
            ints = np.frombuffer(body, dtype=">i4", count=cardinality)
            if not np.isin(ints, (0, 1)).all():
                raise InvalidFormatError("BOOLEAN dictionary entries must be 0/1")
            return cls(data_type, ints.astype(bool))

        if data_type is DataType.BYTES:
            # Beyond the reference (dictionary.rs:125-134 rejects BYTES):
            # 4-byte-BE-length-prefixed entries, the same var-length layout
            # as STRING with lengthOfEachEntry == 0. The fixed-length padded
            # layout is NOT supported for BYTES — NUL padding is ambiguous
            # for binary payloads (any trim rule corrupts values that end in
            # NUL), so the writer never emits it.
            if length_of_each_entry > 0:
                raise UnsupportedFeatureError(
                    "fixed-length BYTES dictionaries are unsupported (NUL "
                    "padding is ambiguous for binary values)"
                )
            values: list[bytes] = []
            pos = 0
            for _ in range(cardinality):
                if pos + 4 > len(body):
                    raise InvalidFormatError("dictionary blob truncated")
                n = int.from_bytes(body[pos : pos + 4], "big")
                pos += 4
                if pos + n > len(body):
                    raise InvalidFormatError("dictionary blob truncated")
                values.append(body[pos : pos + n])
                pos += n
            return cls(data_type, values)
        raise UnsupportedFeatureError(f"{data_type.value} dictionary not expected")

    def __len__(self) -> int:
        return len(self.values)

    def get(self, dict_id: int):
        return self.values[dict_id]

    def take(self, dict_ids: np.ndarray):
        """Vectorized dictId→value lookup (fancy indexing / list map)."""
        if isinstance(self.values, np.ndarray):
            return self.values[dict_ids]
        vals = self.values
        return [vals[i] for i in dict_ids]

    def min_max(self):
        """(min, max) of the dictionary — valid because Pinot dictionaries are
        sorted; used for segment zone-map pruning."""
        if len(self.values) == 0:
            return None
        return self.values[0], self.values[len(self.values) - 1]
