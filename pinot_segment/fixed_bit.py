"""Fixed-bit-width forward index decoder (dictionary-encoded columns).

Behavioral spec: reference pinot-segment/src/forward_index/fixed_bit.rs
(itself modeled on Pinot's PinotDataBitSet.java). Layout inside columns.psf:
8-byte magic marker, then docId→dictId values packed at ``bits_per_value``
bits each in big-endian bit order; values may span byte boundaries
(fixed_bit.rs:34-42,53-103).

Two implementations:

- :func:`unpack_bits` — numpy-vectorized (np.unpackbits + weighted dot),
  the production path. The reference decodes per-value in Rust
  (fixed_bit.rs:106-112); a literal Python loop would be ~100x slower
  (SURVEY.md §4.2 "vectorized decode").
- :func:`unpack_bits_scalar` — direct transliteration of the bit arithmetic,
  kept as the executable spec for property tests.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pinot_segment.errors import InvalidFormatError

MAGIC_MARKER_SIZE = 8
_CHUNK_VALUES = 1 << 20  # bound temp memory: ~8MB per chunk at 8B/value


def unpack_bits_scalar(buffer: bytes, bits_per_value: int, num_values: int) -> list[int]:
    """Reference scalar implementation (spec for tests)."""
    out = []
    for doc_id in range(num_values):
        bit_offset = doc_id * bits_per_value
        byte_offset = bit_offset // 8
        bit_in_first = bit_offset % 8
        if byte_offset >= len(buffer):
            raise InvalidFormatError("buffer overflow")
        value = buffer[byte_offset] & (0xFF >> bit_in_first)
        bits_left = bits_per_value - (8 - bit_in_first)
        if bits_left <= 0:
            out.append(value >> (-bits_left))
            continue
        byte_offset += 1
        while bits_left > 8:
            value = (value << 8) | buffer[byte_offset]
            bits_left -= 8
            byte_offset += 1
        out.append((value << bits_left) | (buffer[byte_offset] >> (8 - bits_left)))
    return out


def unpack_bits(buffer: bytes | np.ndarray, bits_per_value: int, num_values: int) -> np.ndarray:
    """Vectorized big-endian bit unpack → uint32 array of dict ids."""
    if bits_per_value < 1 or bits_per_value > 32:
        raise InvalidFormatError(f"bits_per_value {bits_per_value} out of range")
    raw = np.frombuffer(buffer, dtype=np.uint8) if not isinstance(buffer, np.ndarray) else buffer
    total_bits = num_values * bits_per_value
    if raw.size * 8 < total_bits:
        raise InvalidFormatError(
            f"buffer of {raw.size} bytes too small for {num_values} x {bits_per_value}-bit values"
        )
    bits = np.unpackbits(raw, count=total_bits)  # big-endian bit order
    weights = (np.uint64(1) << np.arange(bits_per_value - 1, -1, -1, dtype=np.uint64))
    out = np.empty(num_values, dtype=np.uint32)
    # Chunked matmul keeps the (values x bits) temp bounded for huge segments.
    for lo in range(0, num_values, _CHUNK_VALUES):
        hi = min(lo + _CHUNK_VALUES, num_values)
        block = bits[lo * bits_per_value : hi * bits_per_value].reshape(hi - lo, bits_per_value)
        out[lo:hi] = block.astype(np.uint64) @ weights
    return out


class FixedBitWidthReader:
    """Reads a bit-packed forward-index byte range from columns.psf."""

    def __init__(self, buffer: bytes, bits_per_value: int, num_values: int) -> None:
        self.buffer = buffer
        self.bits_per_value = bits_per_value
        self.num_values = num_values

    @classmethod
    def read(
        cls,
        file_path: str | Path,
        offset: int,
        size: int,
        bits_per_value: int,
        num_values: int,
    ) -> "FixedBitWidthReader":
        if size < MAGIC_MARKER_SIZE:
            raise InvalidFormatError(
                "Forward index too small to contain magic marker"
            )
        with open(file_path, "rb") as f:
            f.seek(offset)
            blob = f.read(size)
        if len(blob) != size:
            raise InvalidFormatError("short read for forward index")
        # The 8-byte magic marker precedes the packed data (fixed_bit.rs:34-42).
        return cls(blob[MAGIC_MARKER_SIZE:], bits_per_value, num_values)

    def get_dict_id(self, doc_id: int) -> int:
        if doc_id >= self.num_values:
            raise InvalidFormatError(
                f"doc_id {doc_id} out of range (num_values={self.num_values})"
            )
        return unpack_bits_scalar(self.buffer, self.bits_per_value, doc_id + 1)[doc_id]

    def read_all(self) -> np.ndarray:
        return unpack_bits(self.buffer, self.bits_per_value, self.num_values)
