"""Per-column bloom filter index.

Pinot servers keep an optional bloom filter per (segment, column) to skip
segments during point lookups (Pinot docs: "bloom filter" index type; the
reference engine does not read them — README.md:311-315 lists index support
as out of scope — so this is a beyond-parity feature of this rebuild). Zone
maps only prune when values are clustered; for a high-cardinality column
written in arrival order (orderkey, user id, UUID) every segment spans the
full value range, and an equality probe otherwise decodes every segment.
The bloom filter answers "is value v definitely absent from this segment?"
from a few hundred KB without touching the forward index.

On-disk layout (defined by this rebuild, addressed by Pinot's real
``{column}.bloom_filter`` index_map naming convention):

    magic(8) | num_bits u32 BE | num_hashes u8 | bit array

Bit ``i`` lives in byte ``i // 8`` at big-endian position ``7 - i % 8`` —
the same bit order as every other 1-bit structure in the format
(fixed_bit.py). The hash family is double hashing over the two 64-bit
halves of MD5 (g_i = h1 + i*h2 mod m, Kirsch–Mitzenmacher), chosen because
it is exactly reproducible anywhere — write side, Spark executors, and any
future non-Python reader — with no library dependency.

Sizing: ~10 bits per distinct value and 7 hashes give ~1% false positives;
the filter is built over the *distinct* value set, so for dictionary
columns its cost is bounded by the dictionary, not the doc count.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Iterable

import numpy as np

from pinot_segment.errors import InvalidFormatError
from pinot_segment.metadata import DataType

_MAGIC = bytes.fromhex("deadbeefdeafbead")

BITS_PER_KEY = 10
NUM_HASHES = 7
# 1 MiB of bits — a segment whose distinct count would need more (>~800k
# distinct values) caps here and accepts a higher FPR instead of an
# unbounded blob.
MAX_BITS = 1 << 23

_INT_TYPES = (DataType.INT, DataType.LONG, DataType.TIMESTAMP)


def canonical_bytes(value, data_type: DataType) -> bytes:
    """Type-stable canonical encoding hashed on both the write and probe
    sides. Integers widen to 8-byte signed BE (an INT probe against a LONG
    column hashes identically); floats canonicalize through the f64 bit
    pattern; strings through UTF-8."""
    if data_type in _INT_TYPES:
        return int(value).to_bytes(8, "big", signed=True)
    if data_type in (DataType.FLOAT, DataType.DOUBLE):
        return struct.pack(">d", float(value))
    if data_type is DataType.BOOLEAN:
        return b"\x01" if value else b"\x00"
    if data_type is DataType.BYTES:
        return bytes(value)
    return str(value).encode("utf-8")


def _hash_pair(data: bytes) -> tuple[int, int]:
    d = hashlib.md5(data).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def build_bloom(
    distinct_values: Iterable[bytes],
    num_distinct: int,
    bits_per_key: int = BITS_PER_KEY,
    num_hashes: int = NUM_HASHES,
) -> bytes:
    """Serialize a bloom filter over canonical-encoded distinct values."""
    m = max(64, num_distinct * bits_per_key)
    m = min(m, MAX_BITS)
    m = ((m + 7) // 8) * 8  # whole bytes
    bits = np.zeros(m // 8, dtype=np.uint8)
    for data in distinct_values:
        h1, h2 = _hash_pair(data)
        for i in range(num_hashes):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 0x80 >> (pos & 7)
    return (
        _MAGIC
        + m.to_bytes(4, "big")
        + num_hashes.to_bytes(1, "big")
        + bits.tobytes()
    )


class BloomFilter:
    def __init__(self, num_bits: int, num_hashes: int, bits: np.ndarray) -> None:
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self._bits = bits

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        if blob[:8] != _MAGIC:
            raise InvalidFormatError("Bad bloom-filter magic")
        num_bits = int.from_bytes(blob[8:12], "big")
        num_hashes = blob[12]
        need = num_bits // 8
        bits = np.frombuffer(blob[13 : 13 + need], dtype=np.uint8)
        if len(bits) != need:
            raise InvalidFormatError(
                f"Bloom filter truncated: want {need} bytes, have {len(bits)}"
            )
        return cls(num_bits, num_hashes, bits)

    def might_contain_bytes(self, data: bytes) -> bool:
        h1, h2 = _hash_pair(data)
        m = self.num_bits
        for i in range(self.num_hashes):
            pos = (h1 + i * h2) % m
            if not self._bits[pos >> 3] & (0x80 >> (pos & 7)):
                return False
        return True

    def might_contain(self, value, data_type: DataType) -> bool:
        return self.might_contain_bytes(canonical_bytes(value, data_type))


def expected_fpr(num_distinct: int, num_bits: int, num_hashes: int) -> float:
    """Analytic false-positive rate, for tests and sizing sanity."""
    if num_bits == 0:
        return 1.0
    return (1.0 - math.exp(-num_hashes * num_distinct / num_bits)) ** num_hashes
