"""Per-column range index: equal-count value buckets with doc bitmaps.

Pinot's ``range_index`` type accelerates range predicates on columns that
are neither sorted nor clustered — exactly where zone maps (whole-segment
min/max) stop helping because every segment spans the full value range.
The reference engine reads no indexes (README.md:311-315), so this is a
beyond-parity feature of this rebuild, completing its Pinot index family
(inverted, bloom, partition map, text, sorted ranges, zone maps).

Shape: docs are split into ``n_buckets`` equal-count groups by value
order; each bucket stores its ACTUAL value min/max plus a 1-bit doc
bitmap. A pushed range predicate then classifies each bucket as
*definite* (bucket range fully inside the predicate — every doc matches,
bitmap OR, no decode), *candidate* (overlapping — only those docs are
selection-decoded and verified), or *disjoint* (skipped). For a selective
range on an unclustered column the decode shrinks from the whole segment
to ~1-2 boundary buckets.

On-disk layout (addressed by Pinot's real ``{column}.range_index``
index_map naming convention):

    magic(8) | n_buckets u32 BE | bitmap_bytes u32 BE | dtype u8
    | bucket mins (n_buckets x 8 bytes BE) | bucket maxs (same)
    | per-bucket 1-bit big-endian doc bitmaps, concatenated

dtype 0 = signed int64 (INT/LONG/TIMESTAMP — exact, no f64 2^53 loss),
dtype 1 = float64 (FLOAT/DOUBLE). Bit order matches every other 1-bit
structure in the format (fixed_bit.py). Null docs carry their fill value
in some bucket; readers AND the null-vector out afterwards, same as every
other mask path.
"""

from __future__ import annotations

import numpy as np

from pinot_segment.errors import InvalidFormatError

_MAGIC = bytes.fromhex("deadbeefdeafbead")

DEFAULT_BUCKETS = 64


def build_range_index(values, is_float: bool, n_buckets: int = DEFAULT_BUCKETS) -> bytes:
    """Build the blob over the per-doc numeric values."""
    arr = np.asarray(values, dtype=np.float64 if is_float else np.int64)
    n = len(arr)
    n_buckets = max(1, min(n_buckets, n)) if n else 1
    order = np.argsort(arr, kind="stable")
    # equal-count split of the value-ordered docs
    edges = np.linspace(0, n, n_buckets + 1).astype(np.int64)
    bitmap_bytes = (n + 7) // 8
    out = bytearray(_MAGIC)
    out += int(n_buckets).to_bytes(4, "big")
    out += int(bitmap_bytes).to_bytes(4, "big")
    out += (b"\x01" if is_float else b"\x00")
    mins = np.empty(n_buckets, dtype=arr.dtype)
    maxs = np.empty(n_buckets, dtype=arr.dtype)
    bitmaps = bytearray()
    for b in range(n_buckets):
        sel = order[edges[b] : edges[b + 1]]
        if len(sel):
            vals = arr[sel]
            mins[b], maxs[b] = vals.min(), vals.max()
        else:
            # empty bucket (more buckets than docs): impossible range
            mins[b], maxs[b] = (np.inf, -np.inf) if is_float else (
                np.iinfo(np.int64).max,
                np.iinfo(np.int64).min,
            )
        bits = np.zeros(n, dtype=np.uint8)
        bits[sel] = 1
        bitmaps += np.packbits(bits).tobytes()
    be = ">f8" if is_float else ">i8"
    out += mins.astype(be).tobytes() + maxs.astype(be).tobytes()
    out += bitmaps
    return bytes(out)


class RangeIndex:
    """Parsed range index for one column of one segment."""

    def __init__(self, blob: bytes, total_docs: int) -> None:
        if blob[:8] != _MAGIC:
            raise InvalidFormatError("Bad range-index magic")
        self.total_docs = total_docs
        self.n_buckets = int.from_bytes(blob[8:12], "big")
        self.bitmap_bytes = int.from_bytes(blob[12:16], "big")
        self.is_float = blob[16] == 1
        be = ">f8" if self.is_float else ">i8"
        o = 17
        self.mins = np.frombuffer(blob[o : o + 8 * self.n_buckets], be)
        o += 8 * self.n_buckets
        self.maxs = np.frombuffer(blob[o : o + 8 * self.n_buckets], be)
        o += 8 * self.n_buckets
        self._bitmaps = blob[o:]
        if len(self._bitmaps) != self.n_buckets * self.bitmap_bytes:
            raise InvalidFormatError("range-index postings size mismatch")

    def _bucket_mask(self, buckets) -> np.ndarray:
        # OR in packed byte space, unpack once — for wide ranges (many
        # definite buckets) this is 8x less work than per-bucket unpacks
        packed = np.zeros(self.bitmap_bytes, dtype=np.uint8)
        for b in buckets:
            start = b * self.bitmap_bytes
            packed |= np.frombuffer(
                self._bitmaps[start : start + self.bitmap_bytes], np.uint8
            )
        return np.unpackbits(packed)[: self.total_docs].astype(bool)

    def classify(self, lo, lo_inc: bool, hi, hi_inc: bool):
        """(definite_mask, candidate_mask) for the interval: *definite*
        buckets lie fully inside it, *candidate* buckets overlap it. A
        None bound is unbounded on that side."""
        mins, maxs = self.mins, self.maxs
        ok_lo_all = (
            np.ones(self.n_buckets, dtype=bool)
            if lo is None
            else (mins >= lo if lo_inc else mins > lo)
        )
        ok_hi_all = (
            np.ones(self.n_buckets, dtype=bool)
            if hi is None
            else (maxs <= hi if hi_inc else maxs < hi)
        )
        overlap_lo = (
            np.ones(self.n_buckets, dtype=bool)
            if lo is None
            else (maxs >= lo if lo_inc else maxs > lo)
        )
        overlap_hi = (
            np.ones(self.n_buckets, dtype=bool)
            if hi is None
            else (mins <= hi if hi_inc else mins < hi)
        )
        nonempty = mins <= maxs
        definite = ok_lo_all & ok_hi_all & nonempty
        candidate = overlap_lo & overlap_hi & nonempty & ~definite
        return (
            self._bucket_mask(np.flatnonzero(definite)),
            self._bucket_mask(np.flatnonzero(candidate)),
        )
