"""RAW (no-dictionary) V4 var-byte chunk forward-index reader for STRING/BYTES.

Behavioral spec: reference pinot-segment/src/forward_index/var_byte.rs.

Layout of the forward-index byte range inside columns.psf:

- optional 4-byte magic ``0xDEADBEEF`` + 4 more marker bytes (var_byte.rs:45-55)
- 16-byte big-endian header: version (must be 4) | targetDecompressedChunkSize
  | compressionType | chunksStartOffset (var_byte.rs:57-73)
- chunk-metadata array of 8-byte little-endian entries
  ``(docId | hugeFlag<<31, chunkOffset)`` — ``metadata_size =
  chunksStartOffset - 16`` (var_byte.rs:76-79); entries are docId-sorted and
  binary-searched for point reads (var_byte.rs:95-123)
- chunk data; per-entry ``chunkOffset`` is relative to the chunks region; the
  next entry's offset bounds the chunk, with sentinel ``0xFFFFFFFF`` (or no
  next entry) meaning "runs to the end of the region" (var_byte.rs:144-166)

Decompressed regular chunk layout: numDocs (LE u32), numDocs LE u32
value-start offsets, then value bytes; the last value ends at the chunk end
(var_byte.rs:187-252). A metadata entry with the high docId bit set marks a
"huge value" chunk whose entire decompressed payload is one value
(var_byte.rs:141,183-185).

Compression codes (var_byte.rs:8-13): PASS_THROUGH=0 SNAPPY=1 ZSTANDARD=2
LZ4=3 LZ4_LENGTH_PREFIXED=4; SNAPPY/ZSTANDARD unsupported, matching the
reference. LZ4_LENGTH_PREFIXED chunks carry a 4-byte LE decompressed-size
prefix (var_byte.rs:273-285).

Unlike the reference (which re-opens and seeks the file per chunk), the whole
forward-index range is read once — segments are bounded (<1GB assumption,
reference README.md:318-321) and one sequential read beats many seeks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pinot_segment import lz4_block
from pinot_segment.errors import InvalidFormatError, UnsupportedFeatureError

METADATA_ENTRY_SIZE = 8

PASS_THROUGH = 0
SNAPPY = 1
ZSTANDARD = 2
LZ4 = 3
LZ4_LENGTH_PREFIXED = 4

_SENTINEL = 0xFFFFFFFF
_HUGE_FLAG = 0x80000000


class VarByteChunkReader:
    def __init__(self, blob: bytes, total_docs: int) -> None:
        """``blob`` is the full forward-index byte range."""
        self.total_docs = total_docs

        pos = 0
        if blob[:4] == b"\xde\xad\xbe\xef":
            pos = 8  # skip full 8-byte magic marker
        header = blob[pos : pos + 16]
        if len(header) < 16:
            raise InvalidFormatError("var-byte header truncated")
        version = int.from_bytes(header[0:4], "big", signed=True)
        self.target_decompressed_chunk_size = int.from_bytes(header[4:8], "big", signed=True)
        self.compression_type = int.from_bytes(header[8:12], "big", signed=True)
        chunks_start_offset = int.from_bytes(header[12:16], "big", signed=True)
        if version != 4:
            raise UnsupportedFeatureError(f"Expected V4 format, got version {version}")

        meta_lo = pos + 16
        metadata_size = chunks_start_offset - 16
        meta_hi = meta_lo + metadata_size
        raw_meta = np.frombuffer(blob[meta_lo:meta_hi], dtype="<u4").reshape(-1, 2)
        self.entry_doc_ids = (raw_meta[:, 0] & 0x7FFFFFFF).astype(np.int64)
        self.entry_huge = (raw_meta[:, 0] & _HUGE_FLAG) != 0
        self.entry_chunk_offsets = raw_meta[:, 1].astype(np.int64)
        self.chunks = blob[pos + chunks_start_offset :]

    @classmethod
    def read(
        cls, file_path: str | Path, offset: int, size: int, total_docs: int
    ) -> "VarByteChunkReader":
        with open(file_path, "rb") as f:
            f.seek(offset)
            blob = f.read(size)
        if len(blob) != size:
            raise InvalidFormatError("short read for var-byte forward index")
        return cls(blob, total_docs)

    # -- chunk access -------------------------------------------------------

    def num_chunks(self) -> int:
        return len(self.entry_doc_ids)

    def _chunk_bounds(self, idx: int) -> tuple[int, int]:
        lo = int(self.entry_chunk_offsets[idx])
        if idx + 1 < len(self.entry_chunk_offsets):
            nxt = int(self.entry_chunk_offsets[idx + 1])
            hi = len(self.chunks) if nxt == _SENTINEL else nxt
        else:
            hi = len(self.chunks)
        return lo, hi

    def _decompress(self, data: bytes) -> bytes:
        ct = self.compression_type
        if ct == PASS_THROUGH:
            return data
        if ct == LZ4_LENGTH_PREFIXED:
            if len(data) < 4:
                raise InvalidFormatError(
                    "LZ4_LENGTH_PREFIXED data too short for length prefix"
                )
            size = int.from_bytes(data[:4], "little")
            return lz4_block.decompress(data[4:], size)
        if ct == LZ4:
            # Expected size is the configured target; the last chunk may be
            # smaller, so decode without enforcing the hint.
            return lz4_block.decompress(data, None)
        if ct == SNAPPY:
            return _snappy_decompress(data)
        if ct == ZSTANDARD:
            return _zstd_decompress(data)
        raise UnsupportedFeatureError(f"Unknown compression type: {ct}")

    def _decompressed_chunk(self, idx: int) -> bytes:
        lo, hi = self._chunk_bounds(idx)
        return self._decompress(self.chunks[lo:hi])

    # -- point reads (binary search, var_byte.rs:95-123) --------------------

    def _find_chunk(self, doc_id: int) -> int:
        idx = int(np.searchsorted(self.entry_doc_ids, doc_id, side="right")) - 1
        return max(idx, 0)

    def get_bytes(self, doc_id: int) -> bytes:
        idx = self._find_chunk(doc_id)
        chunk = self._decompressed_chunk(idx)
        if self.entry_huge[idx]:
            return chunk
        base_doc = int(self.entry_doc_ids[idx])
        return _slice_value(chunk, doc_id - base_doc)

    def get_string(self, doc_id: int) -> str:
        return self.get_bytes(doc_id).decode("utf-8")

    # -- bulk reads (chunk-at-a-time, var_byte.rs:333-434) ------------------

    def _iter_values(self):
        for idx in range(self.num_chunks()):
            chunk = self._decompressed_chunk(idx)
            if self.entry_huge[idx]:
                yield chunk
                continue
            if len(chunk) < 8:
                raise InvalidFormatError("Decompressed chunk too small")
            num_docs = int.from_bytes(chunk[0:4], "little")
            offsets = np.frombuffer(chunk, dtype="<u4", count=num_docs, offset=4).astype(np.int64)
            ends = np.empty(num_docs, dtype=np.int64)
            ends[:-1] = offsets[1:]
            ends[-1] = len(chunk)
            for s, e in zip(offsets, ends):
                yield chunk[s:e]

    def read_all_bytes(self) -> list[bytes]:
        return list(self._iter_values())

    def read_all_strings(self) -> list[str]:
        return [v.decode("utf-8", errors="replace") for v in self._iter_values()]

    def read_all_strings_arrow(self):
        """All values as a ``pyarrow`` string array built directly from each
        chunk's (offsets, bytes) layout — no per-value Python objects. The
        chunk format is already Arrow-shaped (prefix offsets + contiguous
        value bytes), so this is a buffer cast plus an offset rebase."""
        import pyarrow as pa

        return self._read_all_large_binary().cast(pa.large_string()).cast(pa.string())

    def read_all_bytes_arrow(self):
        """All values as a ``pyarrow`` binary array (BYTES columns — beyond
        the reference, which rejects BYTES at scan time, exec.rs:136-141).
        Same zero-copy chunk-buffer path as the string read, minus the UTF-8
        cast."""
        import pyarrow as pa

        return self._read_all_large_binary().cast(pa.binary())

    def take_bytes_arrow(self, doc_ids):
        """Selected docs (sorted ascending absolute ids) as a binary array,
        decompressing ONLY the chunks containing a selected doc — the
        selective-filter path for RAW payload columns (media blobs,
        embeddings), where decode-everything-then-take would decompress the
        whole forward index for a handful of rows."""
        import pyarrow as pa

        return self._take_large_binary(doc_ids).cast(pa.binary())

    def take_strings_arrow(self, doc_ids):
        import pyarrow as pa

        return (
            self._take_large_binary(doc_ids)
            .cast(pa.large_string())
            .cast(pa.string())
        )

    def _take_large_binary(self, doc_ids):
        import pyarrow as pa

        vals = []
        i, n = 0, len(doc_ids)
        while i < n:
            idx = self._find_chunk(int(doc_ids[i]))
            base_doc = int(self.entry_doc_ids[idx])
            hi_doc = (
                int(self.entry_doc_ids[idx + 1])
                if idx + 1 < self.num_chunks()
                else self.total_docs
            )
            chunk = self._decompressed_chunk(idx)
            if self.entry_huge[idx]:
                while i < n and int(doc_ids[i]) < hi_doc:
                    vals.append(chunk)
                    i += 1
                continue
            while i < n and int(doc_ids[i]) < hi_doc:
                vals.append(_slice_value(chunk, int(doc_ids[i]) - base_doc))
                i += 1
        return pa.array(vals, type=pa.large_binary())

    def _read_all_large_binary(self):
        import pyarrow as pa

        chunks = []
        for idx in range(self.num_chunks()):
            chunk = self._decompressed_chunk(idx)
            if self.entry_huge[idx]:
                chunks.append(pa.array([chunk], type=pa.large_binary()))
                continue
            if len(chunk) < 8:
                raise InvalidFormatError("Decompressed chunk too small")
            num_docs = int.from_bytes(chunk[0:4], "little")
            offs = np.frombuffer(chunk, dtype="<u4", count=num_docs, offset=4)
            base = int(offs[0]) if num_docs else 0
            arrow_offs = np.empty(num_docs + 1, dtype=np.int64)
            arrow_offs[:-1] = offs
            arrow_offs[-1] = len(chunk)
            arrow_offs -= base
            arr = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                num_docs,
                [None, pa.py_buffer(arrow_offs.tobytes()), pa.py_buffer(chunk[base:])],
            )
            chunks.append(arr)
        return pa.concat_arrays(chunks) if chunks else pa.array([], pa.large_binary())


def _snappy_decompress(data: bytes) -> bytes:
    """Raw-Snappy decode (beyond the reference, which rejects SNAPPY chunks,
    var_byte.rs:8-13): the raw format's preamble is the uncompressed length
    as a varint — parse it, then decode via pyarrow's snappy codec."""
    import pyarrow as pa

    size, shift, i = 0, 0, 0
    while True:
        if i >= len(data):
            raise InvalidFormatError("truncated snappy varint preamble")
        b = data[i]
        size |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not (b & 0x80):
            break
    out = pa.Codec("snappy").decompress(bytes(data), decompressed_size=size)
    return out.to_pybytes()


def _zstd_frame_content_size(data: bytes) -> int:
    """Frame content size from a zstd frame header (RFC 8878 §3.1.1)."""
    if len(data) < 5 or data[:4] != b"\x28\xb5\x2f\xfd":
        raise InvalidFormatError("not a zstd frame")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    dict_flag = fhd & 0x03
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_flag]
    if fcs_flag == 0:
        if not single_segment:
            raise UnsupportedFeatureError(
                "zstd frame without declared content size"
            )
        return data[pos]
    if fcs_flag == 1:
        return int.from_bytes(data[pos : pos + 2], "little") + 256
    if fcs_flag == 2:
        return int.from_bytes(data[pos : pos + 4], "little")
    return int.from_bytes(data[pos : pos + 8], "little")


def _zstd_decompress(data: bytes) -> bytes:
    """Zstandard decode (beyond the reference, which rejects ZSTANDARD
    chunks): content size comes from the frame header, then pyarrow's zstd
    codec does the work."""
    import pyarrow as pa

    size = _zstd_frame_content_size(data)
    out = pa.Codec("zstd").decompress(bytes(data), decompressed_size=size)
    return out.to_pybytes()


def _slice_value(chunk: bytes, doc_idx: int) -> bytes:
    num_docs = int.from_bytes(chunk[0:4], "little")
    if doc_idx >= num_docs:
        raise InvalidFormatError(
            f"doc index {doc_idx} not in chunk ({num_docs} docs)"
        )
    off_pos = 4 + doc_idx * 4
    start = int.from_bytes(chunk[off_pos : off_pos + 4], "little")
    if doc_idx == num_docs - 1:
        end = len(chunk)
    else:
        end = int.from_bytes(chunk[off_pos + 4 : off_pos + 8], "little")
    if start > len(chunk) or end > len(chunk):
        raise InvalidFormatError("Value offsets out of range")
    return chunk[start:end]
