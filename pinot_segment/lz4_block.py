"""LZ4 *block* format codec, pure Python, from the public format spec
(https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md).

The container has no `lz4` wheel, so decompression (needed by the RAW V4
var-byte reader, reference var_byte.rs:266-316) is implemented here; if the
C-backed ``lz4.block`` module is importable we use it instead. Compression is
needed only by the test-only segment writer.

Block format recap: a block is a sequence of *sequences*; each sequence is
  token(1B: hi-nibble literal len, lo-nibble match len - 4)
  [literal-len extension bytes of 255 while == 255]
  literals
  match offset (2B little-endian, 0 < offset <= 65535)
  [match-len extension bytes]
The last sequence contains only literals (no offset/match). Matches may
overlap their own output (offset < length ⇒ repeated pattern).
"""

from __future__ import annotations

try:  # pragma: no cover - exercised only when the wheel exists
    import lz4.block as _c_lz4
except ImportError:
    _c_lz4 = None

try:
    # pyarrow's lz4_raw codec decodes the same block format ~50x faster than
    # the Python loop; it needs the exact decompressed size, which the
    # LZ4_LENGTH_PREFIXED chunks carry (the common Pinot configuration).
    import pyarrow as _pa

    _pa_lz4 = _pa.Codec("lz4_raw")
except Exception:  # pragma: no cover - pyarrow is a baked-in dependency
    _pa_lz4 = None

MIN_MATCH = 4
# Spec: last 5 bytes are always literals; last match cannot start within the
# last 12 bytes.
_LAST_LITERALS = 5
_MFLIMIT = 12


class LZ4Error(ValueError):
    pass


def decompress(src: bytes, uncompressed_size: int | None = None) -> bytes:
    """Decode one LZ4 block. ``uncompressed_size`` is a validation hint."""
    if uncompressed_size is not None:
        if _c_lz4 is not None:
            return _c_lz4.decompress(src, uncompressed_size=uncompressed_size)
        if _pa_lz4 is not None:
            return _pa_lz4.decompress(
                bytes(src), decompressed_size=uncompressed_size
            ).to_pybytes()

    dst = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise LZ4Error("truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise LZ4Error("truncated literals")
        dst += src[i : i + lit_len]
        i += lit_len
        if i >= n:
            break  # last sequence: literals only
        if i + 2 > n:
            raise LZ4Error("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise LZ4Error("zero match offset")
        match_len = token & 0x0F
        if match_len == 15:
            while True:
                if i >= n:
                    raise LZ4Error("truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += MIN_MATCH
        start = len(dst) - offset
        if start < 0:
            raise LZ4Error("match offset beyond output start")
        if offset >= match_len:
            dst += dst[start : start + match_len]
        else:
            # Overlapping match: output repeats the trailing `offset` bytes.
            pattern = dst[start:]
            reps, rem = divmod(match_len, offset)
            dst += pattern * reps + pattern[:rem]
    if uncompressed_size is not None and len(dst) != uncompressed_size:
        raise LZ4Error(
            f"decompressed {len(dst)} bytes, expected {uncompressed_size}"
        )
    return bytes(dst)


# Encoder override for byte-frozen fixtures: every encoder emits spec-valid
# blocks but DIFFERENT bytes, so tests that pin exact compressed bytes must
# force the encoder that produced the committed fixture instead of taking
# whichever codec happens to be installed (the availability-preference chain
# below). None = prefer native codecs (production default).
_FORCED_ENCODER: str | None = None


def force_encoder(name: str | None) -> str | None:
    """Pin compress() to one encoder: "native" (lz4 wheel), "pyarrow",
    "python", or None to restore the availability-preference default.
    Returns the previous setting so callers can save/restore."""
    global _FORCED_ENCODER
    if name not in (None, "native", "pyarrow", "python"):
        raise ValueError(f"unknown lz4 encoder {name!r}")
    prev = _FORCED_ENCODER
    _FORCED_ENCODER = name
    return prev


def _compress_pyarrow(src: bytes) -> bytes:
    if _pa_lz4 is None:
        raise LZ4Error("pyarrow lz4_raw codec unavailable")
    out = _pa_lz4.compress(src)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


def compress(src: bytes) -> bytes:
    """LZ4 block encoder. Prefers native codecs (lz4 wheel, then pyarrow's
    lz4_raw — both emit spec-valid blocks, ~50x the Python loop and the
    production write path's hot spot); the pure-Python greedy encoder is the
    dependency-free fallback and the readable spec implementation.
    """
    if _FORCED_ENCODER == "python":
        return compress_py(src)
    if _FORCED_ENCODER == "pyarrow":
        return _compress_pyarrow(src)
    if _FORCED_ENCODER == "native":
        if _c_lz4 is None:
            raise LZ4Error("lz4 wheel unavailable")
        return _c_lz4.compress(src, store_size=False)
    if _c_lz4 is not None:
        return _c_lz4.compress(src, store_size=False)
    if _pa_lz4 is not None:
        return _compress_pyarrow(src)
    return compress_py(src)


def compress_py(src: bytes) -> bytes:
    """The pure-Python greedy spec encoder (stable bytes on any environment
    — the permanently-frozen fixture tier is encoded with this)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        out.append(0)  # one empty-literal sequence
        return bytes(out)

    table: dict[bytes, int] = {}
    anchor = 0  # start of pending literals
    i = 0
    match_limit = n - _LAST_LITERALS

    def emit(lit_start: int, lit_end: int, offset: int | None, mlen: int) -> None:
        lit_len = lit_end - lit_start
        ml = 0 if offset is None else mlen - MIN_MATCH
        token_lit = 15 if lit_len >= 15 else lit_len
        token_ml = 15 if ml >= 15 else ml
        out.append((token_lit << 4) | token_ml)
        rest = lit_len - 15
        while token_lit == 15:
            if rest >= 255:
                out.append(255)
                rest -= 255
            else:
                out.append(rest)
                break
        out.extend(src[lit_start:lit_end])
        if offset is None:
            return
        out.append(offset & 0xFF)
        out.append(offset >> 8)
        rest = ml - 15
        while token_ml == 15:
            if rest >= 255:
                out.append(255)
                rest -= 255
            else:
                out.append(rest)
                break

    while i < n - _MFLIMIT:
        key = src[i : i + MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF or src[cand : cand + MIN_MATCH] != key:
            i += 1
            continue
        # Extend the match forward (not past the end-of-block safety margin).
        mlen = MIN_MATCH
        while i + mlen < match_limit and src[cand + mlen] == src[i + mlen]:
            mlen += 1
        emit(anchor, i, i - cand, mlen)
        i += mlen
        anchor = i
    emit(anchor, n, None, 0)  # trailing literals
    return bytes(out)
