"""Pure-Python LZ4 block codec tests (roundtrip + known vectors)."""

import pytest
from hypothesis import given, strategies as st

from pinot_segment import lz4_block


def test_empty_roundtrip():
    assert lz4_block.decompress(lz4_block.compress(b"")) == b""


def test_incompressible_roundtrip():
    data = bytes(range(256))
    assert lz4_block.decompress(lz4_block.compress(data)) == data


def test_repetitive_roundtrip():
    data = b"abcd" * 1000 + b"tail-bytes"
    comp = lz4_block.compress(data)
    assert len(comp) < len(data) // 2  # actually compresses
    assert lz4_block.decompress(comp, len(data)) == data


def test_overlapping_match_decode():
    # token: 1 literal, match len 15+4: 'a' then 18 copies at offset 1 -> 'a'*20
    # hand-built block: token=0x1F, literal 'a', offset=1 LE, ext len byte 0,
    # then a final literals-only sequence 'Z'
    block = bytes([0x1F]) + b"a" + bytes([0x01, 0x00, 0x00]) + bytes([0x10]) + b"Z"
    out = lz4_block.decompress(block)
    assert out == b"a" * 20 + b"Z"


def test_size_mismatch_raises():
    comp = lz4_block.compress(b"hello world, hello world, hello world")
    with pytest.raises(Exception):
        lz4_block.decompress(comp, 5)


@given(st.binary(max_size=4096))
def test_roundtrip_random(data):
    assert lz4_block.decompress(lz4_block.compress(data), len(data)) == data


@given(st.lists(st.sampled_from([b"foo", b"barbar", b"x", b"yzyzyz"]), max_size=400))
def test_roundtrip_repetitive(parts):
    data = b"".join(parts)
    assert lz4_block.decompress(lz4_block.compress(data), len(data)) == data


def test_pure_python_encoder_fallback(monkeypatch):
    """compress() prefers native codecs (lz4 wheel / pyarrow lz4_raw); the
    pure-Python encoder must stay a working dependency-free fallback."""
    monkeypatch.setattr(lz4_block, "_c_lz4", None)
    monkeypatch.setattr(lz4_block, "_pa_lz4", None)
    data = b"abcd" * 1000 + bytes(range(256)) + b"tail"
    comp = lz4_block.compress(data)
    assert len(comp) < len(data)
    assert lz4_block.decompress(comp) == data


def test_cross_codec_compatibility(monkeypatch):
    """Blocks from the native encoder decode in the pure-Python decoder and
    vice versa — both speak the same spec'd block format."""
    data = b"hello pinot " * 500 + bytes(range(64))
    native = lz4_block.compress(data)  # pyarrow (or lz4 wheel) path
    monkeypatch.setattr(lz4_block, "_c_lz4", None)
    monkeypatch.setattr(lz4_block, "_pa_lz4", None)
    python_block = lz4_block.compress(data)
    # python decoder reads the native block (no size hint → python loop)
    assert lz4_block.decompress(native) == data
    monkeypatch.undo()
    # native decoder reads the python block (size hint → pyarrow path)
    assert lz4_block.decompress(python_block, len(data)) == data
