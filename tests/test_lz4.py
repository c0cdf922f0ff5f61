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
