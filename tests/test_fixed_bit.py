"""Fixed-bit unpacker tests.

Byte vectors ported verbatim from reference fixed_bit.rs:115-170, plus
property tests validating the vectorized numpy path against the scalar
transliteration (SURVEY.md §7 'hard parts' (a))."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from pinot_segment.fixed_bit import (
    FixedBitWidthReader,
    unpack_bits,
    unpack_bits_scalar,
)


def test_bit_packing_1bit():
    # [0,1,0,1,1,0,0,1] packed as 01011001 = 0x59 (fixed_bit.rs:119-137)
    r = FixedBitWidthReader(bytes([0x59]), 1, 8)
    assert list(r.read_all()) == [0, 1, 0, 1, 1, 0, 0, 1]
    assert r.get_dict_id(0) == 0
    assert r.get_dict_id(7) == 1


def test_bit_packing_4bit():
    # [5,10,15,3] packed as 0x5A 0xF3 (fixed_bit.rs:139-153)
    r = FixedBitWidthReader(bytes([0x5A, 0xF3]), 4, 4)
    assert list(r.read_all()) == [5, 10, 15, 3]


def test_bit_packing_cross_byte():
    # 5-bit [10,20,5] packed as 0x55 0x0A (fixed_bit.rs:155-169)
    r = FixedBitWidthReader(bytes([0x55, 0x0A]), 5, 3)
    assert list(r.read_all()) == [10, 20, 5]


def test_out_of_range_doc_id():
    r = FixedBitWidthReader(bytes([0x59]), 1, 8)
    with pytest.raises(Exception):
        r.get_dict_id(8)


@given(
    bits=st.integers(min_value=1, max_value=31),
    n=st.integers(min_value=0, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_vectorized_matches_scalar(bits, n, seed):
    rng = np.random.RandomState(seed)
    nbytes = (n * bits + 7) // 8 + 1
    buf = rng.randint(0, 256, size=nbytes, dtype=np.uint8).tobytes()
    assert list(unpack_bits(buf, bits, n)) == unpack_bits_scalar(buf, bits, n)


@given(
    bits=st.integers(min_value=1, max_value=31),
    values=st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=64),
)
def test_roundtrip_via_writer_packer(bits, values):
    from pinot_segment.writer import _pack_bits

    values = [v & ((1 << bits) - 1) for v in values]
    packed = _pack_bits(values, bits)
    assert list(unpack_bits(packed, bits, len(values))) == values
