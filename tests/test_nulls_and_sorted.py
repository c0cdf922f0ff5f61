"""Nullable columns (null-vector index) and sorted-column row-range pruning.

Both are rebuild extensions beyond the reference: its schema mapping is
non-nullable-only (schema.rs:29-30) and its scan ignores filters entirely
(table.rs:163). Library-level coverage here; the Spark end-to-end path is
hash-gated by the `pinot_nulls_roundtrip` / `pinot_sorted_scan` catalog
queries (tests/test_queries_oracle.py)."""

import numpy as np
import pytest

from pinot_segment.metadata import DataType
from pinot_segment.segment_reader import SegmentReader
from pinot_segment.writer import ColumnSpec, write_segment


@pytest.fixture(scope="module")
def nullable_segment(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullable")
    n = 100
    mask = np.arange(n) % 3 == 0
    ints = np.where(mask, 0, np.arange(100, 100 + n))
    strs = ["" if mask[i] else f"s{i:03d}" for i in range(n)]
    raw_d = np.where(mask, 0.0, np.linspace(1.0, 2.0, n))
    v3 = write_segment(
        d / "seg",
        "seg",
        "tbl",
        [
            ColumnSpec("i", DataType.INT, ints, null_mask=mask),
            ColumnSpec("s", DataType.STRING, strs, null_mask=mask),
            ColumnSpec("rd", DataType.DOUBLE, raw_d, raw=True, null_mask=mask),
            ColumnSpec("k", DataType.LONG, np.arange(n)),
        ],
    )
    return SegmentReader.open(v3), mask, ints, strs


def test_null_mask_roundtrip(nullable_segment):
    reader, mask, _, _ = nullable_segment
    for col in ("i", "s", "rd"):
        assert reader.metadata.get_column(col).has_null_values
        np.testing.assert_array_equal(reader.null_mask(col), mask)
    assert not reader.metadata.get_column("k").has_null_values
    assert reader.null_mask("k") is None


def test_arrow_nulls_applied(nullable_segment):
    reader, mask, ints, strs = nullable_segment
    table = reader.read_columns_arrow(["i", "s", "k"])
    got_i = table.column("i").to_pylist()
    got_s = table.column("s").to_pylist()
    for doc, is_null in enumerate(mask):
        if is_null:
            assert got_i[doc] is None and got_s[doc] is None
        else:
            assert got_i[doc] == int(ints[doc]) and got_s[doc] == strs[doc]
    # schema reflects nullability per column
    sch = reader.arrow_schema(["i", "k"])
    assert sch.field("i").nullable and not sch.field("k").nullable


def test_nullable_zone_map_covers_non_null_values_only(nullable_segment):
    reader, mask, ints, _ = nullable_segment
    # bounds come from the writer's non-null metadata stats, NOT the
    # dictionary (which contains the 0 fill value)
    non_null = ints[~mask]
    assert reader.column_min_max("i") == (non_null.min(), non_null.max())
    assert reader.column_min_max("rd") is not None
    assert reader.column_min_max("rd")[0] > 0.0  # 0.0 fill excluded
    # the sort order is still never trusted for nullable columns
    assert not reader.metadata.get_column("i").is_sorted
    assert reader.sorted_row_range("i", 0, True, 10, True) is None


def test_all_null_column_has_no_zone_map(tmp_path):
    n = 4
    v3 = write_segment(
        tmp_path / "seg",
        "seg",
        "tbl",
        [
            ColumnSpec(
                "x",
                DataType.LONG,
                np.zeros(n, dtype=np.int64),
                null_mask=np.ones(n, dtype=bool),
            )
        ],
    )
    assert SegmentReader.open(v3).column_min_max("x") is None


def test_all_null_and_no_null_edge_masks(tmp_path):
    n = 8
    v3 = write_segment(
        tmp_path / "seg",
        "seg",
        "tbl",
        [
            ColumnSpec(
                "all_null",
                DataType.LONG,
                np.zeros(n, dtype=np.int64),
                null_mask=np.ones(n, dtype=bool),
            ),
            # an all-False mask is dropped: no null vector on disk
            ColumnSpec(
                "no_null",
                DataType.LONG,
                np.arange(n),
                null_mask=np.zeros(n, dtype=bool),
            ),
        ],
    )
    r = SegmentReader.open(v3)
    assert r.read_columns_arrow(["all_null"]).column("all_null").null_count == n
    assert not r.metadata.get_column("no_null").has_null_values
    # no-null column with an all-False mask still gets its sorted flag
    assert r.metadata.get_column("no_null").is_sorted


def test_null_mask_length_mismatch_rejected():
    with pytest.raises(ValueError, match="null_mask length"):
        ColumnSpec(
            "x", DataType.LONG, np.arange(4), null_mask=np.zeros(3, dtype=bool)
        )


@pytest.fixture(scope="module")
def sorted_segment(tmp_path_factory):
    d = tmp_path_factory.mktemp("sorted")
    n = 1000
    rng = np.random.RandomState(7)
    dict_key = np.sort(rng.randint(0, 300, n))  # sorted dict LONG (dupes)
    raw_key = np.sort(rng.uniform(0.0, 100.0, n))  # sorted RAW DOUBLE
    skey = sorted(f"k{i % 40:03d}" for i in range(n))  # sorted dict STRING
    unsorted = rng.randint(0, 50, n)
    v3 = write_segment(
        d / "seg",
        "seg",
        "tbl",
        [
            ColumnSpec("dk", DataType.LONG, dict_key),
            ColumnSpec("rk", DataType.DOUBLE, raw_key, raw=True),
            ColumnSpec("sk", DataType.STRING, skey),
            ColumnSpec("u", DataType.LONG, unsorted),
        ],
    )
    return SegmentReader.open(v3), dict_key, raw_key, skey


def test_sorted_flags(sorted_segment):
    reader, _, _, _ = sorted_segment
    assert reader.metadata.get_column("dk").is_sorted
    assert reader.metadata.get_column("rk").is_sorted  # RAW numerics too
    assert reader.metadata.get_column("sk").is_sorted
    assert not reader.metadata.get_column("u").is_sorted
    assert reader.sorted_row_range("u", 1, True, 2, True) is None


@pytest.mark.parametrize(
    "lo,lo_inc,hi,hi_inc",
    [
        (50, True, 150, False),
        (50, False, 150, True),
        (None, True, 100, True),
        (75, True, None, True),
        (100, True, 100, True),  # equality
        (-5, True, -1, True),  # empty below
        (1000, True, 2000, True),  # empty above
    ],
)
def test_sorted_range_dict_long(sorted_segment, lo, lo_inc, hi, hi_inc):
    reader, dict_key, _, _ = sorted_segment
    d_lo, d_hi = reader.sorted_row_range("dk", lo, lo_inc, hi, hi_inc)
    sel = np.ones(len(dict_key), dtype=bool)
    if lo is not None:
        sel &= dict_key >= lo if lo_inc else dict_key > lo
    if hi is not None:
        sel &= dict_key <= hi if hi_inc else dict_key < hi
    expected = np.flatnonzero(sel)
    if len(expected):
        assert (d_lo, d_hi) == (expected[0], expected[-1] + 1)
    else:
        assert d_lo >= d_hi


def test_sorted_range_raw_double(sorted_segment):
    reader, _, raw_key, _ = sorted_segment
    d_lo, d_hi = reader.sorted_row_range("rk", 25.0, False, 50.0, True)
    assert (raw_key[d_lo:d_hi] > 25.0).all()
    assert (raw_key[d_lo:d_hi] <= 50.0).all()
    assert d_lo == 0 or raw_key[d_lo - 1] <= 25.0
    assert d_hi == len(raw_key) or raw_key[d_hi] > 50.0


def test_sorted_range_string_equality(sorted_segment):
    reader, _, _, skey = sorted_segment
    d_lo, d_hi = reader.sorted_row_range("sk", "k010", True, "k010", True)
    assert d_hi - d_lo == skey.count("k010")
    assert all(s == "k010" for s in skey[d_lo:d_hi])


def test_range_sliced_read_matches_full(sorted_segment):
    reader, _, _, _ = sorted_segment
    lo, hi = reader.sorted_row_range("dk", 50, True, 150, False)
    full = reader.read_columns_arrow(["dk", "rk", "sk", "u"])
    sliced = reader.read_columns_arrow(["dk", "rk", "sk", "u"], (lo, hi))
    assert sliced.num_rows == hi - lo
    assert sliced.to_pylist() == full.slice(lo, hi - lo).to_pylist()


@pytest.fixture(scope="module")
def inverted_segment(tmp_path_factory):
    d = tmp_path_factory.mktemp("inverted")
    n = 400
    rng = np.random.RandomState(11)
    flags = [["A", "B", "C", "D"][i] for i in rng.randint(0, 4, n)]
    nums = rng.randint(0, 16, n)
    v3 = write_segment(
        d / "seg",
        "seg",
        "tbl",
        [
            ColumnSpec("flag", DataType.STRING, flags, inverted=True),
            ColumnSpec("num", DataType.INT, nums, inverted=True),
            ColumnSpec("plain", DataType.LONG, np.arange(n)),
        ],
    )
    return SegmentReader.open(v3), flags, nums


def test_inverted_metadata_flags(inverted_segment):
    reader, _, _ = inverted_segment
    assert reader.metadata.get_column("flag").has_inverted_index
    assert reader.metadata.get_column("num").has_inverted_index
    assert not reader.metadata.get_column("plain").has_inverted_index
    assert reader.inverted_match_mask("plain", [1]) is None


def test_inverted_string_equality(inverted_segment):
    reader, flags, _ = inverted_segment
    mask = reader.inverted_match_mask("flag", ["B"])
    np.testing.assert_array_equal(mask, np.asarray(flags) == "B")


def test_inverted_int_in_list(inverted_segment):
    reader, _, nums = inverted_segment
    mask = reader.inverted_match_mask("num", [3, 7, 15])
    np.testing.assert_array_equal(mask, np.isin(nums, [3, 7, 15]))


def test_inverted_absent_value_is_all_false(inverted_segment):
    reader, _, _ = inverted_segment
    assert reader.inverted_match_mask("flag", ["ZZZ"]).sum() == 0
    assert reader.inverted_match_mask("num", [999]).sum() == 0


def test_inverted_rejects_raw_but_allows_mv():
    with pytest.raises(ValueError, match="inverted index requires"):
        ColumnSpec("x", DataType.STRING, ["a"], raw=True, inverted=True)
    # MV dict columns take inverted indexes (r6c4, Pinot parity): bitmap i
    # marks docs whose array contains value i — tests/test_mv_inverted.py
    spec = ColumnSpec(
        "x", DataType.INT, [[1], [2]], multi_value=True, inverted=True
    )
    assert spec.inverted and spec.multi_value


def test_spark_filters_map_to_sorted_range(sorted_segment):
    """The datasource's filter → bounds translation, Spark-free."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        LessThanOrEqual,
    )

    from datafusion_pinot_spark.sources.pinot_datasource import (
        _sorted_row_range,
    )

    reader, dict_key, _, _ = sorted_segment
    rng = _sorted_row_range(
        reader, [GreaterThan(("dk",), 50), LessThanOrEqual(("dk",), 150)]
    )
    lo, hi = rng
    assert (dict_key[lo:hi] > 50).all() and (dict_key[lo:hi] <= 150).all()
    # equality on the unsorted column contributes nothing
    assert _sorted_row_range(reader, [EqualTo(("u",), 3)]) is None
    # an impossible conjunction yields an empty range
    lo2, hi2 = _sorted_row_range(
        reader, [GreaterThan(("dk",), 200), LessThanOrEqual(("dk",), 100)]
    )
    assert lo2 >= hi2
