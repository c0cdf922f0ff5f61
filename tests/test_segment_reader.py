"""Segment reader end-to-end tests over writer-generated v3 fixtures.

Mirrors the reference's integration-test tier (SURVEY.md §5) but with
self-contained fixtures instead of the Docker quickstart segment."""

import numpy as np
import pytest

from pinot_segment.errors import UnsupportedFeatureError
from pinot_segment.metadata import DataType
from pinot_segment.segment_reader import SegmentReader
from pinot_segment.var_byte import LZ4_LENGTH_PREFIXED, PASS_THROUGH
from pinot_segment.writer import ColumnSpec, write_segment


@pytest.fixture(scope="module")
def segment(tmp_path_factory):
    rng = np.random.RandomState(7)
    n = 1000
    ints = rng.randint(-50, 300, n).tolist()
    longs = rng.randint(-(10**12), 10**12, n).tolist()
    floats = [float(np.float32(x)) for x in rng.randn(n)]
    doubles = rng.randn(n).tolist()
    teams = [f"T{j:02d}" for j in rng.randint(0, 30, n)]
    names = [f"player {j}" for j in rng.randint(0, 200, n)]
    raw_ids = [f"id{j:06x}-{'pad' * (j % 5)}" for j in range(n)]
    raw_lz4 = [f"value-{j % 97}-{'rep' * (j % 11)}" for j in range(n)]

    d = tmp_path_factory.mktemp("seg") / "seg0"
    v3 = write_segment(
        d,
        "seg0",
        "t",
        [
            ColumnSpec("i", DataType.INT, ints),
            ColumnSpec("l", DataType.LONG, longs),
            ColumnSpec("f", DataType.FLOAT, floats),
            ColumnSpec("d", DataType.DOUBLE, doubles),
            ColumnSpec("team", DataType.STRING, teams, fixed_length_dict=True),
            ColumnSpec("name", DataType.STRING, names),
            ColumnSpec("rid", DataType.STRING, raw_ids, raw=True,
                       compression=PASS_THROUGH, target_chunk_size=512),
            ColumnSpec("rlz", DataType.STRING, raw_lz4, raw=True,
                       compression=LZ4_LENGTH_PREFIXED, target_chunk_size=256,
                       with_magic_prefix=True),
        ],
    )
    return v3, dict(i=ints, l=longs, f=floats, d=doubles, team=teams,
                    name=names, rid=raw_ids, rlz=raw_lz4)


def test_metadata_roundtrip(segment):
    v3, data = segment
    r = SegmentReader.open(v3)
    assert r.total_docs() == 1000
    assert r.column_names() == ["i", "l", "f", "d", "team", "name", "rid", "rlz"]


def test_int_column(segment):
    v3, data = segment
    assert list(SegmentReader.open(v3).read_int_column("i")) == data["i"]


def test_long_column(segment):
    v3, data = segment
    assert list(SegmentReader.open(v3).read_long_column("l")) == data["l"]


def test_float_column(segment):
    v3, data = segment
    got = SegmentReader.open(v3).read_float_column("f")
    assert np.allclose(got, np.asarray(data["f"], dtype=np.float32), rtol=0, atol=0)


def test_double_column(segment):
    v3, data = segment
    assert list(SegmentReader.open(v3).read_double_column("d")) == data["d"]


def test_fixed_length_string_dictionary(segment):
    v3, data = segment
    assert SegmentReader.open(v3).read_string_column("team") == data["team"]


def test_var_length_string_dictionary(segment):
    v3, data = segment
    assert SegmentReader.open(v3).read_string_column("name") == data["name"]


def test_raw_string_passthrough_multichunk(segment):
    v3, data = segment
    assert SegmentReader.open(v3).read_string_column("rid") == data["rid"]


def test_raw_string_lz4_with_magic(segment):
    v3, data = segment
    assert SegmentReader.open(v3).read_string_column("rlz") == data["rlz"]


def test_point_reads_match_bulk(segment):
    from pinot_segment.var_byte import VarByteChunkReader

    v3, data = segment
    r = SegmentReader.open(v3)
    loc = r.index_map.get_forward_index("rid")
    vb = VarByteChunkReader.read(v3 / "columns.psf", loc.start_offset, loc.size, 1000)
    for doc in [0, 1, 7, 499, 999]:
        assert vb.get_string(doc) == data["rid"][doc]


def test_huge_value_chunk(tmp_path):
    vals = ["short", "x" * 5000, "another-short", "y" * 4096, "tail"]
    v3 = write_segment(
        tmp_path / "huge", "huge", "t",
        [ColumnSpec("c", DataType.STRING, vals, raw=True,
                    compression=LZ4_LENGTH_PREFIXED, target_chunk_size=1024)],
    )
    assert SegmentReader.open(v3).read_string_column("c") == vals


def test_zone_map_min_max(segment):
    v3, data = segment
    r = SegmentReader.open(v3)
    mn, mx = r.column_min_max("i")
    assert mn == min(data["i"]) and mx == max(data["i"])
    assert r.column_min_max("rid") is None  # RAW: no stats


def test_column_type_mismatch(segment):
    v3, _ = segment
    with pytest.raises(Exception):
        SegmentReader.open(v3).read_int_column("team")


def test_arrow_assembly(segment):
    v3, data = segment
    t = SegmentReader.open(v3).read_columns_arrow(["i", "team", "rid"])
    assert t.num_rows == 1000
    assert t.column_names == ["i", "team", "rid"]
    assert not t.schema.field("i").nullable
    assert t.column("team").to_pylist() == data["team"]


# -- whole-segment property round-trip ---------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st
from pinot_segment.var_byte import LZ4, SNAPPY, ZSTANDARD


# data_too_large suppressed: the test intentionally draws one list per
# column x 11 columns, so examples are big by design (sizes are capped
# per-draw below).
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.data_too_large],
)
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=200),
    compression=st.sampled_from(
        [PASS_THROUGH, LZ4, LZ4_LENGTH_PREFIXED, SNAPPY, ZSTANDARD]
    ),
    chunk=st.sampled_from([64, 256, 4096]),
)
def test_property_roundtrip_all_types(tmp_path_factory, data, n, compression, chunk):
    """Any values of every readable type survive write→read bit-exactly."""
    ints = data.draw(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=n, max_size=n))
    longs = data.draw(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=n, max_size=n))
    floats = [
        float(np.float32(x))
        for x in data.draw(
            st.lists(st.floats(allow_nan=False, width=32), min_size=n, max_size=n)
        )
    ]
    doubles = data.draw(
        st.lists(st.floats(allow_nan=False, allow_infinity=True), min_size=n, max_size=n)
    )
    strs = data.draw(
        st.lists(st.text(max_size=40), min_size=n, max_size=n)
    )
    raws = data.draw(st.lists(st.text(max_size=80), min_size=n, max_size=n))
    bools = data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    blobs = data.draw(st.lists(st.binary(max_size=80), min_size=n, max_size=n))
    dict_blobs = data.draw(st.lists(st.binary(max_size=24), min_size=n, max_size=n))
    mv_ints = data.draw(
        st.lists(
            st.lists(st.integers(-(2**31), 2**31 - 1), max_size=5),
            min_size=n, max_size=n,
        )
    )
    mv_strs = data.draw(
        st.lists(st.lists(st.text(max_size=12), max_size=4), min_size=n, max_size=n)
    )

    d = tmp_path_factory.mktemp("prop") / "seg"
    v3 = write_segment(
        d,
        "seg",
        "t",
        [
            ColumnSpec("i", DataType.INT, ints),
            ColumnSpec("l", DataType.LONG, longs),
            ColumnSpec("f", DataType.FLOAT, floats),
            ColumnSpec("d", DataType.DOUBLE, doubles),
            ColumnSpec("s", DataType.STRING, strs),
            ColumnSpec("r", DataType.STRING, raws, raw=True,
                       compression=compression, target_chunk_size=chunk),
            ColumnSpec("bl", DataType.BOOLEAN, bools),
            ColumnSpec("by", DataType.BYTES, blobs, raw=True,
                       compression=compression, target_chunk_size=chunk),
            ColumnSpec("byd", DataType.BYTES, dict_blobs),
            ColumnSpec("mi", DataType.INT, mv_ints, multi_value=True),
            ColumnSpec("ms", DataType.STRING, mv_strs, multi_value=True),
        ],
    )
    reader = SegmentReader.open(v3)
    assert reader.read_column("i").tolist() == ints
    assert reader.read_column("l").tolist() == longs
    assert reader.read_column("f").tolist() == [float(np.float32(x)) for x in floats]
    assert reader.read_column("d").tolist() == doubles
    assert list(reader.read_column("s")) == strs
    assert list(reader.read_column("r")) == raws
    assert list(reader.read_column("bl")) == bools
    assert reader.read_column("by") == blobs
    assert reader.read_column("byd") == dict_blobs
    assert reader.read_column("mi") == mv_ints
    assert reader.read_column("ms") == mv_strs
    # Arrow assembly agrees with the typed readers for the r3 shapes
    tbl = reader.read_columns_arrow(["byd", "mi", "ms"])
    assert tbl.column("byd").to_pylist() == dict_blobs
    assert tbl.column("mi").to_pylist() == mv_ints
    assert tbl.column("ms").to_pylist() == mv_strs


def test_snappy_and_zstd_raw_columns(tmp_path):
    """SNAPPY and ZSTANDARD chunk decode — beyond the reference, which
    rejects both compression types (var_byte.rs:8-13)."""
    from pinot_segment.var_byte import SNAPPY, ZSTANDARD

    vals = [f"value-{i}-{'xy' * (i % 9)}" for i in range(5000)]
    d = tmp_path / "seg"
    v3 = write_segment(
        d,
        "seg",
        "t",
        [
            ColumnSpec("sn", DataType.STRING, vals, raw=True,
                       compression=SNAPPY, target_chunk_size=1024),
            ColumnSpec("zs", DataType.STRING, vals, raw=True,
                       compression=ZSTANDARD, target_chunk_size=1024),
        ],
    )
    r = SegmentReader.open(v3)
    assert list(r.read_column("sn")) == vals
    assert list(r.read_column("zs")) == vals
    assert r.read_columns_arrow(["sn", "zs"]).column("zs").to_pylist() == vals


def test_snappy_zstd_huge_chunks_roundtrip(tmp_path):
    """r14 (verdict #8): the HUGE-chunk path (one value larger than the
    chunk target, hugeFlag<<31 in the metadata entry) must round-trip under
    SNAPPY and ZSTANDARD too — the 0xFFFFFFFF sentinel/offset arithmetic is
    codec-independent, but each codec's decompress runs on the huge payload."""
    from pinot_segment.var_byte import SNAPPY, ZSTANDARD

    vals = ["small"] * 10 + ["H" * 5000] + ["tail-%d" % i for i in range(10)]
    d = tmp_path / "seg"
    v3 = write_segment(
        d,
        "seg",
        "t",
        [
            ColumnSpec("sn", DataType.STRING, vals, raw=True,
                       compression=SNAPPY, target_chunk_size=256),
            ColumnSpec("zs", DataType.STRING, vals, raw=True,
                       compression=ZSTANDARD, target_chunk_size=256),
        ],
    )
    r = SegmentReader.open(v3)
    assert list(r.read_column("sn")) == vals
    assert list(r.read_column("zs")) == vals
    # selection decode (absolute doc ids) crossing the huge boundary
    # decompresses each codec
    sel = np.array([9, 10, 11], dtype=np.int64)
    t = r.read_columns_arrow(["sn", "zs"], selection=sel)
    assert t.column("sn").to_pylist() == [vals[9], vals[10], vals[11]]
    assert t.column("zs").to_pylist() == [vals[9], vals[10], vals[11]]


def test_boolean_int_relabel_reads_as_bool(tmp_path):
    """BOOLEAN's on-disk encoding IS an INT dictionary of 0/1 (the reference
    declares BOOLEAN but rejects it at read, dictionary.rs:125-134 /
    exec.rs:136-141 — this repo exceeds parity and reads it): an INT column
    of 0/1 relabeled BOOLEAN decodes to bools."""
    d = tmp_path / "seg"
    v3 = write_segment(
        d, "seg", "t", [ColumnSpec("flag", DataType.INT, [0, 1, 1, 0])]
    )
    meta_file = v3 / "metadata.properties"
    meta_file.write_text(
        meta_file.read_text().replace(
            "column.flag.dataType=INT", "column.flag.dataType=BOOLEAN"
        )
    )
    r = SegmentReader.open(v3)
    assert r.metadata.get_column("flag").data_type is DataType.BOOLEAN
    assert list(r.read_column("flag")) == [False, True, True, False]
    assert r.read_columns_arrow(["flag"]).column("flag").to_pylist() == [
        False, True, True, False,
    ]


def test_boolean_bytes_roundtrip(tmp_path):
    """BOOLEAN (1-bit dict) and BYTES (RAW var-byte, incl. empty and
    NUL-containing payloads) roundtrip through writer -> reader."""
    bools = [True, False, True, True, False, False, True, False]
    blobs = [b"", b"\x00\x01\x02", bytes(range(256)), b"x" * 10_000,
             b"\xff\xfe", b"a", b"\x00", b"tail"]
    d = tmp_path / "seg"
    v3 = write_segment(
        d, "seg", "t",
        [
            ColumnSpec("ok", DataType.BOOLEAN, bools),
            ColumnSpec("payload", DataType.BYTES, blobs, raw=True),
        ],
    )
    r = SegmentReader.open(v3)
    assert r.metadata.get_column("ok").bits_per_element == 1
    assert list(r.read_column("ok")) == bools
    assert r.read_column("payload") == blobs
    tbl = r.read_columns_arrow(["ok", "payload"])
    assert tbl.column("ok").to_pylist() == bools
    assert tbl.column("payload").to_pylist() == blobs


def test_bytes_dictionary_roundtrip(tmp_path):
    """Dictionary-encoded BYTES (beyond the reference, dictionary.rs:125-134
    rejects it): var-length length-prefixed entries + fixed-bit ids. Edge
    payloads that would break a NUL-padded layout — empty, all-NUL, and
    trailing-NUL values — must survive byte-exactly."""
    domain = [b"", b"\x00", b"\x00\x00", b"a", b"a\x00", b"ab", b"\xff" * 40]
    blobs = [domain[i % len(domain)] for i in range(200)]
    d = tmp_path / "seg"
    v3 = write_segment(
        d, "seg", "t", [ColumnSpec("payload", DataType.BYTES, blobs)]
    )
    r = SegmentReader.open(v3)
    col = r.metadata.get_column("payload")
    assert col.has_dictionary and col.cardinality == len(domain)
    assert col.bits_per_element == 3
    assert r.read_column("payload") == blobs
    assert r.read_columns_arrow(["payload"]).column("payload").to_pylist() == blobs

    # the fixed-length (NUL-padded) layout is refused for BYTES
    with pytest.raises(ValueError, match="var-length"):
        ColumnSpec("b", DataType.BYTES, blobs, fixed_length_dict=True)


def test_raw_numeric_roundtrip(tmp_path):
    """RAW (no-dictionary) numeric columns — beyond the reference, which
    errors on them (segment_reader.rs:53-57). High-cardinality values
    round-trip without any dictionary, and metadata minValue/maxValue
    stats stand in for the sorted-dictionary zone map."""
    n = 5000
    ints = list(range(-2500, 2500))
    longs = [i * 3_000_000_007 for i in range(n)]
    floats = [float(np.float32(i / 7)) for i in range(n)]
    doubles = [i / 9.0 for i in range(n)]
    d = tmp_path / "seg"
    v3 = write_segment(
        d, "seg", "t",
        [
            ColumnSpec("ri", DataType.INT, ints, raw=True),
            ColumnSpec("rl", DataType.LONG, longs, raw=True),
            ColumnSpec("rf", DataType.FLOAT, floats, raw=True),
            ColumnSpec("rd", DataType.DOUBLE, doubles, raw=True),
        ],
    )
    r = SegmentReader.open(v3)
    assert not r.metadata.get_column("rl").has_dictionary
    assert r.read_column("ri").tolist() == ints
    assert r.read_column("rl").tolist() == longs
    assert r.read_column("rf").tolist() == floats
    assert r.read_column("rd").tolist() == doubles
    tbl = r.read_columns_arrow(["ri", "rl", "rd"])
    assert tbl.column("ri").to_pylist() == ints
    assert tbl.column("rl").to_pylist() == longs
    assert tbl.column("rd").to_pylist() == doubles
    # zone-map stats come from metadata, not a dictionary
    assert r.column_min_max("ri") == (-2500, 2499)
    assert r.column_min_max("rl") == (0, (n - 1) * 3_000_000_007)
    assert r.column_min_max("rd") == (0.0, (n - 1) / 9.0)


def test_timestamp_roundtrip(tmp_path):
    """TIMESTAMP (beyond the reference, README.md:314): epoch-millis LONGs
    on disk, microsecond-instant Arrow arrays out — dict and RAW paths."""
    import pyarrow as pa

    ms = [1_700_000_000_000 + i * 97 for i in range(1000)]
    d = tmp_path / "seg"
    v3 = write_segment(
        d, "seg", "t",
        [
            ColumnSpec("td", DataType.TIMESTAMP, ms),
            ColumnSpec("tr", DataType.TIMESTAMP, ms, raw=True),
        ],
    )
    r = SegmentReader.open(v3)
    assert r.read_column("td").tolist() == ms
    assert r.read_column("tr").tolist() == ms
    tbl = r.read_columns_arrow(["td", "tr"])
    assert tbl.schema.field("td").type == pa.timestamp("us", tz="UTC")
    assert tbl.column("td").cast(pa.int64()).to_pylist() == [m * 1000 for m in ms]
    assert tbl.column("tr").cast(pa.int64()).to_pylist() == [m * 1000 for m in ms]


def test_multivalue_roundtrip(tmp_path):
    """Multi-value columns (beyond the reference, README.md:310-316 lists MV
    as unsupported): flattened dictionary + bit-packed end-offsets. Edge
    rows: empty arrays, singletons, repeated values, NUL-containing
    strings."""
    ints = [[1, 2, 3], [], [7], [2, 2, 2, 2], [5, 6]]
    strs = [["a", "b"], ["nul\x00"], [], ["b", "a", "c"], ["z"]]
    dbls = [[0.5], [1.5, -2.25], [], [3.0], [0.5, 0.5]]
    d = tmp_path / "seg"
    v3 = write_segment(
        d, "seg", "t",
        [
            ColumnSpec("mi", DataType.INT, ints, multi_value=True),
            ColumnSpec("ms", DataType.STRING, strs, multi_value=True),
            ColumnSpec("md", DataType.DOUBLE, dbls, multi_value=True),
        ],
    )
    r = SegmentReader.open(v3)
    col = r.metadata.get_column("mi")
    assert not col.is_single_value
    assert col.total_number_of_entries == 10
    assert col.max_number_of_multi_values == 4
    assert r.read_column("mi") == ints
    assert r.read_column("ms") == strs
    assert r.read_column("md") == dbls
    tbl = r.read_columns_arrow(["mi", "ms", "md"])
    assert tbl.column("mi").to_pylist() == ints
    assert tbl.column("ms").to_pylist() == strs
    assert tbl.column("md").to_pylist() == dbls
    assert r.column_min_max("mi") is None  # no MV zone maps

    # MV is dictionary-only; MV BYTES is unsupported
    with pytest.raises(ValueError, match="dictionary-only"):
        ColumnSpec("x", DataType.STRING, strs, raw=True, multi_value=True)
    with pytest.raises(ValueError, match="BYTES"):
        ColumnSpec("x", DataType.BYTES, [[b"a"]], multi_value=True)


def test_varbyte_selective_take_matches_dense(segment):
    """Chunk-selective RAW decode (r6): take_{bytes,strings}_arrow over
    sorted doc ids must equal the dense decode + take, across chunk
    boundaries, for PASS_THROUGH and LZ4 columns and edge selections."""
    import numpy as np
    import pyarrow as pa

    v3, data = segment
    r = SegmentReader.open(v3)
    n = r.total_docs()
    selections = [
        np.array([], dtype=np.int64),
        np.array([0]),
        np.array([n - 1]),
        np.arange(0, n, 97),  # crosses many chunks
        np.arange(0, n),  # everything
        np.array([5, 6, 7, 500, 501, 999]),
    ]
    for colname in ("rid", "rlz"):
        dense = r._read_column_arrow_dense(colname)
        for sel in selections:
            got = r._read_column_arrow_dense(colname, selection=sel)
            want = dense.take(pa.array(sel, pa.int64()))
            assert got.equals(want), (colname, sel[:5])


def test_varbyte_selective_take_huge_chunks(tmp_path):
    """Huge-value chunks (one value per chunk) through the selective path."""
    import numpy as np
    import pyarrow as pa

    big = ["x" * 5000, "y" * 4000, "z" * 6000]
    v3 = write_segment(
        tmp_path / "hg",
        "hg",
        "t",
        [
            ColumnSpec(
                "v",
                DataType.STRING,
                big,
                raw=True,
                compression=LZ4_LENGTH_PREFIXED,
                target_chunk_size=1024,
            )
        ],
    )
    r = SegmentReader.open(v3)
    dense = r._read_column_arrow_dense("v")
    for sel in ([0], [2], [0, 2], [0, 1, 2]):
        sel = np.asarray(sel, dtype=np.int64)
        got = r._read_column_arrow_dense("v", selection=sel)
        assert got.equals(dense.take(pa.array(sel, pa.int64())))


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    values=st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=300
    ),
    data=st.data(),
)
def test_varbyte_selective_take_property(tmp_path_factory, values, data):
    """Property: for random byte values and a random sorted selection, the
    chunk-selective take equals the dense decode + take (PASS_THROUGH and
    LZ4, small chunks to force many chunk crossings)."""
    import numpy as np
    import pyarrow as pa

    n = len(values)
    sel = sorted(
        data.draw(
            st.sets(st.integers(min_value=0, max_value=n - 1), max_size=n)
        )
    )
    d = tmp_path_factory.mktemp("vbprop")
    v3 = write_segment(
        d,
        "s",
        "t",
        [
            ColumnSpec("pt", DataType.BYTES, values, raw=True,
                       compression=PASS_THROUGH, target_chunk_size=128),
            ColumnSpec("lz", DataType.BYTES, values, raw=True,
                       compression=LZ4_LENGTH_PREFIXED, target_chunk_size=128),
        ],
    )
    r = SegmentReader.open(v3)
    sel_arr = np.asarray(sel, dtype=np.int64)
    for col in ("pt", "lz"):
        dense = r._read_column_arrow_dense(col)
        got = r._read_column_arrow_dense(col, selection=sel_arr)
        assert got.equals(dense.take(pa.array(sel_arr)))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.data_too_large],
)
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=120),
    num_partitions=st.integers(min_value=1, max_value=16),
)
def test_property_r6_index_metadata(tmp_path_factory, data, n, num_partitions):
    """r6 storage features hold for arbitrary data: bloom filters never
    false-negative, partition metadata records exactly the floor-mod
    residue set, dictionary string predicates agree with Python's, and a
    two-way merge concatenates bit-exactly."""
    keys = data.draw(
        st.lists(
            st.integers(-(2**62), 2**62 - 1), min_size=n, max_size=n
        )
    )
    strs = data.draw(st.lists(st.text(max_size=24), min_size=n, max_size=n))
    pattern = data.draw(st.text(max_size=4))

    d = tmp_path_factory.mktemp("propb") / "seg"
    v3 = write_segment(
        d,
        "seg",
        "t",
        [
            ColumnSpec(
                "k",
                DataType.LONG,
                keys,
                raw=True,
                bloom=True,
                partition_config=("Modulo", num_partitions),
            ),
            ColumnSpec("s", DataType.STRING, strs, bloom=True),
        ],
    )
    r = SegmentReader.open(v3)
    # bloom: zero false negatives on either path
    assert r.bloom_might_contain("k", [keys[0]]) is True
    assert r.bloom_might_contain("s", [strs[-1]]) is True
    # partition metadata: exact residue set, floor-mod semantics
    cm = r.metadata.get_column("k")
    assert cm.partition_values == tuple(
        sorted({k % num_partitions for k in keys})
    )
    # dictionary string predicates agree with Python semantics
    for kind, ref in (
        ("startswith", lambda v: v.startswith(pattern)),
        ("endswith", lambda v: v.endswith(pattern)),
        ("contains", lambda v: pattern in v),
    ):
        got = r.string_predicate_mask("s", kind, pattern)
        assert got.tolist() == [ref(v) for v in strs]
    # merge of the segment with itself doubles every column bit-exactly
    from pinot_segment.compact import merge_segments

    m = SegmentReader.open(
        merge_segments(
            [str(v3), str(v3)], d.parent / "m", "m", "t"
        )
    )
    assert m.total_docs() == 2 * n
    assert m.read_column("k").tolist() == keys + keys
    assert list(m.read_column("s")) == strs + strs
    assert m.metadata.get_column("k").partition_values == cm.partition_values
    assert m.bloom_might_contain("k", [keys[0]]) is True


def test_bigdecimal_roundtrip_property(tmp_path):
    """Random decimals at random scales round-trip bit-exactly through
    both encodings (dictionary and RAW var-byte)."""
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    from pinot_segment import SegmentReader
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    counter = {"n": 0}

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(10**12), max_value=10**12),
            min_size=1,
            max_size=40,
        ),
        st.integers(min_value=0, max_value=6),
        st.booleans(),
    )
    def run(unscaled, scale, raw):
        vals = [Decimal(u).scaleb(-scale) for u in unscaled]
        counter["n"] += 1
        seg = tmp_path / f"s{counter['n']}"
        v3 = write_segment(
            seg,
            f"s{counter['n']}",
            "t",
            [
                ColumnSpec(
                    "m",
                    DataType.BIG_DECIMAL,
                    vals,
                    raw=raw,
                    decimal=(18, scale),
                )
            ],
        )
        r = SegmentReader.open(v3)
        assert r.read_column("m") == vals
        arr = r._read_column_arrow("m")
        assert arr.type.scale == scale
        assert arr.to_pylist() == vals

    run()
