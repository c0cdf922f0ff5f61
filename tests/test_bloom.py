"""Bloom-filter index: serialization, probe semantics, writer/reader
round-trip, and the datasource's segment-skip path.

Everything here is deterministic (MD5 hash family, fixed data), so the
"definitely absent" assertions cannot flake — a value either collides in
this exact filter or it never does.
"""

import numpy as np
import pytest

from pinot_segment.bloom import (
    BloomFilter,
    build_bloom,
    canonical_bytes,
    expected_fpr,
)
from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment


def test_roundtrip_no_false_negatives_and_low_fpr():
    present = [f"key_{i}" for i in range(1000)]
    blob = build_bloom(
        (canonical_bytes(v, DataType.STRING) for v in present), len(present)
    )
    bf = BloomFilter.from_bytes(blob)
    # bloom invariant: zero false negatives
    assert all(bf.might_contain(v, DataType.STRING) for v in present)
    absent = [f"other_{i}" for i in range(1000)]
    fp = sum(bf.might_contain(v, DataType.STRING) for v in absent)
    # 10 bits/key + 7 hashes → ~1% analytic FPR; allow generous slack
    assert fp < 50
    assert expected_fpr(1000, bf.num_bits, bf.num_hashes) < 0.02


def test_canonical_bytes_int_widening():
    # an INT-typed probe must hash identically against a LONG column
    assert canonical_bytes(42, DataType.INT) == canonical_bytes(
        42, DataType.LONG
    )
    assert canonical_bytes(-1, DataType.LONG) == b"\xff" * 8
    assert canonical_bytes(3.5, DataType.FLOAT) == canonical_bytes(
        3.5, DataType.DOUBLE
    )


def test_writer_reader_roundtrip_dict_and_raw(tmp_path):
    from pinot_segment import SegmentReader

    keys = np.arange(0, 5000, 7, dtype=np.int64)  # 0, 7, 14, ...
    langs = ["en", "de", "fr"] * (len(keys) // 3 + 1)
    v3 = write_segment(
        tmp_path / "seg",
        "seg",
        "t",
        [
            ColumnSpec("k", DataType.LONG, keys, raw=True, bloom=True),
            ColumnSpec("lang", DataType.STRING, langs[: len(keys)], bloom=True),
            ColumnSpec("plain", DataType.LONG, keys + 1),
        ],
    )
    r = SegmentReader.open(v3)
    assert r.metadata.get_column("k").has_bloom_filter
    assert r.metadata.get_column("lang").has_bloom_filter
    assert not r.metadata.get_column("plain").has_bloom_filter
    # no false negatives, RAW and dict paths alike
    assert r.bloom_might_contain("k", [7]) is True
    assert r.bloom_might_contain("k", [4998 // 7 * 7]) is True
    assert r.bloom_might_contain("lang", ["de"]) is True
    # definite misses
    assert r.bloom_might_contain("k", [3]) is False
    assert r.bloom_might_contain("lang", ["zz"]) is False
    # IN semantics: any present value → True
    assert r.bloom_might_contain("k", [3, 14]) is True
    # no bloom on this column → None (caller falls through)
    assert r.bloom_might_contain("plain", [1]) is None


def test_nullable_fill_value_not_inserted(tmp_path):
    from pinot_segment import SegmentReader

    # 0 is the LONG fill value and appears ONLY at null positions: the
    # bloom must not contain it
    values = np.array([10, 0, 20, 0, 30], dtype=np.int64)
    mask = np.array([False, True, False, True, False])
    v3 = write_segment(
        tmp_path / "seg",
        "seg",
        "t",
        [
            ColumnSpec(
                "x", DataType.LONG, values, raw=True, null_mask=mask, bloom=True
            )
        ],
    )
    r = SegmentReader.open(v3)
    assert r.bloom_might_contain("x", [10]) is True
    assert r.bloom_might_contain("x", [0]) is False


def test_multi_value_bloom_rejected():
    with pytest.raises(ValueError, match="single-value"):
        ColumnSpec(
            "mv", DataType.INT, [[1, 2], [3]], multi_value=True, bloom=True
        )


def test_datasource_bloom_skip_and_correctness(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, In

    from datafusion_pinot_spark.sources import register_pinot_source
    from datafusion_pinot_spark.sources.pinot_datasource import (
        _bloom_says_absent,
    )
    from pinot_segment import SegmentReader

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    # 4 segments of disjoint unclustered keys: segment i holds keys with
    # key % 4 == i, so zone maps (min/max) cannot prune — each segment
    # spans nearly the full range. Exactly the bloom filter's case.
    df = (
        spark.range(0, 4000)
        .selectExpr(
            "id AS k",
            "CAST(id % 4 AS INT) AS part",
            "concat('v', id) AS payload",
        )
        .repartitionByRange(4, "part")
    )
    (
        df.write.format("pinot")
        .mode("overwrite")
        .option("raw", "k,payload")
        .option("bloom", "k")
        .save(out)
    )
    back = spark.read.format("pinot").load(out)
    # present key → exactly one row, correct payload
    row = back.filter("k = 1234").collect()
    assert len(row) == 1 and row[0]["payload"] == "v1234"
    # absent key → empty
    assert back.filter("k = 999999").count() == 0
    # the skip is provable per segment: a key from segment 0 is
    # bloom-absent from the other three
    import os

    seg_dirs = [
        os.path.join(out, d, "v3")
        for d in os.listdir(out)
        if os.path.isdir(os.path.join(out, d, "v3"))
    ]
    assert len(seg_dirs) >= 3  # range partitioner may fold two key groups
    absent = [
        _bloom_says_absent(SegmentReader.open(d), [EqualTo(("k",), 1234)])
        for d in seg_dirs
    ]
    # all but the single owning segment skip outright
    assert sum(absent) == len(seg_dirs) - 1
    # IN probes prune only when every value misses
    r0 = SegmentReader.open(seg_dirs[0])
    keys_here = r0.read_column("k")
    here, there = int(keys_here[0]), int(keys_here[0]) + 1
    assert _bloom_says_absent(r0, [In(("k",), (here, there))]) is False
