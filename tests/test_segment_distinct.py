"""Segment-partitioned distinct count (Pinot SEGMENTPARTITIONEDDISTINCTCOUNT)
— layout proof, served fast path, and the fallback contract."""

import numpy as np

from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment

from datafusion_pinot_spark.operators.segment_distinct import (
    distinct_count,
    partition_exclusive_column,
)


def _seg(table, name, keys, num=8, partitioned=True):
    return write_segment(
        table / name,
        name,
        "t",
        [
            ColumnSpec(
                "k",
                DataType.LONG,
                np.asarray(keys, dtype=np.int64),
                raw=True,
                partition_config=("Modulo", num) if partitioned else None,
            ),
        ],
    )


def test_exclusive_layout_served_and_exact(spark, tmp_path):
    table = tmp_path / "t_OFFLINE"
    _seg(table, "s0", [0, 8, 16, 8])      # residue 0
    _seg(table, "s1", [1, 9, 17, 1, 9])   # residue 1
    _seg(table, "s2", [2, 10])            # residue 2
    assert partition_exclusive_column(str(table), "k")
    df, method = distinct_count(spark, str(table), "k")
    assert method == "segment_partitioned"
    assert df.collect()[0]["n_distinct"] == 8  # {0,8,16,1,9,17,2,10}


def test_shared_residue_falls_back_to_bitmap(spark, tmp_path):
    table = tmp_path / "t_OFFLINE"
    _seg(table, "s0", [0, 8])   # residue 0
    _seg(table, "s1", [16, 0])  # residue 0 again -> value 0 spans segments
    assert not partition_exclusive_column(str(table), "k")
    # layout proof fails -> auto stays with the exact global distinct
    # (the bitmap strategy is opt-in by measurement, see distinct_count)
    df, method = distinct_count(spark, str(table), "k")
    assert method == "global_distinct"
    assert df.collect()[0]["n_distinct"] == 3  # {0, 8, 16}
    # the opt-in bitmap strategy gives the same exact answer
    df2, method2 = distinct_count(spark, str(table), "k", strategy="bitmap")
    assert method2 == "bitmap_merge"
    assert df2.collect()[0]["n_distinct"] == 3


def test_unpartitioned_column_auto_global_bitmap_optin(spark, tmp_path):
    table = tmp_path / "t_OFFLINE"
    _seg(table, "s0", [0, 1, 2], partitioned=False)
    assert not partition_exclusive_column(str(table), "k")
    df, method = distinct_count(spark, str(table), "k")
    assert method == "global_distinct"
    assert df.collect()[0]["n_distinct"] == 3
    df2, method2 = distinct_count(spark, str(table), "k", strategy="bitmap")
    assert method2 == "bitmap_merge"
    assert df2.collect()[0]["n_distinct"] == 3


def test_huge_domain_rejects_bitmap(spark, tmp_path):
    import pytest as _pytest

    from datafusion_pinot_spark.operators import segment_distinct as sd

    table = tmp_path / "t_OFFLINE"
    _seg(table, "s0", [0, sd.BITMAP_MAX_DOMAIN + 10], partitioned=False)
    df, method = distinct_count(spark, str(table), "k")
    assert method == "global_distinct"
    assert df.collect()[0]["n_distinct"] == 2
    with _pytest.raises(ValueError, match="bitmap strategy needs"):
        distinct_count(spark, str(table), "k", strategy="bitmap")


def test_bitmap_dictionary_served_when_dict_encoded(spark, tmp_path):
    """r14 (verdict #7): with every segment dict-encoded + null-free, the
    bitmap strategy builds its bitmap from dictionary entries (decode-free)
    — method 'bitmap_dictionary_merge' — and stays exact across
    overlapping segments."""
    table = tmp_path / "t_OFFLINE"
    for name, keys in (
        ("s0", [5, 9, 13, 9, 5]),
        ("s1", [9, 21, 5]),
        ("s2", [100, 13]),
    ):
        write_segment(
            table / name, name, "t",
            [ColumnSpec("k", DataType.LONG, np.asarray(keys, dtype=np.int64))],
        )
    df, method = distinct_count(spark, str(table), "k", strategy="bitmap")
    assert method == "bitmap_dictionary_merge"
    assert df.collect()[0]["n_distinct"] == 5  # {5, 9, 13, 21, 100}


def test_bitmap_distinct_matches_exact_on_random(spark):
    import numpy as np

    from datafusion_pinot_spark.operators.segment_distinct import (
        bitmap_distinct_sum,
    )

    rng = np.random.RandomState(11)
    vals = rng.randint(100, 5000, size=4000).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "k long").repartition(8)
    got = bitmap_distinct_sum(df, "k", 100, 4999).collect()[0]["n_distinct"]
    assert got == len(set(vals))


# -- r8: dictionary-served strategies ---------------------------------------


def _dict_seg(table, name, keys, num=8, partitioned=True, nulls=None):
    return write_segment(
        table / name,
        name,
        "t",
        [
            ColumnSpec(
                "k",
                DataType.LONG,
                np.asarray(keys, dtype=np.int64),
                partition_config=("Modulo", num) if partitioned else None,
                null_mask=nulls,
            ),
        ],
    )


def test_metadata_cardinality_no_job(spark, tmp_path):
    """Partition-exclusive + dict-encoded + null-free: the router answers
    from manifest cardinalities — and the number is exact."""
    from datafusion_pinot_spark.operators.segment_distinct import (
        metadata_distinct_count,
    )

    table = tmp_path / "t_OFFLINE"
    _dict_seg(table, "s0", [0, 8, 16, 8])      # residue 0: 3 distinct
    _dict_seg(table, "s1", [1, 9, 17, 1, 9])   # residue 1: 3 distinct
    _dict_seg(table, "s2", [2, 10])            # residue 2: 2 distinct
    assert metadata_distinct_count(str(table), "k") == 8
    df, method = distinct_count(spark, str(table), "k")
    assert method == "metadata_cardinality"
    assert df.collect()[0]["n_distinct"] == 8


def test_dictionary_union_dedups_across_segments(spark, tmp_path):
    """Dict-encoded but NOT layout-exclusive: values repeat across
    segments, so cardinalities cannot be summed — the dictionary-union
    path still answers exactly without decoding any rows."""
    from datafusion_pinot_spark.operators.segment_distinct import (
        dictionary_union_distinct,
    )

    table = tmp_path / "t_OFFLINE"
    _dict_seg(table, "s0", [0, 8, 8, 24], partitioned=False)
    _dict_seg(table, "s1", [16, 0, 8], partitioned=False)   # 0 and 8 repeat
    df = dictionary_union_distinct(spark, str(table), "k")
    assert df is not None
    assert df.collect()[0]["n_distinct"] == 4  # {0, 8, 16, 24}
    df2, method = distinct_count(spark, str(table), "k")
    assert method == "dictionary_union"
    assert df2.collect()[0]["n_distinct"] == 4


def test_nullable_dictionary_not_served(spark, tmp_path):
    """A nullable column's dictionary carries the NULL fill entry, so the
    dictionary strategies must decline (count(DISTINCT) excludes NULLs);
    auto falls through to the exact global path."""
    table = tmp_path / "t_OFFLINE"
    mask = np.array([False, True, False], dtype=bool)
    _dict_seg(table, "s0", [5, 0, 7], partitioned=False, nulls=mask)
    from datafusion_pinot_spark.operators.segment_distinct import (
        dictionary_union_distinct,
        metadata_distinct_count,
    )

    assert metadata_distinct_count(str(table), "k") is None
    assert dictionary_union_distinct(spark, str(table), "k") is None
    df, method = distinct_count(spark, str(table), "k")
    assert method == "global_distinct"
    assert df.collect()[0]["n_distinct"] == 2  # {5, 7}; the NULL slot is out


def test_raw_column_skips_dictionary_strategies(spark, tmp_path):
    """RAW (no-dictionary) columns can't use either dictionary strategy;
    the partition proof still serves the summed per-partition path."""
    table = tmp_path / "t_OFFLINE"
    _seg(table, "s0", [0, 8, 16, 8])
    _seg(table, "s1", [1, 9, 17])
    df, method = distinct_count(spark, str(table), "k")
    assert method == "segment_partitioned"
    assert df.collect()[0]["n_distinct"] == 6


def test_dictionary_union_string_column(spark, tmp_path):
    from datafusion_pinot_spark.operators.segment_distinct import (
        dictionary_union_distinct,
    )

    table = tmp_path / "t_OFFLINE"
    for name, vals in (("s0", ["a", "b", "a"]), ("s1", ["b", "c"])):
        write_segment(
            table / name,
            name,
            "t",
            [ColumnSpec("s", DataType.STRING, vals)],
        )
    df = dictionary_union_distinct(spark, str(table), "s")
    assert df is not None
    assert df.collect()[0]["n_distinct"] == 3  # {a, b, c}


def test_dictionary_only_scan_direct(spark, tmp_path):
    """The dictionary_only read option surfaces each segment's dictionary
    entries as rows through the normal scan; filters apply to entries
    above the scan."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    table = tmp_path / "t_OFFLINE"
    _dict_seg(table, "s0", [5, 1, 5, 3], partitioned=False)
    _dict_seg(table, "s1", [3, 9], partitioned=False)
    df = (
        spark.read.format("pinot")
        .option("dictionary_only", "k")
        .load(str(table))
    )
    # entries per segment: {1,3,5} + {3,9} (3 appears once per segment)
    vals = sorted(r["k"] for r in df.collect())
    assert vals == [1, 3, 3, 5, 9]
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert not df.schema["k"].nullable
    # filters evaluate on the entry stream
    assert sorted(r["k"] for r in df.filter("k > 2").collect()) == [3, 3, 5, 9]


def _inv_seg(table, name, keys, inverted=True, nulls=None):
    return write_segment(
        table / name,
        name,
        "t",
        [
            ColumnSpec(
                "k",
                DataType.LONG,
                np.asarray(keys, dtype=np.int64),
                inverted=inverted,
                null_mask=nulls,
            ),
        ],
    )


def test_dict_value_counts_popcount_equals_bincount(tmp_path):
    """The inverted-index popcount path and the forward-id bincount path
    must agree with each other and with the true per-value counts."""
    from pinot_segment import SegmentReader

    keys = [7, 3, 7, 7, 3, 9, 9, 9, 9, 1]
    truth = {1: 1, 3: 2, 7: 3, 9: 4}
    inv = _inv_seg(tmp_path / "t_OFFLINE", "s_inv", keys, inverted=True)
    plain = _inv_seg(tmp_path / "t_OFFLINE", "s_plain", keys, inverted=False)
    for v3 in (inv, plain):
        r = SegmentReader.open(v3)
        vals, counts = r.dict_value_counts("k")
        assert dict(zip(list(vals), list(counts))) == truth
        assert int(np.sum(counts)) == len(keys)
    # the inverted segment really has the index (popcount path exercised)
    assert SegmentReader.open(inv).metadata.get_column("k").has_inverted_index
    assert not (
        SegmentReader.open(plain).metadata.get_column("k").has_inverted_index
    )


def test_dict_value_counts_declines_nullable_and_raw(tmp_path):
    from pinot_segment import SegmentReader

    table = tmp_path / "t_OFFLINE"
    mask = np.array([False, True, False], dtype=bool)
    v3n = _inv_seg(table, "s_null", [5, 0, 7], inverted=False, nulls=mask)
    assert SegmentReader.open(v3n).dict_value_counts("k") is None
    v3r = _seg(table, "s_raw", [5, 6, 7], partitioned=False)
    assert SegmentReader.open(v3r).dict_value_counts("k") is None


def test_dictionary_groupby_count_across_segments(spark, tmp_path):
    """Counts sum across segments for shared values; result equals the
    plain GROUP BY over the same data."""
    from datafusion_pinot_spark.operators.segment_distinct import (
        dictionary_groupby_count,
    )

    table = tmp_path / "t_OFFLINE"
    _inv_seg(table, "s0", [0, 8, 8, 24])
    _inv_seg(table, "s1", [16, 0, 8], inverted=False)  # mixed index presence
    df = dictionary_groupby_count(spark, str(table), "k")
    assert df is not None
    got = {r["k"]: r["n"] for r in df.collect()}
    assert got == {0: 2, 8: 3, 16: 1, 24: 1}


def test_dictionary_groupby_declines_nullable(spark, tmp_path):
    from datafusion_pinot_spark.operators.segment_distinct import (
        dictionary_groupby_count,
    )

    table = tmp_path / "t_OFFLINE"
    mask = np.array([False, True, False], dtype=bool)
    _inv_seg(table, "s0", [5, 0, 7], inverted=False, nulls=mask)
    assert dictionary_groupby_count(spark, str(table), "k") is None


def test_value_counts_option_validation(spark, tmp_path):
    import pytest

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    table = tmp_path / "t_OFFLINE"
    _inv_seg(table, "s0", [1, 2, 2])
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.read.format("pinot")
            .option("value_counts", "k")
            .option("dictionary_only", "k")
            .load(str(table))
            .collect()
        )
    with pytest.raises(Exception, match="not in segment"):
        (
            spark.read.format("pinot")
            .option("value_counts", "zz")
            .load(str(table))
            .collect()
        )


def test_metadata_min_max_count_no_data_read(spark, tmp_path):
    """MIN/MAX/COUNT folded from per-segment bounds + doc counts — and
    exact; a STRING column (no INT/LONG bounds) declines."""
    from datafusion_pinot_spark.operators.segment_distinct import (
        metadata_min_max_count,
    )

    table = tmp_path / "t_OFFLINE"
    _seg(table, "s0", [5, 42, 17], partitioned=False)
    _seg(table, "s1", [-3, 9], partitioned=False)
    r = metadata_min_max_count(spark, str(table), "k").first()
    assert (r["min_v"], r["max_v"], r["n"]) == (-3, 42, 5)

    stable = tmp_path / "s_OFFLINE"
    write_segment(
        stable / "s0",
        "s0",
        "t",
        [ColumnSpec("w", DataType.STRING, ["a", "b"])],
    )
    assert metadata_min_max_count(spark, str(stable), "w") is None


def test_dict_value_counts_multi_and_composite_groupby(spark, tmp_path):
    """Composite-key kernel: mixed-radix np.unique grouping equals the
    hand-counted pair histogram; the operator sums across segments."""
    from pinot_segment import SegmentReader

    from datafusion_pinot_spark.operators.segment_distinct import (
        dictionary_groupby_count,
    )

    table = tmp_path / "t_OFFLINE"

    def seg(name, a_vals, b_vals):
        return write_segment(
            table / name,
            name,
            "t",
            [
                ColumnSpec("a", DataType.LONG, np.asarray(a_vals, dtype=np.int64)),
                ColumnSpec("b", DataType.STRING, list(b_vals)),
            ],
        )

    v3 = seg("s0", [1, 1, 2, 1], ["x", "y", "x", "x"])
    seg("s1", [2, 1], ["x", "x"])
    vals, counts = SegmentReader.open(v3).dict_value_counts_multi(["a", "b"])
    got = {
        (int(vals[0][i]), vals[1][i]): int(counts[i])
        for i in range(len(counts))
    }
    assert got == {(1, "x"): 2, (1, "y"): 1, (2, "x"): 1}
    df = dictionary_groupby_count(spark, str(table), ["a", "b"])
    assert df is not None
    total = {(r["a"], r["b"]): r["n"] for r in df.collect()}
    assert total == {(1, "x"): 3, (1, "y"): 1, (2, "x"): 2}
