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
