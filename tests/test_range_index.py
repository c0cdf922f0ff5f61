"""Range index: bucket classification soundness, reader probe, datasource
e2e equality with the plain decode path, and option validation."""

import os
import tempfile

import numpy as np
import pytest

from pinot_segment import SegmentReader
from pinot_segment.metadata import DataType
from pinot_segment.range_index import RangeIndex, build_range_index
from pinot_segment.writer import ColumnSpec, write_segment


def _truth(vals, lo, li, hi, hi_inc):
    m = np.ones(len(vals), bool)
    if lo is not None:
        m &= (vals >= lo) if li else (vals > lo)
    if hi is not None:
        m &= (vals <= hi) if hi_inc else (vals < hi)
    return m


@pytest.mark.parametrize("is_float", [False, True])
def test_classify_sound_and_complete(is_float):
    rng = np.random.RandomState(3)
    vals = rng.permutation(5000).astype(np.float64 if is_float else np.int64)
    if is_float:
        vals = vals / 7.0
    ri = RangeIndex(build_range_index(vals, is_float), len(vals))
    cases = [
        (100, True, 900, False),
        (None, True, 50, True),
        (4000, False, None, True),
        (123, True, 123, True),
        (-10, True, -1, True),  # empty result
        (None, True, None, True),  # unbounded
    ]
    for lo, li, hi, hi_inc in cases:
        definite, cand = ri.classify(lo, li, hi, hi_inc)
        truth = _truth(vals, lo, li, hi, hi_inc)
        assert not (definite & ~truth).any()  # sound: definite ⊆ truth
        assert not (truth & ~(definite | cand)).any()  # complete
        assert not (definite & cand).any()  # disjoint classes


def test_wide_range_yields_definite_buckets():
    vals = np.arange(10000, dtype=np.int64)
    np.random.RandomState(0).shuffle(vals)
    ri = RangeIndex(build_range_index(vals, False), len(vals))
    definite, cand = ri.classify(1000, True, 9000, True)
    # interior buckets are fully contained → decode only the boundary ones
    assert definite.sum() > 0.8 * 8001
    assert cand.sum() < 2 * (10000 // 64 + 1) + 2


def test_reader_probe_and_dict_columns():
    vals = np.random.RandomState(1).randint(0, 50, 3000).astype(np.int64)
    for raw in (True, False):
        v3 = write_segment(
            tempfile.mkdtemp(),
            "s",
            "t",
            [ColumnSpec("k", DataType.LONG, vals, raw=raw, range_index=True)],
        )
        r = SegmentReader.open(str(v3))
        definite, cand = r.range_classify("k", 10, True, 20, False)
        truth = _truth(vals, 10, True, 20, False)
        assert not (definite & ~truth).any()
        assert not (truth & ~(definite | cand)).any()
    # a column without the index reports None → callers use the plain path
    v3b = write_segment(
        tempfile.mkdtemp(),
        "s2",
        "t",
        [ColumnSpec("k", DataType.LONG, vals[:10])],
    )
    assert SegmentReader.open(str(v3b)).range_classify("k", 0, True, 1, True) is None


def test_spec_validation():
    with pytest.raises(ValueError, match="numeric"):
        ColumnSpec("s", DataType.STRING, ["a"], range_index=True)
    with pytest.raises(ValueError, match="numeric"):
        ColumnSpec(
            "mv", DataType.INT, [[1]], multi_value=True, range_index=True
        )


def test_datasource_range_index_equals_plain(spark):
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    indexed = os.path.join(tempfile.mkdtemp(), "ri_OFFLINE")
    plain = os.path.join(tempfile.mkdtemp(), "rp_OFFLINE")
    w = li.repartition(4, "l_orderkey").write.format("pinot").mode("overwrite")
    w.option("range_index", "l_partkey").save(indexed)
    w.save(plain)

    def agg(path):
        return sorted(
            tuple(r)
            for r in spark.read.format("pinot")
            .load(path)
            .filter((F.col("l_partkey") >= 100) & (F.col("l_partkey") < 140))
            .groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    got, expect = agg(indexed), agg(plain)
    assert got == expect and len(got) > 0


def test_datasource_range_index_nullable_semantics(spark):
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else i * 3) for i in range(200)],
        "id long, v long",
    )
    out = os.path.join(tempfile.mkdtemp(), "rn_OFFLINE")
    df.repartition(2).write.format("pinot").mode("overwrite").option(
        "range_index", "v"
    ).save(out)
    got = (
        spark.read.format("pinot")
        .load(out)
        .filter(F.col("v") <= 30)
        .count()
    )
    expect = df.filter(F.col("v") <= 30).count()
    assert got == expect


def test_sink_rejects_range_index_on_string(spark):
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    out = os.path.join(tempfile.mkdtemp(), "bad_OFFLINE")
    with pytest.raises(Exception, match="numeric"):
        df.write.format("pinot").option("range_index", "s").mode(
            "overwrite"
        ).save(out)
