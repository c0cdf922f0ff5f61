"""TIMESTAMP filter pushdown (r5 verdict #1 — "the last scale-killer").

Time-range predicates are the canonical Pinot access pattern; before r6 they
were yielded back to Spark, so a 100 TB time-partitioned table decoded every
segment. These tests pin:

- the datetime→epoch-millis filter rewrite (`_convert_ts_filter`) is exact,
  including sub-millisecond (unaligned) bounds and naive/aware operands;
- a ts-range predicate zone-map-prunes segments at partitions() time with
  ZERO SegmentReader opens when the manifest is fresh;
- end-to-end through Spark: filtered reads over the pinot source equal the
  same filter evaluated by Spark over the original rows, for aligned AND
  unaligned bounds.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pytest

from pinot_segment import SegmentReader
from pinot_segment import manifest as M
from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment

from datafusion_pinot_spark.sources import pinot_datasource as ds

UTC = dt.timezone.utc


def _utc(*args, **kw):
    return dt.datetime(*args, tzinfo=UTC, **kw)


# ---------------------------------------------------------------------------
# unit: the filter rewrite
# ---------------------------------------------------------------------------


def test_convert_aligned_bounds():
    v = _utc(2024, 1, 8)  # millis-aligned
    q = 1704672000000  # epoch ms
    assert ds._convert_ts_filter(ds.EqualTo(("ts",), v)) == ds.EqualTo(("ts",), q)
    assert ds._convert_ts_filter(ds.GreaterThan(("ts",), v)) == ds.GreaterThan(("ts",), q)
    assert ds._convert_ts_filter(ds.GreaterThanOrEqual(("ts",), v)) == ds.GreaterThanOrEqual(("ts",), q)
    assert ds._convert_ts_filter(ds.LessThan(("ts",), v)) == ds.LessThan(("ts",), q)
    assert ds._convert_ts_filter(ds.LessThanOrEqual(("ts",), v)) == ds.LessThanOrEqual(("ts",), q)


def test_convert_unaligned_bounds():
    # 500us past an aligned instant: no stored (ms-aligned) value can be
    # strictly between q*1000 and (q+1)*1000 micros
    v = _utc(2024, 1, 8, microsecond=500)
    q = 1704672000000
    assert ds._convert_ts_filter(ds.GreaterThan(("ts",), v)) == ds.GreaterThan(("ts",), q)
    assert ds._convert_ts_filter(ds.GreaterThanOrEqual(("ts",), v)) == ds.GreaterThan(("ts",), q)
    assert ds._convert_ts_filter(ds.LessThan(("ts",), v)) == ds.LessThanOrEqual(("ts",), q)
    assert ds._convert_ts_filter(ds.LessThanOrEqual(("ts",), v)) == ds.LessThanOrEqual(("ts",), q)
    # unaligned equality matches nothing — empty IN prunes everything
    assert ds._convert_ts_filter(ds.EqualTo(("ts",), v)) == ds.In(("ts",), ())


def test_convert_exhaustive_vs_bruteforce():
    """Property check: for every filter class and bound near an alignment
    boundary, the converted millis predicate selects exactly the stored
    values the original micros predicate selects."""
    stored_ms = np.array([999, 1000, 1001, 1002, 2000])  # epoch millis
    surfaced_us = stored_ms * 1000

    ops = {
        ds.EqualTo: lambda s, u: s == u,
        ds.GreaterThan: lambda s, u: s > u,
        ds.GreaterThanOrEqual: lambda s, u: s >= u,
        ds.LessThan: lambda s, u: s < u,
        ds.LessThanOrEqual: lambda s, u: s <= u,
    }
    for bound_us in range(999_000, 1_003_001, 250):  # aligned + unaligned
        v = dt.datetime(1970, 1, 1, tzinfo=UTC) + dt.timedelta(microseconds=bound_us)
        for cls, op in ops.items():
            conv = ds._convert_ts_filter(cls(("ts",), v))
            expected = op(surfaced_us, bound_us)
            if isinstance(conv, ds.In):
                got = np.isin(stored_ms, list(conv.value))
            else:
                got = ops[type(conv)](stored_ms, conv.value)
            assert (got == expected).all(), (cls.__name__, bound_us, conv)


def test_convert_in_and_naive_and_non_datetime():
    aligned = _utc(2024, 1, 8)
    unaligned = _utc(2024, 1, 8, microsecond=7)
    conv = ds._convert_ts_filter(ds.In(("ts",), (aligned, unaligned)))
    assert conv == ds.In(("ts",), (1704672000000,))  # unaligned member dropped
    # naive datetime == UTC wall clock (the pinned session timezone)
    naive = dt.datetime(2024, 1, 8)
    assert ds._convert_ts_filter(ds.EqualTo(("ts",), naive)) == ds.EqualTo(
        ("ts",), 1704672000000
    )
    # date (not datetime) and other operands: not convertible
    assert ds._convert_ts_filter(ds.EqualTo(("ts",), dt.date(2024, 1, 8))) is None
    assert ds._convert_ts_filter(ds.EqualTo(("ts",), "2024-01-08")) is None


# ---------------------------------------------------------------------------
# planning: ts-range predicates prune segments with zero opens
# ---------------------------------------------------------------------------


@pytest.fixture()
def ts_table_dir(tmp_path):
    """3 segments with disjoint hour ranges of a sorted TIMESTAMP column
    (epoch-millis LONGs on disk), stats manifest written."""
    base_ms = 1704672000000  # 2024-01-08T00:00:00Z
    hour = 3600_000
    table = tmp_path / "ev_OFFLINE"
    for i in range(3):
        ts = base_ms + i * hour + np.arange(0, hour, hour // 50, dtype=np.int64)
        write_segment(
            table / f"seg{i}",
            f"seg{i}",
            "ev",
            [
                ColumnSpec("ts", DataType.TIMESTAMP, ts),
                ColumnSpec("v", DataType.LONG, np.arange(len(ts))),
            ],
        )
    M.write_manifest(str(table), M.build_manifest(str(table)))
    return str(table)


def test_ts_range_prunes_with_zero_opens(ts_table_dir, monkeypatch):
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    segs = [os.path.join(ts_table_dir, f"seg{i}", "v3") for i in range(3)]
    opened = []
    real_open = SegmentReader.open.__func__

    def counting_open(cls, seg_dir):
        opened.append(str(seg_dir))
        return real_open(cls, seg_dir)

    monkeypatch.setattr(SegmentReader, "open", classmethod(counting_open))

    schema = StructType(
        [StructField("ts", TimestampType()), StructField("v", LongType())]
    )
    reader = ds.PinotDataSourceReader(schema, segs)
    # range fully inside segment 1's hour
    unpushed = list(
        reader.pushFilters(
            [
                ds.GreaterThanOrEqual(("ts",), _utc(2024, 1, 8, 1, 10)),
                ds.LessThan(("ts",), _utc(2024, 1, 8, 1, 40)),
            ]
        )
    )
    assert unpushed == []  # both converted and pushed
    parts = reader.partitions()
    assert opened == []  # manifest answered every prune decision
    kept = [d for p in parts for d in p.segment_dirs]
    assert kept == [segs[1]]


def test_ts_equality_unaligned_prunes_everything(ts_table_dir, monkeypatch):
    from pyspark.sql.types import StructField, StructType, TimestampType

    segs = [os.path.join(ts_table_dir, f"seg{i}", "v3") for i in range(3)]
    schema = StructType([StructField("ts", TimestampType())])
    reader = ds.PinotDataSourceReader(schema, segs)
    list(
        reader.pushFilters(
            [ds.EqualTo(("ts",), _utc(2024, 1, 8, 1, 0, 0, 123))]
        )
    )
    parts = reader.partitions()
    # all pruned -> single sentinel partition with no segments
    assert [p.segment_dirs for p in parts] == [()]


# ---------------------------------------------------------------------------
# end-to-end through Spark (sink → source → filtered agg)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ts_spark_table(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path_factory.mktemp("tsq") / "ev_OFFLINE")
    base = 1704672000000
    rows = spark.range(0, 5000).select(
        F.timestamp_millis(F.lit(base) + F.col("id") * 1000 + (F.col("id") % 7) * 3).alias("ts"),
        (F.col("id") % 5).alias("v"),
    )
    (
        rows.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "ts")
        .save(out)
    )
    return out, rows


@pytest.mark.parametrize(
    "lo_us,hi_us",
    [
        (0, None),  # no filter sanity
        (1_000_000 * 1000, 1_800_000 * 1000),  # aligned bounds
        (1_000_000 * 1000 + 500, 1_800_000 * 1000 + 1),  # sub-ms bounds
    ],
)
def test_ts_filter_end_to_end(spark, ts_spark_table, lo_us, hi_us):
    from pyspark.sql import functions as F

    out, rows = ts_spark_table
    base = 1704672000000

    def bounds(df):
        f = df
        if lo_us:
            f = f.filter(
                F.col("ts") >= F.timestamp_micros(F.lit(base * 1000 + lo_us))
            )
        if hi_us is not None:
            f = f.filter(
                F.col("ts") < F.timestamp_micros(F.lit(base * 1000 + hi_us))
            )
        return f.agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.unix_millis(F.min("ts")).alias("mn"),
            F.unix_millis(F.max("ts")).alias("mx"),
        ).collect()[0]

    back = spark.read.format("pinot").load(out)
    # oracle: the same predicate over the PRE-WRITE rows, ms-truncated the
    # way the sink stores them (timestamp_millis already is)
    assert list(bounds(back)) == list(bounds(rows))


def test_ts_filter_fully_consumed_in_plan(spark, ts_spark_table):
    """A convertible ts-range predicate must be consumed by the source —
    the optimized plan over the pinot scan carries no residual Filter
    node (Spark trusts pushFilters' contract; a yielded-back filter would
    reappear as a post-scan Filter)."""
    from pyspark.sql import functions as F

    out, _ = ts_spark_table
    base = 1704672000000
    df = (
        spark.read.format("pinot")
        .load(out)
        .filter(
            (F.col("ts") >= F.timestamp_millis(F.lit(base + 1_000_000)))
            & (F.col("ts") < F.timestamp_millis(F.lit(base + 2_000_000)))
        )
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in plan, plan


def test_convert_pre_epoch_bounds():
    """Pre-1970 operands: divmod floor semantics must stay exact for
    negative epoch values (floor division rounds toward -inf)."""
    stored_ms = np.array([-2000, -1001, -1000, -999, 0])  # epoch millis
    surfaced_us = stored_ms * 1000
    ops = {
        ds.EqualTo: lambda s, u: s == u,
        ds.GreaterThan: lambda s, u: s > u,
        ds.GreaterThanOrEqual: lambda s, u: s >= u,
        ds.LessThan: lambda s, u: s < u,
        ds.LessThanOrEqual: lambda s, u: s <= u,
    }
    for bound_us in range(-1_000_750, -998_999, 250):
        v = dt.datetime(1970, 1, 1, tzinfo=UTC) + dt.timedelta(
            microseconds=bound_us
        )
        for cls, op in ops.items():
            conv = ds._convert_ts_filter(cls(("ts",), v))
            expected = op(surfaced_us, bound_us)
            if isinstance(conv, ds.In):
                got = np.isin(stored_ms, list(conv.value))
            else:
                got = ops[type(conv)](stored_ms, conv.value)
            assert (got == expected).all(), (cls.__name__, bound_us, conv)
