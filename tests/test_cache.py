"""Manifest-keyed result cache: hit on identical segment state, rebuild
on any segment change, staged-rename commit."""

import numpy as np
import pytest

from pinot_segment.metadata import DataType
from pinot_segment.writer import ColumnSpec, write_segment


@pytest.fixture()
def table(tmp_path):
    td = tmp_path / "t_OFFLINE"
    write_segment(
        td / "seg0", "seg0", "t",
        [ColumnSpec("k", DataType.LONG, np.arange(10))],
    )
    return str(td)


def test_cache_hits_and_invalidates(spark, table, tmp_path):
    from datafusion_pinot_spark.cache import cached_query, table_state_digest
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    cache = str(tmp_path / "cache")
    calls = []

    def build(s):
        calls.append(1)
        return (
            s.read.format("pinot")
            .load(table)
            .agg({"k": "sum"})
            .withColumnRenamed("sum(k)", "s")
        )

    d0 = table_state_digest(table)
    r1 = cached_query(spark, table, cache, "sum_k", build).collect()
    r2 = cached_query(spark, table, cache, "sum_k", build).collect()
    assert r1 == r2
    assert len(calls) == 1  # second call served from cache

    # a different query key misses
    cached_query(spark, table, cache, "sum_k_v2", build).collect()
    assert len(calls) == 2

    # landing a new segment changes the table state => rebuild
    write_segment(
        f"{table}/seg1", "seg1", "t",
        [ColumnSpec("k", DataType.LONG, np.arange(10, 20))],
    )
    assert table_state_digest(table) != d0
    r3 = cached_query(spark, table, cache, "sum_k", build).collect()
    assert len(calls) == 3
    assert r3[0]["s"] == sum(range(20))
    assert r1[0]["s"] == sum(range(10))
