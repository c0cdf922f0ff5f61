"""Star-tree companion: level structure, exactness vs direct aggregation,
level pruning, and validation."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pinot_segment.startree import (
    COUNT_COL,
    LEVEL_COL,
    STAR,
    companion_table_dir,
    validate_config,
)


def test_validate_config():
    validate_config(["a"], {"m": "sum"})
    with pytest.raises(ValueError, match="dimension"):
        validate_config([], {"m": "sum"})
    with pytest.raises(ValueError, match="unsupported agg"):
        validate_config(["a"], {"m": "avg"})
    with pytest.raises(ValueError, match="both dim and metric"):
        validate_config(["a"], {"a": "sum"})


def test_companion_dir_naming():
    assert companion_table_dir("/x/t_OFFLINE") == "/x/t__startree_OFFLINE"
    assert companion_table_dir("/x/t_REALTIME") == "/x/t__startree_OFFLINE"


@pytest.fixture(scope="module")
def fact_table(spark):
    from datafusion_pinot_spark.sources import register_pinot_source
    from datafusion_pinot_spark.startree import build_startree

    register_pinot_source(spark)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    out = os.path.join(tempfile.mkdtemp(), "li_OFFLINE")
    li.repartition(4).write.format("pinot").mode("overwrite").save(out)
    comp = build_startree(
        spark, out, dims=["flag", "status"], metrics={"qty": "sum"}
    )
    return out, comp, li


def test_levels_and_star_markers(spark, fact_table):
    out, comp, li = fact_table
    rows = spark.read.format("pinot").load(comp).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r[LEVEL_COL], []).append(r)
    nflag = li.select("flag").distinct().count()
    npair = li.select("flag", "status").distinct().count()
    assert len(by_level[0]) == 1  # grand total
    assert len(by_level[1]) == nflag
    assert len(by_level[2]) == npair
    assert all(r["flag"] == STAR and r["status"] == STAR for r in by_level[0])
    assert all(r["status"] == STAR and r["flag"] != STAR for r in by_level[1])
    # grand total row equals the whole table
    assert by_level[0][0][COUNT_COL] == li.count()


@pytest.mark.parametrize("k,groupcols", [(1, ["flag"]), (2, ["flag", "status"])])
def test_served_prefix_equals_direct_agg(spark, fact_table, k, groupcols):
    from datafusion_pinot_spark.startree import read_startree_agg

    out, comp, li = fact_table
    served = sorted(
        tuple(r)
        for r in read_startree_agg(spark, out, prefix_len=k)
        .select(*groupcols, COUNT_COL, "qty")
        .collect()
    )
    direct = sorted(
        tuple(r)
        for r in li.groupBy(*groupcols)
        .agg(F.count(F.lit(1)).alias(COUNT_COL), F.sum("qty").alias("qty"))
        .collect()
    )
    assert served == direct


def test_level_filter_is_pushed(spark, fact_table):
    from datafusion_pinot_spark.startree import read_startree_agg

    out, comp, li = fact_table
    df = read_startree_agg(spark, out, prefix_len=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no residual Filter NODE — the __level equality is consumed by the
    # source ("RuntimeFilters: []" in the scan line also contains the
    # word, hence the node-shaped patterns)
    assert "Filter (" not in plan and ") Filter" not in plan


def test_serve_agg_routes_and_falls_back(spark, fact_table):
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.startree import serve_agg

    out, comp, li = fact_table

    def norm(df):
        return sorted(tuple(r) for r in df.collect())

    direct = norm(
        li.groupBy("flag").agg(
            F.count(F.lit(1)).alias(COUNT_COL), F.sum("qty").alias("qty")
        )
    )
    routed = serve_agg(spark, out, ["flag"], {"qty": "sum"})
    assert norm(routed) == direct
    # the routed plan never touches the fact table dir
    assert out not in routed._jdf.queryExecution().executedPlan().toString()

    # non-prefix grouping (status alone) → fallback, same answer
    by_status = serve_agg(spark, out, ["status"], {"qty": "sum"})
    assert norm(by_status) == norm(
        li.groupBy("status").agg(
            F.count(F.lit(1)).alias(COUNT_COL), F.sum("qty").alias("qty")
        )
    )
    # unmaterialized metric → fallback, same answer
    by_max = serve_agg(spark, out, ["flag"], {"qty": "max"})
    assert norm(by_max) == norm(
        li.groupBy("flag").agg(
            F.count(F.lit(1)).alias(COUNT_COL), F.max("qty").alias("qty")
        )
    )
