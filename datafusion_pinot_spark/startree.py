"""Build and serve star-tree-style pre-aggregation companions.

See pinot_segment/startree.py for the structure (prefix-level star-tree:
one aggregated row group per split-order prefix, star marker for the
collapsed dims — Pinot's star-node records for its split order, minus the
mid-level branches). This module is the Spark side:

- ``build_startree``: ONE pass over the fact table — ``F.rollup`` emits
  every prefix level in a single grouping-sets aggregate (one shuffle),
  stars fill the collapsed dims, and the result lands as a normal pinot
  table ``{table}__startree_OFFLINE`` through the existing sink. At
  100 TB this is the same cost as the coarsest rollup the cluster would
  run anyway, and it amortizes over every dashboard query that follows.
- ``read_startree_agg``: serve a prefix grouping from the level's rows —
  ``product(prefix cardinalities)`` rows read instead of the full fact
  table, with equality pushdown on ``__level`` letting zone maps prune.

Constraints (validated): dimension values must not collide with the
star marker ``*`` and must be non-null; metrics aggregate by sum/min/max
(count is always materialized as ``__count``). Non-prefix groupings are
not served — callers fall back to the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pinot_segment.startree import (
    COUNT_COL,
    LEVEL_COL,
    STAR,
    companion_table_dir,
    validate_config,
)


def build_startree(
    spark: SparkSession,
    table_dir: str,
    dims: list[str],
    metrics: dict[str, str],
) -> str:
    """Build/refresh the companion; returns its table dir."""
    from datafusion_pinot_spark.sources import register_pinot_source

    validate_config(dims, metrics)
    register_pinot_source(spark)
    fact = spark.read.format("pinot").load(table_dir)
    dim_cols = [F.col(d).cast("string").alias(d) for d in dims]
    base = fact.select(
        *dim_cols, *[F.col(m) for m in metrics]
    )
    aggs = [F.count(F.lit(1)).alias(COUNT_COL)]
    for m, fn in metrics.items():
        aggs.append(getattr(F, fn)(F.col(m)).alias(m))
    gid = F.grouping_id(*dims)
    rolled = (
        base.rollup(*dims)
        .agg(*aggs, gid.alias("__gid"))
    )
    # rollup's grouping sets are exactly the prefixes: gid has a 1-bit per
    # COLLAPSED dim, so a prefix of length k has gid == 2^(n-k) - 1.
    n = len(dims)
    level = (F.lit(n) - F.expr("bit_count(__gid)")).cast("int")
    out = rolled.select(
        level.alias(LEVEL_COL),
        *[
            F.when(
                (F.lit(1 << (n - 1 - i)).bitwiseAND(F.col("__gid"))) == 0,
                F.col(d),
            )
            .otherwise(F.lit(STAR))
            .alias(d)
            for i, d in enumerate(dims)
        ],
        F.col(COUNT_COL),
        *[F.col(m) for m in metrics],
    )
    comp = companion_table_dir(table_dir)
    out.repartition(1).write.format("pinot").mode("overwrite").save(comp)
    return comp


def read_startree_agg(
    spark: SparkSession, table_dir: str, prefix_len: int
) -> DataFrame:
    """The pre-aggregated rows for a split-order prefix of the given
    length; group-by columns keep their names, metrics are the stored
    aggregates, ``__count`` the row count behind each group."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    comp = companion_table_dir(table_dir)
    return (
        spark.read.format("pinot")
        .load(comp)
        .filter(F.col(LEVEL_COL) == prefix_len)
        .drop(LEVEL_COL)
    )
