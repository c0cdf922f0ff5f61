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

import os

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
    # sidecar config: the split order and metric->agg map, so serve_agg
    # can refuse a mismatched request (e.g. max over a sum-materialized
    # metric) instead of silently serving the wrong aggregate. Segment
    # discovery skips non-segment entries, so the file is invisible to
    # every reader.
    import json

    with open(os.path.join(comp, "startree_config.json"), "w") as f:
        json.dump({"dims": list(dims), "metrics": dict(metrics)}, f)
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


def serve_agg(
    spark: SparkSession,
    table_dir: str,
    group_dims: list[str],
    metrics: dict[str, str],
) -> DataFrame:
    """Route a GROUP BY to the star-tree companion when possible: if the
    grouped dims are a PREFIX of the companion's split order and every
    requested metric is materialized with the same agg function, the
    result comes from the level's pre-aggregated rows (count from
    ``__count``); otherwise aggregate the fact table directly — same
    schema either way, so callers don't care which path served them.

    The check reads ONE companion row group's schema (no fact-table
    touch); a missing companion or a non-prefix grouping is simply the
    fallback, never an error."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)

    def fallback() -> DataFrame:
        fact = spark.read.format("pinot").load(table_dir)
        aggs = [F.count(F.lit(1)).alias(COUNT_COL)] + [
            getattr(F, fn)(F.col(m)).alias(m) for m, fn in metrics.items()
        ]
        return fact.groupBy(
            *[F.col(d).cast("string").alias(d) for d in group_dims]
        ).agg(*aggs)

    import json

    comp = companion_table_dir(table_dir)
    cfg_path = os.path.join(comp, "startree_config.json")
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
        companion = spark.read.format("pinot").load(comp)
    except Exception:
        return fallback()
    k = len(group_dims)
    if cfg["dims"][:k] != list(group_dims) or any(
        cfg["metrics"].get(m) != fn for m, fn in metrics.items()
    ):
        return fallback()
    return (
        companion.filter(F.col(LEVEL_COL) == k)
        .select(*group_dims, COUNT_COL, *metrics)
    )
