"""Distributed exact global ranking: the bucketed two-pass prefix-sum
pattern shared by sequence packing, equi-depth histograms, funnel
latency quantiles, and RFM segmentation.

A global ``row_number() OVER (ORDER BY ...)`` puts the whole table in one
partition — the one shape this repo bans. The two-pass form instead:

1. buckets rows by a coarse expression that is MONOTONE in the order
   (so buckets are contiguous runs of the global order),
2. counts rows per bucket and runs the prefix window over the tiny
   per-bucket frame (the only single-partition exchange — thousands of
   rows at most),
3. broadcasts the prefixes back and finishes with a within-bucket
   ``row_number``, partitioned by bucket.

``global_rank`` returns the input plus a ``rank`` column (1-based, dense
over the total order) and a ``total`` count column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    rank_col: str = "rank",
    total_col: str = "total",
) -> DataFrame:
    """Exact global 1-based rank over ``order_cols`` without a global
    sort. ``bucket`` must be monotone non-decreasing in the
    ``order_cols`` order (e.g. ``value div span`` when ranking by
    (value, id)); rows with equal order keys get distinct ranks in an
    order determined by the (deterministic) trailing order columns.

    PRECONDITION: the bucket and order keys must be NON-NULL. A NULL
    bucket would be counted into ``total`` and every prefix by the
    nulls-first window but never matched by the equi-join, silently
    dropping the row and shifting every rank — callers coalesce or
    filter NULLs first (all in-repo callers guarantee this)."""
    b = df.withColumn("__bucket", bucket)
    counts = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__bn"))
    w_prefix = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prefixes = counts.select(
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_prefix), F.lit(0)).alias("__prefix"),
        F.sum("__bn").over(w_all).alias(total_col),
    )
    w_local = Window.partitionBy("__bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        b.join(F.broadcast(prefixes), "__bucket")
        .withColumn(rank_col, F.col("__prefix") + F.row_number().over(w_local))
        .drop("__bucket", "__prefix")
    )


def proportional_bucket(
    rank_col: str, total_col: str, buckets: int
) -> Column:
    """Equi-depth bucket of a 1-based rank: ``(rank - 1) * buckets div
    total + 1`` — sizes differ by at most one, odd rows interleave."""
    return F.expr(f"({rank_col} - 1) * {buckets} div {total_col} + 1").cast(
        "int"
    )


def percentile_rank(total_col: str, pct: int) -> Column:
    """The 1-based rank holding the exact low-``pct``-percentile order
    statistic of ``total_col`` rows: ``(total - 1) * pct div 100 + 1``.
    The single formula behind every exact median/quantile in the repo
    (A/B median split, funnel latency p50/p90, MAD medians)."""
    return F.expr(f"({total_col} - 1) * {pct} div 100 + 1")


def pareto_revenue_share(
    orders, top_pct: int = 10
) -> "DataFrame":
    """Pareto concentration audit (the 80/20 check): what share of total
    order revenue do the top ``top_pct`` percent of customers hold?
    Exact decimal revenue sums (DECIMAL(18,2) — no float accumulation),
    exact rank cutoff ``ceil(n·pct/100)`` over (revenue desc, custkey
    asc), share in integer ppm via one floor division of exact decimals
    cast to BIGINT cents.

    Scale shape: one map-side-combined per-customer revenue agg
    collapses the order log; the rank then comes from global_rank's
    bucketed two-pass prefix sum ($10k revenue buckets are monotone in
    the (rev desc, custkey) order), so the customers-sized frame is
    never funneled through a single-partition window — r13, replacing
    the bare row_number() OVER (ORDER BY) this module's header bans."""
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    per = per.withColumn("__neg_cents", F.expr("-CAST(rev * 100 AS BIGINT)"))
    ranked = global_rank(
        per,
        F.expr("__neg_cents DIV 1000000"),
        ["__neg_cents", "o_custkey"],
        rank_col="rk",
        total_col="n",
    ).drop("__neg_cents")
    cut = F.expr(f"CAST((n * {top_pct} + 99) DIV 100 AS BIGINT)")
    return (
        ranked.withColumn("is_top", (F.col("rk") <= cut).cast("bigint"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("is_top").cast("long").alias("n_top"),
            F.expr(
                "CAST(sum(CASE WHEN is_top = 1 THEN rev ELSE 0 END) * 100"
                " AS BIGINT)"
            ).alias("top_rev_cents"),
            F.expr("CAST(sum(rev) * 100 AS BIGINT)").alias(
                "total_rev_cents"
            ),
        )
        .select(
            "n_customers",
            "n_top",
            "top_rev_cents",
            "total_rev_cents",
            F.expr(
                "CAST(top_rev_cents * 1000000 DIV total_rev_cents"
                " AS BIGINT)"
            ).alias("top_share_ppm"),
        )
    )


def pareto_revenue_share_oracle_sql(top_pct: int = 10) -> str:
    return f"""
WITH per AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev DESC, o_custkey ASC) AS rk,
         count(*) OVER () AS n
  FROM per
), marked AS (
  SELECT rev, CASE WHEN rk <= (n * {top_pct} + 99) // 100
                   THEN 1 ELSE 0 END AS is_top
  FROM ranked
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(is_top) AS BIGINT) AS n_top,
       CAST(sum(CASE WHEN is_top = 1 THEN rev ELSE 0 END) * 100 AS BIGINT)
         AS top_rev_cents,
       CAST(sum(rev) * 100 AS BIGINT) AS total_rev_cents,
       CAST(CAST(sum(CASE WHEN is_top = 1 THEN rev ELSE 0 END) * 100
                 AS BIGINT) * 1000000
            // CAST(sum(rev) * 100 AS BIGINT) AS BIGINT) AS top_share_ppm
FROM marked"""


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    bucket: Column,
    order_cols: list[str],
    rank_col: str = "rank",
    total_col: str = "total",
) -> DataFrame:
    """Per-GROUP exact 1-based rank — ``global_rank``'s partitioned
    sibling: within each ``group_cols`` combination, rows rank by
    ``order_cols`` without a per-group global sort. Same contract:
    ``bucket`` must be monotone non-decreasing in the order and, like
    every key here, NON-NULL. The prefix window partitions by the group
    and orders by bucket (a bounded per-group bucket frame); the local
    ``row_number`` partitions by (group, bucket). Neither window is
    all-to-one, so this passes the repo's bare-window gate at any data
    scale."""
    b = df.withColumn("__bucket", bucket)
    counts = b.groupBy(*group_cols, "__bucket").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    w_prefix = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prefixes = counts.select(
        *group_cols,
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_prefix), F.lit(0)).alias("__prefix"),
        F.sum("__bn").over(w_all).alias(total_col),
    )
    w_local = Window.partitionBy(*group_cols, "__bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        b.join(F.broadcast(prefixes), [*group_cols, "__bucket"])
        .withColumn(rank_col, F.col("__prefix") + F.row_number().over(w_local))
        .drop("__bucket", "__prefix")
    )
