"""Deterministic mergeable quantile summaries through pinot storage.

Pinot serves PERCENTILETDIGEST / PERCENTILEKLL from sketch columns that are
pre-aggregated at ingest and merged at query time. TDigest/KLL are
randomized and engine-specific — stored here they would be rows-only, like
the Datasketches HLL column (`pinot_hll_sketch_rollup`). This module keeps
the same build-once/merge-many contract but with a DETERMINISTIC summary,
so the whole pipeline sits under the driver's hash gate:

- **Build** (:func:`quantile_sketch_build`): per group, the sorted values'
  every ``k``-th order statistic plus the max (rank-determined — a pure
  function of the multiset, reproducible by any engine), stored as one
  multi-value LONG column per group row. Size = ``ceil(n/k) + 1`` per
  group; error of any quantile read from the summary is bounded by ``k``
  ranks.
- **Merge** (:func:`quantile_sketch_merge`): flatten + re-sort the stored
  sample arrays across groups, read quantiles at integer ranks. Merging
  loses no additional accuracy class (samples stay rank-representative
  within 2k), and like every summary here it never re-touches raw data.

Scale shape: the build is one window pass per group (parallel across
groups) at ingest; every later quantile query reads ``ceil(n/k)`` longs
per group instead of ``n`` raw values — the same economics as the HLL
rollup, with cross-engine exact reproducibility as the bonus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_K = 8  # keep every k-th order statistic


def quantile_sketch_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    order_tiebreak: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per group: ``*group_cols, qs`` (sorted rank samples as
    ``array<long>``) and ``n_rows``. Samples are ranks ``1, 1+k, 1+2k,
    ...`` plus the final rank — deterministic for any tie order because
    tied values are interchangeable at equal ranks."""
    w = Window.partitionBy(*group_cols).orderBy(value_col, order_tiebreak)
    wc = Window.partitionBy(*group_cols)
    return (
        df.select(*group_cols, value_col, order_tiebreak)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") % k == 1) | (F.col("rn") == F.col("cnt")))
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.col(value_col).cast("long"))
            ).alias("qs"),
            F.max("cnt").cast("long").alias("n_rows"),
        )
    )


def quantile_sketch_merge(
    sketches: DataFrame,
    group_cols: list[str],
    percents: list[int],
) -> DataFrame:
    """Merge stored summaries up to a coarser grouping and read quantiles
    at integer percent ranks: ``*group_cols, n_rows, n_samples,
    est_p{P}...``. All arithmetic is integer (rank indexing into the
    sorted flattened samples), so both engines agree bit-for-bit."""
    merged = sketches.groupBy(*group_cols).agg(
        F.sort_array(F.flatten(F.collect_list("qs"))).alias("allq"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
    cols = [
        *group_cols,
        "n_rows",
        F.size("allq").cast("long").alias("n_samples"),
    ]
    for p in percents:
        cols.append(
            F.element_at(
                "allq",
                (
                    F.expr(f"(size(allq) - 1) * {p} div 100") + 1
                ).cast("int"),
            ).alias(f"est_p{p}")
        )
    return merged.select(*cols).orderBy(*group_cols)


def quantile_sketch_rollup_oracle_sql(
    percents: list[int], k: int = DEFAULT_K
) -> str:
    """DuckDB oracle for the documents-table n_chars rollup: rebuild the
    identical rank-sampled summaries per (source, lang) from the parquet,
    merge per source, and index the same integer ranks."""
    ests = ", ".join(
        f"allq[(n_samples - 1) * {p} // 100 + 1] AS est_p{p}"
        for p in percents
    )
    return f"""
WITH r AS (
  SELECT source, lang, n_chars,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source, lang) AS cnt
  FROM documents
), s AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS v
  FROM r WHERE rn % {k} = 1 OR rn = cnt
), g AS (
  SELECT source, list_sort(list(v)) AS allq,
         CAST(count(*) AS BIGINT) AS n_samples
  FROM s GROUP BY source
), c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_rows
  FROM documents GROUP BY source
)
SELECT source, n_rows, n_samples, {ests}
FROM g JOIN c USING (source) ORDER BY source"""
