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


def quantile_sketch_accuracy_audit(
    docs: DataFrame,
    percents: tuple[int, ...] = (50, 90, 99),
    k: int = DEFAULT_K,
) -> DataFrame:
    """Accuracy audit of the deterministic rank-sample sketch against the
    EXACT quantiles it approximates — the quantile twin of the
    cms_frequency_audit / minhash_estimate_error pattern: never ship a
    summary structure without measuring its error on real data. Per
    (source, percent): the merged-sketch estimate, the exact value at
    the same integer rank, the value error, the RANK error (how many
    ranks the estimate's position interval misses the target by), and
    whether the PROVABLE merged bound ``rank_err <= k * n_sketches``
    held — each merged per-(source, lang) summary can hide at most k-1
    ranks between two of its samples, so G merged summaries bound the
    interval miss by k*G. The audit proves that bound empirically (and
    usually shows errors far inside it).

    Scale shape (100 TB): the sketch legs read ceil(n/k) samples per
    group; the exact leg is one PARTITIONED rank window per source (the
    thing the sketch lets production avoid — an audit pays it once on a
    sample); the rank-interval check is one broadcast join of the tiny
    (source, percent) frame against a conditional count."""
    sk = quantile_sketch_build(docs, ["source", "lang"], "n_chars", "doc_id", k)
    n_sk = sk.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sketches")
    )
    est = quantile_sketch_merge(sk, ["source"], list(percents))
    stack_args = ", ".join(f"{p}, est_p{p}" for p in percents)
    melt = est.select(
        "source",
        "n_rows",
        "n_samples",
        F.expr(
            f"stack({len(percents)}, {stack_args}) AS (p, est)"
        ),
    ).select(
        "source",
        "n_rows",
        "n_samples",
        F.col("p").cast("int").alias("p"),
        "est",
        F.expr("(n_rows - 1) * p div 100 + 1").alias("target_rank"),
    )
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    ranked = docs.select(
        "source", F.col("n_chars").cast("long").alias("v"), "doc_id"
    ).withColumn("rn", F.row_number().over(w))
    exact = melt.join(
        ranked.select(
            "source", F.col("rn").alias("target_rank"), F.col("v").alias("exact")
        ),
        ["source", "target_rank"],
    )
    pos = (
        ranked.join(
            F.broadcast(melt.select("source", "p", "est")), "source"
        )
        .groupBy("source", "p")
        .agg(
            F.sum(F.expr("CAST(v < est AS BIGINT)")).alias("below"),
            F.sum(F.expr("CAST(v <= est AS BIGINT)")).alias("at_or_below"),
        )
    )
    return (
        exact.join(pos, ["source", "p"])
        .join(F.broadcast(n_sk), "source")
        .select(
            "source",
            "p",
            "n_rows",
            "n_samples",
            "n_sketches",
            "est",
            "exact",
            F.expr("abs(est - exact)").cast("long").alias("abs_val_err"),
            F.expr(
                "CAST(CASE WHEN target_rank < below + 1"
                " THEN below + 1 - target_rank"
                " WHEN target_rank > at_or_below"
                " THEN target_rank - at_or_below"
                " ELSE 0 END AS BIGINT)"
            ).alias("rank_err"),
        )
        .withColumn(
            "bound_ok",
            F.expr(f"CAST(rank_err <= {k} * n_sketches AS BIGINT)"),
        )
        .orderBy("source", "p")
    )


def quantile_sketch_accuracy_audit_oracle_sql(
    percents: tuple[int, ...] = (50, 90, 99), k: int = DEFAULT_K
) -> str:
    plist = ", ".join(str(p) for p in percents)
    return f"""
WITH r AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS v, doc_id,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source, lang) AS cnt
  FROM documents
), s AS (
  SELECT source, v FROM r WHERE rn % {k} = 1 OR rn = cnt
), g AS (
  SELECT source, list_sort(list(v)) AS allq,
         CAST(count(*) AS BIGINT) AS n_samples
  FROM s GROUP BY source
), c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_rows
  FROM documents GROUP BY source
), nsk AS (
  SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_sketches
  FROM documents GROUP BY source
), melt AS (
  SELECT g.source, c.n_rows, g.n_samples, p.p,
         allq[(n_samples - 1) * p.p // 100 + 1] AS est,
         (c.n_rows - 1) * p.p // 100 + 1 AS target_rank
  FROM g JOIN c ON g.source = c.source
  CROSS JOIN (SELECT unnest([{plist}]) AS p) p
), ranked AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rn
  FROM documents
), exact AS (
  SELECT m.source, m.p, m.n_rows, m.n_samples, m.est, m.target_rank,
         r.v AS exact
  FROM melt m JOIN ranked r
    ON m.source = r.source AND r.rn = m.target_rank
), pos AS (
  SELECT m.source, m.p,
         sum(CAST(r.v < m.est AS BIGINT)) AS below,
         sum(CAST(r.v <= m.est AS BIGINT)) AS at_or_below
  FROM ranked r JOIN melt m ON r.source = m.source
  GROUP BY m.source, m.p
)
SELECT e.source, CAST(e.p AS INTEGER) AS p, e.n_rows, e.n_samples,
       n.n_sketches, e.est, e.exact,
       CAST(abs(e.est - e.exact) AS BIGINT) AS abs_val_err,
       CAST(CASE WHEN e.target_rank < p.below + 1
            THEN p.below + 1 - e.target_rank
            WHEN e.target_rank > p.at_or_below
            THEN e.target_rank - p.at_or_below
            ELSE 0 END AS BIGINT) AS rank_err,
       CAST(CASE WHEN (CASE WHEN e.target_rank < p.below + 1
            THEN p.below + 1 - e.target_rank
            WHEN e.target_rank > p.at_or_below
            THEN e.target_rank - p.at_or_below
            ELSE 0 END) <= {k} * n.n_sketches THEN 1 ELSE 0 END AS BIGINT)
         AS bound_ok
FROM exact e JOIN pos p ON e.source = p.source AND e.p = p.p
JOIN nsk n ON e.source = n.source
ORDER BY e.source, e.p"""
